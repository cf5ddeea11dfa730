"""Deduplication family for the training-data pipeline — the operators a
100 TB caption corpus actually needs, each Spark-native (higher-order
functions, no Python UDFs) so the hot path stays in the JVM.

Scale notes (timings: 5M-doc corpus, local[32] — BENCH/scale5m.json):
- exact:    one hash-groupBy shuffle on md5(text) — map-side partial agg (3 s).
- minhash:  signatures are per-row map-only over a shingle-id array computed
            once per row (51 s; the original inline per-shingle fold was
            599 s); candidate pairing happens on banded signature groupBy
            (shuffle keyed on small band strings).
- simhash:  64-bit sketch as 4×16-bit band words via a vectorized Arrow
            kernel (42-53 s; the r2 16-bit interpreted-HOF sketch was 84 s
            AND collision-useless at 10^12 rows); candidates = shared band
            word + Hamming ≤ 3 verify on star edges (46 s incl. sketch).
- jaccard:  exact verify on LSH star-edge candidates (jaccard_candidates,
            56 s for 16.4M verified pairs — linear in corpus);
            jaccard_pairs keeps the blocked all-pairs baseline for recall
            studies only.
- embedding near-dup: sign-LSH bucket blocking shared with similarity.py's
            ANN index; exact cosine only on same-bucket pairs.
- group-min everywhere via groupBy+join (AQE-splittable), never a Window
            over (band, band_key) — a hot band group would sort in one task.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .relational import table

# Fixed minhash permutation parameters (k=8), small primes — portable to
# the SQL oracle verbatim.
MINHASH_A = [2, 3, 5, 7, 11, 13, 17, 19]
MINHASH_B = [1, 2, 3, 4, 5, 6, 7, 8]
MOD = 1_000_000_007

# Shared sub-expressions (SQL strings so the DuckDB oracle mirrors 1:1).
#
# Shingle ids: each 3-char shingle maps to ONE integer via base-0x110000
# positional encoding (injective over all of Unicode, max ≈ 1.4e18 < int64),
# reduced mod 1e9+7 so downstream permutations can't overflow. This replaces
# the original per-shingle rolling fold over split(s, '') — an interpreted
# HOF chain (split + transform + aggregate, 3 array allocations per shingle)
# that measured 599 s for 5M docs at 32 cores; the arithmetic form runs the
# same corpus in seconds. The codepoint array is materialized ONCE per row
# (named column) and the three lookups per shingle are plain element_at.
_BASE = 0x110000  # one above the max Unicode codepoint → injective
_CODEPOINTS = "transform(split(text, ''), c -> ascii(c))"
_SHINGLE_IDS_FROM_CS = (
    "array_distinct(transform(sequence(1, length(text) - 2), i -> "
    f"(element_at(cs, i) * {_BASE * _BASE}L + element_at(cs, i + 1) * {_BASE}L "
    "+ element_at(cs, i + 2)) % 1000000007))"
)
def _with_shingles(d: DataFrame) -> DataFrame:
    """(…, hs: array<bigint>) — distinct 3-gram shingle ids, computed once
    per row behind a named column so multi-consumer plans can't inline and
    recompute the expensive part."""
    return (
        d.withColumn("cs", F.expr(_CODEPOINTS))
        .withColumn("hs", F.expr(_SHINGLE_IDS_FROM_CS))
        .drop("cs")
    )


def exact_dedup(spark, sf_dir) -> DataFrame:
    """Exact dedup: group on content hash, keep the smallest id (stable
    survivor rule), count multiplicity."""
    return (
        table(spark, sf_dir, "documents")
        .groupBy(F.md5("text").alias("content_hash"))
        .agg(F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("n_copies"))
    )


def _minhash_sig(sh: DataFrame) -> DataFrame:
    """(doc_id, mh0..mh7) from a (doc_id, hs: array<bigint>) frame — each of
    the k permutations is a cheap arithmetic array_min over the shared
    shingle-id array, so the whole signature stays map-only."""
    cols = [
        F.expr(f"array_min(transform(hs, h -> ({a} * h + {b}) % {MOD}))").alias(
            f"mh{j}"
        )
        for j, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]
    return sh.select("doc_id", *cols)


def minhash_signatures(spark, sf_dir) -> DataFrame:
    """MinHash (k=8) over distinct character 3-gram shingle ids. Map-only:
    the shingle-id array is computed once per row (see _with_shingles),
    then each permutation is an array_min over that shared array."""
    return _minhash_sig(
        _with_shingles(
            table(spark, sf_dir, "documents").where(F.length("text") >= 3)
        )
    )


def _band_assignments(sig: DataFrame) -> DataFrame:
    """LSH banding (4 bands × 2 rows): (doc_id, band, band_key) rows.

    ONE posexplode over an array of the 4 band keys — not a 4-way union of
    projections, which would plant 4 scans of the signature plan (the
    signature expressions would run 4× per row)."""
    arr = F.array(
        *[
            F.concat_ws("_", F.col(f"mh{2 * b}"), F.col(f"mh{2 * b + 1}"))
            for b in range(4)
        ]
    )
    return sig.select(
        "doc_id", F.posexplode(arr).alias("band", "band_key")
    )


def _with_grp_min(bands: DataFrame) -> DataFrame:
    """Attach each band-assignment row its group's min doc_id.

    groupBy + equi-join instead of a Window min: the partial aggregate
    combines map-side (the min table is one row per band group regardless
    of skew), and the join back is an AQE-splittable shuffle — a Window
    over (band, band_key) would sort every row of a hot band group in ONE
    task, exactly the skew a template-heavy corpus produces."""
    mins = bands.groupBy("band", "band_key").agg(
        F.min("doc_id").alias("grp_min")
    )
    return bands.join(mins, ["band", "band_key"])


def minhash_band_candidates(spark, sf_dir) -> DataFrame:
    """LSH banding: docs sharing any band key are near-dup candidates.
    Returns per-band bucket sizes — the shuffle is keyed on tiny band
    strings, never on document text."""
    bands = _band_assignments(minhash_signatures(spark, sf_dir))
    return (
        bands.groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc"))
        .where(F.col("n_docs") > 1)
    )


def minhash_survivors(spark, sf_dir) -> DataFrame:
    """End-to-end MinHash dedup: a doc survives unless some band bucket
    contains a smaller doc_id (min-id survivor rule — the single-round
    connected-components approximation used by LSH dedup pipelines).
    Group-min over (band, band_key) (skew-safe groupBy+join, see
    _with_grp_min), then per-doc reduction."""
    bands = _band_assignments(minhash_signatures(spark, sf_dir))
    per_band = _with_grp_min(bands)
    return (
        per_band.groupBy("doc_id")
        .agg(F.min("grp_min").alias("dup_of"))
        .withColumn("survivor", F.col("dup_of") == F.col("doc_id"))
    )


# --- durable CC checkpoint state ---------------------------------------------
# CC is the most expensive query family at every scale notch (minutes at
# 5-20M rows, hours at 100 TB) and was the only multi-minute path with no
# resume story: localCheckpoint truncates lineage but dies with the driver.
# These helpers persist per-round state (labels for propagation, the edge
# set for star contraction) as parquet "rounds" plus a tiny Spark-written
# state table carrying (round, checksum). Ordering invariant: the state
# table for round k commits strictly AFTER round k's data parquet, so the
# existence of a state row implies its data committed — a crash anywhere
# leaves the newest VALID state pointing at a fully-written round, and the
# torn round directory is simply overwritten on re-run. Everything goes
# through Spark writes/reads (Hadoop FS), so the same paths work on HDFS /
# object stores, not just the local FS.


def _cc_load_latest(spark, checkpoint_dir: str, tag: str):
    """Newest committed round for ``tag``: (round, [checksum strings],
    data DataFrame) or None. Discovery reads the state tables by glob (no
    directory-listing API — works on any Hadoop FS)."""
    try:
        states = spark.read.parquet(f"{checkpoint_dir}/{tag}_state_*")
        rows = states.collect()
    except Exception:
        return None
    if not rows:
        return None
    best = max(rows, key=lambda r: r["round"])
    df = spark.read.parquet(f"{checkpoint_dir}/{tag}_round_{best['round']}")
    return int(best["round"]), list(best["checksum"]), df


def _cc_save_state(spark, checkpoint_dir: str, tag: str, rnd: int, checksum):
    """Commit the state row for round ``rnd`` (call only after the round's
    data parquet has committed). Checksums are stringified: the star
    variant's edge-hash sum is a decimal(38,0) that would overflow int64."""
    spark.createDataFrame(
        [(rnd, [str(x) for x in checksum])],
        "round int, checksum array<string>",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{checkpoint_dir}/{tag}_state_{rnd}"
    )


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    max_iters: int = 50,
    checkpoint_every: int = 5,
    telemetry: dict | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components by iterative min-label propagation: every node
    starts labeled with its own id; each round, labels flow across edges and
    each node keeps the minimum seen; stop at fixpoint. Convergence needs
    O(diameter) rounds — on LSH star-edges (doc ↔ band-group min) the
    diameter is tiny, so 2-4 rounds close even chained clusters; for
    high-diameter graphs use :func:`connected_components_star` (O(log n)
    rounds, equality pinned by test). The per-round plan here is the right
    one: one shuffle join + one min-aggregate, labels cached between
    rounds.

    Two guards for deep graphs:
    - every ``checkpoint_every`` rounds the label table is
      ``localCheckpoint``-ed (eager), truncating the logical plan — without
      this the plan tree chains one join+agg per round and Catalyst analysis
      time grows superlinearly on long chains (tested on a 12-round chain).
    - if ``max_iters`` is exhausted before the checksum fixpoint the result
      would silently contain SPLIT clusters, so this raises RuntimeError
      instead of returning non-converged labels. ``max_iters`` is a safety
      cap against pathological graphs, not a tuning knob — the default (50)
      is far above any diameter LSH star-edges produce.

    nodes: one column `doc_id`. edges: columns (a, b), directed — pass both
    directions for undirected graphs. Returns (doc_id, cluster_id).

    ``checkpoint_dir`` makes the per-round state DURABLE: every
    ``checkpoint_every`` rounds the label table is written to parquet
    (replacing that round's localCheckpoint — both truncate lineage, the
    parquet additionally survives the driver), and a re-run with the same
    directory resumes from the newest committed round instead of round 0
    (telemetry records ``resumed_from_round``). Crash anywhere: the newest
    committed state always points at a fully-written round (see
    _cc_save_state ordering).
    """
    spark = nodes.sparkSession
    start_round = 0
    labels = None
    if checkpoint_dir is not None:
        st = _cc_load_latest(spark, checkpoint_dir, "prop")
        if st is not None:
            start_round, cks, saved = st
            checksum = int(cks[0])
            labels = saved.cache()
            if telemetry is not None:
                telemetry["resumed_from_round"] = start_round
    if labels is None:
        labels = nodes.select("doc_id", F.col("doc_id").alias("cluster")).cache()
        # Convergence via checksum: every propagation step can only LOWER a
        # node's label (min of self and neighbors), so sum(cluster) strictly
        # decreases until the fixpoint. Comparing consecutive sums replaces a
        # per-round comparison join+count with one scalar aggregate that also
        # materializes the round's cache — one job per round total.
        checksum = labels.agg(F.sum("cluster")).collect()[0][0]
    converged = False
    executed = 0  # rounds actually run THIS invocation (telemetry: a
    # durable resume must execute only the remaining rounds)
    for i in range(start_round, max_iters):
        executed += 1
        msgs = edges.join(
            labels, edges["b"] == labels["doc_id"]
        ).select(F.col("a").alias("doc_id"), "cluster")
        new_labels = labels.unionAll(msgs).groupBy("doc_id").agg(
            F.min("cluster").alias("cluster")
        )
        durable_round = checkpoint_dir is not None and (i + 1) % checkpoint_every == 0
        if durable_round:
            # durable twin of localCheckpoint: parquet write + re-read both
            # materializes and truncates lineage, and survives the driver
            path = f"{checkpoint_dir}/prop_round_{i + 1}"
            new_labels.write.mode("overwrite").parquet(path)
            new_labels = spark.read.parquet(path)
        elif (i + 1) % checkpoint_every == 0:
            # materialize AND truncate lineage (replaces the cache for this
            # round): the next round's plan starts from the checkpointed
            # scan, not the i-round join chain.
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels = new_labels.cache()
        new_checksum = new_labels.agg(F.sum("cluster")).collect()[0][0]
        if durable_round:
            # data committed above, checksum known → commit the state row
            _cc_save_state(spark, checkpoint_dir, "prop", i + 1, [new_checksum])
        labels.unpersist()
        labels = new_labels
        if new_checksum == checksum:
            converged = True
            if telemetry is not None:
                telemetry.update(variant="label_propagation", rounds=i + 1)
            break
        checksum = new_checksum
    if telemetry is not None:
        telemetry["rounds_executed"] = executed
    if not converged:
        # release the last round's cached label table before raising —
        # connected_components_auto treats this raise as a ROUTINE fallback
        # trigger, and a leaked |nodes|-row cache would stay pinned in
        # executor storage for the rest of the application
        labels.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds; "
            "returning labels here would silently split clusters — raise "
            "max_iters (diameter of the dup graph exceeds the cap)"
        )
    return labels


def connected_components_auto(
    nodes: DataFrame,
    edges: DataFrame,
    switch_after: int = 10,
    max_iters: int = 50,
    telemetry: dict | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components with an automatic O(log n) fallback: min-label
    propagation (cheapest per round, O(diameter) rounds — converges in 2-4
    rounds on LSH star edges) up to ``switch_after`` rounds; if the graph's
    diameter exceeds that, rerun with the large-star/small-star contraction
    (O(log n) rounds on ANY graph) instead of grinding out hundreds of
    propagation rounds. Output equality of the two variants is pinned by
    tests on chains/random graphs/forests; ``telemetry`` (optional dict)
    records which variant finished and its round count. ``checkpoint_dir``
    enables durable per-round resume in both variants (distinct state tags,
    so a fallback never reads propagation state as star state)."""
    try:
        return connected_components(
            nodes,
            edges,
            max_iters=switch_after,
            telemetry=telemetry,
            checkpoint_dir=checkpoint_dir,
        )
    except RuntimeError:
        if telemetry is not None:
            telemetry["fallback_after"] = switch_after
        return connected_components_star(
            nodes,
            edges,
            max_iters=max_iters,
            telemetry=telemetry,
            checkpoint_dir=checkpoint_dir,
        )


def connected_components_star(
    nodes: DataFrame,
    edges: DataFrame,
    max_iters: int = 50,
    telemetry: dict | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components via alternating large-star/small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond") — the
    100 TB swap-in for :func:`connected_components`: min-label propagation
    needs O(diameter) rounds, star contraction O(log n) on ANY graph, so
    high-diameter dup graphs (long similarity chains) converge in a handful
    of rounds instead of hundreds.

    large-star: every node's neighbors LARGER than it re-attach to the
    minimum of its neighborhood (incl. itself); small-star: the ≤ neighbors
    do. Both keep components intact and monotonically pull edges toward the
    component minimum; the fixpoint is a star forest centered on component
    minima. Same per-round plan shape as the label version: one
    groupBy-min + one join, both AQE-splittable, lineage truncated every
    sub-round by localCheckpoint. Returns (doc_id, cluster) like connected_components;
    equality on arbitrary graphs is pinned by test.
    """
    # undirected closure, no self-loops
    und = (
        edges.select("a", "b")
        .unionAll(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .cache()
    )
    # Fixpoint test: edge sets are DISTINCT (a, b) sets, so equal
    # (count, sum of a 64-bit per-edge hash) across consecutive rounds is a
    # sound set-equality check up to a 2^-64-scale hash-sum collision —
    # unlike (count, sum(a+b)), where different edge sets collide easily
    # (edges are not 1:1 across star rounds). One scalar aggregate per
    # sub-round, same cost shape as before.
    # decimal(38,0) sum: int64 hash values would overflow a long sum under
    # ANSI mode; the decimal accumulator is exact and order-independent
    _edge_sum = F.sum(F.xxhash64("a", "b").cast("decimal(38,0)"))
    spark = nodes.sparkSession
    start_round = 0
    if checkpoint_dir is not None:
        st = _cc_load_latest(spark, checkpoint_dir, "star")
        if st is not None:
            from decimal import Decimal

            start_round, cks, saved = st
            checksum = (int(cks[0]), Decimal(cks[1]) if cks[1] != "None" else None)
            cur = saved
            und.unpersist()
            und = cur
            if telemetry is not None:
                telemetry["resumed_from_round"] = start_round
    if start_round == 0:
        checksum = und.agg(F.count(F.lit(1)), _edge_sum).collect()[0]
        cur = und
    converged = cur.isEmpty()
    if converged and telemetry is not None:
        telemetry.update(variant="star", rounds=start_round)
    for i in range(start_round, max_iters):
        if converged:
            break
        for large in (True, False):
            nbrs = cur.unionAll(
                cur.select(F.col("b").alias("a"), F.col("a").alias("b"))
            )
            mins = nbrs.groupBy("a").agg(F.min("b").alias("mb"))
            mins = mins.select(
                "a", F.least(F.col("a"), F.col("mb")).alias("m")
            )
            joined = nbrs.join(mins, "a")
            if large:
                out = joined.where(F.col("b") > F.col("a"))
            else:
                out = joined.where(F.col("b") <= F.col("a")).unionAll(
                    joined.select("a", F.col("a").alias("b"), "m")
                )
            nxt = (
                out.select(F.col("b").alias("a"), F.col("m").alias("b"))
                .where(F.col("a") != F.col("b"))
                .distinct()
            )
            # checkpoint EVERY sub-round: the neighborhood closure
            # references `cur` twice, so an un-truncated plan tree DOUBLES
            # per round (exponential — a cached-only variant OOMed the
            # driver on plan tree strings by round ~12). With a
            # checkpoint_dir, the small-star sub-round's edge set goes to
            # parquet instead (durable twin; one write per full round).
            durable_round = checkpoint_dir is not None and not large
            if durable_round:
                path = f"{checkpoint_dir}/star_round_{i + 1}"
                nxt.write.mode("overwrite").parquet(path)
                nxt = spark.read.parquet(path)
            else:
                nxt = nxt.localCheckpoint(eager=True)
            new_checksum = nxt.agg(F.count(F.lit(1)), _edge_sum).collect()[0]
            if durable_round:
                _cc_save_state(
                    spark, checkpoint_dir, "star", i + 1, list(new_checksum)
                )
            cur.unpersist()
            cur = nxt
            if not large:
                if tuple(new_checksum) == tuple(checksum):
                    converged = True
                    if telemetry is not None:
                        telemetry.update(variant="star", rounds=i + 1)
                checksum = new_checksum
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iters} "
            "rounds — raise max_iters"
        )
    # fixpoint is a star forest: every non-root points at its component
    # minimum; roots/singletons label themselves
    attach = cur.groupBy("a").agg(F.min("b").alias("cluster"))
    labels = (
        nodes.join(attach, nodes["doc_id"] == attach["a"], "left")
        .select(
            "doc_id",
            F.least(F.coalesce("cluster", F.col("doc_id")), F.col("doc_id")).alias(
                "cluster"
            ),
        )
    )
    und.unpersist()
    return labels


def dedup_clusters(
    spark,
    sf_dir,
    telemetry: dict | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Transitive near-dup clustering — the endgame of MinHash dedup: a doc
    sharing a band with B, where B shares a *different* band with C, must
    land in ONE cluster (single-round survivor rules miss the A~C link).
    Star edges (doc ↔ band-group min) keep the edge count linear in corpus
    size — never the quadratic clique — then connected components collapse
    chains to their global min id. ``checkpoint_dir`` (one directory per
    job) makes the CC rounds durably resumable — the hours-long path at
    100 TB restarts from the last committed round, not round 0."""
    sig = minhash_signatures(spark, sf_dir)
    bands = _band_assignments(sig)
    star = _with_grp_min(bands)
    edges = (
        star.where(F.col("doc_id") != F.col("grp_min"))
        .select(F.col("doc_id").alias("a"), F.col("grp_min").alias("b"))
        .distinct()
    )
    und = edges.unionAll(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).cache()
    # node set = same filter as the signatures, WITHOUT recomputing the
    # minhash expressions (a full signature pass just to list ids)
    nodes = (
        table(spark, sf_dir, "documents")
        .where(F.length("text") >= 3)
        .select("doc_id")
    )
    labels = connected_components_auto(
        nodes, und, telemetry=telemetry, checkpoint_dir=checkpoint_dir
    )
    und.unpersist()
    return labels.select(
        "doc_id",
        F.col("cluster").alias("cluster_id"),
        (F.col("cluster") == F.col("doc_id")).alias("survivor"),
    )


# --- 64-bit SimHash with Hamming banding -------------------------------------
#
# The r2 sketch was 16 bits matched by equality — at 10^12 rows that is pure
# collision noise (~10^7 docs per sketch value) AND it was the slowest per-row
# kernel (84 s at 5M: interpreted HOF votes). The r3 rework:
#
# - 64 genuine bits per word from two portable rolling hashes:
#     h1 = fold (acc*31 + cp) % 1_000_000_007      (the repo-wide word hash)
#     h2 = fold (acc*37 + cp) % 998_244_353
#     g  = h1 * 998_244_353 + h2   — injective in (h1, h2), < 2^60 → 60 bits
#     t  = (3*h1 + 5*h2) % 16      — 4 more independent bits
#   Integer arithmetic only, so the Arrow/numpy kernel and the DuckDB oracle
#   produce bit-identical sketches (unlike float kernels, no quantization).
# - sketch = 4×16-bit band words sh0..sh3 (bit j of band i = global bit
#   16i+j; band 3 packs g-bits 48..59 + the 4 t-bits). Keeping the bands as
#   separate non-negative 16-bit columns sidesteps cross-engine sign
#   semantics of a packed signed int64 while carrying the same 64 bits.
# - candidates = docs sharing ANY band word (classic 4×16 simhash banding —
#   guaranteed to catch every pair with Hamming distance ≤ 3), generated as
#   STAR edges against the band-group minimum (linear in corpus size, the
#   same skew-proof machinery as the minhash path), then verified with
#   hamming = Σ bit_count(sh_i ^ sh_i') ≤ 3.
#
# The sketch runs as a VECTORIZED Arrow kernel (mapInPandas): the per-word
# rolling hash folds column-at-a-time over a padded codepoint matrix, votes
# are one (n_words × 64) bit-unpack + segment-sum — no per-char or per-bit
# Python. This replaces the 84 s interpreted HOF form; the banding and
# Hamming verify stay in JVM expressions.

_P1, _B1 = 1_000_000_007, 31
_P2, _B2 = 998_244_353, 37
SIMHASH_MAX_HAMMING = 3


def _simhash64_kernel(texts) -> "np.ndarray":
    """(n_docs, 4) int64 array of 16-bit band words — vectorized numpy
    implementation of the sketch definition above. Exact integer math:
    bit-identical to the DuckDB oracle's per-word SQL folds.

    Memory-bandwidth note (measured at 5M docs, 32 concurrent workers):
    the obvious formulation — an (n_words × 64) int64 shift matrix plus an
    equal-size ±1 votes matrix — moves ~1 GB of temporaries per 10k-row
    batch and the 32 workers saturate DRAM (183 s for 5M). This version
    keeps word-level intermediates at 1–8 bytes/row:
    - rolling hashes fold over CONTIGUOUS prefix slices of length-sorted
      words (no per-column boolean fancy indexing);
    - all 64 bits are packed into one int64 bit pattern and exploded with a
      single np.unpackbits pass (uint8, 8 B/word total);
    - vote sums use 2·Σbits − n_words, so no ±1 matrix ever exists, and
      reduceat accumulates straight into an int64 doc-level array.
    Net: 42 s for the 5M sketch (was 183 s naive numpy, 84 s for the
    16-bit interpreted-HOF sketch it replaces)."""
    import numpy as np

    words: list[str] = []
    counts = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        ws = t.split(" ")
        counts[i] = len(ws)
        words.extend(ws)
    n = len(words)
    if n == 0:
        return np.zeros((len(texts), 4), dtype=np.int64)
    lens = np.fromiter((len(w) for w in words), dtype=np.int64, count=n)
    # one utf-32 decode for the whole batch
    flat = np.frombuffer("".join(words).encode("utf-32-le"), dtype=np.uint32)
    flat = flat.astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    # process words longest-first: the words still active at char position c
    # form the prefix [0:k_c) — contiguous slices instead of masked updates
    order = np.argsort(-lens, kind="stable")
    lens_s = lens[order]
    starts_s = starts[order]
    maxlen = int(lens_s[0])
    # k_c = number of words with length > c  (lens_s is descending)
    k_for = np.searchsorted(-lens_s, -(np.arange(maxlen)), side="left")
    h1 = np.zeros(n, dtype=np.int64)
    h2 = np.zeros(n, dtype=np.int64)
    for c in range(maxlen):
        k = k_for[c]
        cv = flat[starts_s[:k] + c]
        h1[:k] = (h1[:k] * _B1 + cv) % _P1
        h2[:k] = (h2[:k] * _B2 + cv) % _P2
    # unsort back to corpus word order
    inv = np.empty(n, dtype=np.int64)
    inv[order] = np.arange(n)
    h1, h2 = h1[inv], h2[inv]
    g = h1 * _P2 + h2                      # < 2^60, exact int64
    t = (3 * h1 + 5 * h2) % 16
    # all 64 bits as ONE int64 bit pattern (t<<60 may set the sign bit —
    # irrelevant, only the bit pattern is read), exploded in a single
    # C-level unpackbits pass: (n_words, 64) uint8
    full = g | (t << 60)
    bits = np.unpackbits(
        full.astype("<i8").view(np.uint8).reshape(n, 8), axis=1, bitorder="little"
    )
    ends = np.cumsum(counts)
    offs = np.concatenate(([0], ends[:-1]))
    sums = np.add.reduceat(bits, offs, axis=0, dtype=np.int64)  # Σ bits per doc
    # Σ votes = 2·Σ bits − n_words  (votes are ±1)
    sketch_bits = (2 * sums > counts[:, None]).astype(np.int64)
    weights = 1 << np.arange(16, dtype=np.int64)
    return sketch_bits.reshape(len(texts), 4, 16) @ weights


def simhash64_sketch(d: DataFrame) -> DataFrame:
    """(doc_id, sh0..sh3) — the 64-bit simhash of ``text`` as 4×16-bit band
    words, via the vectorized Arrow kernel."""
    import pandas as pd

    def fn(batches):
        for pdf in batches:
            sk = _simhash64_kernel(pdf["text"].tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sh0": sk[:, 0], "sh1": sk[:, 1],
                    "sh2": sk[:, 2], "sh3": sk[:, 3],
                }
            )

    return d.select("doc_id", "text").mapInPandas(
        fn, "doc_id long, sh0 long, sh1 long, sh2 long, sh3 long"
    )


def simhash(spark, sf_dir) -> DataFrame:
    """64-bit SimHash sketch query (driver-oracled: the DuckDB twin refolds
    the integer hashes in SQL — exact, no quantization)."""
    return simhash64_sketch(table(spark, sf_dir, "documents"))


def simhash64_candidates(
    d: DataFrame, max_hamming: int = SIMHASH_MAX_HAMMING
) -> DataFrame:
    """Near-dup candidate pairs by 4×16 simhash banding + Hamming verify.

    Shape mirrors jaccard_candidates: ONE posexplode into (band, band_key)
    rows, star edges against the skew-proof band-group minimum (groupBy +
    join, never a Window over a hot band), sketches re-attached to the
    candidate edges only, hamming ≤ max_hamming filter.

    Recall contract (same tradeoff as jaccard_candidates, stated
    precisely): pigeonhole guarantees any pair within Hamming distance 3
    lands in a shared band GROUP, and the emitted edges are each doc ↔ its
    group minimum — the linear star set that feeds connected-components
    dedup. A pair (B, C) whose shared group's minimum A is Hamming-far
    from both is NOT emitted directly (all-pairs within groups would be,
    at O(group²) cost — quadratic under template skew). For min-id
    survivor dedup this is the standard formulation; for exhaustive
    pair-level mining, verify all pairs within each band group instead and
    accept the quadratic group cost."""
    # The sketch plan is consumed 4× below (band explode, group-min
    # join-back, both sides of the pair join) — materialize the Arrow
    # kernel's output ONCE (5 longs/doc ≈ 40 B/row) instead of re-running
    # it per consumer. At 100 TB this is the sketch table a real pipeline
    # persists anyway; localCheckpoint is the single-job equivalent.
    sk = simhash64_sketch(d).localCheckpoint(eager=False)
    bands = sk.select(
        "doc_id",
        F.posexplode(F.array("sh0", "sh1", "sh2", "sh3")).alias(
            "band", "band_key"
        ),
    )
    star = _with_grp_min(bands)
    cand = (
        star.where(F.col("doc_id") != F.col("grp_min"))
        .select(F.col("grp_min").alias("doc_a"), F.col("doc_id").alias("doc_b"))
        .distinct()
    )
    a = sk.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"sh{i}").alias(f"a{i}") for i in range(4)],
    )
    b = sk.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"sh{i}").alias(f"b{i}") for i in range(4)],
    )
    hamming = sum(
        F.bit_count(F.col(f"a{i}").bitwiseXOR(F.col(f"b{i}"))) for i in range(4)
    )
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", hamming.cast("int").alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .orderBy("hamming", "doc_a", "doc_b")
    )


def simhash_candidates(spark, sf_dir) -> DataFrame:
    return simhash64_candidates(table(spark, sf_dir, "documents"))


def jaccard_candidates(spark, sf_dir) -> DataFrame:
    """Exact n-gram Jaccard verification restricted to LSH band candidates —
    the verify-after-candidates wiring a 100 TB dedup actually runs.

    Candidate pairs are the STAR edges of the banded-signature groups that
    minhash_band_candidates reports: every doc is verified against its
    band-group minimum (the same doc ↔ grp_min edges dedup_clusters feeds to
    connected components), NOT against every co-bucketed doc. All-pairs
    within a band group is quadratic in group size and template-heavy
    corpora produce mega-groups (measured: 79k pairs from 500 docs at
    sf0.001, 63% of ALL pairs); star edges are ≤ bands·n rows no matter how
    skewed the buckets get. The shingle sets are attached afterwards by two
    doc_id-keyed joins — no shuffle ever carries a shingle array for a
    non-candidate doc, and the O(block²) shape of jaccard_pairs never
    appears. Verified-pair count == candidate-edge count, pinned by test."""
    sig = minhash_signatures(spark, sf_dir)
    bands = _band_assignments(sig)
    star = _with_grp_min(bands)
    cand = (
        star.where(F.col("doc_id") != F.col("grp_min"))
        .select(F.col("grp_min").alias("doc_a"), F.col("doc_id").alias("doc_b"))
        .distinct()  # an edge sharing several bands is verified once
    )
    sh = _with_shingles(
        table(spark, sf_dir, "documents").where(F.length("text") >= 3)
    ).select("doc_id", F.col("hs").alias("shingles"))
    pairs = cand.join(
        sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")),
        "doc_a",
    ).join(
        sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")),
        "doc_b",
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return pairs.select("doc_a", "doc_b", jac.alias("jac")).orderBy(
        F.col("jac").desc(), "doc_a", "doc_b"
    )


def jaccard_pairs(spark, sf_dir) -> DataFrame:
    """Exact n-gram Jaccard verification over blocked candidate pairs.
    Blocking on (lang, source) bounds the self-join; top pairs returned
    deterministically (score, then ids; the rational score is unrounded —
    identical doubles in every engine).

    This is the exhaustive-within-block shape (useful as a recall baseline);
    the scale path is jaccard_candidates, which verifies ONLY pairs the LSH
    bands propose — at 100× corpus size a single dominant (lang, source)
    block here self-joins O(block²) pairs, while the candidate set stays
    linear in the number of true near-dups."""
    d = table(spark, sf_dir, "documents").where(F.length("text") >= 3)
    # int shingle ids (base-0x110000 positional code, injective before the
    # mod-1e9+7 reduction) make set intersection/union sizes — and thus jac
    # — match string shingles except under a mod collision (~1e-9 per
    # distinct-shingle pair, and identical across engines either way), at a
    # fraction of the compare cost
    sh = _with_shingles(d).select(
        "doc_id", "lang", "source", F.col("hs").alias("shingles")
    )
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.source") == F.col("b.source"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    jac = F.size(F.array_intersect("a.shingles", "b.shingles")) / F.size(
        F.array_union("a.shingles", "b.shingles")
    )
    return (
        pairs.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jac.alias("jac"),
        )
        .orderBy(F.col("jac").desc(), "doc_a", "doc_b")
        .limit(200)
    )


def embedding_near_dup(spark, sf_dir, n_anchors: int = 8) -> DataFrame:
    """Embedding-cosine near-dup with sign-LSH bucket blocking: every vector
    gets a map-only 8-hyperplane bucket (the SAME index ann_search probes —
    similarity._bucket_sql, anchors inlined as literals, no join/shuffle per
    vector), then exact double-precision cosine runs only on same-bucket
    pairs. Candidate count is Σ_b n_b·(n_b−1)/2 over bucket sizes instead of
    O(n²/L) block pairs — with 2^8 buckets the pair count drops ~100×
    (pinned by test) and the self-join shuffle is keyed on the bucket id.
    Vectors whose 8 signs all agree are exactly the sign-LSH near-dup
    definition; recall vs the brute-force baseline is tolerance-tested in
    tests/test_approx_scale_paths.py. Deterministic top-50.

    ``n_anchors`` sets the bucket width (2^n buckets) — the knob that must
    GROW with corpus size: expected candidate pairs ≈ n²/2^(b+1), so 8
    bits is right for ~10^4 vectors and ~16 bits for 10^6 (the 1M scale
    leg in BENCH/ann_scale.py runs 16). The driver-oracled query keeps the
    default 8 to match the DuckDB twin."""
    from .similarity import _anchor_literals, _bucket_sql

    anchors = _anchor_literals(spark, sf_dir, n_anchors)
    e = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .withColumn("bucket", F.expr(_bucket_sql(anchors)))
    )
    a, b = e.alias("a"), e.alias("b")
    dot = F.expr(
        "aggregate(zip_with(a.v, b.v, (x, y) -> x * y), cast(0.0 as double), (acc, x) -> acc + x)"
    )
    nrm = lambda side: F.sqrt(
        F.expr(
            f"aggregate(transform({side}.v, x -> x * x), cast(0.0 as double), (acc, x) -> acc + x)"
        )
    )
    cos = F.round(dot / (nrm("a") * nrm("b")), 4)
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos"),
        )
        .orderBy(F.col("cos").desc(), "vec_a", "vec_b")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Image-side near-dup: perceptual-hash Hamming banding.
#
# The input schema (BASELINE.json input_hint) carries phash:int64 — an
# 8x8 average hash of the decoded pixels (imagecodec.average_hash; the
# stage already buckets its writes on it, plans/stage.py). This is the
# image pillar of the dedup family: near-duplicate IMAGES (re-encodes,
# small crops/noise) differ in a few phash bits, exactly like near-dup
# texts differ in a few simhash bits — so the machinery is the same
# 4x16-bit banding + bit_count(xor) verify as simhash64_candidates, and
# the oracle is pure int64 bit arithmetic (DuckDB-portable, exact).
# ---------------------------------------------------------------------------

PHASH_MAX_HAMMING = 3


def phash_near_dup_candidates(
    d: DataFrame, max_hamming: int = PHASH_MAX_HAMMING, ordered: bool = True
) -> DataFrame:
    """Near-duplicate image candidate pairs from (image_id, phash) rows.

    4 bands x 16 bits: ``(phash >> 16b) & 0xFFFF`` — after the mask,
    arithmetic vs logical shift semantics are indistinguishable, so the
    expression is engine-portable even for negative hashes. Pigeonhole:
    any pair within Hamming distance 3 shares at least one band word →
    lands in a shared band group. Star edges against the band-group
    minimum image_id (groupBy+join — skew-proof for template/logo
    clusters that concentrate one phash), then exact
    ``bit_count(xor)`` verify on the candidate edges only. Same recall
    contract as simhash64_candidates: each doc pairs with its group min,
    the linear edge set connected-components dedup consumes — not
    all-pairs within a group (quadratic under skew).

    The input plan is consumed 3x (band explode + both sides of the
    verify join); callers passing an EXPENSIVE plan (e.g. a decode
    pipeline) get it materialized once via localCheckpoint — phash rows
    are 8 B + id, the sketch table a real pipeline persists anyway.

    ``ordered=False`` skips the output sort (a range-partition shuffle):
    the clustering consumers feed these edges straight into connected
    components, where edge order is irrelevant — only the oracled
    report query pays for a deterministic presentation order."""
    ph = d.select(
        F.col("image_id").alias("doc_id"), "phash"
    ).localCheckpoint(eager=False)
    bands = ph.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.expr(f"shiftright(phash, {16 * b}) & 65535")
                    for b in range(4)
                ]
            )
        ).alias("band", "band_key"),
    )
    star = _with_grp_min(bands)
    cand = (
        star.where(F.col("doc_id") != F.col("grp_min"))
        .select(F.col("grp_min").alias("id_a"), F.col("doc_id").alias("id_b"))
        .distinct()
    )
    a = ph.select(F.col("doc_id").alias("id_a"), F.col("phash").alias("ph_a"))
    b = ph.select(F.col("doc_id").alias("id_b"), F.col("phash").alias("ph_b"))
    out = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
            .cast("int")
            .alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )
    return out.orderBy("hamming", "id_a", "id_b") if ordered else out


def phash_variant_bits(i: int) -> int:
    """XOR mask for the planted near-dup variant of synth row i: flips
    bit (i % 62) and bit ((i * 31) % 62) — ≤ 2-bit perturbations (0 when
    the two coincide, i ≡ 0 mod 31: an exact-dup twin; both cases stay
    within the Hamming-3 verify). Bits ≥ 62 never used: 1<<63 overflows
    differently across engines. Mirrored literally in the SQL oracle."""
    return (1 << (i % 62)) ^ (1 << ((i * 31) % 62))


def phash_corpus(spark, n: int = 300) -> DataFrame:
    """(image_id, phash) over n synth rows PLUS planted near-dup twins:
    every 7th row (i % 7 == 3) contributes an ``<id>_v`` variant whose
    phash differs by phash_variant_bits(i). The synth table itself plants
    exact-dup clusters (pixels_for: i % 11 == 0 share pixels → identical
    phash); the twins add genuine 1-2-bit neighbors so the Hamming verify
    is exercised at every distance it accepts."""
    from ..sources.synth import synth_spark

    base = synth_spark(spark, n).select("image_id", "phash")
    i = "cast(substring(image_id, 5) as bigint)"
    pert = base.where(F.expr(f"{i} % 7 = 3")).select(
        F.concat("image_id", F.lit("_v")).alias("image_id"),
        F.expr(
            f"phash ^ shiftleft(cast(1 as bigint), cast({i} % 62 as int)) "
            f"^ shiftleft(cast(1 as bigint), cast(({i} * 31) % 62 as int))"
        ).alias("phash"),
    )
    return base.unionByName(pert)


def phash_candidates(spark, sf_dir) -> DataFrame:
    """Driver-oracled image near-dup query: the DuckDB twin recomputes
    every phash driver-side with the pure-Python reference
    (imagecodec.average_hash over pixels_for) + the same variant masks,
    inlines them as VALUES, and re-derives banding + star edges +
    Hamming verify relationally. What it pins: the distributed synth →
    phash pipeline is bit-identical to the reference, AND the banding
    logic matches an independent SQL implementation."""
    return phash_near_dup_candidates(phash_corpus(spark, 300))


def phash_cluster_labels(
    d: DataFrame,
    max_hamming: int = PHASH_MAX_HAMMING,
    telemetry: dict | None = None,
) -> DataFrame:
    """Transitive image near-dup clustering — the endgame of phash dedup,
    mirroring dedup_clusters on the text side: a re-encode A within
    Hamming 3 of B, where B is within 3 of a further re-encode C, must
    land in ONE cluster even when A and C are 6 bits apart. Edges are the
    VERIFIED candidate pairs (banded star edges + bit_count(xor) ≤ k —
    never unverified band collisions, which would merge unrelated images
    through a shared 16-bit word), then connected components collapse
    chains to their minimum member.

    Input needs (nid:long, image_id, phash): CC runs on the NUMERIC id —
    its convergence checksum is a provably-monotone integer sum, and at
    10¹² rows numeric shuffle keys beat string keys anyway. Callers
    derive nid from their id scheme (the registered query parses the
    synth id; a production pipeline ships a surrogate key).
    Returns (image_id, cluster_id, survivor) with cluster_id the minimum
    member's image_id string."""
    ph = d.select(
        F.col("nid").alias("doc_id"), F.col("image_id"), "phash"
    ).localCheckpoint(eager=False)
    cand = phash_near_dup_candidates(
        ph.select(F.col("doc_id").alias("image_id"), "phash"),
        max_hamming,
        ordered=False,
    )
    # candidate ids are the numeric ids here (passed through the image_id
    # column of the candidate contract)
    edges = cand.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    und = edges.unionAll(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).cache()
    labels = connected_components_auto(
        ph.select("doc_id"), und, telemetry=telemetry
    )
    und.unpersist()
    ids = ph.select("doc_id", "image_id")
    cl_ids = ph.select(
        F.col("doc_id").alias("cluster"), F.col("image_id").alias("cluster_id")
    )
    return (
        labels.join(ids, "doc_id")
        .join(cl_ids, "cluster")
        .select(
            "image_id",
            "cluster_id",
            (F.col("cluster") == F.col("doc_id")).alias("survivor"),
        )
    )


def phash_clusters(spark, sf_dir) -> DataFrame:
    """Driver-oracled image clustering query over the planted synth corpus
    (exact-dup pixel clusters + 0-2-bit variants). The DuckDB twin
    re-derives banding, star edges, the Hamming verify, AND the
    transitive closure (recursive CTE) over driver-side reference
    phashes. nid doubles the base index and marks variants odd — the
    same expression inlined in the SQL twin."""
    d = phash_corpus(spark, 300).withColumn(
        "nid",
        F.expr("cast(substring(image_id, 5, 8) as bigint)") * 2
        + F.when(F.col("image_id").endswith("_v"), F.lit(1)).otherwise(F.lit(0)),
    )
    return phash_cluster_labels(d)


# ---------------------------------------------------------------------------
# Cross-modal near-dup clustering: image (phash) ∪ caption (minhash-LSH)
# edges feeding ONE connected-components pass — "duplicate if EITHER
# modality matches", the dedup rule an image+caption training corpus
# (LAION-style) actually applies. A re-encoded image with a fresh caption
# and a re-captioned copy of the same photo both collapse into the
# original's cluster, including chains that alternate modalities
# (A ~image~ B ~text~ C ⇒ one cluster even though A and C share nothing).
# ---------------------------------------------------------------------------

CROSSMODAL_JACCARD_TAU = 0.8


def caption_lsh_edges(
    rows: DataFrame, tau: float = CROSSMODAL_JACCARD_TAU
) -> DataFrame:
    """Verified caption near-dup edges (a, b) from (nid, caption) rows.

    The text half of the cross-modal graph, every stage the scale path:
    3-gram shingle ids (map-only arithmetic) → MinHash k=8 → 4×2 band star
    edges against the band-group min nid (groupBy+join, skew-proof for
    template captions) → exact Jaccard ≥ tau computed ONLY on candidate
    edges. Captions shorter than one shingle (< 3 chars, incl. empty) take
    no part — a bare re-encode with no caption can still cluster through
    the image side. The shingle table is localCheckpointed once for its
    three plan consumers (signature + both verify joins)."""
    sh = (
        _with_shingles(
            rows.where(F.length("caption") >= 3).select(
                F.col("nid").alias("doc_id"), F.col("caption").alias("text")
            )
        )
        .select("doc_id", "hs")
        .localCheckpoint(eager=False)
    )
    star = _with_grp_min(_band_assignments(_minhash_sig(sh)))
    cand = (
        star.where(F.col("doc_id") != F.col("grp_min"))
        .select(F.col("grp_min").alias("a"), F.col("doc_id").alias("b"))
        .distinct()
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        cand.join(
            sh.select(F.col("doc_id").alias("a"), F.col("hs").alias("sh_a")), "a"
        )
        .join(
            sh.select(F.col("doc_id").alias("b"), F.col("hs").alias("sh_b")), "b"
        )
        .where(jac >= tau)
        .select("a", "b")
    )


def crossmodal_cluster_labels(
    d: DataFrame,
    tau: float = CROSSMODAL_JACCARD_TAU,
    max_hamming: int = PHASH_MAX_HAMMING,
    telemetry: dict | None = None,
) -> DataFrame:
    """Transitive clusters over the UNION of image and caption edges.

    Input: (nid:long, image_id, caption, phash). Image edges are the
    banded-phash star edges verified at Hamming ≤ max_hamming
    (phash_near_dup_candidates); caption edges are LSH star edges verified
    at Jaccard ≥ tau (caption_lsh_edges). Both edge families are linear in
    corpus size under skew (star edges vs the band-group min, never
    within-group all-pairs), and both verify BEFORE the union — an
    unverified band collision in either modality would fuse unrelated
    clusters through one bad edge, which transitivity then amplifies.
    Connected components run once on the merged graph over numeric nids.
    Returns (image_id, cluster_id, survivor), cluster_id = the minimum
    member's image_id."""
    rows = d.select("nid", "image_id", "caption", "phash").localCheckpoint(
        eager=False
    )
    icand = phash_near_dup_candidates(
        rows.select(F.col("nid").alias("image_id"), "phash"),
        max_hamming,
        ordered=False,
    )
    ie = icand.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    te = caption_lsh_edges(rows.select("nid", "caption"), tau)
    edges = ie.unionByName(te).distinct()
    und = edges.unionAll(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).cache()
    labels = connected_components_auto(
        rows.select(F.col("nid").alias("doc_id")), und, telemetry=telemetry
    )
    und.unpersist()
    ids = rows.select(F.col("nid").alias("doc_id"), "image_id")
    cl = rows.select(
        F.col("nid").alias("cluster"), F.col("image_id").alias("cluster_id")
    )
    return (
        labels.join(ids, "doc_id")
        .join(cl, "cluster")
        .select(
            "image_id",
            "cluster_id",
            (F.col("cluster") == F.col("doc_id")).alias("survivor"),
        )
    )


def crossmodal_corpus(spark, n: int = 300) -> DataFrame:
    """(image_id, nid, caption, phash) over n synth rows PLUS the planted
    phash variants of phash_corpus. Base rows keep their synth captions —
    the degenerate fraction plants exact text dups ("tiny", "spam …"), and
    the i %% 11 pixel cluster plants exact image dups, so rows that sit in
    both (e.g. a pixel-cluster member with a degenerate caption) bridge the
    two modalities transitively. Variants carry an EMPTY caption (the
    realistic shape: a re-encode arrives uncaptioned) so they can only
    cluster through the image side. nid = 2i, variants 2i+1 — mirrored
    literally in the SQL twin."""
    from ..sources.synth import synth_spark

    base = synth_spark(spark, n).select("image_id", "caption", "phash")
    i = "cast(substring(image_id, 5) as bigint)"
    base = base.withColumn("nid", F.expr(f"{i} * 2"))
    pert = base.where(F.expr(f"({i}) % 7 = 3")).select(
        F.concat("image_id", F.lit("_v")).alias("image_id"),
        F.lit("").alias("caption"),
        F.expr(
            f"phash ^ shiftleft(cast(1 as bigint), cast({i} % 62 as int)) "
            f"^ shiftleft(cast(1 as bigint), cast(({i} * 31) % 62 as int))"
        ).alias("phash"),
        F.expr(f"{i} * 2 + 1").alias("nid"),
    )
    return base.unionByName(pert)


def crossmodal_clusters(spark, sf_dir) -> DataFrame:
    """Driver-oracled cross-modal clustering query over the planted synth
    corpus. The DuckDB twin recomputes every phash AND every caption
    driver-side (pure-Python average_hash / caption_for — no Spark), then
    re-derives BOTH edge families (phash banding + Hamming verify; caption
    shingles + minhash + banding + Jaccard verify) and the transitive
    closure as a recursive CTE."""
    return crossmodal_cluster_labels(crossmodal_corpus(spark, 300))
