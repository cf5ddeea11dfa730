"""Deduplication family for the training-data pipeline — the operators a
100 TB caption corpus actually needs, each Spark-native (higher-order
functions, no Python UDFs) so the hot path stays in the JVM.

Scale notes (timings: 5M-doc corpus, local[32] — BENCH/scale5m.json):
- exact:    one hash-groupBy shuffle on md5(text) — map-side partial agg (3 s).
- minhash:  signatures are per-row map-only over a shingle-id array computed
            once per row (51 s; the original inline per-shingle fold was
            599 s); candidate pairing happens on banded signature groupBy
            (shuffle keyed on small band strings).
- simhash:  per-row map-only 16-bit sketch; near-dups = equal sketch (84 s).
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
_HASH_ONE = "aggregate(transform(split({s}, ''), c -> ascii(c)), 0L, (acc, x) -> (acc * 31 + x) % 1000000007)"
_WORD_HASHES = "transform(split(text, ' '), w -> " + _HASH_ONE.format(s="w") + ")"


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


def minhash_signatures(spark, sf_dir) -> DataFrame:
    """MinHash (k=8) over distinct character 3-gram shingle ids. Map-only:
    the shingle-id array is computed once per row (see _with_shingles),
    then each of the k permutations is a cheap arithmetic array_min over
    that shared array."""
    d = _with_shingles(
        table(spark, sf_dir, "documents").where(F.length("text") >= 3)
    )
    cols = [
        F.expr(f"array_min(transform(hs, h -> ({a} * h + {b}) % {MOD}))").alias(
            f"mh{j}"
        )
        for j, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]
    return d.select("doc_id", *cols)


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


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    max_iters: int = 50,
    checkpoint_every: int = 5,
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
    """
    labels = nodes.select("doc_id", F.col("doc_id").alias("cluster")).cache()
    # Convergence via checksum: every propagation step can only LOWER a
    # node's label (min of self and neighbors), so sum(cluster) strictly
    # decreases until the fixpoint. Comparing consecutive sums replaces a
    # per-round comparison join+count with one scalar aggregate that also
    # materializes the round's cache — one job per round total.
    checksum = labels.agg(F.sum("cluster")).collect()[0][0]
    converged = False
    for i in range(max_iters):
        msgs = edges.join(
            labels, edges["b"] == labels["doc_id"]
        ).select(F.col("a").alias("doc_id"), "cluster")
        new_labels = labels.unionAll(msgs).groupBy("doc_id").agg(
            F.min("cluster").alias("cluster")
        )
        if (i + 1) % checkpoint_every == 0:
            # materialize AND truncate lineage (replaces the cache for this
            # round): the next round's plan starts from the checkpointed
            # scan, not the i-round join chain.
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels = new_labels.cache()
        new_checksum = new_labels.agg(F.sum("cluster")).collect()[0][0]
        labels.unpersist()
        labels = new_labels
        if new_checksum == checksum:
            converged = True
            break
        checksum = new_checksum
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds; "
            "returning labels here would silently split clusters — raise "
            "max_iters (diameter of the dup graph exceeds the cap)"
        )
    return labels


def connected_components_star(
    nodes: DataFrame, edges: DataFrame, max_iters: int = 50
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
    checksum = und.agg(F.count(F.lit(1)), _edge_sum).collect()[0]
    cur = und
    converged = cur.isEmpty()
    for i in range(max_iters):
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
            # driver on plan tree strings by round ~12)
            nxt = nxt.localCheckpoint(eager=True)
            new_checksum = nxt.agg(F.count(F.lit(1)), _edge_sum).collect()[0]
            cur.unpersist()
            cur = nxt
            if not large:
                if tuple(new_checksum) == tuple(checksum):
                    converged = True
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


def dedup_clusters(spark, sf_dir) -> DataFrame:
    """Transitive near-dup clustering — the endgame of MinHash dedup: a doc
    sharing a band with B, where B shares a *different* band with C, must
    land in ONE cluster (single-round survivor rules miss the A~C link).
    Star edges (doc ↔ band-group min) keep the edge count linear in corpus
    size — never the quadratic clique — then connected components collapse
    chains to their global min id."""
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
    labels = connected_components(nodes, und)
    und.unpersist()
    return labels.select(
        "doc_id",
        F.col("cluster").alias("cluster_id"),
        (F.col("cluster") == F.col("doc_id")).alias("survivor"),
    )


def simhash(spark, sf_dir) -> DataFrame:
    """16-bit SimHash over word hashes: bit b set iff the sum of ±1 votes
    from each word's bit b is positive. Near-dups share the sketch.

    Formulation note (measured at 5M docs, 32 cores): this per-bit outer
    fold looks like it re-derives the word hashes 16×, but Spark's
    subexpression elimination evaluates the _WORD_HASHES argument once per
    row — 84 s total, dominated by the per-word rolling hash itself. Two
    "optimized" rewrites were measured SLOWER and rejected: a zip_with
    16-vote-vector fold (330 s — per-element array allocation dominates
    interpreted HOF cost) and a packed-bitfield arithmetic accumulator
    (282 s — one 5-element array allocation per word still loses to the
    engine's own dedup). Keep the transparent form."""
    d = table(spark, sf_dir, "documents")
    sim = F.expr(
        "aggregate(sequence(0, 15), 0L, (acc, b) -> acc + "
        f"case when aggregate({_WORD_HASHES}, 0L, "
        "(a, h) -> a + case when (h div shiftleft(1L, b)) % 2 = 1 then 1 else -1 end"
        ") > 0 then shiftleft(1L, b) else 0L end)"
    )
    return d.select("doc_id", sim.alias("simhash16"))


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


def embedding_near_dup(spark, sf_dir) -> DataFrame:
    """Embedding-cosine near-dup with sign-LSH bucket blocking: every vector
    gets a map-only 8-hyperplane bucket (the SAME index ann_search probes —
    similarity._bucket_sql, anchors inlined as literals, no join/shuffle per
    vector), then exact double-precision cosine runs only on same-bucket
    pairs. Candidate count is Σ_b n_b·(n_b−1)/2 over bucket sizes instead of
    O(n²/L) block pairs — with 2^8 buckets the pair count drops ~100×
    (pinned by test) and the self-join shuffle is keyed on the bucket id.
    Vectors whose 8 signs all agree are exactly the sign-LSH near-dup
    definition; recall vs the brute-force baseline is tolerance-tested in
    tests/test_approx_scale_paths.py. Deterministic top-50."""
    from .similarity import _anchor_literals, _bucket_sql

    anchors = _anchor_literals(spark, sf_dir, 8)
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
