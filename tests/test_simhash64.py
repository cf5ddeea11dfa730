"""64-bit SimHash family: kernel parity, banding guarantees, planted
near-dup recall, and the scale-shape guards (star edges, not all-pairs)."""

import random

import numpy as np
import pyspark.sql.functions as F

from pii_detection_service_spark.operators import dedup

SF = "/root/testdata/sf0.001"


def _ref_sketch(t: str) -> list[int]:
    """Independent pure-Python re-derivation of the sketch definition."""
    sums = [0] * 64
    for w in t.split(" "):
        h1 = h2 = 0
        for ch in w:
            h1 = (h1 * 31 + ord(ch)) % 1_000_000_007
            h2 = (h2 * 37 + ord(ch)) % 998_244_353
        g = h1 * 998_244_353 + h2
        tt = (3 * h1 + 5 * h2) % 16
        for b in range(60):
            sums[b] += 1 if (g >> b) & 1 else -1
        for b in range(4):
            sums[60 + b] += 1 if (tt >> b) & 1 else -1
    bits = [1 if s > 0 else 0 for s in sums]
    return [sum(bits[16 * i + j] << j for j in range(16)) for i in range(4)]


def _hamming(a, b) -> int:
    return sum(bin(x ^ y).count("1") for x, y in zip(a, b))


def test_kernel_matches_pure_python_reference():
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(200)]
    texts = [
        " ".join(rng.choices(vocab, k=rng.randint(1, 40))) for _ in range(50)
    ]
    texts += ["", " ", "a  b", "héllo wörld", "x"]
    sk = dedup._simhash64_kernel(texts)
    for i, t in enumerate(texts):
        assert list(sk[i]) == _ref_sketch(t), t


def test_word_order_invariance_and_exact_dup_miss():
    """Shuffled word order → identical sketch (hamming 0): simhash catches
    reordered duplicates that content-hash exact dedup cannot (different
    md5), which is exactly the near-dup class the sketch is for."""
    rng = random.Random(7)
    words = [f"tok{i}" for i in range(30)]
    a = " ".join(words)
    shuffled = words[:]
    rng.shuffle(shuffled)
    b = " ".join(shuffled)
    assert a != b
    sk = dedup._simhash64_kernel([a, b])
    assert list(sk[0]) == list(sk[1])


def test_banding_pigeonhole_on_hamming_3():
    """Any pair within Hamming distance 3 differs in at most 3 of the 4
    16-bit bands, so it MUST share at least one band word — the guarantee
    the candidate generator relies on. Fuzzed over random sketches with ≤3
    planted bit flips."""
    rng = random.Random(13)
    for _ in range(200):
        base = [rng.randrange(1 << 16) for _ in range(4)]
        other = base[:]
        for _ in range(rng.randint(0, 3)):
            i = rng.randrange(4)
            other[i] ^= 1 << rng.randrange(16)
        if _hamming(base, other) <= 3:
            assert any(x == y for x, y in zip(base, other))


def test_planted_near_dup_recall(spark):
    """20 isolated near-dup pairs (disjoint vocab per pair; one word of ~200
    swapped → expected Hamming ≈ 64·θ/π ≈ 2) planted among unrelated noise
    docs: candidates must recover most planted pairs and pair up no noise."""
    rng = random.Random(99)
    rows = []
    doc_id = 0
    planted = []
    for p in range(20):
        vocab = [f"p{p}w{i}" for i in range(300)]
        words = rng.choices(vocab, k=200)
        edited = words[:]
        edited[rng.randrange(200)] = f"p{p}sub"
        rows.append((doc_id, " ".join(words)))
        rows.append((doc_id + 1, " ".join(edited)))
        planted.append((doc_id, doc_id + 1))
        doc_id += 2
    for q in range(40):  # unrelated noise, disjoint vocab per doc
        vocab = [f"n{q}x{i}" for i in range(300)]
        rows.append((doc_id, " ".join(rng.choices(vocab, k=200))))
        doc_id += 1
    d = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.simhash64_candidates(d).collect()
    }
    found = sum(1 for p in planted if p in pairs or p[::-1] in pairs)
    assert found >= 12, f"recall {found}/20"
    noise_pairs = [
        p for p in pairs if p not in planted and p[::-1] not in planted
    ]
    assert not noise_pairs, noise_pairs


def test_candidates_are_star_edges_with_verified_hamming(spark):
    """Candidate pairs == the band-group star edges that pass the Hamming
    filter (independent brute-force recompute from the sketches), pinning
    both the linear edge shape and the verify predicate."""
    # orderBy before limit: an unordered limit may pick different rows per
    # job, and this test runs TWO jobs over `d` (sketch + candidates)
    d = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(300)
    )
    sk = {r["doc_id"]: (r["sh0"], r["sh1"], r["sh2"], r["sh3"])
          for r in dedup.simhash64_sketch(d).collect()}
    groups: dict[tuple, list] = {}
    for did, bands in sk.items():
        for i, key in enumerate(bands):
            groups.setdefault((i, key), []).append(did)
    expect = set()
    for members in groups.values():
        m = min(members)
        for did in members:
            if did != m and _hamming(sk[m], sk[did]) <= 3:
                expect.add((m, did))
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dedup.simhash64_candidates(d).collect()
    }
    assert {(a, b) for a, b, _ in got} == expect
    for a, b, h in got:
        assert h == _hamming(sk[a], sk[b])


def test_sketch_forced_aggregation_matches_numpy(spark):
    """Distributed sketch sums over sf0.001 == single-process kernel sums
    (catches partition-boundary bugs in the batch kernel)."""
    d = spark.read.parquet(f"{SF}/documents.parquet")
    agg = dedup.simhash64_sketch(d).agg(
        *[F.sum(f"sh{i}").alias(f"s{i}") for i in range(4)]
    ).collect()[0]
    texts = [r["text"] for r in d.select("doc_id", "text")
             .orderBy("doc_id").collect()]
    sk = dedup._simhash64_kernel(texts)
    ref = sk.sum(axis=0)
    assert [agg[f"s{i}"] for i in range(4)] == [int(x) for x in ref]
