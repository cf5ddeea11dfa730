"""Cross-modal (image phash ∪ caption LSH) near-dup clustering.

The contract only the UNION graph can give: rows may be linked through
EITHER modality, and chains that alternate modalities (A ~image~ B ~text~ C)
must collapse to one cluster even though the endpoints share nothing.
"""

import pyspark.sql.functions as F

from pii_detection_service_spark.operators import dedup
from pii_detection_service_spark.sources.synth import caption_for

SF = "/root/testdata/sf0.001"


def _ham(x: int, y: int) -> int:
    return bin((x ^ y) & 0xFFFFFFFFFFFFFFFF).count("1")


def test_crossmodal_bridge_chain(spark):
    """A-B share only pixels (identical phash, unrelated captions); B-C
    share only text (identical caption, unrelated phash); A and C share
    NOTHING — yet transitivity over the union graph puts all three in one
    cluster, while unrelated D stays its own survivor."""
    a_ph = 0x0123456789ABCDEF
    b_ph = a_ph  # image edge A-B at Hamming 0
    c_ph = 0x7EDCBA9876543210
    d_ph = 0x5A5A5A5A5A5A5A5A
    # no accidental image edges: every non-planted pair is far in Hamming
    for x, y in [(a_ph, c_ph), (a_ph, d_ph), (c_ph, d_ph)]:
        assert _ham(x, y) > dedup.PHASH_MAX_HAMMING
    cap_b = "totally different words describing an orange cat sleeping"
    rows = [
        (0, "imgA", "a unique caption about mountains and rivers flowing", a_ph),
        (1, "imgB", cap_b, b_ph),
        (2, "imgC", cap_b, c_ph),  # text edge B-C at Jaccard 1.0
        (3, "imgD", "nothing here resembles any other caption at all", d_ph),
    ]
    df = spark.createDataFrame(
        rows, "nid long, image_id string, caption string, phash long"
    )
    got = {
        r["image_id"]: (r["cluster_id"], r["survivor"])
        for r in dedup.crossmodal_cluster_labels(df).collect()
    }
    assert got == {
        "imgA": ("imgA", True),
        "imgB": ("imgA", False),
        "imgC": ("imgA", False),
        "imgD": ("imgD", True),
    }


def test_crossmodal_short_captions_cluster_via_image_only(spark):
    """Rows whose captions are shorter than one shingle (incl. empty — the
    uncaptioned-re-encode shape) never enter the text graph but still
    cluster through the image side; two of them with unrelated phashes do
    NOT merge just because both captions are degenerate."""
    base = 0x0FEDCBA987654321
    rows = [
        (0, "imgA", "a real caption long enough to shingle", base),
        (1, "imgA_v", "", base ^ (1 << 7)),  # 1 bit from A, no caption
        (2, "imgX", "x", 0x2A2A2A2A2A2A2A2A),  # short caption, far phash
        (3, "imgY", "", 0x5050505050505050),
    ]
    assert _ham(rows[2][3], rows[3][3]) > dedup.PHASH_MAX_HAMMING
    df = spark.createDataFrame(
        rows, "nid long, image_id string, caption string, phash long"
    )
    got = {
        r["image_id"]: r["cluster_id"]
        for r in dedup.crossmodal_cluster_labels(df).collect()
    }
    assert got == {
        "imgA": "imgA",
        "imgA_v": "imgA",
        "imgX": "imgX",
        "imgY": "imgY",
    }


def test_crossmodal_corpus_contract(spark):
    """Registered query over the planted synth corpus: every exact-pixel
    dup row joins img_00000000's cluster, every exact-caption dup pair
    shares a cluster (identical text ⇒ identical signature ⇒ shared band
    group ⇒ verified at Jaccard 1.0 — edge guaranteed, not probabilistic),
    the flagship cluster strictly outgrows its image-only twin (the text
    bridges are doing real work), and survivor flags mark exactly the
    minimum member of each cluster."""
    out = dedup.crossmodal_clusters(spark, SF).collect()
    lab = {r["image_id"]: r["cluster_id"] for r in out}
    assert len(lab) == 300 + len(range(3, 300, 7))

    # image pillar: the i % 11 == 0 exact-dup pixel cluster
    for i in range(0, 300, 11):
        assert lab[f"img_{i:08d}"] == lab["img_00000000"]

    # text pillar: exact-caption dups always merge
    caps: dict[str, str] = {}
    n_text_pairs = 0
    for i in range(300):
        c = caption_for(i)
        if c in caps:
            assert lab[f"img_{i:08d}"] == lab[caps[c]], c
            n_text_pairs += 1
        else:
            caps[c] = f"img_{i:08d}"
    assert n_text_pairs > 0, "corpus must plant exact caption dups"

    # union does real work: the flagship crossmodal cluster is strictly
    # larger than the image-only cluster of the same seed row
    ph_lab = {
        r["image_id"]: r["cluster_id"]
        for r in dedup.phash_clusters(spark, SF).collect()
    }
    xm_size = sum(1 for v in lab.values() if v == lab["img_00000000"])
    ph_size = sum(1 for v in ph_lab.values() if v == ph_lab["img_00000000"])
    assert xm_size > ph_size

    # one survivor per cluster, and it is the min member
    surv = {r["image_id"] for r in out if r["survivor"]}
    by_cluster: dict[str, list[str]] = {}
    for k, v in lab.items():
        by_cluster.setdefault(v, []).append(k)
    assert surv == {min(members) for members in by_cluster.values()}
