"""End-to-end tests for the flagship stage: golden parity between the
distributed pipeline and the pure-Python reference semantics, plus the
north-rule invariants (resume, pixel/caption preservation, bucketing)."""

import os

import numpy as np
import pyspark.sql.functions as F
import pytest

from pii_detection_service_spark.functions import quality, tagger
from pii_detection_service_spark.plans import stage
from pii_detection_service_spark.sources import imagecodec, synth

N = 300


@pytest.fixture(scope="module")
def src(spark):
    return stage.read_synth_or_generate(spark, N).cache()


def test_scored_matches_pure_python_golden(spark, src):
    """F1 target anchor: the Spark pipeline's keep/drop + scrubbed caption
    must agree with the shared pure-Python semantics on every row (exact
    agreement ⇒ F1 = 1.0 ≥ 0.99)."""
    scored = stage.score(src).select(
        "image_id", "caption", "lang", "keep", "drop_reason",
        "scrubbed_caption", "n_pii", "n_toxic",
    )
    rows = {r["image_id"]: r for r in scored.collect()}
    assert len(rows) == N
    mismatches = 0
    for i in range(N):
        image_id = f"img_{i:08d}"
        cap = synth.caption_for(i)
        lang = quality.langid_char_ngram(cap)
        keep, reason = quality.keep_decision(cap, lang, quality.perplexity(cap))
        _, _, scrubbed, n_pii, n_toxic = tagger.tag_and_scrub(cap)
        r = rows[image_id]
        if (
            r["keep"] != keep
            or r["drop_reason"] != reason
            or r["scrubbed_caption"] != scrubbed
            or r["n_pii"] != n_pii
            or r["n_toxic"] != n_toxic
            or r["lang"] != lang
        ):
            mismatches += 1
    assert mismatches == 0


def test_caption_byte_equality_for_kept_clean_rows(spark, src):
    scored = stage.score(src)
    kept_clean = scored.where(
        F.col("keep") & (F.col("n_pii") == 0) & (F.col("n_toxic") == 0)
    )
    bad = kept_clean.where(F.col("scrubbed_caption") != F.col("caption")).count()
    assert bad == 0
    assert kept_clean.count() > 0
    # toxic rows exist and are masked, not dropped
    toxic = scored.where(F.col("n_toxic") > 0)
    assert toxic.count() > 0
    assert toxic.where(F.col("scrubbed_caption").contains("[TOXIC]")).count() == toxic.count()


def test_pixel_preservation_invariant(spark, src):
    """input_hint invariant: decoded pixels allclose / PSNR≥40dB vs source."""
    sample = src.limit(30).select("image_id", "bytes", "fmt").collect()
    for r in sample:
        i = int(r["image_id"].split("_")[1])
        px = synth.pixels_for(i)
        dec = imagecodec.decode(bytes(r["bytes"]), r["fmt"])
        if r["fmt"] == "png":
            assert np.array_equal(px, dec)
        else:
            assert imagecodec.psnr(px, dec) >= 40.0


def test_run_stage_and_resume(spark, src, tmp_path):
    out = str(tmp_path / "stage_out")
    m1 = stage.run_stage(spark, src, out, n_buckets=8, salt_factor=2)
    assert m1["rows"] == N
    assert 0 < m1["kept"] < N
    assert m1["pii_rows"] > 0

    # output is partitioned by bucket on disk (explicit phash-derived layout)
    buckets = sorted(
        d for d in os.listdir(os.path.join(out, "data")) if d.startswith("bucket=")
    )
    assert len(buckets) == 8

    # lineage has one done row per bucket
    lineage = spark.read.parquet(os.path.join(out, "lineage"))
    assert lineage.where("status = 'done'").select("bucket").distinct().count() == 8
    assert lineage.count() == 8

    # metrics table: per-(lang, keep, drop_reason) counts sum to all rows
    metrics = spark.read.parquet(os.path.join(out, "metrics"))
    assert {"lang", "keep", "drop_reason", "count"} <= set(metrics.columns)
    assert metrics.agg(F.sum("count")).head()[0] == N

    # resume: everything complete → no recompute, no duplicate rows/lineage
    m2 = stage.run_stage(spark, src, out, n_buckets=8, salt_factor=2)
    assert m2["resumed_noop"]
    data = spark.read.parquet(os.path.join(out, "data"))
    assert data.count() == N
    assert spark.read.parquet(os.path.join(out, "lineage")).count() == 8


def test_null_tolerant_source_and_null_safe_buckets(spark, tmp_path):
    """input_hint sources may carry nulls (caption/fmt/phash). The stage
    must process every row, and NULL phash must NOT produce a NULL bucket:
    the hive default partition breaks the resume NOT-IN filter (NULL
    predicate → row silently dropped from resumed runs)."""
    from pii_detection_service_spark.sources import synth

    df = synth.synth_spark(spark, 50)
    df = df.withColumn(
        "caption", F.when(F.col("phash") % 5 == 0, None).otherwise(F.col("caption"))
    ).withColumn(
        "fmt", F.when(F.col("phash") % 7 == 0, None).otherwise(F.col("fmt"))
    ).withColumn(
        "phash", F.when(F.col("phash") % 11 == 0, None).otherwise(F.col("phash"))
    )
    assert df.where(F.col("phash").isNull()).count() > 0  # nulls planted
    out = str(tmp_path / "null_out")
    m = stage.run_stage(spark, df, out, n_buckets=4, salt_factor=2)
    assert m["rows"] == 50
    dirs = os.listdir(os.path.join(out, "data"))
    assert not any("HIVE_DEFAULT" in d for d in dirs)
    # resumed run is a clean no-op — null-phash rows are NOT re-pending
    m2 = stage.run_stage(spark, df, out, n_buckets=4, salt_factor=2)
    assert m2["resumed_noop"]
    assert spark.read.parquet(os.path.join(out, "data")).count() == 50


def test_bucket_filter_prunes_partitions_on_read(spark, src, tmp_path):
    """Reading the stage output with a bucket predicate must prune at the
    PARTITION level (PartitionFilters in the scan, not a row filter over
    all files) — this is what makes the resume NOT-IN filter metadata-only
    over a bucket-partitioned table."""
    out = str(tmp_path / "prune_out")
    stage.run_stage(spark, src, out, n_buckets=8, salt_factor=2)
    read = spark.read.parquet(os.path.join(out, "data")).where("bucket = 3")
    plan = read._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "(bucket" in plan.split("PartitionFilters")[1][:80]
    # and the NOT-IN resume shape prunes the same way
    anti = spark.read.parquet(os.path.join(out, "data")).where(
        ~F.col("bucket").isin([0, 1, 2])
    )
    aplan = anti._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in aplan
    assert anti.select("bucket").distinct().count() == 5


def test_resume_processes_only_missing_buckets(spark, src, tmp_path):
    out = str(tmp_path / "partial_out")
    # simulate a crashed run: process only buckets 0-3 by pre-marking 4-7 done
    pre = spark.createDataFrame(
        [(b, 0, 0, 0, 0.0, "done") for b in range(4, 8)],
        "bucket int, n_rows long, n_kept long, n_pii_rows long, runtime_sec double, status string",
    )
    os.makedirs(out, exist_ok=True)
    pre.coalesce(1).write.mode("overwrite").parquet(os.path.join(out, "lineage"))

    m = stage.run_stage(spark, src, out, n_buckets=8, salt_factor=2)
    expected = (
        stage.with_bucket(src, 8).where(F.col("bucket") < 4).count()
    )
    assert m["rows"] == expected  # only pending buckets were scored
    data = spark.read.parquet(os.path.join(out, "data"))
    assert set(
        r["bucket"] for r in data.select("bucket").distinct().collect()
    ) == set(range(4))


def test_stage_plan_is_map_only_plus_one_shuffle(spark, src):
    """Scale guard: scoring adds NO shuffle; the job's only exchange is the
    explicit (bucket, salt) repartition."""
    df = stage.with_bucket(src, 8)
    scored = stage.score(df)
    salted = scored.withColumn(
        "salt", F.pmod(F.xxhash64("image_id"), F.lit(2)).cast("int")
    ).repartition(16, "bucket", "salt")
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_resume_after_torn_file_rewrites_bucket_idempotently(spark, src, tmp_path):
    """Crash DURING a bucket's data write: the bucket dir holds a torn
    (half-written, unreadable) parquet part and lineage never recorded the
    bucket. Resume must rewrite that bucket's partition atomically (dynamic
    partition overwrite replaces the whole directory, torn file included) —
    no duplicate rows, no unreadable leftovers, exact row parity."""
    out = str(tmp_path / "torn_out")
    stage.run_stage(spark, src, out, n_buckets=8, salt_factor=2)

    victim = 3
    vdir = os.path.join(out, "data", f"bucket={victim}")
    parts = [f for f in os.listdir(vdir) if f.endswith(".parquet")]
    assert parts
    # tear the first part: truncate to half (invalid parquet footer) — the
    # file system state a mid-write executor kill leaves behind
    torn = os.path.join(vdir, parts[0])
    blob = open(torn, "rb").read()
    with open(torn, "wb") as f:
        f.write(blob[: len(blob) // 2])
    # and the crash happened before lineage committed the bucket
    ldir = os.path.join(out, "lineage")
    lineage = spark.read.parquet(ldir).where(F.col("bucket") != victim).collect()
    import shutil

    shutil.rmtree(ldir)
    spark.createDataFrame(
        lineage,
        "bucket int, n_rows long, n_kept long, n_pii_rows long, "
        "runtime_sec double, status string",
    ).coalesce(1).write.mode("overwrite").parquet(ldir)

    m = stage.run_stage(spark, src, out, n_buckets=8, salt_factor=2)
    expected_victim = (
        stage.with_bucket(src, 8).where(F.col("bucket") == victim).count()
    )
    assert m["rows"] == expected_victim  # only the torn bucket reprocessed

    data = spark.read.parquet(os.path.join(out, "data"))  # all parts readable
    assert data.count() == src.count()
    assert data.select("image_id").distinct().count() == src.count()
    assert spark.read.parquet(ldir).where("status = 'done'").count() == 8
