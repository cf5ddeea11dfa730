"""Long-document + adversarial-skew scale legs.

Two stress axes the 5M/20M caption runs never exercise (every historical
scale bug — the 599 s shingle fold, Window band-group skew, the
DRAM-bound simhash kernel — surfaced only under a NEW axis):

1. LONG DOCUMENTS (Gopher's actual target): n_long docs x ~2k words.
   Times the production run-length Gopher/quality expressions over the
   full corpus AND, on a small identical sample, the retired
   O(distinct*n) nested-filter shape they replaced — the reported
   speedup is the per-row ratio on that shared sample (the old shape is
   quadratic; running it on the full corpus would take hours, which is
   the point).

2. TEMPLATE SKEW: n_skew docs where ~10% share one near-identical
   template, concentrating them into a single hot LSH band group. Runs
   the full dedup family on the skewed corpus and on a uniform corpus of
   the same size; telemetry = max band-group size, max/median task time
   of the heaviest stage (Spark REST API), and the skew/uniform
   wall-clock ratio. The skew-safe claims under test: group-min via
   groupBy+join (map-side combine, one row per group out), AQE skew
   splitting on the join back, star edges (group_size-1, never size^2).

Usage: python BENCH/scale_longdoc.py [n_long] [n_skew]
       (defaults 500_000 and 2_000_000)
Writes BENCH/scale_longdoc.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

UI_PORT = 4058
HOT_FRAC = 10  # 1/HOT_FRAC of skew rows are template clones


# ---------------------------------------------------------------- corpora
def build_longdoc(spark, n: int, path: str) -> None:
    """n docs of 1500-2500 words (mean ~2k) from a 2000-word Zipf-ish
    vocabulary; every 20th doc gets a tiled phrase run so the Gopher
    rules actually fire. Deterministic per doc_id."""
    import pandas as pd

    def gen(batches):
        import numpy as np

        rng0 = np.random.default_rng(1234)
        alpha = np.array(list("abcdefghijklmnopqrstuvwxyz"))
        vocab = np.array(
            [
                "".join(rng0.choice(alpha, size=int(rng0.integers(3, 10))))
                for _ in range(2000)
            ]
        )
        for pdf in batches:
            out_id, out_txt = [], []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng(777_000_000 + i)
                nw = 1500 + i % 1000
                # power transform => Zipf-ish head without per-call alias
                idx = (rng.random(nw) ** 3 * len(vocab)).astype(np.int64)
                words = vocab[idx]
                if i % 20 == 0:  # plant heavy 3-gram repetition
                    phrase = vocab[[7, 42, 99]]
                    reps = 40 + i % 200
                    tile = np.tile(phrase, reps)
                    words = np.concatenate([tile, words[: nw - len(tile)]])
                out_id.append(i)
                out_txt.append(" ".join(words.tolist()))
            yield pd.DataFrame(
                {
                    "doc_id": out_id,
                    "text": out_txt,
                    "lang": ["en"] * len(out_id),
                    "source": ["longdoc"] * len(out_id),
                    "n_chars": [len(t) for t in out_txt],
                }
            )

    (
        spark.range(0, n, 1, 256)
        .mapInPandas(
            gen,
            "doc_id long, text string, lang string, source string, n_chars int",
        )
        .write.mode("overwrite")
        .parquet(path)
    )


def build_skew(spark, n: int, path: str, skewed: bool) -> None:
    """n caption-sized docs; if skewed, every HOT_FRAC-th row is the same
    ~30-word template with ONE trailing word varying over 7 choices (so
    the clones share nearly all shingles and pile into one band group)."""
    import pandas as pd

    from pii_detection_service_spark.sources.synth import caption_for

    template = (
        "system generated template caption describing the same stock "
        "product photo with identical boilerplate wording repeated across "
        "the whole crawl batch for this vendor feed item variant"
    )

    def gen(batches):
        for pdf in batches:
            ids, txts = [], []
            for i in pdf["id"]:
                i = int(i)
                if skewed and i % HOT_FRAC == 0:
                    t = f"{template} tag{i % 7}"
                else:
                    t = caption_for(i)
                ids.append(i)
                txts.append(t)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "text": txts,
                    "lang": ["en"] * len(ids),
                    "source": ["skew" if skewed else "unif"] * len(ids),
                    "n_chars": [len(t) for t in txts],
                }
            )

    (
        spark.range(0, n, 1, 128)
        .mapInPandas(
            gen,
            "doc_id long, text string, lang string, source string, n_chars int",
        )
        .write.mode("overwrite")
        .parquet(path)
    )


# ------------------------------------------------- retired-shape twins
def old_gopher(spark, sf_dir):
    """The retired O(distinct*n) nested-filter Gopher expression,
    reproduced verbatim for the speedup comparison (same inputs/outputs
    as textstats.gopher_repetition)."""
    import pyspark.sql.functions as F

    from pii_detection_service_spark.operators.relational import table

    def old_gram(n):  # slice-per-position construction: O(n_words^2)/row
        return (
            f"if(size(split(text, ' ')) < {n}, array(), "
            f"transform(sequence(1, size(split(text, ' ')) - {n - 1}), "
            f"i -> array_join(slice(split(text, ' '), i, {n}), ' ')))"
        )

    def frac(col):
        return F.expr(
            f"""
        case when size({col}) < 1 then cast(0.0 as double) else
          aggregate(array_distinct({col}),
                    named_struct('c', 0, 'g', ''),
                    (acc, g) -> if(size(filter({col}, x -> x = g)) > acc.c
                                   or (size(filter({col}, x -> x = g)) = acc.c
                                       and g < acc.g),
                                named_struct('c', size(filter({col}, x -> x = g)),
                                             'g', g),
                                acc),
                    acc -> least(cast(acc.c * length(acc.g) as double)
                                   / length(text),
                                 cast(1.0 as double)))
        end
        """
        )

    d = table(spark, sf_dir, "documents")
    for g in (2, 3):
        d = d.withColumn(f"gs{g}", F.expr(old_gram(g)))
    return d.select(
        "doc_id", frac("gs2").alias("top2_frac"), frac("gs3").alias("top3_frac")
    )


def old_quality(spark, sf_dir):
    """The retired O(distinct*n) word-count shape of quality_score
    (top-word ratio + entropy only — the cost carriers)."""
    import pyspark.sql.functions as F

    from pii_detection_service_spark.operators.relational import table

    d = table(spark, sf_dir, "documents")
    counts = (
        "transform(array_distinct(split(text, ' ')), "
        "w -> size(filter(split(text, ' '), x -> x = w)))"
    )
    return d.select(
        "doc_id",
        (F.expr(f"array_max({counts})") / F.size(F.split(F.col("text"), " "))).alias(
            "top_word_ratio"
        ),
        F.expr(
            f"-aggregate({counts}, cast(0.0 as double), "
            "(acc, c) -> acc + (c / size(split(text, ' '))) "
            "* ln(c / size(split(text, ' '))))"
        ).alias("word_entropy"),
    )


# ------------------------------------------------------------ telemetry
def _api(app_id: str, path: str):
    url = f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def task_skew(app_id: str, seen: set[int]) -> dict:
    """max/median task duration of the heaviest NEW completed stage since
    the last call — the 'no single hot task' evidence."""
    stages = _api(app_id, "/stages?status=complete")
    fresh = [s for s in stages if s["stageId"] not in seen]
    for s in stages:
        seen.add(s["stageId"])
    if not fresh:
        return {}
    top = max(fresh, key=lambda s: s.get("executorRunTime", 0))
    q = _api(
        app_id,
        f"/stages/{top['stageId']}/{top['attemptId']}/taskSummary"
        "?quantiles=0.0,0.5,1.0",
    )
    lo, med, hi = q["duration"]
    return {
        "stage": top["stageId"],
        "n_tasks": top["numCompleteTasks"],
        "task_ms_median": round(med, 1),
        "task_ms_max": round(hi, 1),
        "max_over_median": round(hi / med, 2) if med else None,
    }


def main():
    n_long = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_skew = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    n_old = 256  # sample size for the retired quadratic shape
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pii-spark-longdoc-skew")
        .config("spark.sql.shuffle.partitions", str(cpus * 4))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    seen_stages: set[int] = set()

    import pyspark.sql.functions as F

    from pii_detection_service_spark.operators import dedup, textstats

    times: dict[str, float] = {}
    rows: dict[str, int] = {}
    tele: dict[str, dict] = {}

    def timed(name, fn, skew_probe=False):
        task_skew(app_id, seen_stages)  # drain pre-existing stages
        t0 = time.monotonic()
        out = fn()
        times[name] = round(time.monotonic() - t0, 2)
        rows[name] = out
        if skew_probe:
            tele[name] = task_skew(app_id, seen_stages)
        print(f"  {name}: {times[name]}s ({out} rows) {tele.get(name, '')}",
              file=sys.stderr)

    # ---------------------------------------------------- long-doc leg
    long_dir = f"/tmp/spark_graft_longdoc_v1_{n_long}"
    if not os.path.isdir(f"{long_dir}/documents.parquet"):
        build_longdoc(spark, n_long, f"{long_dir}/documents.parquet")
    sample_dir = f"/tmp/spark_graft_longdoc_v1_{n_old}s"
    if not os.path.isdir(f"{sample_dir}/documents.parquet"):
        (
            spark.read.parquet(f"{long_dir}/documents.parquet")
            .where(F.col("doc_id") < n_old)
            .repartition(cpus)
            .write.mode("overwrite")
            .parquet(f"{sample_dir}/documents.parquet")
        )

    force_g = lambda d: len(  # noqa: E731
        d.agg(F.sum("top2_frac"), F.sum("top3_frac"), F.count(F.lit(1))).collect()
    )
    force_q = lambda d: len(  # noqa: E731
        d.agg(F.sum("top_word_ratio"), F.sum("word_entropy")).collect()
    )

    timed("gopher_new_full", lambda: force_g(
        textstats.gopher_repetition(spark, long_dir)), skew_probe=True)
    timed("quality_new_full", lambda: force_q(
        textstats.quality_score(spark, long_dir)))
    timed("gopher_new_sample", lambda: force_g(
        textstats.gopher_repetition(spark, sample_dir)))
    timed("gopher_old_sample", lambda: force_g(old_gopher(spark, sample_dir)))
    timed("quality_new_sample", lambda: force_q(
        textstats.quality_score(spark, sample_dir)))
    timed("quality_old_sample", lambda: force_q(old_quality(spark, sample_dir)))

    # one sketch leg at 100k long docs: text-length scaling of minhash
    sub_dir = f"/tmp/spark_graft_longdoc_v1_{min(n_long, 100_000)}sub"
    if not os.path.isdir(f"{sub_dir}/documents.parquet"):
        (
            spark.read.parquet(f"{long_dir}/documents.parquet")
            .where(F.col("doc_id") < min(n_long, 100_000))
            .repartition(cpus * 4)
            .write.mode("overwrite")
            .parquet(f"{sub_dir}/documents.parquet")
        )
    sig_force = [F.sum(f"mh{j}") for j in range(8)]
    timed(
        "minhash_signatures_longdoc_100k",
        lambda: len(dedup.minhash_signatures(spark, sub_dir).agg(*sig_force).collect()),
        skew_probe=True,
    )

    speedup = {
        # same-sample ratio (conservative: per-job overhead inflates the
        # fast side's ~0.2 s denominator)
        "gopher_per_row": round(
            times["gopher_old_sample"] / max(times["gopher_new_sample"], 1e-9), 1
        ),
        "quality_per_row": round(
            times["quality_old_sample"] / max(times["quality_new_sample"], 1e-9), 1
        ),
        # old per-row (sample) vs new per-row amortized over the full
        # corpus — removes the fixed-overhead bias
        "gopher_per_row_amortized": round(
            (times["gopher_old_sample"] / n_old)
            / max(times["gopher_new_full"] / n_long, 1e-12),
            1,
        ),
        "quality_per_row_amortized": round(
            (times["quality_old_sample"] / n_old)
            / max(times["quality_new_full"] / n_long, 1e-12),
            1,
        ),
    }
    print(f"  speedup over retired shape: {speedup}", file=sys.stderr)

    # -------------------------------------------------------- skew leg
    corp = {}
    for tag, skewed in (("skew", True), ("unif", False)):
        d = f"/tmp/spark_graft_skew_v1_{tag}_{n_skew}"
        if not os.path.isdir(f"{d}/documents.parquet"):
            build_skew(spark, n_skew, f"{d}/documents.parquet", skewed)
        corp[tag] = d

    band_tel = {}
    for tag in ("skew", "unif"):
        d = corp[tag]
        sizes = (
            dedup.minhash_band_candidates(spark, d)
            .agg(
                F.max("n_docs").alias("max_grp"),
                F.expr("percentile_approx(n_docs, 0.5)").alias("med_grp"),
                F.count(F.lit(1)).alias("n_groups"),
            )
            .collect()[0]
        )
        band_tel[tag] = {
            "max_band_group": sizes["max_grp"],
            "median_band_group": int(sizes["med_grp"]),
            "n_groups": sizes["n_groups"],
        }
        print(f"  band groups [{tag}]: {band_tel[tag]}", file=sys.stderr)
        timed(f"minhash_survivors_{tag}", lambda d=d: len(
            dedup.minhash_survivors(spark, d).agg(F.sum("dup_of")).collect()),
            skew_probe=(tag == "skew"))
        timed(f"simhash_candidates_{tag}", lambda d=d:
              dedup.simhash_candidates(spark, d).count(),
              skew_probe=(tag == "skew"))
        timed(f"jaccard_candidates_{tag}", lambda d=d:
              dedup.jaccard_candidates(spark, d).count(),
              skew_probe=(tag == "skew"))
        cc_tel: dict = {}
        timed(f"dedup_clusters_{tag}", lambda d=d:
              dedup.dedup_clusters(spark, d, telemetry=cc_tel).count(),
              skew_probe=(tag == "skew"))
        tele.setdefault(f"dedup_clusters_{tag}", {})["cc"] = dict(cc_tel)

    skew_ratio = {
        q: round(times[f"{q}_skew"] / max(times[f"{q}_unif"], 1e-9), 2)
        for q in (
            "minhash_survivors",
            "simhash_candidates",
            "jaccard_candidates",
            "dedup_clusters",
        )
    }
    print(f"  skew/uniform wall ratio: {skew_ratio}", file=sys.stderr)

    result = {
        "n_long": n_long,
        "n_skew": n_skew,
        "hot_fraction": 1.0 / HOT_FRAC,
        "cpus": cpus,
        "queries_sec": times,
        "rows": rows,
        "speedup_vs_retired_shape": speedup,
        "band_groups": band_tel,
        "skew_over_uniform_wall": skew_ratio,
        "task_skew": tele,
        "total_sec": round(sum(times.values()), 2),
    }
    print(json.dumps(result))
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "scale_longdoc.json"), "w") as f:
        json.dump(result, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
