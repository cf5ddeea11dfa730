"""Artifact distribution (S3-S6 Spark equivalents)."""

import os
import zipfile

from pii_detection_service_spark.sources import artifacts


def test_broadcast_gazetteer(spark):
    bc = artifacts.broadcast_gazetteer(spark, extra_names={"Zarathustra"})
    assert "alice" in bc.value and "zarathustra" in bc.value
    # usable inside a distributed closure
    n = (
        spark.sparkContext.parallelize(["Alice", "nobody"], 2)
        .filter(lambda w: w.lower() in bc.value)
        .count()
    )
    assert n == 1
    bc.unpersist()


def test_distribute_and_fetch_archive(spark, tmp_path):
    content = tmp_path / "gaz.txt"
    content.write_text("alpha\nbeta\n")
    zpath = tmp_path / "model.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.write(content, "gaz.txt")

    name = artifacts.distribute_archive(spark, str(zpath))

    def use(_):
        d = artifacts.fetch_archive(name)
        return open(os.path.join(d, "gaz.txt")).read()

    out = spark.sparkContext.parallelize([1, 2], 2).map(use).collect()
    assert out == ["alpha\nbeta\n"] * 2
    # extract-once cache marker exists
    d = artifacts.fetch_archive(name)
    assert os.path.exists(os.path.join(d, ".extracted"))
