"""Small-file compaction: layout changes, data never does."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from processor_post_timeseries_spark.plans.compaction import (
    compact_partitions,
    file_stats,
    plan_compaction,
)


def _fragmented_table(spark, path, n_frag=12):
    base = spark.range(2000).select(
        (F.col("id") % 4).cast("string").alias("src"),
        F.col("id"),
        (F.col("id") * 1.5).alias("v"),
    )
    # many small files per partition: one write per fragment
    for i in range(n_frag):
        base.filter(F.col("id") % n_frag == i).write.mode("append").partitionBy(
            "src"
        ).parquet(path)
    return base


def test_compaction_reduces_files_and_preserves_data(spark, tmp_path):
    path = str(tmp_path / "t")
    expected = _fragmented_table(spark, path)

    before = {r["src"]: r["n_files"] for r in file_stats(spark, path, ["src"]).collect()}
    assert all(n >= 12 for n in before.values())

    plan = compact_partitions(spark, path, ["src"], target_file_bytes=64 * 1024 * 1024)
    assert plan.n_partitions_to_compact == 4

    after = {r["src"]: r["n_files"] for r in file_stats(spark, path, ["src"]).collect()}
    assert all(after[s] < before[s] for s in before)
    assert all(n <= 2 for n in after.values())  # tiny data -> ~target_files=1

    got = spark.read.parquet(path).select("src", "id", "v")
    exp = expected.select("src", "id", "v")
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0

    # idempotent: a second run compacts nothing
    plan2 = compact_partitions(spark, path, ["src"], target_file_bytes=64 * 1024 * 1024)
    assert plan2.n_partitions_to_compact == 0


def test_compaction_skips_healthy_partitions(spark, tmp_path):
    path = str(tmp_path / "t2")
    df = spark.range(100).select((F.col("id") % 2).cast("string").alias("src"), "id")
    df.coalesce(1).write.partitionBy("src").parquet(path)  # 1 file per partition
    plan = plan_compaction(spark, path, ["src"])
    assert plan.n_partitions_total == 2 and plan.n_partitions_to_compact == 0
    # single-file partition untouched byte-wise after a compact call
    files_before = sorted(glob.glob(f"{path}/src=*/*.parquet"))
    compact_partitions(spark, path, ["src"])
    assert sorted(glob.glob(f"{path}/src=*/*.parquet")) == files_before
