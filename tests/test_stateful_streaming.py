from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from processor_post_timeseries_spark.streaming.stateful import run_extents_available_now

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _events(spark, rows):
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [(u, base + dt.timedelta(seconds=s), v) for u, s, v in rows], SCHEMA
    )


def test_state_survives_across_triggers(spark, tmp_path):
    in_dir, out_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")

    _events(spark, [(1, 0, 5.0), (1, 10, 7.0), (2, 3, -1.0)]).write.mode("overwrite").parquet(in_dir)
    run_extents_available_now(spark, in_dir, out_dir, ckpt, SCHEMA).awaitTermination(120)

    # second batch arrives; state must carry the first batch's extents
    _events(spark, [(1, 100, 1.0), (2, 1, 9.0)]).write.mode("append").parquet(in_dir)
    run_extents_available_now(spark, in_dir, out_dir, ckpt, SCHEMA).awaitTermination(120)

    # latest emission per key = cumulative extents over BOTH batches
    out = spark.read.parquet(out_dir)
    latest = {
        r["user_id"]: r
        for r in out.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                    "user_id"
                ).orderBy(F.desc("n_samples"))
            ),
        )
        .filter("rn = 1")
        .collect()
    }
    u1 = latest[1]
    assert u1["n_samples"] == 3
    assert (u1["min_v"], u1["max_v"]) == (1.0, 7.0)
    base_us = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1e6)
    assert u1["start_us"] == base_us and u1["end_us"] == base_us + 100_000_000
    u2 = latest[2]
    assert u2["n_samples"] == 2
    assert (u2["min_v"], u2["max_v"]) == (-1.0, 9.0)
