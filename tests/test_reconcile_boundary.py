"""J1/F4 reconciliation semantics at the exact tolerance boundary —
mirrors the reference's boundary golden (channel equality iff
|1 - r_a/r_b| < 0.02 STRICTLY, /root/reference/processor/
timeseries_channel.py:73-80; boundary case tests/test_timeseries_channel.py:253)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _pairs(spark, rate_a, rate_b):
    a = spark.createDataFrame([("ch", "continuous", float(rate_a))], "name string, type string, rate double")
    b = spark.createDataFrame([("CH ", "CONTINUOUS", float(rate_b))], "name2 string, type2 string, rate2 double")
    cond = (
        (F.lower(F.trim("name")) == F.lower(F.trim("name2")))
        & (F.lower("type") == F.lower("type2"))
        & (F.abs(1 - F.col("rate") / F.col("rate2")) < 0.02)
    )
    return a.join(F.broadcast(b), cond).count()


def test_match_within_band(spark):
    assert _pairs(spark, 1000.0, 1010.0) == 1  # 1% off -> match


def test_exact_boundary_is_no_match(spark):
    # |1 - 980/1000| = 0.02 exactly -> strict < fails (reference golden)
    assert _pairs(spark, 980.0, 1000.0) == 0


def test_outside_band_no_match(spark):
    assert _pairs(spark, 900.0, 1000.0) == 0


def test_casefold_and_trim_match(spark):
    # name matching is trim+casefold (reference timeseries_channel.py:76-77)
    assert _pairs(spark, 1000.0, 1000.0) == 1
