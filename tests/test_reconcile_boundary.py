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


def test_rate_validation_exact_boundary(spark):
    """Reference reader.py:82-106 semantics: error strictly greater than
    2% fails; error == 0.02 (IEEE-exact for 30600 vs 30000) passes."""
    import pytest
    from pyspark.sql import functions as F

    from processor_post_timeseries_spark.operators.segments import validate_rates

    rows = [
        ("at_boundary", 30000.0, 30600.0, True),   # |Δ|/declared == 0.02 exactly
        ("inside", 30000.0, 30450.0, True),        # 1.5%
        ("outside", 30000.0, 30700.0, False),      # 2.33%
        ("below", 30000.0, 29500.0, True),         # 1.67% low side
        ("way_off", 30000.0, 31000.0, False),
    ]
    df = spark.createDataFrame(
        rows, "name string, declared_rate_hz double, inferred_rate_hz double, want boolean"
    )
    got = validate_rates(df)
    assert got.filter(F.col("rate_valid") != F.col("want")).count() == 0
    # fail mode raises with the reference's message format
    with pytest.raises(ValueError, match=r"Inferred rate from timestamps \(30700\.0000\)"):
        validate_rates(df, mode="fail")
    # fail mode is silent when all rows pass
    ok = df.filter(F.col("want"))
    assert validate_rates(ok, mode="fail").count() == 3


def test_infer_rate_hz_median_of_first_10(spark):
    from processor_post_timeseries_spark.operators.segments import infer_rate_hz

    # 25 samples at 1000 us spacing, one jitter; only the first 10 matter
    rows = [(1, i * 1000 + (7 if i == 3 else 0)) for i in range(25)]
    df = spark.createDataFrame(rows, "ch int, ts_us long")
    r = infer_rate_hz(df, "ch", "ts_us").collect()[0]
    assert r["median_delta_us"] == 1000.0
    assert r["inferred_rate_hz"] == 1000.0


def test_rate_validation_zero_and_null_declared(spark):
    """Declared rate 0 or NULL cannot validate anything: unconditionally
    invalid (the reference would raise ZeroDivisionError), never NULL."""
    from pyspark.sql import functions as F

    from processor_post_timeseries_spark.operators.segments import validate_rates

    df = spark.createDataFrame(
        [("zero", 0.0, 100.0), ("null", None, 100.0), ("ok", 100.0, 100.0)],
        "name string, declared_rate_hz double, inferred_rate_hz double",
    )
    got = {r["name"]: r for r in validate_rates(df).collect()}
    assert got["zero"]["rate_valid"] is False
    assert got["null"]["rate_valid"] is False
    assert got["ok"]["rate_valid"] is True
