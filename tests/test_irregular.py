"""Explicit-timestamp (array<long> ts) segmentation + block bounds —
mirrors the reference reader/writer gap cases: split strictly above the
2-period threshold, half-open [start, last+1) bounds, chunks cut within
segments with real-µs keys."""

from __future__ import annotations

import pytest

from processor_post_timeseries_spark.operators.irregular import (
    block_bounds_from_ts_arrays,
    explode_ts_samples,
    gap_threshold_us,
    irregular_from_blocks,
    irregular_to_blocks,
    rate_from_ts_arrays,
    segments_from_ts_arrays,
    tier_from_ts_arrays,
)


@pytest.fixture(scope="module")
def spark():
    from processor_post_timeseries_spark.session import get_spark

    return get_spark("test-irregular", master="local[4]")


def _seq(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, ts array<long>, source string"
    )


def test_gap_threshold_is_two_periods():
    assert gap_threshold_us(500.0) == 4000
    assert gap_threshold_us(250.0) == 8000


def test_split_on_gap_and_halfopen_bounds(spark):
    # deltas: 1000,1000, 50000 (gap), 1000 -> segments [0..2002], [52000..53001)
    df = _seq(spark, [("d1", [1, 2, 3, 4, 5], [0, 1000, 2000, 52000, 53000], "s")])
    out = {
        r["seg_id"]: (r["seg_start_us"], r["seg_end_us"], r["n_samples"])
        for r in segments_from_ts_arrays(df, gap_us=4000).collect()
    }
    assert out == {0: (0, 2001, 3), 1: (52000, 53001, 2)}


def test_gap_equal_to_threshold_does_not_split(spark):
    # reference splits on delta > threshold, not >=
    df = _seq(spark, [("d1", [1, 2], [0, 4000], "s")])
    segs = segments_from_ts_arrays(df, gap_us=4000).collect()
    assert len(segs) == 1 and segs[0]["n_samples"] == 2


def test_single_sample_and_empty(spark):
    df = _seq(spark, [("one", [7], [123], "s"), ("empty", [], [], "s")])
    segs = segments_from_ts_arrays(df, gap_us=4000).collect()
    assert len(segs) == 1
    r = segs[0]
    assert (r["doc_id"], r["seg_start_us"], r["seg_end_us"], r["n_samples"]) == (
        "one", 123, 124, 1,
    )


def test_blocks_cut_within_segments_with_real_us_keys(spark):
    # one segment of 5 samples + one of 2; block_size=2 -> blocks 2,2,1 | 2
    ts = [0, 10, 20, 30, 40, 99000, 99010]
    df = _seq(spark, [("d1", list(range(7)), ts, "s")])
    rows = sorted(
        (
            (r["seg_id"], r["block_no"], r["start_us"], r["end_us"], r["n"], r["key"])
            for r in block_bounds_from_ts_arrays(df, gap_us=4000, block_size=2).collect()
        )
    )
    assert rows == [
        (0, 0, 0, 11, 2, "d1_000000000000_000000000011.bin"),
        (0, 1, 20, 31, 2, "d1_000000000020_000000000031.bin"),
        (0, 2, 40, 41, 1, "d1_000000000040_000000000041.bin"),
        (1, 0, 99000, 99011, 2, "d1_000000099000_000000099011.bin"),
    ]


def test_payload_blocks_roundtrip_and_kernel_agrees_with_sql_bounds(spark):
    import random

    rng = random.Random(3)
    rows = []
    for d in range(12):
        n = rng.randrange(1, 60)
        ts, cur = [], 0
        for i in range(n):
            cur += 40000 if rng.random() < 0.08 and i else rng.randrange(500, 1500)
            ts.append(cur)
        rows.append((f"d{d}", [rng.randrange(0, 255) for _ in range(n)], ts, "s"))
    df = _seq(spark, rows)
    blocks = irregular_to_blocks(df, gap_us=4000, block_size=7)
    # the numpy kernel's (seg, block, bounds) must equal the JVM-exprs path
    cols = ("doc_id", "seg_id", "block_no", "start_us", "end_us", "start_pos", "n", "key")
    a = sorted(tuple(r[c] for c in cols) for r in blocks.collect())
    b = sorted(
        tuple(r[c] for c in cols)
        for r in block_bounds_from_ts_arrays(df, gap_us=4000, block_size=7).collect()
    )
    assert a == b  # including start_pos: both emitters are 0-based
    # decode + reassemble: tokens AND timestamps byte-identical
    back = {r["doc_id"]: r for r in irregular_from_blocks(blocks).collect()}
    for doc_id, toks, ts, _src in rows:
        assert list(back[doc_id]["tokens"]) == toks
        assert list(back[doc_id]["ts"]) == ts


def test_payload_blocks_refuse_int32_span_overflow(spark):
    # a block whose rebased ts deltas exceed int32 must raise, never wrap
    big = 3_000_000_000  # > 2^31-1 µs within one block
    df = _seq(spark, [("d1", [1, 2], [0, big], "s")])
    with pytest.raises(Exception, match="int32"):
        irregular_to_blocks(df, gap_us=big + 1, block_size=2).collect()


def test_tier_kernel_rejects_unsorted_ts(spark):
    df = _seq(spark, [("d1", [1, 2, 3], [100, 50, 200], "s")])
    with pytest.raises(Exception, match="not sorted"):
        tier_from_ts_arrays(df, window_us=1000).collect()


def test_blocks_kernel_rejects_unsorted_ts(spark):
    # same documented precondition as tier_from_ts_arrays: unsorted ts
    # would silently mis-segment and emit negative-span keys
    df = _seq(spark, [("d1", [1, 2, 3], [100, 50, 200], "s")])
    with pytest.raises(Exception, match="not sorted"):
        irregular_to_blocks(df, gap_us=1000, block_size=2).collect()


def test_rate_inference_median_semantics(spark):
    # deltas 1000,1000,3000 -> median 1000 (odd count); two deltas
    # 1000,2000 -> median 1500 (even interpolation); single sample -> absent
    df = _seq(
        spark,
        [
            ("odd", [1, 2, 3, 4], [0, 1000, 2000, 5000], "s"),
            ("even", [1, 2, 3], [0, 1000, 3000], "s"),
            ("one", [9], [42], "s"),
        ],
    )
    out = {r["doc_id"]: r for r in rate_from_ts_arrays(df, first_k=10).collect()}
    assert set(out) == {"odd", "even"}
    assert out["odd"]["median_delta_us"] == 1000.0
    assert out["odd"]["inferred_rate_hz"] == 1000.0
    assert out["even"]["median_delta_us"] == 1500.0
    assert abs(out["even"]["inferred_rate_hz"] - 666.666666667) < 1e-9
    # first_k truncation: only the first 3 samples (2 deltas) count
    trunc = rate_from_ts_arrays(
        _seq(spark, [("d", [1, 2, 3, 4], [0, 100, 200, 99999], "s")]), first_k=3
    ).collect()[0]
    assert trunc["median_delta_us"] == 100.0


def test_tier_from_ts_arrays_matches_groupby_reference(spark):
    import random

    rng = random.Random(5)
    rows = []
    for d in range(15):
        n = rng.randrange(1, 80)
        ts, cur = [], rng.randrange(0, 1000)
        for _ in range(n):
            cur += rng.randrange(100, 90000)
            ts.append(cur)
        rows.append((f"d{d}", [rng.randrange(-5, 250) for _ in range(n)], ts, "s"))
    df = _seq(spark, rows)
    WIN = 50_000
    got = sorted(
        (r["doc_id"], r["win_us"], r["min_v"], r["max_v"], r["sum_v"], r["cnt"], r["mean_v"])
        for r in tier_from_ts_arrays(df, window_us=WIN).collect()
    )
    # reference: plain row-per-sample groupBy on the exploded view
    from pyspark.sql import functions as F

    ref = sorted(
        (r["doc_id"], r["win_us"], r["min_v"], r["max_v"], r["sum_v"], r["cnt"], r["mean_v"])
        for r in explode_ts_samples(df)
        .groupBy("doc_id", (F.col("ts_us") - F.pmod("ts_us", F.lit(WIN))).alias("win_us"))
        .agg(
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
            F.sum("v").cast("long").alias("sum_v"),
            F.count("*").alias("cnt"),
            F.round(F.sum("v") / F.count("*"), 6).alias("mean_v"),
        )
        .collect()
    )
    assert got == ref
    # batch-vectorized kernel must be partition-invariant
    again = sorted(
        (r["doc_id"], r["win_us"], r["min_v"], r["max_v"], r["sum_v"], r["cnt"], r["mean_v"])
        for r in tier_from_ts_arrays(df.repartition(13), window_us=WIN).collect()
    )
    assert got == again


def test_array_model_plans_have_zero_exchanges(spark):
    def _plan(df) -> str:
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    df = _seq(spark, [("d1", [1, 2], [0, 1000], "s")])
    for out in (
        segments_from_ts_arrays(df, gap_us=4000),
        block_bounds_from_ts_arrays(df, gap_us=4000, block_size=2),
        rate_from_ts_arrays(df),
        tier_from_ts_arrays(df, window_us=1000),
    ):
        plan = _plan(out)
        assert "Exchange" not in plan, plan


def test_partition_invariance_and_sample_explode(spark):
    rows = [
        (f"d{i}", [i, i + 1, i + 2], [0, 1000, 60000 + i], "s") for i in range(20)
    ]
    df = _seq(spark, rows)
    a = sorted(map(tuple, segments_from_ts_arrays(df.repartition(1), gap_us=4000).collect()))
    b = sorted(map(tuple, segments_from_ts_arrays(df.repartition(7), gap_us=4000).collect()))
    assert a == b
    flat = explode_ts_samples(df)
    assert flat.count() == 60
    one = sorted(
        (r["pos"], r["ts_us"], r["v"])
        for r in flat.filter("doc_id = 'd0'").collect()
    )
    assert one == [(0, 0, 0), (1, 1000, 1), (2, 60000, 2)]
