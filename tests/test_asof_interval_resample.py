"""Semantics tests for the round-2 alignment operators: as-of join
(operators/asof.py), grid-bucketed interval join (operators/interval.py)
and linear resampling (operators/resample.py) — hand-built inputs whose
expected outputs are computed by eye, covering the tie/tolerance/edge
branches the contract oracles exercise only statistically."""

from __future__ import annotations

import pytest

from processor_post_timeseries_spark.operators.asof import asof_join
from processor_post_timeseries_spark.operators.interval import interval_join
from processor_post_timeseries_spark.operators.resample import resample_linear


@pytest.fixture(scope="module")
def spark():
    from processor_post_timeseries_spark.session import get_spark

    return get_spark("test-asof", master="local[4]")


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


class TestAsofJoin:
    def test_backward_match_and_equal_ts(self, spark):
        left = spark.createDataFrame(
            [(1, 100, 10), (1, 200, 20), (1, 50, 30)], "k int, ts long, lid int"
        )
        right = spark.createDataFrame(
            [(1, 100, 7.0, 1), (1, 150, 8.0, 2)], "k int, ts long, v double, rid int"
        )
        out = asof_join(
            left, right, by="k", ts="ts",
            right_cols={"v": "rv"}, right_tiebreak="rid",
        )
        got = _rows(out, "lid", "ts_l", "rv", "ts_r")
        # ts=100 matches the equal-ts right row (<= semantics); ts=50 has
        # no earlier right row -> NULL; ts=200 carries the latest (150).
        assert got == [(10, 100, 7.0, 100), (20, 200, 8.0, 150), (30, 50, None, None)]

    def test_tie_resolves_to_max_tiebreak(self, spark):
        left = spark.createDataFrame([(1, 10, 1)], "k int, ts long, lid int")
        right = spark.createDataFrame(
            [(1, 10, 1.0, 5), (1, 10, 2.0, 9), (1, 10, 3.0, 7)],
            "k int, ts long, v double, rid int",
        )
        out = asof_join(
            left, right, by="k", ts="ts",
            right_cols={"v": "rv"}, right_tiebreak="rid",
        )
        assert _rows(out, "rv") == [(2.0,)]  # rid=9 wins

    def test_tolerance_nulls_stale_matches(self, spark):
        left = spark.createDataFrame(
            [(1, 100, 1), (1, 1000, 2)], "k int, ts long, lid int"
        )
        right = spark.createDataFrame([(1, 90, 5.0, 1)], "k int, ts long, v double, rid int")
        out = asof_join(
            left, right, by="k", ts="ts",
            right_cols={"v": "rv"}, tolerance_us=50, right_tiebreak="rid",
        )
        got = dict((r["lid"], (r["rv"], r["ts_r"])) for r in out.collect())
        assert got[1] == (5.0, 90)        # lag 10 <= 50
        assert got[2] == (None, None)     # lag 910 > 50 -> nulled

    def test_keys_do_not_leak(self, spark):
        left = spark.createDataFrame([(1, 100, 1)], "k int, ts long, lid int")
        right = spark.createDataFrame([(2, 50, 9.0, 1)], "k int, ts long, v double, rid int")
        out = asof_join(left, right, by="k", ts="ts", right_cols={"v": "rv"}, right_tiebreak="rid")
        assert _rows(out, "lid", "rv") == [(1, None)]


class TestIntervalJoin:
    def test_half_open_and_multi_cell(self, spark):
        pts = spark.createDataFrame(
            [(0, 1), (5, 2), (9, 3), (10, 4), (25, 5)], "ts long, pid int"
        )
        iv = spark.createDataFrame(
            [(0, 10, 100), (8, 26, 200)], "s long, e long, iid int"
        )
        out = interval_join(pts, iv, "ts", "s", "e", grid_us=4)
        got = _rows(out, "pid", "iid")
        # [0,10): pts 0,5,9 (10 excluded). [8,26): pts 9,10,25 — interval
        # spans cells 2..6, each point matched exactly once.
        assert got == [(1, 100), (2, 100), (3, 100), (3, 200), (4, 200), (5, 200)]

    def test_empty_interval_matches_nothing(self, spark):
        pts = spark.createDataFrame([(5, 1)], "ts long, pid int")
        iv = spark.createDataFrame([(5, 5, 1), (6, 5, 2)], "s long, e long, iid int")
        assert interval_join(pts, iv, "ts", "s", "e", grid_us=4).count() == 0


class TestResampleLinear:
    def test_exact_hit_interp_and_span_clamp(self, spark):
        df = spark.createDataFrame(
            [(1, 0, 10.0, 1), (1, 10, 20.0, 2), (1, 15, 40.0, 3)],
            "k int, ts long, v double, i int",
        )
        out = resample_linear(df, by="k", ts_col="ts", val_col="v", step_us=5, tiebreak="i")
        got = _rows(out, "grid_ts_us", "v")
        # grid = 0,5,10,15 (confined to [0,15]); 5 interpolates 10->20.
        assert got == [(0, 10.0), (5, 15.0), (10, 20.0), (15, 40.0)]

    def test_duplicate_ts_takes_max_tiebreak_and_no_div0(self, spark):
        df = spark.createDataFrame(
            [(1, 0, 1.0, 1), (1, 10, 5.0, 2), (1, 10, 7.0, 3)],
            "k int, ts long, v double, i int",
        )
        out = resample_linear(df, by="k", ts_col="ts", val_col="v", step_us=10, tiebreak="i")
        got = _rows(out, "grid_ts_us", "v")
        assert got == [(0, 1.0), (10, 7.0)]  # exact hit -> last duplicate (i=3)

    def test_single_sample_channel(self, spark):
        df = spark.createDataFrame([(1, 20, 3.5, 1)], "k int, ts long, v double, i int")
        out = resample_linear(df, by="k", ts_col="ts", val_col="v", step_us=10, tiebreak="i")
        assert _rows(out, "grid_ts_us", "v") == [(20, 3.5)]

    def test_string_tiebreak_keeps_native_order(self, spark):
        # a string tiebreak must order as a string (the old cast-to-long
        # made it NULL and duplicate resolution partition-dependent)
        df = spark.createDataFrame(
            [(1, 0, 1.0, "a"), (1, 10, 5.0, "b10"), (1, 10, 7.0, "b9")],
            "k int, ts long, v double, rid string",
        )
        out = resample_linear(df, by="k", ts_col="ts", val_col="v", step_us=10, tiebreak="rid")
        # exact hit at 10 -> greatest STRING tiebreak is "b9" (not b10)
        assert _rows(out, "grid_ts_us", "v") == [(0, 1.0), (10, 7.0)]


class TestAsofDirections:
    def test_forward_and_equal_ts(self, spark):
        left = spark.createDataFrame(
            [(1, 100, 1), (1, 160, 2), (1, 200, 3)], "k int, ts long, lid int"
        )
        right = spark.createDataFrame(
            [(1, 100, 7.0, 1), (1, 150, 8.0, 2)], "k int, ts long, v double, rid int"
        )
        out = asof_join(left, right, by="k", ts="ts", right_cols={"v": "rv"},
                        right_tiebreak="rid", direction="forward")
        got = {r["lid"]: (r["rv"], r["ts_r"]) for r in out.collect()}
        # 100 matches the equal-ts right (>=); 160 has no later right;
        # 200 likewise
        assert got == {1: (7.0, 100), 2: (None, None), 3: (None, None)}

    def test_forward_tie_takes_min_tiebreak(self, spark):
        left = spark.createDataFrame([(1, 10, 1)], "k int, ts long, lid int")
        right = spark.createDataFrame(
            [(1, 10, 1.0, 9), (1, 10, 2.0, 5)], "k int, ts long, v double, rid int"
        )
        out = asof_join(left, right, by="k", ts="ts", right_cols={"v": "rv"},
                        right_tiebreak="rid", direction="forward")
        assert _rows(out, "rv") == [(2.0,)]  # rid=5 wins forward

    def test_nearest_picks_closer_and_backward_on_tie(self, spark):
        left = spark.createDataFrame(
            [(1, 10, 1), (1, 100, 2), (1, 149, 3)], "k int, ts long, lid int"
        )
        right = spark.createDataFrame(
            [(1, 50, 1.0, 1), (1, 150, 2.0, 2)], "k int, ts long, v double, rid int"
        )
        out = asof_join(left, right, by="k", ts="ts", right_cols={"v": "rv"},
                        right_tiebreak="rid", direction="nearest")
        got = {r["lid"]: r["rv"] for r in out.collect()}
        # 10 -> 50 (only forward); 100 equidistant -> backward (50);
        # 149 -> 150
        assert got == {1: 1.0, 2: 1.0, 3: 2.0}

    def test_nearest_tolerance(self, spark):
        left = spark.createDataFrame([(1, 100, 1)], "k int, ts long, lid int")
        right = spark.createDataFrame([(1, 220, 3.0, 1)], "k int, ts long, v double, rid int")
        out = asof_join(left, right, by="k", ts="ts", right_cols={"v": "rv"},
                        right_tiebreak="rid", direction="nearest", tolerance_us=100)
        assert _rows(out, "rv", "ts_r") == [(None, None)]

    def test_bad_direction_raises(self, spark):
        left = spark.createDataFrame([(1, 1, 1)], "k int, ts long, lid int")
        with pytest.raises(ValueError):
            asof_join(left, left, by="k", ts="ts", right_cols={}, direction="sideways")


class TestAsofRegressionsR2Review:
    def test_null_right_value_does_not_tear_attributes(self, spark):
        # r2(ts=2) has a NULL value: the match must report r2's id with a
        # NULL value — never pair r2's id with r1's stale value
        left = spark.createDataFrame([(1, 3, 1)], "k int, ts long, lid int")
        right = spark.createDataFrame(
            [(1, 1, 5.0, 10), (1, 2, None, 20)], "k int, ts long, v double, rid int"
        )
        out = asof_join(
            left, right, by="k", ts="ts",
            right_cols={"rid": "view_rid", "v": "rv"}, right_tiebreak="rid",
        ).collect()[0]
        assert out["view_rid"] == 20 and out["ts_r"] == 2
        assert out["rv"] is None  # legitimately NULL, not r1's 5.0

    def test_string_tiebreak_is_honored(self, spark):
        left = spark.createDataFrame([(1, 10, 1)], "k int, ts long, lid int")
        right = spark.createDataFrame(
            [(1, 10, 1.0, "a"), (1, 10, 2.0, "c"), (1, 10, 3.0, "b")],
            "k int, ts long, v double, rid string",
        )
        out = asof_join(
            left, right, by="k", ts="ts",
            right_cols={"v": "rv"}, right_tiebreak="rid",
        )
        assert _rows(out, "rv") == [(2.0,)]  # 'c' greatest, wins backward
