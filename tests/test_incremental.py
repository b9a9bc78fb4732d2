"""append_tokens_to_tiers edge semantics (the contract query certifies
end-state equality statistically; these pin the branches)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from processor_post_timeseries_spark.operators.incremental import (
    append_tokens_to_tiers,
)
from processor_post_timeseries_spark.operators.rollup import (
    tier1_from_tokens,
    tier_points,
)


@pytest.fixture(scope="module")
def spark():
    from processor_post_timeseries_spark.session import get_spark

    return get_spark("test-incr", master="local[4]")


def _seq(spark, rows):
    return spark.createDataFrame(
        [(d, t, len(t), "s") for d, t in rows],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )


def _delta(spark, rows):
    return spark.createDataFrame(
        [(d, t, "s", off) for d, t, off in rows],
        "doc_id string, tokens array<int>, source string, offset long",
    )


def _points(df):
    return {
        (r["doc_id"], r["win_no"]): (r["min_v"], r["max_v"], r["sum_v"], r["cnt"])
        for r in tier_points(df).collect()
    }


class TestIncrementalAppend:
    def test_misaligned_boundary_merge(self, spark):
        # window 4; 6 existing tokens -> windows [0..3],[4,5 partial];
        # append 5 more: 2 complete the boundary window, 3 start the next
        existing = tier1_from_tokens(_seq(spark, [("a", [1, 2, 3, 4, 5, 6])]), 4)
        merged = append_tokens_to_tiers(
            existing, _delta(spark, [("a", [7, 8, 9, 10, 11], 6)]), 4
        )
        got = _points(merged)
        full = _points(tier1_from_tokens(_seq(spark, [("a", list(range(1, 12)))]), 4))
        assert got == full
        assert got[("a", 1)] == (5, 8, 26, 4)  # the merged boundary window

    def test_aligned_append_and_new_doc(self, spark):
        existing = tier1_from_tokens(_seq(spark, [("a", [1, 2, 3, 4])]), 4)
        merged = append_tokens_to_tiers(
            existing,
            _delta(spark, [("a", [9, 9], 4), ("b", [5, 6, 7], 0)]),
            4,
        )
        got = _points(merged)
        assert got[("a", 1)] == (9, 9, 18, 2)
        assert got[("b", 0)] == (5, 7, 18, 3)

    def test_untouched_docs_pass_through(self, spark):
        existing = tier1_from_tokens(
            _seq(spark, [("a", [1, 2]), ("c", [8, 8, 8])]), 4
        )
        merged = append_tokens_to_tiers(existing, _delta(spark, [("a", [3], 2)]), 4)
        got = _points(merged)
        assert got[("c", 0)] == (8, 8, 24, 3)
        assert got[("a", 0)] == (1, 3, 6, 3)

    def test_offset_mismatch_raises(self, spark):
        existing = tier1_from_tokens(_seq(spark, [("a", [1, 2, 3])]), 4)
        merged = append_tokens_to_tiers(existing, _delta(spark, [("a", [4], 7)]), 4)
        with pytest.raises(Exception, match="offset 7 != ingested 3"):
            merged.collect()

    def test_new_doc_with_nonzero_offset_raises(self, spark):
        existing = tier1_from_tokens(_seq(spark, [("a", [1])]), 4)
        merged = append_tokens_to_tiers(existing, _delta(spark, [("z", [4], 3)]), 4)
        with pytest.raises(Exception, match="no existing tier row"):
            merged.collect()

    def test_cascades_compose_after_merge(self, spark):
        from processor_post_timeseries_spark.operators.rollup import cascade_tier

        existing = tier1_from_tokens(_seq(spark, [("a", list(range(8)))]), 2)
        merged = append_tokens_to_tiers(
            existing, _delta(spark, [("a", list(range(8, 16)), 8)]), 2
        )
        t2 = cascade_tier(merged, factor=2, tier="t2")
        full_t2 = cascade_tier(
            tier1_from_tokens(_seq(spark, [("a", list(range(16)))]), 2), 2, "t2"
        )
        assert _points(t2) == _points(full_t2)
