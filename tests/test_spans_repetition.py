"""Span-level duplication (strided window hashing) and within-doc
repetition metrics — known-answer fixtures."""

from __future__ import annotations

import pytest

from processor_post_timeseries_spark.functions.text import repetition_metrics
from processor_post_timeseries_spark.operators.spans import (
    duplicate_spans,
    span_dup_report,
)


@pytest.fixture(scope="module")
def spark():
    from processor_post_timeseries_spark.session import get_spark

    return get_spark("test-spans", master="local[4]")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BOILER = "x" * 40  # a 40-char run shared verbatim across docs


class TestDuplicateSpans:
    def test_shared_boilerplate_is_flagged_same_phase(self, spark):
        # same phase (both copies start at position 1): every aligned
        # window of the run matches across docs
        docs = _docs(spark, [(1, BOILER + "abcdefgh"), (2, BOILER + "zzzzzzzz")])
        out = duplicate_spans(docs, window=32, stride=8)
        by_doc = {}
        for r in out.collect():
            by_doc.setdefault(r["doc_id"], set()).add(r["pos"])
        # windows at pos 1 and 9 lie fully inside the shared 40-char run
        assert {1, 9} <= by_doc[1] and {1, 9} <= by_doc[2]
        assert all(r["n_docs"] == 2 for r in out.collect())

    def test_unique_docs_have_no_flags(self, spark):
        import random

        rng = random.Random(0)
        mk = lambda: "".join(rng.choice("abcdefghij") for _ in range(80))  # noqa: E731
        docs = _docs(spark, [(1, mk()), (2, mk())])
        assert duplicate_spans(docs, window=32, stride=8).count() == 0

    def test_report_fraction(self, spark):
        # doc 3 too short for a window -> absent from the report
        docs = _docs(spark, [(1, BOILER + "abcdefgh"), (2, BOILER + "zzzzzzzz"), (3, "tiny")])
        rep = {r["doc_id"]: r for r in span_dup_report(docs, window=32, stride=8).collect()}
        assert set(rep) == {1, 2}
        # len 48 -> windows at 1,9,17 (17+31=48): n_windows=3; pos 17
        # straddles the unique tail, so 2 of 3 windows are flagged
        assert rep[1]["n_windows"] == 3 and rep[1]["n_dup_windows"] == 2
        assert rep[1]["dup_fraction"] == round(2 / 3, 6)


class TestRepetition:
    def test_known_values(self, spark):
        # "a b a b a": bigrams [a b, b a, a b, b a] -> 4 grams, 2 distinct,
        # dup_fraction 0.5, top_share 0.5
        docs = _docs(spark, [(1, "a b a b a"), (2, "q w e r t"), (3, "solo")])
        out = {r["doc_id"]: r for r in repetition_metrics(docs, n=2).collect()}
        assert set(out) == {1, 2}  # "solo" has no bigram
        r1 = out[1]
        assert (r1["n_grams"], r1["n_distinct"]) == (4, 2)
        assert r1["dup_fraction"] == 0.5 and r1["top_share"] == 0.5
        r2 = out[2]
        assert r2["dup_fraction"] == 0.0 and r2["top_share"] == 0.25

    def test_zero_shuffle_plan(self, spark):
        docs = _docs(spark, [(1, "a b c")])
        plan = repetition_metrics(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
