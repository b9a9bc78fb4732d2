from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from processor_post_timeseries_spark import oracle
from processor_post_timeseries_spark.operators.rollup import (
    cascade_tier,
    rollup_all_tiers,
    source_stats,
    tier1_from_tokens,
    tier_points,
)
from processor_post_timeseries_spark.sources.synth import sequences

N_DOCS = 40
TIERS = (("1s", 10), ("1m", 6), ("1h", 6))


@pytest.fixture(scope="module")
def seq(spark):
    df = sequences(spark, N_DOCS, seed=7, min_tok=5, max_tok=500, vocab=1000).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def seq_pd(seq):
    return {r["doc_id"]: (np.array(r["tokens"], np.int64), r["source"]) for r in seq.collect()}


def test_synth_deterministic_across_partitioning(spark):
    a = sequences(spark, 20, seed=3, partitions=1).orderBy("doc_id").collect()
    b = sequences(spark, 20, seed=3, partitions=7).orderBy("doc_id").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_tier1_matches_numpy_oracle(seq, seq_pd):
    t1 = tier1_from_tokens(seq, 10, "1s")
    for r in t1.collect():
        toks, src = seq_pd[r["doc_id"]]
        exp = oracle.window_stats(toks, 10)
        assert r["source"] == src
        assert list(r["mins"]) == exp["mins"].tolist()
        assert list(r["maxs"]) == exp["maxs"].tolist()
        assert list(r["sums"]) == exp["sums"].tolist()
        assert list(r["cnts"]) == exp["cnts"].tolist()
        assert r["n_windows"] == len(exp["mins"])


def test_cascade_equals_direct_from_raw(seq, seq_pd):
    tiers = rollup_all_tiers(seq, TIERS)
    # 1m tier (window 60) must equal direct window-60 stats from raw
    got = {r["doc_id"]: r for r in tiers["1m"].collect()}
    for doc, (toks, _) in seq_pd.items():
        exp = oracle.window_stats(toks, 60)
        r = got[doc]
        assert r["window"] == 60
        assert list(r["sums"]) == exp["sums"].tolist()
        assert list(r["mins"]) == exp["mins"].tolist()
        assert list(r["maxs"]) == exp["maxs"].tolist()
        assert list(r["cnts"]) == exp["cnts"].tolist()
    # 1h tier (window 360)
    got = {r["doc_id"]: r for r in tiers["1h"].collect()}
    for doc, (toks, _) in seq_pd.items():
        exp = oracle.window_stats(toks, 360)
        r = got[doc]
        assert list(r["sums"]) == exp["sums"].tolist()
        assert list(r["cnts"]) == exp["cnts"].tolist()


def test_tier_points_mean_and_totals(seq, seq_pd):
    pts = tier_points(tier1_from_tokens(seq, 10, "1s"))
    total_cnt = pts.agg(F.sum("cnt")).collect()[0][0]
    assert total_cnt == sum(len(t) for t, _ in seq_pd.values())
    row = pts.filter("cnt > 0").first()
    assert row["mean_v"] == round(row["sum_v"] / row["cnt"], 6)


def test_source_stats_exact(seq, seq_pd):
    pts = tier_points(tier1_from_tokens(seq, 10, "1s"))
    got = {r["source"]: r for r in source_stats(pts).collect()}
    exp_sum: dict[str, int] = {}
    exp_cnt: dict[str, int] = {}
    for toks, src in seq_pd.values():
        exp_sum[src] = exp_sum.get(src, 0) + int(toks.sum())
        exp_cnt[src] = exp_cnt.get(src, 0) + len(toks)
    for src, r in got.items():
        assert r["sum_v"] == exp_sum[src]
        assert r["cnt"] == exp_cnt[src]


def test_partitioning_invariance(spark, seq):
    t_a = tier_points(tier1_from_tokens(seq.repartition(1), 10)).orderBy("doc_id", "win_no")
    t_b = tier_points(tier1_from_tokens(seq.repartition(13), 10)).orderBy("doc_id", "win_no")
    assert [r.asDict() for r in t_a.collect()] == [r.asDict() for r in t_b.collect()]


def test_ragged_tail_and_tiny_docs(spark):
    seq = sequences(spark, 10, seed=1, min_tok=1, max_tok=12, vocab=50)
    t1 = tier1_from_tokens(seq, 5, "1s")
    for r in t1.collect():
        n = r["n_tok"] if "n_tok" in r else None
        total = sum(r["cnts"])
        assert total == sum(r["cnts"])  # cnts cover every sample
        assert r["n_windows"] == len(r["mins"]) == len(r["sums"])
    joined = seq.join(t1.withColumnRenamed("source", "s2"), "doc_id")
    for r in joined.select("n_tok", "cnts").collect():
        assert sum(r["cnts"]) == r["n_tok"]


def test_empty_token_arrays_survive_kernels(spark):
    df = spark.createDataFrame(
        [("d0", [], 0, "s"), ("d1", [5, 6, 7], 3, "s"), ("d2", [], 0, "s")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    rows = {r["doc_id"]: r for r in tier1_from_tokens(df, 2, "1s").collect()}
    assert rows["d0"]["n_windows"] == 0 and list(rows["d0"]["sums"]) == []
    assert list(rows["d1"]["sums"]) == [11, 7]
    t2 = {r["doc_id"]: r for r in cascade_tier(tier1_from_tokens(df, 2, "1s"), 2, "1m").collect()}
    assert t2["d2"]["n_windows"] == 0
    assert list(t2["d1"]["sums"]) == [18]
