"""Round-5 operators: training-order manifest, BPE primitives,
bloom-filter decontamination, embedding centroid outliers."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from processor_post_timeseries_spark.operators.bpe import (
    _merge_one,
    apply_merge,
    bpe_train,
    pair_counts,
)
from processor_post_timeseries_spark.operators.ordering import shuffle_manifest


@pytest.fixture(scope="module")
def spark():
    from processor_post_timeseries_spark.session import get_spark

    return get_spark("test-round5", master="local[4]")


# ---------------------------------------------------------------------------
# shuffle_manifest
# ---------------------------------------------------------------------------


def test_shuffle_manifest_is_exact_global_rank(spark):
    docs = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    got = {
        r["doc_id"]: r["position"]
        for r in shuffle_manifest(docs, salt="e0").collect()
    }
    want_order = sorted(
        range(500), key=lambda d: (hashlib.md5(f"e0{d}".encode()).hexdigest(), d)
    )
    want = {d: i + 1 for i, d in enumerate(want_order)}
    assert got == want


def test_shuffle_manifest_partition_invariant_and_salted(spark):
    docs = spark.range(0, 300).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: r["position"] for r in shuffle_manifest(docs.repartition(1)).collect()}
    b = {r["doc_id"]: r["position"] for r in shuffle_manifest(docs.repartition(13)).collect()}
    assert a == b
    # positions are a permutation of 1..n
    assert sorted(a.values()) == list(range(1, 301))
    # a different salt gives a different permutation
    c = {r["doc_id"]: r["position"] for r in shuffle_manifest(docs, salt="e1").collect()}
    assert c != a and sorted(c.values()) == list(range(1, 301))


def test_shuffle_manifest_no_global_data_window(spark):
    """The corpus-sized frame must never sit under a 0-arity window —
    only the bounded |buckets| summary does (the waived global)."""
    docs = spark.range(0, 100).select(F.col("id").alias("doc_id"))
    plan = shuffle_manifest(docs)._jdf.queryExecution().executedPlan().toString()
    # the per-bucket rank window partitions by _bkt
    assert "_bkt" in plan


# ---------------------------------------------------------------------------
# BPE
# ---------------------------------------------------------------------------


def test_merge_one_greedy_semantics():
    # left != right: every match merges
    assert _merge_one(np.array([1, 2, 1, 2, 3]), 1, 2, 9).tolist() == [9, 9, 3]
    # left == right run: greedy left-to-right, like str.replace
    assert _merge_one(np.array([5, 5, 5]), 5, 5, 9).tolist() == [9, 5]
    assert _merge_one(np.array([5, 5, 5, 5]), 5, 5, 9).tolist() == [9, 9]
    # merge output can abut the next match start without merging again
    assert _merge_one(np.array([1, 1, 2]), 1, 2, 9).tolist() == [1, 9]
    assert _merge_one(np.array([7]), 7, 7, 9).tolist() == [7]


def test_pair_counts_counts_every_adjacency(spark):
    seq = spark.createDataFrame(
        [(["a", [97, 97, 97]])], "doc_id string, tokens array<int>"
    ).select("doc_id", "tokens")
    rows = pair_counts(seq).collect()
    assert len(rows) == 1 and rows[0]["n_pairs"] == 2  # overlapping both count


def test_apply_merge_matches_string_replace(spark):
    texts = ["banana", "aaaa", "ab", "x", "abababa"]
    seq = spark.createDataFrame(
        [(t, [ord(c) for c in t], len(t)) for t in texts],
        "doc_id string, tokens array<int>, n_tok int",
    )
    out = {
        r["doc_id"]: r["tokens"]
        for r in apply_merge(seq, ord("a"), ord("b"), 300).collect()
    }
    for t in texts:
        want = []
        s = t.replace("ab", "\x01")
        want = [300 if c == "\x01" else ord(c) for c in s]
        assert out[t] == want, t
    # n_tok updated
    nt = {r["doc_id"]: r["n_tok"] for r in apply_merge(seq, ord("a"), ord("b"), 300).collect()}
    assert nt["abababa"] == 4


def test_bpe_train_matches_reference_loop(spark):
    texts = ["the cat sat on the mat", "the bat and the cat", "thththth"]
    seq = spark.createDataFrame(
        [(str(i), [ord(c) for c in t], len(t)) for i, t in enumerate(texts)],
        "doc_id string, tokens array<int>, n_tok int",
    )
    got = [
        (r["round"], r["left"], r["right"], r["new_id"], r["n_pairs"])
        for r in bpe_train(seq, n_merges=3).orderBy("round").collect()
    ]
    # reference loop on strings (merge == replace with a fresh char)
    cur = list(texts)
    mapped = {}
    want = []
    for rnd in range(3):
        counts: dict = {}
        for s in cur:
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + 1
        code = lambda ch: mapped.get(ch, ord(ch))
        (l, r), c = min(
            counts.items(), key=lambda kv: (-kv[1], code(kv[0][0]), code(kv[0][1]))
        )
        new_ch = chr(1 + rnd)
        mapped[new_ch] = 256 + rnd
        want.append((rnd, code(l), code(r), 256 + rnd, c))
        cur = [s.replace(l + r, new_ch) for s in cur]
    assert got == want


# ---------------------------------------------------------------------------
# bloom decontamination
# ---------------------------------------------------------------------------


def test_bloom_decontaminate_no_false_negatives(spark):
    from processor_post_timeseries_spark.operators.decontam import (
        bloom_decontaminate,
        contamination_report,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta"),
            (2, "one two three four five six seven eight"),
            (3, "short text"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "x alpha beta gamma delta epsilon y")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in bloom_decontaminate(docs, bench, n=5).collect()}
    exact = {
        r["doc_id"]: r["contaminated"]
        for r in contamination_report(docs, bench, n=5).collect()
    }
    # every exact hit is a bloom hit (no false negatives)
    for d, contaminated in exact.items():
        if contaminated:
            assert got[d]["flagged"]
    assert got[1]["flagged"] and got[1]["n_grams"] == 3
    # the too-short doc appears with zero grams, never flagged
    assert got[3]["n_grams"] == 0 and not got[3]["flagged"]


def test_bloom_positions_match_hashlib(spark):
    from processor_post_timeseries_spark.operators.decontam import bloom_positions

    df = spark.createDataFrame([("alpha beta gamma",)], "shingle string")
    row = df.select(*[
        p.alias(f"p{j}") for j, p in enumerate(bloom_positions(F.col("shingle")))
    ]).collect()[0]
    for j in range(3):
        h = hashlib.md5(f"{j}:alpha beta gamma".encode()).hexdigest()
        assert row[f"p{j}"] == int(h[:5], 16)


# ---------------------------------------------------------------------------
# centroid outliers
# ---------------------------------------------------------------------------


def test_centroid_outliers_exact_small_case(spark):
    from processor_post_timeseries_spark.operators.similarity import (
        centroid_outliers,
        label_centroids,
    )

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [0.0, 1.0], 0),
            (3, [2.0, 2.0], 1),
            (4, [0.0, 0.0], 2),  # zero vector -> score 0
        ],
        "vec_id long, embedding array<float>, label int",
    )
    cents = {
        (r["group"], r["dim"]): r["c"] for r in label_centroids(emb).collect()
    }
    assert cents[(0, 0)] == 0.5 and cents[(0, 1)] == 0.5
    assert cents[(1, 0)] == 2.0
    out = {r["vec_id"]: r["cos_centroid"] for r in centroid_outliers(emb).collect()}
    # label 0 centroid (.5,.5): both members at 45 degrees -> cos = 1/sqrt(2)
    assert out[1] == pytest.approx(0.707107, abs=1e-6)
    assert out[2] == pytest.approx(0.707107, abs=1e-6)
    assert out[3] == pytest.approx(1.0)
    assert out[4] == 0.0


# ---------------------------------------------------------------------------
# M4 downsample + LM quality score
# ---------------------------------------------------------------------------


def test_m4_downsample_known_values(spark):
    from processor_post_timeseries_spark.operators.downsample import m4_downsample

    # 8 samples into 4 buckets -> 2 samples each
    seq = spark.createDataFrame(
        [("d", [5, 1, 9, 2, 7, 7, 3, 8], 8)],
        "doc_id string, tokens array<int>, n_tok int",
    )
    rows = {r["bucket"]: r for r in m4_downsample(seq, 4).collect()}
    assert rows[0]["min_v"] == 1 and rows[0]["max_v"] == 5
    assert rows[0]["first_v"] == 5 and rows[0]["last_v"] == 1
    assert rows[3]["first_v"] == 3 and rows[3]["last_v"] == 8
    assert all(rows[b]["n"] == 2 for b in range(4))


def test_m4_downsample_short_doc_fills_fewer_buckets(spark):
    from processor_post_timeseries_spark.operators.downsample import m4_downsample

    seq = spark.createDataFrame(
        [("d", [4, 6], 2)], "doc_id string, tokens array<int>, n_tok int"
    )
    rows = {r["bucket"]: r for r in m4_downsample(seq, 4).collect()}
    # i=0 -> bucket 0, i=1 -> bucket 2
    assert set(rows) == {0, 2}
    assert rows[0]["min_v"] == rows[0]["max_v"] == 4


def test_lm_avg_prob_hand_computed(spark):
    from processor_post_timeseries_spark.functions.text import lm_avg_prob

    model = spark.createDataFrame([(0, "abab")], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, "ab"), (2, "zz")], "doc_id long, text string"
    )
    # model bigrams: ab, ba, ab -> c(ab)=2, c(ba)=1; c(a.)=2, c(b.)=1; V=2
    rows = {r["doc_id"]: r for r in lm_avg_prob(corpus, model).collect()}
    # doc 1: p(b|a) = (2+1)/(2+2) = 0.75
    assert rows[1]["n_bigrams"] == 1 and rows[1]["avg_prob"] == 0.75
    # doc 2: unseen z: (0+1)/(0+2) = 0.5
    assert rows[2]["avg_prob"] == 0.5


def test_rollup_upsert_equals_full_recompute(spark):
    from processor_post_timeseries_spark.operators.rollup import (
        rollup_all_tiers,
        rollup_upsert,
        tier_points,
    )

    tiers = (("1s", 4),)

    def seq(rows):
        return spark.createDataFrame(
            rows, "doc_id string, tokens array<int>, n_tok int, source string"
        )

    old = seq(
        [
            ("a", [1, 2, 3, 4, 5, 6, 7, 8, 9], 9, "s"),  # will SHRINK
            ("b", [10, 20, 30], 3, "s"),                  # unchanged
        ]
    )
    delta = seq([("a", [5, 5], 2, "s")])
    fresh_corpus = seq(
        [("a", [5, 5], 2, "s"), ("b", [10, 20, 30], 3, "s")]
    )
    existing = tier_points(rollup_all_tiers(old, tiers)["1s"])
    got = sorted(
        (r["doc_id"], r["win_no"], r["min_v"], r["max_v"], r["cnt"])
        for r in rollup_upsert(existing, delta, tiers, "1s").collect()
    )
    want = sorted(
        (r["doc_id"], r["win_no"], r["min_v"], r["max_v"], r["cnt"])
        for r in tier_points(rollup_all_tiers(fresh_corpus, tiers)["1s"]).collect()
    )
    assert got == want
    # the shrunken doc's trailing windows are GONE (doc a: 9 tokens -> 2)
    assert max(w for d, w, *_ in got if d == "a") == 0


# ---------------------------------------------------------------------------
# bpe_encode
# ---------------------------------------------------------------------------


def test_bpe_encode_equals_chained_apply_merge(spark):
    rows = [
        (str(i), [int(x) for x in np.random.RandomState(i).randint(1, 6, 30)])
        for i in range(40)
    ] + [("solo", [3])]
    seq = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    merges = bpe_train(seq, n_merges=3)
    table = [(r["left"], r["right"], r["new_id"]) for r in merges.orderBy("round").collect()]
    chained = seq
    for left, right, new_id in table:
        chained = apply_merge(chained, left, right, new_id)
    from processor_post_timeseries_spark.operators.bpe import bpe_encode

    got = {r["doc_id"]: r["tokens"] for r in bpe_encode(seq, merges).collect()}
    want = {r["doc_id"]: r["tokens"] for r in chained.collect()}
    assert got == want
    assert got["solo"] == [3]  # 1-token docs pass through


def test_bpe_encode_accepts_plain_merge_list_and_updates_ntok(spark):
    seq = spark.createDataFrame(
        [("a", [1, 2, 1, 2], 4)], "doc_id string, tokens array<int>, n_tok long"
    )
    from processor_post_timeseries_spark.operators.bpe import bpe_encode

    r = bpe_encode(seq, [(1, 2, 256)]).collect()[0]
    assert r["tokens"] == [256, 256] and r["n_tok"] == 2


# ---------------------------------------------------------------------------
# epoch_batches / unigram_stats / char_distribution_drift
# ---------------------------------------------------------------------------


def test_epoch_batches_consistent_with_manifest(spark):
    docs = spark.range(0, 333).select(F.col("id").alias("doc_id"))
    got = {
        r["doc_id"]: (r["position"], r["batch_no"], r["pos_in_batch"])
        for r in __import__(
            "processor_post_timeseries_spark.operators.ordering",
            fromlist=["epoch_batches"],
        ).epoch_batches(docs, batch_size=50, salt="e1").collect()
    }
    man = {
        r["doc_id"]: r["position"]
        for r in shuffle_manifest(docs, salt="e1").collect()
    }
    assert len(got) == 333
    for d, (pos, b, pib) in got.items():
        assert pos == man[d] and b == (pos - 1) // 50 and pib == (pos - 1) % 50


def test_unigram_stats_rank_total_order(spark):
    from processor_post_timeseries_spark.operators.bpe import unigram_stats

    seq = spark.createDataFrame(
        [("a", [1, 1, 1, 2, 2, 3]), ("b", [2, 3, 3, 3, 9])],
        "doc_id string, tokens array<int>",
    )
    rows = {r["token"]: (r["n"], r["rank"]) for r in unigram_stats(seq).collect()}
    # counts: 3->4, 1->3, 2->3, 9->1; tie (1,2) broken by token asc
    assert rows == {3: (4, 1), 1: (3, 2), 2: (3, 3), 9: (1, 4)}


def test_char_drift_zero_for_identical_distribution_and_bounds(spark):
    from processor_post_timeseries_spark.functions.text import (
        char_distribution_drift,
    )

    same = spark.createDataFrame(
        [(1, "abab", "x"), (2, "abab", "y")], "doc_id long, text string, source string"
    )
    out = {r["group"]: r["tv"] for r in char_distribution_drift(same).collect()}
    assert out == {"x": 0.0, "y": 0.0}
    skew = spark.createDataFrame(
        [(1, "aaaa", "x"), (2, "bbbb", "y")], "doc_id long, text string, source string"
    )
    out2 = {r["group"]: r["tv"] for r in char_distribution_drift(skew).collect()}
    # each source: |1 - 0.5| + |0 - 0.5| halved = 0.5
    assert out2 == {"x": 0.5, "y": 0.5}


# ---------------------------------------------------------------------------
# gopher_quality_flags
# ---------------------------------------------------------------------------


def test_gopher_flags_crafted_cases(spark):
    from processor_post_timeseries_spark.functions.text import (
        gopher_quality_flags,
    )

    good = " ".join(["the", "be", "word"] + ["solid"] * 60)
    short = "the be tiny"
    hashy = "the be " + "# " * 60
    nostop = " ".join(["zzz"] * 60)
    longw = "the be " + " ".join(["x" * 40] * 60)
    docs = spark.createDataFrame(
        [(1, good), (2, short), (3, hashy), (4, nostop), (5, longw)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in gopher_quality_flags(docs).collect()}
    assert out[1]["kept"]
    assert not out[2]["word_count_ok"] and not out[2]["kept"]
    assert not out[3]["hash_ratio_ok"] and not out[3]["alpha_word_ok"]
    assert not out[4]["stopword_ok"]
    assert not out[5]["mean_word_len_ok"]
    # integer-form thresholds: mean len exactly 10 passes (boundary)
    b = spark.createDataFrame(
        [(9, "the be " + " ".join(["y" * 11] * 58))], "doc_id long, text string"
    )
    row = gopher_quality_flags(b).collect()[0]
    # total_len = 3+2+58*11 = 643 > 10*60: fails; craft exact boundary
    docs10 = spark.createDataFrame(
        [(10, " ".join(["z" * 10] * 50 + ["the", "be"] + ["w" * 10] * 8))],
        "doc_id long, text string",
    )
    r10 = gopher_quality_flags(docs10).collect()[0]
    # 60 words, total_len = 58*10 + 3 + 2 = 585 <= 600: boundary holds
    assert r10["mean_word_len_ok"] and r10["kept"]


# ---------------------------------------------------------------------------
# property: _merge_one == string replace semantics (hypothesis)
# ---------------------------------------------------------------------------


def test_merge_one_matches_replace_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(st.integers(min_value=1, max_value=4), max_size=40),
        st.integers(min_value=1, max_value=4),
        st.integers(min_value=1, max_value=4),
    )
    def check(tokens, left, right):
        got = _merge_one(np.asarray(tokens, np.int64), left, right, 9).tolist()
        s = "".join(chr(t) for t in tokens)
        want = [9 if c == "\x09" else ord(c) for c in s.replace(chr(left) + chr(right), "\x09")]
        assert got == want, (tokens, left, right)

    check()


def test_bpe_train_checkpoint_bounds_plan_depth(spark, monkeypatch):
    """r6: the train loop must localCheckpoint the working frame every
    ``checkpoint_every`` rounds (bounded plan depth / O(rounds *
    corpus / checkpoint_every) re-merge cost instead of O(rounds^2))
    and produce the identical merge table regardless of the cadence."""
    texts = [
        "the cat sat on the mat and the bat sat on the cat",
        "a banana bandana and a cabana in havana",
        "thththththththth",
        "mississippi mississippi mississippi",
    ]
    seq = spark.createDataFrame(
        [(str(i), [ord(c) for c in t], len(t)) for i, t in enumerate(texts)],
        "doc_id string, tokens array<int>, n_tok int",
    )

    cls = type(seq)  # the concrete (classic) DataFrame type
    ckpts: list[bool] = []
    orig = cls.localCheckpoint

    def spy(self, eager=True):
        ckpts.append(eager)
        return orig(self, eager)

    monkeypatch.setattr(cls, "localCheckpoint", spy)
    got = [tuple(r) for r in bpe_train(seq, 12, checkpoint_every=3).collect()]
    # 12 rounds / cadence 3 -> the checkpoint fired (eagerly) at least 3x
    assert len(ckpts) >= 3 and all(ckpts)

    monkeypatch.setattr(cls, "localCheckpoint", orig)
    want = [tuple(r) for r in bpe_train(seq, 12, checkpoint_every=10_000).collect()]
    assert got == want
