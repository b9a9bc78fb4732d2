"""Sequence packing (concat-and-chunk): placement arithmetic, manifest
tiling invariants, partition invariance."""

from __future__ import annotations

import pytest

from processor_post_timeseries_spark.operators.packing import (
    pack_manifest,
    pack_offsets,
)


@pytest.fixture(scope="module")
def spark():
    from processor_post_timeseries_spark.session import get_spark

    return get_spark("test-packing", master="local[4]")


def _seq(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, n_tok int, source string")


def test_offsets_and_block_spans(spark):
    # source s: docs of 3, 5, 4 tokens; ctx 4 -> offsets 0, 3, 8
    df = _seq(spark, [("a", 3, "s"), ("b", 5, "s"), ("c", 4, "s"), ("z", 2, "t")])
    out = {r["doc_id"]: r for r in pack_offsets(df, ctx_len=4).collect()}
    assert (out["a"]["offset"], out["a"]["first_block"], out["a"]["last_block"]) == (0, 0, 0)
    assert (out["b"]["offset"], out["b"]["first_block"], out["b"]["last_block"]) == (3, 0, 1)
    assert (out["c"]["offset"], out["c"]["first_block"], out["c"]["last_block"]) == (8, 2, 2)
    assert out["z"]["offset"] == 0  # sources pack independently


def test_manifest_tiles_blocks_exactly(spark):
    import random

    rng = random.Random(9)
    rows = [(f"d{i:03d}", rng.randrange(1, 40), f"s{i % 3}") for i in range(60)]
    df = _seq(spark, rows)
    CTX = 16
    man = pack_manifest(df, ctx_len=CTX).collect()
    # (1) per-doc slices reassemble the whole doc contiguously from 0
    per_doc = {}
    for r in man:
        per_doc.setdefault(r["doc_id"], []).append((r["doc_start"], r["n_in_block"]))
    n_of = dict((d, n) for d, n, _s in rows)
    for doc, slices in per_doc.items():
        slices.sort()
        assert slices[0][0] == 0
        end = 0
        for start, n in slices:
            assert start == end and n > 0
            end = start + n
        assert end == n_of[doc]
    # (2) every block is densely tiled (except the final partial block)
    per_block = {}
    for r in man:
        per_block.setdefault((r["source"], r["block_id"]), []).append(
            (r["block_off"], r["n_in_block"])
        )
    totals = {}
    for (src, _b), slices in per_block.items():
        slices.sort()
        off = 0
        for boff, n in slices:
            assert boff == off
            off += n
        assert off <= CTX
        totals[src] = totals.get(src, 0) + off
    # (3) total packed tokens = total corpus tokens per source
    want = {}
    for _d, n, s in rows:
        want[s] = want.get(s, 0) + n
    assert totals == want


def test_partition_invariance(spark):
    rows = [(f"d{i}", 5 + i % 7, "s") for i in range(30)]
    a = sorted(map(tuple, pack_manifest(_seq(spark, rows).repartition(1), 8).collect()))
    b = sorted(map(tuple, pack_manifest(_seq(spark, rows).repartition(13), 8).collect()))
    assert a == b


def test_materialized_blocks_are_full_and_content_exact(spark):
    from processor_post_timeseries_spark.operators.packing import materialize_blocks

    rows = [
        ("a", [1, 2, 3], 3, "s"),
        ("b", [4, 5, 6, 7, 8], 5, "s"),
        ("c", [9, 10, 11, 12], 4, "s"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>, n_tok int, source string")
    out = {r["block_id"]: r for r in materialize_blocks(df, ctx_len=4).collect()}
    # concatenated stream 1..12 cut every 4 tokens
    assert [list(out[b]["tokens"]) for b in sorted(out)] == [
        [1, 2, 3, 4], [5, 6, 7, 8], [9, 10, 11, 12],
    ]
    assert all(r["n_tokens"] == 4 for r in out.values())
    # final partial block kept (not padded, not dropped)
    out2 = materialize_blocks(df, ctx_len=5).collect()
    sizes = sorted(r["n_tokens"] for r in out2)
    assert sizes == [2, 5, 5]


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_no_single_source_window_in_plan(spark):
    """The 100-TB guard: the corpus-sized cumsum window must partition by
    (source, _bkt), never by source alone — a bare per-source window
    pins a whole source in one task (VERDICT r3 scale-killer #1)."""
    import re

    rows = [(f"d{i:04d}", 1 + i % 9, "only_source") for i in range(300)]
    out = pack_offsets(_seq(spark, rows), ctx_len=64)
    plan = _plan(out)
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected window operators in the packing plan"
    assert all("_bkt" in s for s in specs), f"un-bucketed window spec: {specs}"


def test_single_source_matches_naive_window(spark):
    """Bit-identical to the naive per-source window semantics on a
    one-source corpus (the shape the two-phase prefix sum parallelizes)."""
    import random

    rng = random.Random(7)
    rows = [(f"d{rng.randrange(10**6):07d}x{i}", 1 + rng.randrange(50), "s") for i in range(500)]
    got = {r["doc_id"]: r["offset"] for r in pack_offsets(_seq(spark, rows), 32).collect()}
    run = 0
    for doc, n, _s in sorted(rows):
        assert got[doc] == run
        run += n


def test_integral_doc_ids_bucket_and_pack(spark):
    """order_bucket's integral path: min/max-ranged buckets preserve
    numeric order (string prefixes would not: '10' < '9')."""
    rows = [(i, 3, "s") for i in (1, 9, 10, 11, 100, 1000, 5000)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok int, source string")
    out = sorted(pack_offsets(df, 4).collect(), key=lambda r: r["doc_id"])
    assert [r["offset"] for r in out] == [0, 3, 6, 9, 12, 15, 18]


def test_incremental_matches_full_repack(spark):
    from processor_post_timeseries_spark.operators.packing import (
        merge_pack_totals,
        pack_offsets_incremental,
        pack_totals,
    )

    rows = [(f"d{i:03d}", 1 + i % 9, f"s{i % 2}") for i in range(40)]
    full = {r["doc_id"]: tuple(r) for r in pack_offsets(_seq(spark, rows), 16).collect()}
    existing = [r for r in rows if r[0] < "d020"]
    batch = [r for r in rows if r[0] >= "d020"]
    t = pack_totals(_seq(spark, existing))
    inc = pack_offsets_incremental(_seq(spark, batch), t, ctx_len=16).collect()
    assert {r["doc_id"]: tuple(r) for r in inc} == {
        d: v for d, v in full.items() if d >= "d020"
    }
    # checkpoint merge advances to the full-corpus totals
    merged = merge_pack_totals(t, pack_totals(_seq(spark, batch)))
    want = pack_totals(_seq(spark, rows))
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, want.collect()))


def test_incremental_unseen_source_starts_at_zero(spark):
    from processor_post_timeseries_spark.operators.packing import (
        pack_offsets_incremental,
        pack_totals,
    )

    t = pack_totals(_seq(spark, [("a", 7, "old")]))
    out = pack_offsets_incremental(
        _seq(spark, [("b", 3, "brandnew")]), t, ctx_len=4
    ).collect()
    assert out[0]["offset"] == 0


def test_incremental_rejects_out_of_order_append(spark):
    from processor_post_timeseries_spark.operators.packing import (
        pack_offsets_incremental,
        pack_totals,
    )

    t = pack_totals(_seq(spark, [("m", 7, "s")]))
    bad = _seq(spark, [("a", 3, "s")])  # 'a' < stored max 'm'
    with pytest.raises(Exception, match="out-of-order"):
        pack_offsets_incremental(bad, t, ctx_len=4).collect()
    # enforcement off: caller takes responsibility, placement proceeds
    out = pack_offsets_incremental(bad, t, ctx_len=4, enforce_append=False).collect()
    assert out[0]["offset"] == 7


def test_zero_token_docs_dropped(spark):
    df = _seq(spark, [("a", 0, "s"), ("b", 3, "s")])
    out = pack_offsets(df, ctx_len=4).collect()
    assert [r["doc_id"] for r in out] == ["b"]
    assert out[0]["offset"] == 0
