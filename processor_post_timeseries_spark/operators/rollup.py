"""Cascading continuous aggregates (raw -> 1s -> 1m -> 1h retention tiers).

North-rule operator W5/A6 (SURVEY.md §2.5-2.6). The reference only tracks
per-channel extents (``/root/reference/processor/reader.py:146-175``); the
cascade itself is new, designed Spark-first.

Scale design
------------
Each sequence's token stream is one channel, sample index = time. A tier
window therefore never crosses a row: tier-1 aggregates are a pure
**narrow map** over the ``tokens`` array (numpy reshape inside an Arrow
batch), and each higher tier re-aggregates the previous tier's arrays the
same way — ZERO shuffles for the whole cascade at any scale. Exploding to
one row per token (10^12+ rows) and shuffling on ``(doc, window)`` would
be the naive plan; we keep block form end to end. Cross-doc/source stats
are tiny tier summaries and shuffle only those.

Determinism: sums are int64 over int32 tokens (exact, order-free); mean
is derived at read time as ``sum/cnt`` (never accumulated in float), per
SURVEY.md §7 "hard parts".

Tier windows: sizes in samples, e.g. raw->1s = ``rate`` samples, 1s->1m =
60, 1m->1h = 60 (the reference's channels are fixed-rate streams,
``/root/reference/processor/timeseries_channel.py:28-31``).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# (doc_id, source, tier, window, n_windows, mins, maxs, sums, cnts)
TIER_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("tier", T.StringType(), False),
        T.StructField("window", T.LongType(), False),  # samples per window
        T.StructField("n_windows", T.IntegerType(), False),
        T.StructField("mins", T.ArrayType(T.LongType(), False), False),
        T.StructField("maxs", T.ArrayType(T.LongType(), False), False),
        T.StructField("sums", T.ArrayType(T.LongType(), False), False),
        T.StructField("cnts", T.ArrayType(T.LongType(), False), False),
    ]
)

DEFAULT_TIERS = (("1s", 100), ("1m", 60), ("1h", 60))  # factors vs previous tier


def _window_reduce(a: np.ndarray, w: int, op) -> np.ndarray:
    """Reduce 1-D array in windows of w (last window ragged)."""
    n = len(a)
    full = (n // w) * w
    head = op(a[:full].reshape(-1, w), axis=1) if full else np.empty(0, a.dtype)
    if n > full:
        return np.concatenate([head, [op(a[full:])]])
    return head


def _batch_window_stats(arrays: list[np.ndarray], w: int):
    """Window min/max/sum/cnt for a whole Arrow batch in FOUR numpy calls.

    Concatenates every doc's values and runs ``ufunc.reduceat`` over the
    combined window-start boundaries; windows never straddle docs because
    each doc's offset is itself a boundary. This removes the per-doc
    Python loop — the difference between interpreter-bound and
    memory-bound throughput at high core counts.
    """
    starts, nws, total = _window_starts([len(a) for a in arrays], w)
    if total == 0:
        empty = np.empty(0, np.int64)
        return empty, empty, empty, empty, nws
    vals = np.concatenate(arrays).astype(np.int64, copy=False)
    mins = np.minimum.reduceat(vals, starts)
    maxs = np.maximum.reduceat(vals, starts)
    sums = np.add.reduceat(vals, starts)
    ends = np.concatenate([starts[1:], [len(vals)]])
    cnts = ends - starts
    return mins, maxs, sums, cnts, nws


def _window_starts(lengths, w: int):
    """Combined window-start boundaries for a batch of per-doc arrays laid
    end to end: returns (starts, per-doc window counts, total windows)."""
    lens = np.asarray(lengths, dtype=np.int64)
    nws = (lens + w - 1) // w
    total = int(nws.sum())
    if total == 0:
        return np.empty(0, np.int64), nws, 0
    doc_off = np.concatenate([[0], np.cumsum(lens)[:-1]])
    win_off = np.concatenate([[0], np.cumsum(nws)[:-1]])
    starts = np.repeat(doc_off, nws) + (np.arange(total) - np.repeat(win_off, nws)) * w
    return starts, nws, total


def tier1_from_tokens(seq_df: DataFrame, window: int, tier: str = "1s") -> DataFrame:
    """Raw -> first tier. Narrow map: no shuffle, no explode."""

    def agg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            arrays = [np.asarray(t) for t in pdf["tokens"]]
            mins, maxs, sums, cnts, nws = _batch_window_stats(arrays, window)
            bounds = np.cumsum(nws)[:-1] if len(nws) else []
            res = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "source": pdf["source"].values,
                    "n_windows": nws.astype(np.int32) if len(nws) else nws,
                    "mins": np.split(mins, bounds),
                    "maxs": np.split(maxs, bounds),
                    "sums": np.split(sums, bounds),
                    "cnts": np.split(cnts, bounds),
                }
            )
            res["tier"] = tier
            res["window"] = np.int64(window)
            yield res[[f.name for f in TIER_SCHEMA.fields]]

    return seq_df.mapInPandas(agg, schema=TIER_SCHEMA)


def cascade_tier(prev: DataFrame, factor: int, tier: str) -> DataFrame:
    """Tier k -> k+1 by re-aggregating the previous tier's arrays.

    min of mins / max of maxes / sum of sums / sum of cnts — exact
    composition, still a narrow per-row map.
    """

    def agg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            lens = [len(a) for a in pdf["mins"]]
            starts, nws, total = _window_starts(lens, factor)
            col = {}
            # composition rules: min of mins, max of maxes, sum of sums,
            # sum of cnts — exact tier-k -> tier-k+1 algebra (A6)
            for name, ufunc in (
                ("mins", np.minimum),
                ("maxs", np.maximum),
                ("sums", np.add),
                ("cnts", np.add),
            ):
                vals = (
                    np.concatenate([np.asarray(a) for a in pdf[name]]).astype(np.int64, copy=False)
                    if total
                    else np.empty(0, np.int64)
                )
                col[name] = ufunc.reduceat(vals, starts) if total else vals
            bounds = np.cumsum(nws)[:-1] if len(nws) else []
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "source": pdf["source"].values,
                    "tier": tier,
                    "window": (pdf["window"].values * factor).astype(np.int64),
                    "n_windows": nws.astype(np.int32) if len(nws) else nws,
                    "mins": np.split(col["mins"], bounds),
                    "maxs": np.split(col["maxs"], bounds),
                    "sums": np.split(col["sums"], bounds),
                    "cnts": np.split(col["cnts"], bounds),
                }
            )[[f.name for f in TIER_SCHEMA.fields]]

    return prev.mapInPandas(agg, schema=TIER_SCHEMA)


def fused_tiers(
    seq_df: DataFrame, tiers: tuple[tuple[str, int], ...] = DEFAULT_TIERS
) -> DataFrame:
    """ALL retention tiers in one narrow pass (rows tagged by ``tier``).

    Semantics identical to ``rollup_all_tiers`` — tier k+1 is composed
    from tier k's arrays (min-of-mins / max-of-maxes / sum-of-sums /
    sum-of-cnts) inside the same kernel — but the plan touches the raw
    ``tokens`` exactly once and produces one output, so the pipeline
    needs one write job instead of three chained write+read-backs.
    That read-amplification difference is the scaling-efficiency lever:
    serial per-job overhead happens once.
    """

    def agg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in TIER_SCHEMA.fields]
        for pdf in batches:
            if not len(pdf):
                continue
            arrays = [np.asarray(t) for t in pdf["tokens"]]
            frames = []
            window = 1
            cur = None  # (mins, maxs, sums, cnts, nws)
            for name, factor in tiers:
                window *= factor
                if cur is None:
                    cur = _batch_window_stats(arrays, factor)
                else:
                    mins0, maxs0, sums0, cnts0, nws0 = cur
                    starts, nws, total = _window_starts(nws0, factor)
                    bounds0 = np.cumsum(nws0)[:-1]
                    # previous tier's arrays are already concatenated
                    # batch-wide; reduceat composes them directly
                    cur = (
                        np.minimum.reduceat(mins0, starts) if total else mins0[:0],
                        np.maximum.reduceat(maxs0, starts) if total else maxs0[:0],
                        np.add.reduceat(sums0, starts) if total else sums0[:0],
                        np.add.reduceat(cnts0, starts) if total else cnts0[:0],
                        nws,
                    )
                    del bounds0
                mins, maxs, sums, cnts, nws = cur
                bounds = np.cumsum(nws)[:-1] if len(nws) else []
                frames.append(
                    pd.DataFrame(
                        {
                            "doc_id": pdf["doc_id"].values,
                            "source": pdf["source"].values,
                            "tier": name,
                            "window": np.int64(window),
                            "n_windows": nws.astype(np.int32) if len(nws) else nws,
                            "mins": np.split(mins, bounds),
                            "maxs": np.split(maxs, bounds),
                            "sums": np.split(sums, bounds),
                            "cnts": np.split(cnts, bounds),
                        }
                    )[cols]
                )
            yield pd.concat(frames, ignore_index=True)

    return seq_df.mapInPandas(agg, schema=TIER_SCHEMA)


def rollup_all_tiers(
    seq_df: DataFrame, tiers: tuple[tuple[str, int], ...] = DEFAULT_TIERS
) -> dict[str, DataFrame]:
    """Full cascade. Returns {tier_name: tier_df}. Each tier derives from
    the previous (never recomputed from raw), per the north rule."""
    out: dict[str, DataFrame] = {}
    prev: DataFrame | None = None
    for name, factor in tiers:
        prev = tier1_from_tokens(seq_df, factor, name) if prev is None else cascade_tier(prev, factor, name)
        out[name] = prev
    return out


def tier_points(tier_df: DataFrame) -> DataFrame:
    """Exploded per-window points view (for oracles / downstream SQL):
    (doc_id, source, tier, window, win_no, min_v, max_v, sum_v, cnt, mean_v).
    Mean derived at read: exact int sum / exact int cnt, rounded(6)."""
    z = F.arrays_zip("mins", "maxs", "sums", "cnts").alias("z")
    ex = tier_df.select(
        "doc_id", "source", "tier", "window", F.posexplode(z).alias("win_no", "p")
    )
    return ex.select(
        "doc_id",
        "source",
        "tier",
        "window",
        "win_no",
        F.col("p.mins").alias("min_v"),
        F.col("p.maxs").alias("max_v"),
        F.col("p.sums").alias("sum_v"),
        F.col("p.cnts").alias("cnt"),
        F.round(F.col("p.sums").cast("double") / F.col("p.cnts"), 6).alias("mean_v"),
    )


def source_stats(points: DataFrame) -> DataFrame:
    """Cross-doc per-source tier stats — the only shuffling aggregate, over
    already-reduced tier points (input is ~n_tokens/window rows)."""
    return points.groupBy("source", "tier").agg(
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
        F.sum("sum_v").alias("sum_v"),
        F.sum("cnt").alias("cnt"),
        F.count("*").alias("n_windows"),
    )


def rollup_upsert(
    existing_points: DataFrame,
    delta_seq: DataFrame,
    tiers: tuple[tuple[str, int], ...],
    tier: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental continuous-aggregate maintenance (the TimescaleDB
    refresh semantics the reference's tiers would need under
    re-ingestion): given the materialized tier POINTS of a corpus and a
    delta of re-ingested docs (full replacement token arrays), produce
    the tier points of the updated corpus WITHOUT touching any
    unchanged doc.

    result = existing_points ⟕anti delta_ids  ∪  rollup(delta)

    The anti-join removes EVERY window of a replaced doc (so shrunken
    streams drop their trailing windows — the correctness trap of
    patch-style updates); only the delta is re-rolled, through the same
    zero-shuffle cascade as a full run. At scale the anti-join is a
    broadcast of the delta's doc ids and the write is a dynamic
    partition overwrite of the touched (source, bucket) partitions —
    the plan the pipeline already uses (plans/pipeline.py).

    ``existing_points``/result schema = ``tier_points`` of
    ``rollup_all_tiers(seq, tiers)[tier]``."""
    fresh = tier_points(rollup_all_tiers(delta_seq, tiers)[tier])
    ids = delta_seq.select(F.col(id_col)).distinct()
    kept = existing_points.join(F.broadcast(ids), id_col, "left_anti")
    return kept.unionByName(fresh)
