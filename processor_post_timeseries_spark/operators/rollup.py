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


def tier1_from_tokens(seq_df: DataFrame, window: int, tier: str = "1s") -> DataFrame:
    """Raw -> first tier. Narrow map: no shuffle, no explode."""

    def agg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "source", "n_windows", "mins", "maxs", "sums", "cnts")}
            for doc, src, toks in zip(pdf["doc_id"], pdf["source"], pdf["tokens"]):
                a = np.asarray(toks, dtype=np.int64)
                mins = _window_reduce(a, window, np.min)
                maxs = _window_reduce(a, window, np.max)
                sums = _window_reduce(a, window, np.sum)
                n = len(a)
                nw = len(mins)
                cnts = np.full(nw, window, dtype=np.int64)
                if nw and n % window:
                    cnts[-1] = n % window
                out["doc_id"].append(doc)
                out["source"].append(src)
                out["n_windows"].append(nw)
                out["mins"].append(mins)
                out["maxs"].append(maxs)
                out["sums"].append(sums)
                out["cnts"].append(cnts)
            res = pd.DataFrame(out)
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
            rows = []
            for r in pdf.itertuples(index=False):
                mins = _window_reduce(np.asarray(r.mins, np.int64), factor, np.min)
                maxs = _window_reduce(np.asarray(r.maxs, np.int64), factor, np.max)
                sums = _window_reduce(np.asarray(r.sums, np.int64), factor, np.sum)
                cnts = _window_reduce(np.asarray(r.cnts, np.int64), factor, np.sum)
                rows.append(
                    (r.doc_id, r.source, tier, r.window * factor, len(mins), mins, maxs, sums, cnts)
                )
            yield pd.DataFrame(rows, columns=[f.name for f in TIER_SCHEMA.fields])

    return prev.mapInPandas(agg, schema=TIER_SCHEMA)


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
