"""Sessionization / contiguous-segment detection (operator W1).

Reference semantics: a stream splits where successive timestamp deltas
exceed ``2 × (1/rate)`` (``/root/reference/processor/reader.py:181-225``,
threshold at ``:199``); emitted as half-open ``[start, end)`` ranges.

Spark-first expression: lag-diff flag + running sum over an ordered
window — the classic sessionization idiom. Shuffles once on the key
(unavoidable: segmentation is a per-key ordered computation). For the
streaming twin, ``streaming/stream_rollup.py`` uses ``F.session_window``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(df: DataFrame, key: str, ts: str, gap, tiebreak: list[str] | None = None) -> DataFrame:
    """Add ``seg_id`` (0-based per key): new segment where ts - lag(ts) > gap.

    ``gap`` may be a number (same units as ``ts``) or a Column expression.
    ``tiebreak``: extra order columns so rows with equal ``ts`` get a
    deterministic order (goldens must be partitioning-invariant).
    """
    gap_col = gap if isinstance(gap, Column) else F.lit(gap)
    order = [ts, *(tiebreak or [])]
    w = Window.partitionBy(key).orderBy(*order)
    delta = F.col(ts) - F.lag(ts).over(w)
    flag = F.when(delta > gap_col, 1).otherwise(0)
    return df.withColumn("seg_id", F.sum(flag).over(w).cast("long"))


def segment_bounds(df_with_seg: DataFrame, key: str, ts: str) -> DataFrame:
    """Per-segment extents: (key, seg_id, seg_start, seg_end, n_samples).

    ``seg_end`` follows the reference's half-open convention: last ts + 1
    in index units (``/root/reference/processor/reader.py:222-225`` emits
    ``[start, end)``). For timestamp columns use ``segment_extents``.
    """
    return df_with_seg.groupBy(key, "seg_id").agg(
        F.min(ts).alias("seg_start"),
        (F.max(ts) + F.lit(1)).alias("seg_end"),
        F.count("*").alias("n_samples"),
    )


def segment_extents(df_with_seg: DataFrame, key: str, ts: str) -> DataFrame:
    """Closed-interval extents for arbitrary (e.g. timestamp) axes."""
    return df_with_seg.groupBy(key, "seg_id").agg(
        F.min(ts).alias("seg_start"),
        F.max(ts).alias("seg_end"),
        F.count("*").alias("n_samples"),
    )


def channel_extents(df: DataFrame, key: str, ts: str, value: str) -> DataFrame:
    """Operator A1 — per-channel metadata extents, the reference's
    ``reader.channels`` min/max (``/root/reference/processor/reader.py:146-175``)."""
    return df.groupBy(key).agg(
        F.min(ts).alias("start"),
        F.max(ts).alias("end"),
        F.count("*").alias("n_samples"),
        F.min(value).alias("min_v"),
        F.max(value).alias("max_v"),
    )
