"""Structured Streaming wrappers (SURVEY.md §2.9).

The reference is strictly batch (one file in, files out —
``/root/reference/processor/main.py:26`` asserts a single input), so
streaming is an engine extension, not parity work. Two wrappers:

* ``stream_rollup_available_now`` — incremental batch: new sequence files
  landing in a directory are rolled up to tier-1 aggregates exactly once
  per trigger (``availableNow``), checkpointed by Spark's own streaming
  checkpoint. This is how the 100 TB pipeline ingests continuously: the
  rollup is a narrow map, so the stream never needs state.
* ``stream_sessionize`` — the reference's gap detection (W1) as its
  streaming twin: ``session_window(ts, gap)`` + watermark for late data.
  Needs state; Spark's session-window state store handles it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.rollup import tier1_from_tokens
from ..sources.synth import SEQ_SCHEMA


def stream_rollup_available_now(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: int = 100,
    tier: str = "1s",
):
    """readStream(sequences parquet) -> tier1 -> writeStream(parquet),
    trigger availableNow (process the backlog, then stop). Returns the
    started StreamingQuery; caller awaits termination."""
    src = spark.readStream.schema(SEQ_SCHEMA).parquet(in_dir)
    tiers = tier1_from_tokens(src, window, tier)
    return (
        tiers.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_sessionize(
    events: DataFrame,
    ts_col: str = "ts",
    key: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming W1: per-key session windows with late-data watermark.
    Works on both streaming and batch DataFrames (batch = exact result,
    used by tests to cross-check against the lag/cumsum sessionizer)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(key), F.session_window(F.col(ts_col), gap))
        .agg(
            F.count("*").alias("n_samples"),
            F.min(ts_col).alias("seg_start"),
            F.max(ts_col).alias("seg_end"),
        )
        .select(
            key,
            "n_samples",
            F.unix_micros(F.col("seg_start").cast("timestamp")).alias("seg_start_us"),
            F.unix_micros(F.col("seg_end").cast("timestamp")).alias("seg_end_us"),
        )
    )
