"""End-to-end resumable rollup pipeline: sequences -> blocks + tier tables.

The engine's flagship plan (reference lifecycle §3.1 re-expressed):

    sequences (doc_id, tokens, n_tok, source)
      -> salt bucket (partitioning.with_bucket)
      -> [stage blocks]  DoD-compress fixed-size blocks, write
         partitionBy(source, bucket)                    (narrow map)
      -> [stage tier_*]  cascading continuous aggregates raw->1s->1m->1h,
         each tier written partitionBy(source, bucket)  (narrow maps)
      -> checkpoint rows per (source, bucket) per stage (lineage.py)

Every stage is independently resumable: inputs are filtered through the
checkpoint anti-join, outputs land with dynamic partition overwrite
(idempotent re-write), lineage is computed from read-back files.

Shuffle census at 100 TB: ZERO wide dependencies in the whole pipeline —
blocks and every tier are per-row maps after the one optional
``repartition(source, bucket)`` used to shape output files. The only
shuffles in the system are (a) that explicit repartition, (b) cross-doc
summary stats (tiny), (c) lineage groupBys over already-reduced outputs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.blocks import to_blocks
from ..operators.partitioning import DEFAULT_BUCKETS, with_bucket
from ..operators.rollup import DEFAULT_TIERS, cascade_tier, tier1_from_tokens
from . import lineage


@dataclass
class PipelineConfig:
    out_dir: str
    block_size: int = 131_072
    n_buckets: int = DEFAULT_BUCKETS
    tiers: tuple = DEFAULT_TIERS
    run_id: str = field(default_factory=lineage.new_run_id)
    resume: bool = True


def _write_stage(
    spark: SparkSession,
    cfg: PipelineConfig,
    stage: str,
    df: DataFrame,
    key_cols: list[str] = ("source", "bucket"),
) -> DataFrame:
    """Write one stage partition-first + record lineage from read-back.

    Lineage rows cover only the partitions THIS run wrote (a resumed run
    must not re-attribute earlier runs' partitions), so the read-back is
    semi-joined on the just-written keys — a broadcast of a tiny key set,
    and the parquet scan prunes to those partitions.
    """
    path = f"{cfg.out_dir}/{stage}"
    key_cols = list(key_cols)
    df.write.mode("overwrite").partitionBy(*key_cols).parquet(path)
    keys = df.select(*key_cols).distinct()
    written = spark.read.parquet(path)
    lineage.record_stage(
        spark, cfg.out_dir, stage, written, key_cols, cfg.run_id, only_keys=keys
    )
    return written


def run_pipeline(spark: SparkSession, seq_df: DataFrame, cfg: PipelineConfig) -> dict[str, str]:
    """Execute all stages (skipping checkpointed partitions). Returns
    {stage: output_path}."""
    seq = with_bucket(seq_df, cfg.n_buckets)
    out: dict[str, str] = {}

    # -- stage: blocks --------------------------------------------------
    stage = "blocks"
    pending = lineage.pending_only(seq, spark, cfg.out_dir, stage, ["source", "bucket"]) if cfg.resume else seq
    if not pending.isEmpty():
        blocks = to_blocks(pending.drop("bucket"), cfg.block_size)
        blocks = with_bucket(blocks, cfg.n_buckets).repartition("source", "bucket")
        _write_stage(spark, cfg, stage, blocks)
    out[stage] = f"{cfg.out_dir}/{stage}"

    # -- stages: tier cascade -------------------------------------------
    prev: DataFrame | None = None
    for name, factor in cfg.tiers:
        stage = f"tier_{name}"
        src = seq if prev is None else prev
        pending = (
            lineage.pending_only(src, spark, cfg.out_dir, stage, ["source", "bucket"])
            if cfg.resume
            else src
        )
        if not pending.isEmpty():
            if prev is None:
                tier = tier1_from_tokens(pending.drop("bucket"), factor, name)
                tier = with_bucket(tier, cfg.n_buckets)
            else:
                # mapInPandas re-projects to TIER_SCHEMA; re-derive the
                # (deterministic) bucket for the sink partitioning
                tier = with_bucket(cascade_tier(pending, factor, name), cfg.n_buckets)
            _write_stage(spark, cfg, stage, tier)
        written = spark.read.parquet(f"{cfg.out_dir}/{stage}")
        out[stage] = f"{cfg.out_dir}/{stage}"
        prev = written

    return out


def pipeline_metrics(spark: SparkSession, out_dir: str) -> DataFrame:
    """Checkpoint-table metrics view: rows/checksums per stage+partition."""
    return lineage.read_checkpoint(spark, out_dir).orderBy("stage", "partition_key")
