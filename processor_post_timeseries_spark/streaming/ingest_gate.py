"""Streaming ingest quality gate — the micro-batch admission filter a
continuously-fed training corpus runs BEFORE documents reach the lake:
benchmark decontamination (``operators/decontam.py``) + quality scoring
(``functions/text.py``) applied per micro-batch, with Spark's streaming
checkpoint giving exactly-once admission.

Why ``foreachBatch`` and not a streaming aggregation: the contamination
join aggregates per doc_id, which as a bare streaming agg would pin
unbounded doc state in the store. Each doc arrives WHOLE in one
micro-batch (documents are rows, not multi-row groups), so per-batch
batch-semantics are exact, state-free, and the benchmark gram set stays
a broadcast — the same plan the batch gate runs, incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import quality_score
from ..operators.decontam import contamination_report

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def gate_batch(
    batch: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    min_quality: float = 0.0,
) -> DataFrame:
    """Pure (testable) gate: admit docs that are NOT contaminated and
    score at least ``min_quality``. Docs too short to have n-grams are
    admitted (nothing to test), mirroring the batch report's domain."""
    rep = contamination_report(batch, benchmark, n=n)
    flagged = rep.filter(F.col("contaminated")).select("doc_id")
    return (
        batch.join(flagged, "doc_id", "left_anti")
        .withColumn("quality", quality_score(F.col("text")))
        .filter(F.col("quality") >= min_quality)
    )


def write_admitted_batch(
    admitted: DataFrame, out_dir: str, batch_id: int
) -> None:
    """Idempotent per-micro-batch sink: each batch lands in its own
    ``out_dir/batch=<id>`` partition with OVERWRITE. foreachBatch gives
    at-least-once delivery — a batch that fails mid-append is replayed
    on restart — so a blind ``append`` would duplicate the rows the
    failed attempt already wrote. Overwriting the batch-id-derived
    directory makes the replay converge to exactly one copy regardless
    of how the previous attempt died."""
    admitted.write.mode("overwrite").parquet(f"{out_dir}/batch={int(batch_id)}")


def dedup_against_admitted(
    spark: SparkSession,
    batch: DataFrame,
    out_dir: str,
    batch_id: int,
    text_col: str = "text",
) -> DataFrame:
    """Cross-micro-batch exact dedup: drop docs whose content hash was
    already admitted in ANY earlier batch. The dedup state IS the sink
    (distinct md5 over ``out_dir``), so it needs no state store, it
    survives restarts for free, and replaying a failed batch
    re-derives the identical decision (the overwrite sink then makes
    the replay a no-op). Also dedups WITHIN the batch (keep min doc_id).

    ``batch_id``'s OWN partition is excluded from the read-back: a
    replayed batch whose previous attempt partially committed files
    into ``out_dir/batch=<id>`` would otherwise see its own rows,
    self-exclude them, and the subsequent overwrite would erase them —
    permanent loss. Excluding the current partition also keeps the scan
    from listing files the same job is about to overwrite.

    Scale note: the read-back scans one column of the admitted corpus
    per micro-batch; at very high admitted volume swap the semi-join
    source for a compacted hash table or a Bloom-filter sidecar the
    sink maintains — the decision rule stays identical."""
    import os

    from pyspark.errors import AnalysisException
    from pyspark.sql.window import Window

    w = Window.partitionBy("_h").orderBy("doc_id")
    batch = (
        batch.withColumn("_h", F.md5(F.col(text_col)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if os.path.isdir(out_dir):
        try:
            seen = (
                spark.read.parquet(out_dir)
                .filter(F.col("batch") != int(batch_id))
                .select(F.md5(F.col(text_col)).alias("_h"))
                .distinct()
            )
            batch = batch.join(seen, "_h", "left_anti")
        except AnalysisException:
            # dir exists but holds no readable parquet yet (first batch):
            # nothing admitted, nothing to exclude. Real storage errors
            # are NOT caught — silently skipping dedup would let
            # duplicates into the lake.
            pass
    return batch.drop("_h")


def run_ingest_gate_available_now(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    benchmark: DataFrame,
    n: int = 5,
    min_quality: float = 0.0,
    dedupe: bool = False,
):
    """readStream(documents parquet) -> per-batch gate -> per-batch
    overwrite parquet (``out_dir/batch=<id>``), trigger availableNow.

    Exactly-once admission = the streaming checkpoint (completed batches
    are never re-run on a clean restart) PLUS the idempotent per-batch
    sink (a batch replayed after a mid-write failure overwrites its own
    partition instead of appending a second copy). Readers scan
    ``out_dir`` as one partitioned dataset; ``batch`` appears as a
    partition column."""
    src = spark.readStream.schema(DOC_SCHEMA).parquet(in_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        admitted = gate_batch(batch_df, benchmark, n=n, min_quality=min_quality)
        if dedupe:
            admitted = dedup_against_admitted(spark, admitted, out_dir, batch_id)
        write_admitted_batch(admitted, out_dir, batch_id)

    return (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
