"""Sequence packing — mapping variable-length token documents into
fixed-length training examples (the GPT-style concat-and-chunk
convention: concatenate a source's documents in deterministic order,
cut the stream every ``ctx_len`` tokens; a document may straddle block
boundaries). The planning op every training-data pipeline needs between
"curated corpus" and "batched examples".

Spark-first shape: the only wide operation is ONE per-source window
cumsum (exclusive running total of ``n_tok`` ordered by ``doc_id``) —
the same per-key sort any deterministic packing must pay. Block spans
then come from integer arithmetic, and the per-block manifest is a JVM
``sequence`` explode (a doc touches ``ceil`` of its span, almost always
1-2 blocks). No global ordering: packing is per ``source``, which is
both the scalable choice (parallelism = sources × AQE splits) and the
semantically right one (mixtures are composed per-source upstream — see
``sampling.hash_sample`` for rate control).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_offsets(
    seq: DataFrame,
    ctx_len: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    n_col: str = "n_tok",
) -> DataFrame:
    """Per-doc packed placement: (source, doc_id, n_tok, offset,
    first_block, last_block). ``offset`` is the exclusive running sum of
    token counts within the source (doc_id order); blocks are
    ``ctx_len``-token chunks of the concatenated stream. Zero-token docs
    contribute nothing and are dropped (they have no placement)."""
    w = (
        Window.partitionBy(source_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    off = (F.sum(n_col).over(w) - F.col(n_col)).cast("long")
    return (
        seq.filter(F.col(n_col) > 0)
        .select(
            F.col(source_col).alias("source"),
            F.col(id_col).alias("doc_id"),
            F.col(n_col).cast("long").alias("n_tok"),
            off.alias("offset"),
        )
        # integer `div`, not double `/`: offsets at trillion-token scale
        # pass 2^53 and a through-a-double quotient can land one block
        # off (the same exactness rule interval.py/resample.py follow)
        .withColumn("first_block", F.expr(f"offset div {ctx_len}"))
        .withColumn("last_block", F.expr(f"(offset + n_tok - 1) div {ctx_len}"))
    )


def pack_manifest(
    seq: DataFrame,
    ctx_len: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    n_col: str = "n_tok",
) -> DataFrame:
    """Per-(block, doc) assembly manifest: (source, block_id, doc_id,
    doc_start, block_off, n_in_block) — exactly which token slice
    ``[doc_start, doc_start + n_in_block)`` of each doc lands at
    ``block_off`` inside each block. The union of slices tiles every
    block of a source densely except the final partial block. A worker
    materializing block b reads only the manifest rows of b — packing
    becomes an ordinary partition-pruned join against the sequence
    table."""
    p = pack_offsets(seq, ctx_len, source_col, id_col, n_col)
    blocks = F.explode(F.sequence("first_block", "last_block")).alias("block_id")
    b = p.select("source", "doc_id", "n_tok", "offset", blocks)
    bstart = F.col("block_id") * ctx_len
    bend = bstart + ctx_len
    gstart = F.greatest(bstart, F.col("offset"))  # global slice bounds
    gend = F.least(bend, F.col("offset") + F.col("n_tok"))
    return b.select(
        "source",
        "block_id",
        "doc_id",
        (gstart - F.col("offset")).alias("doc_start"),
        (gstart - bstart).alias("block_off"),
        (gend - gstart).alias("n_in_block"),
    )


def materialize_blocks(
    seq: DataFrame,
    ctx_len: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    n_col: str = "n_tok",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Assemble the actual packed training blocks: (source, block_id,
    n_tokens, tokens) with each block's token array concatenated from
    its manifest slices in ``block_off`` order. Every block is exactly
    ``ctx_len`` tokens except each source's final partial block.

    Plan: manifest join back to the sequence table (shuffle on doc_id,
    the only corpus-sized exchange), per-row ``slice`` of the token
    array (JVM expr), then a per-block ordered reassembly —
    ``array_sort(collect_list(struct(block_off, slice)))`` is the same
    deterministic in-group ordering contract as ``blocks.from_blocks``.
    Block rows are bounded by ``ctx_len`` tokens, so group state is
    constant-size regardless of corpus."""
    man = pack_manifest(seq, ctx_len, source_col, id_col, n_col)
    j = man.join(
        seq.select(F.col(id_col).alias("doc_id"), F.col(tokens_col).alias("_t")),
        "doc_id",
    ).select(
        "source",
        "block_id",
        "block_off",
        F.expr("slice(_t, doc_start + 1, n_in_block)").alias("_sl"),
    )
    return (
        j.groupBy("source", "block_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("block_off", "_sl"))),
                    lambda s: s["_sl"],
                )
            ).alias("tokens")
        )
        .select(
            "source",
            "block_id",
            F.size("tokens").cast("long").alias("n_tokens"),
            "tokens",
        )
    )
