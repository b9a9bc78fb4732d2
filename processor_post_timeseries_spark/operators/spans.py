"""Span-level (sub-document) duplication detection — the
exact-substring-dedup signal of LLM data pipelines (Lee et al.,
"Deduplicating Training Data Makes Language Models Better", ACL'22):
doc-level dedup misses boilerplate, licenses, and templates duplicated
INSIDE otherwise-distinct documents.

The reference algorithm builds a corpus-wide suffix array — inherently
single-machine. The Spark-first shape used here is **strided window
hashing**: hash every ``window``-char span starting at positions
1, 1+stride, 1+2·stride, …; a span duplicated across documents shares
window hashes at possibly different phases, and any duplicated run of
length >= window + stride − 1 is GUARANTEED to contain at least one
stride-aligned window in each copy whose content matches a window in
the other (the aligned-window argument of winnowing, SIGMOD'03) —
PROVIDED both copies start at the same phase mod stride or
stride == 1. For phase-robust guarantees choose stride small relative
to window (the default 8 vs 32 detects shared runs >= 39 chars at any
phase with probability 1 for runs containing a common aligned window,
and in practice template duplication is long). ``stride=1`` gives the
exact guarantee at stride-fold cost.

Scale shape: |corpus|/stride window rows, one shuffle on the window
hash (count reduced map-side), then a broadcast-friendly semi-join of
the duplicated-hash set back onto the window rows. No suffix arrays,
no cross-doc comparisons — cost is linear in corpus bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _window_hashes(
    docs: DataFrame, window: int, stride: int, text_col: str, id_col: str
) -> DataFrame:
    """(doc_id, pos, whash) for every strided window. md5 of the raw
    window text: engine-portable (the DuckDB oracle replays it
    verbatim) and collision-safe at any corpus size that fits storage."""
    n = F.length(text_col)
    return (
        docs.filter(n >= window)
        .select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("_t"),
            F.explode(
                F.sequence(F.lit(1), n - window + 1, F.lit(stride))
            ).alias("pos"),
        )
        .select(
            "doc_id",
            "pos",
            F.md5(F.expr(f"substring(_t, pos, {window})")).alias("whash"),
        )
    )


def duplicate_spans(
    docs: DataFrame,
    window: int = 32,
    stride: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Window occurrences whose content appears in MORE THAN ONE doc:
    (doc_id, pos, whash, n_docs). ``n_docs`` counts distinct docs
    sharing the window text. Downstream removal logic merges adjacent
    flagged positions into spans (positions are stride-aligned)."""
    w = _window_hashes(docs, window, stride, text_col, id_col)
    shared = (
        w.select("whash", "doc_id")
        .distinct()
        .groupBy("whash")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )
    return w.join(shared, "whash").select("doc_id", "pos", "whash", "n_docs")


def span_dup_report(
    docs: DataFrame,
    window: int = 32,
    stride: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    decimals: int = 6,
) -> DataFrame:
    """Per-doc span-duplication summary: (doc_id, n_windows,
    n_dup_windows, dup_fraction). Docs shorter than ``window`` have no
    windows and are absent (nothing to test — the decontam convention)."""
    from pyspark.sql.window import Window

    # ONE scan of the window hashes: reduce to per-(hash, doc) counts
    # first (one shuffle over a frame already much smaller than the
    # corpus), derive each hash's distinct-doc count with an analytic
    # window over that reduced frame, then roll up per doc. The naive
    # three-branch plan (sizes/shared/flagged each reading the hash
    # frame) recomputes the strided md5 scan three times.
    wd = (
        _window_hashes(docs, window, stride, text_col, id_col)
        .groupBy("whash", "doc_id")
        .agg(F.count("*").alias("_c"))
        .withColumn("_nd", F.count("*").over(Window.partitionBy("whash")))
    )
    return (
        wd.groupBy("doc_id")
        .agg(
            F.sum("_c").alias("n_windows"),
            F.sum(F.when(F.col("_nd") > 1, F.col("_c")).otherwise(0)).alias(
                "n_dup_windows"
            ),
        )
        .select(
            "doc_id",
            "n_windows",
            "n_dup_windows",
            F.round(F.col("n_dup_windows") / F.col("n_windows"), decimals).alias(
                "dup_fraction"
            ),
        )
    )
