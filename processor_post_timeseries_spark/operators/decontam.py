"""Benchmark decontamination — flag training documents that overlap an
evaluation/benchmark set by shared word n-grams (the standard
"13-gram overlap" check of LLM data pipelines, applied here with a
configurable n).

Plan shape at 100 TB: the BENCHMARK side is small by nature (eval sets
are thousands of documents), so its distinct n-gram set is broadcast;
the corpus side explodes its n-grams once (JVM array expressions, see
``dedup.shingles``) and the hit test is a broadcast hash join — the
corpus is never shuffled, and the scan streams. Per-doc hit counts and
ratios come from one partial-aggregated groupBy on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles


def normalize_text(col) -> "F.Column":
    """The standard eval-decontamination normalization: lowercase, map
    every non-alphanumeric run to a single space, trim. Applied to BOTH
    sides before n-gramming so cosmetic differences (case, punctuation,
    extra whitespace) can't hide an overlap. Pure JVM regexp chain —
    replayable verbatim in the DuckDB oracle (which needs the explicit
    'g' flag; Spark replaces globally by default)."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(col), "[^a-z0-9 ]", " "), " +", " "
        )
    )


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_hits: int = 1,
    decimals: int = 6,
    normalize: bool = False,
) -> DataFrame:
    """Per-corpus-doc overlap with the benchmark's n-gram set:
    (doc_id, n_grams, n_hits, contamination_ratio, contaminated).

    * ``n_grams`` — DISTINCT word n-grams in the doc (docs shorter than
      ``n`` words have none and are absent from the report: nothing to
      test).
    * ``n_hits`` — how many of those appear anywhere in the benchmark.
    * ``contaminated`` — ``n_hits >= min_hits``.
    * ``normalize`` — apply :func:`normalize_text` to both sides first
      (the lowercase/punct-strip convention of eval decontamination).
      Note normalization can change a doc's word count, so the report's
      domain (docs with >= n normalized words) shifts accordingly.
    """
    if normalize:
        corpus = corpus.withColumn(text_col, normalize_text(F.col(text_col)))
        benchmark = benchmark.withColumn(text_col, normalize_text(F.col(text_col)))
    cg = shingles(corpus, n=n, text_col=text_col, id_col=id_col)
    bg = (
        shingles(benchmark, n=n, text_col=text_col, id_col=id_col)
        .select("shingle")
        .distinct()
    )
    sizes = cg.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        cg.join(F.broadcast(bg), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        sizes.join(hits, id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("n_grams"), decimals
            ).alias("contamination_ratio"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )
