"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the engine's flagship pipeline (documents -> token
sequences -> cascading tier rollup). ``queries``/``oracle_sql`` expose
every implemented operator with a DuckDB-parity oracle (see
``processor_post_timeseries_spark/contract.py`` for the determinism
policy that makes the value hashes match bit-for-bit).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from processor_post_timeseries_spark import contract  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: sequences (tokens = char codes of documents.text) ->
    shuffle-free cascading tier rollup -> exploded tier points."""
    from pyspark.sql import functions as F

    from processor_post_timeseries_spark.operators.rollup import (
        rollup_all_tiers,
        tier_points,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    seq = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.transform(F.split("text", ""), lambda c: F.ascii(c)).alias("tokens"),
        F.length("text").cast("int").alias("n_tok"),
        F.col("source"),
    ).filter(F.col("n_tok") > 0)
    tiers = rollup_all_tiers(seq, (("1s", 16), ("1m", 4), ("1h", 4)))
    return tier_points(tiers["1m"])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return contract.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted => rows-only check)."""
    return contract.oracle_sql()
