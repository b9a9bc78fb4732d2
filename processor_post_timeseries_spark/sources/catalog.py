"""Catalog seam: Iceberg tables on a configured cluster, plain Parquet
paths in the sandbox — identical engine semantics either way (SURVEY §7).

No Iceberg runtime jar ships in this offline environment, so
``iceberg_available()`` gates the format: when any
``spark.sql.catalog.*`` is configured (a real cluster submitted via
``spark-submit --packages org.apache.iceberg:...``), tables resolve to
catalog identifiers and writes go through Iceberg commits (snapshot
isolation, hidden partitioning); otherwise the same logical tables are
hive-partitioned Parquet directories and the engine's checkpoint table
(plans/lineage.py) supplies the snapshot/manifest role.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    confs = spark.sparkContext.getConf().getAll()
    return any(k.startswith("spark.sql.catalog.") for k, _v in confs)


def read_table(spark: SparkSession, locator: str) -> DataFrame:
    """``locator`` = catalog identifier (``cat.db.tbl``) under Iceberg,
    else a filesystem path of a Parquet table."""
    if iceberg_available(spark) and "/" not in locator:
        return spark.read.format("iceberg").load(locator)
    return spark.read.parquet(locator)


def write_table(
    df: DataFrame,
    locator: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    spark = df.sparkSession
    if iceberg_available(spark) and "/" not in locator:
        w = df.writeTo(locator)
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        (w.createOrReplace() if mode == "overwrite" else w.append())
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(locator)
