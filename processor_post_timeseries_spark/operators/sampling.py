"""Deterministic sampling operators for training-data curation.

``df.sample()`` is seed-dependent per partition layout — re-running the
same job over a re-bucketed corpus draws a DIFFERENT sample, which
poisons dataset reproducibility. These operators derive the sample from
content hashes instead, so the same corpus always yields the same
sample regardless of partitioning, cluster size, or Spark version.

* ``stratified_sample`` — exact per-stratum quota: the ceil(n·num/den)
  rows with the smallest ``md5(id)`` per stratum. One shuffle on the
  stratum key; the per-stratum sort is the window sort. Quota uses
  integer arithmetic (``(n·num + den − 1) div den``) so the oracle's
  arithmetic is bit-identical (no float ceil drift).
* ``hash_sample`` — stateless Bernoulli-style: keep rows whose hash
  bucket falls under the rate. Zero shuffles — a pure filter that
  pushes into the scan — and stable under corpus growth (a row's
  membership never changes when other rows appear).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    num: int,
    den: int,
) -> DataFrame:
    """Exact deterministic stratified sample of num/den per stratum:
    (strata, id, sample_rank) for the quota rows with the smallest
    (md5(id), id) per stratum. Quota = ceil(stratum_size * num / den),
    so every non-empty stratum contributes at least one row."""
    w_rank = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    w_all = Window.partitionBy(strata_col)
    return (
        df.select(strata_col, id_col)
        .withColumn("sample_rank", F.row_number().over(w_rank))
        .withColumn("_n", F.count(F.lit(1)).over(w_all))
        .filter(F.col("sample_rank") <= F.expr(f"(_n * {num} + {den - 1}) div {den}"))
        .drop("_n")
    )


def hash_sample(
    df: DataFrame, id_col: str, num: int, den: int, salt: str = ""
) -> DataFrame:
    """Stateless content-hash sample: keep rows where the first 8 hex
    digits of md5(salt || id), read as an integer, fall in the lowest
    num/den fraction of the 32-bit space. No shuffle; membership is a
    pure function of the row id."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    return df.filter(h * den < F.lit(num) * F.lit(4294967296))
