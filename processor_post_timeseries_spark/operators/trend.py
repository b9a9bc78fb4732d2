"""Per-channel trend and changepoint statistics, integer-exact.

The reference's analysis phase reduces each channel to scalar
diagnostics before writing (rate inference and its tolerance check,
``/root/reference/processor/reader.py:66-106``); a retention pipeline
additionally wants "did this channel drift / jump, and where" before
rolling up. Both operators below follow the engine's determinism rule:
fixed-point the measure (cents), keep every statistic a pure integer
expression, never divide — so results hash identically across engines
and partitionings.

Both are one ordered window (or one bounded agg) per channel over the
already-long-form series — no corpus-wide shuffle beyond the per-channel
re-key the caller's frame implies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cusum_changepoint(
    series: DataFrame,
    part_col: str,
    ord_col: str,
    val_col: str,
) -> DataFrame:
    """(part, cp_ord, cusum_scaled, n) — the CUSUM changepoint per channel.

    Classic mean-shift CUSUM: the changepoint is the position maximizing
    ``|sum_{i<=k}(v_i - mean)|``. Scaled by n to stay integral:

        C_k = n * prefix_k - k * total        (== n^2 * classic CUSUM_k)

    with ``prefix_k`` the running sum and ``k`` the 1-based position —
    both from ONE ordered running-frame window; ``total``/``n`` join
    back from a bounded per-channel aggregate. The argmax breaks ties
    to the smallest position, so the winner is unique and portable.

    Range: |C_k| <= n * |total| — fits int64 while
    ``n * sum|v| < ~9e18`` per channel (1e5-cent values up to ~1e6
    rows/channel); beyond that, pre-aggregate to a coarser grid first.
    ``val_col`` must be integral.
    """
    w = (
        Window.partitionBy(part_col)
        .orderBy(ord_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pre = series.select(
        F.col(part_col).alias("part"),
        F.col(ord_col).alias("pos"),
        F.sum(F.col(val_col)).over(w).alias("prefix"),
        F.count(F.lit(1)).over(w).alias("k"),
    )
    tot = series.groupBy(F.col(part_col).alias("part")).agg(
        F.sum(F.col(val_col)).alias("total"), F.count("*").alias("n")
    )
    c = pre.join(F.broadcast(tot), "part").select(
        "part",
        "pos",
        "n",
        (F.col("n") * F.col("prefix") - F.col("k") * F.col("total")).alias("c_k"),
    )
    rk = Window.partitionBy("part").orderBy(
        F.desc(F.abs(F.col("c_k"))), F.asc("pos")
    )
    return (
        c.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .select(
            "part",
            F.col("pos").alias("cp_ord"),
            F.col("c_k").alias("cusum_scaled"),
            F.col("n").cast("bigint").alias("n"),
        )
    )


def trend_slope(
    series: DataFrame,
    part_col: str,
    ord_col: str,
    val_col: str,
) -> DataFrame:
    """(part, n, slope_num, slope_den) — OLS slope as an exact fraction.

    Least-squares slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2). The
    division is never performed: numerator and denominator ship as
    exact int64s (consumers divide at display time), so the statistic
    is bit-portable. ``ord_col`` should be a small per-channel offset
    (shift to min first) and ``val_col`` integral: the largest product
    is ``n * Sxy`` — fits int64 while ``n * sum(x*|v|) < ~9e18``
    (minute offsets < 1e5, cents < 1e6, up to ~1e5 rows/channel).

    One map-side-combined aggregate per channel; nothing else.
    """
    x = F.col(ord_col)
    y = F.col(val_col)
    agg = series.groupBy(F.col(part_col).alias("part")).agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    return agg.select(
        "part",
        F.col("n").cast("bigint").alias("n"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("slope_num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("slope_den"),
    )
