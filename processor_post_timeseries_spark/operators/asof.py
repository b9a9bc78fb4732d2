"""As-of join — align each left-stream row to the most recent
right-stream row (backward inexact match), the canonical timeseries
alignment operator (reference's channel/sample alignment is positional:
``/root/reference/processor/reader.py:233-244`` reads all channels at
one chunk offset; as-of is the general form when clocks differ).

Spark has no native ASOF JOIN; the naive theta-join
(``l.ts >= r.ts`` + max-per-left) materializes O(|L|·|R|) rows per key.
The scalable shape used here is the **union-marker single-window
pass**: interleave both streams, sort once per key, and carry the last
right-side attributes forward with ``last(..., ignorenulls=True)``.
Cost = ONE shuffle of (|L|+|R|) rows on the join key — the same plan a
sort-merge as-of would produce, expressed with existing operators so
Catalyst/AQE still see a plain window.

At 100 TB: the window partitions by ``by`` (e.g. channel/user), so
parallelism = number of keys; skewed keys are bounded by the streams'
own per-key cardinality (no blow-up beyond the union), and the sort is
the one a sort-merge join would pay anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts: str,
    right_cols: dict[str, str],
    tolerance_us: int | None = None,
    left_ts_alias: str = "ts_l",
    right_ts_alias: str = "ts_r",
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join: for each ``left`` row, attach the latest
    ``right`` row with the same ``by`` key and ``right.ts <= left.ts``.

    * ``right_cols`` maps right column -> output alias.
    * Equal timestamps match (``<=``): the marker sorts right rows
      before left rows at identical ``ts``.
    * Ties among right rows at one timestamp resolve to the row with
      the greatest ``right_tiebreak`` value (pass a unique right
      column, e.g. an event id, for fully deterministic output; without
      it the tie order is partition-dependent).
    * ``tolerance_us`` drops matches older than the tolerance
      (left rows keep a NULL match, as pandas ``merge_asof`` does).

    Returns all left columns + aliased right columns + ``right_ts_alias``.
    """
    lcols = left.columns
    l = left.withColumn("_side", F.lit(1)).withColumn(
        "_rtag", F.lit(None).cast("long")
    )
    for src, dst in right_cols.items():
        l = l.withColumn(dst, F.lit(None).cast(right.schema[src].dataType))
    # right rows contribute only key, ts and the carried columns
    rtag = (
        F.col(right_tiebreak).cast("long")
        if right_tiebreak is not None
        else F.monotonically_increasing_id()
    )
    r = right.select(
        F.col(by),
        F.col(ts),
        F.lit(0).alias("_side"),
        rtag.alias("_rtag"),
        *[F.col(src).alias(dst) for src, dst in right_cols.items()],
    )
    for c in lcols:
        if c not in (by, ts):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l.select(r.columns).unionByName(r.select(r.columns))

    # _side=0 (right) sorts before _side=1 (left) at equal ts => "<=".
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(ts).asc(), F.col("_side").asc(), F.col("_rtag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [F.last(dst, ignorenulls=True).over(w).alias(dst) for dst in right_cols.values()]
    u = u.select(
        *[c for c in u.columns if c not in set(right_cols.values())],
        *carried,
    ).withColumn(right_ts_alias, F.last(F.when(F.col("_side") == 0, F.col(ts)), ignorenulls=True).over(w))

    out = u.filter(F.col("_side") == 1).withColumnRenamed(ts, left_ts_alias)
    if tolerance_us is not None:
        stale = F.col(left_ts_alias) - F.col(right_ts_alias) > F.lit(tolerance_us)
        for dst in list(right_cols.values()) + [right_ts_alias]:
            out = out.withColumn(dst, F.when(stale, F.lit(None)).otherwise(F.col(dst)))
    keep = [c for c in lcols if c != ts] + [left_ts_alias, *right_cols.values(), right_ts_alias]
    return out.select(*keep)
