"""As-of join — align each left-stream row to the nearest right-stream
row (backward / forward / nearest inexact match), the canonical
timeseries alignment operator (reference's channel/sample alignment is
positional: ``/root/reference/processor/reader.py:233-244`` reads all
channels at one chunk offset; as-of is the general form when clocks
differ).

Spark has no native ASOF JOIN; the naive theta-join
(``l.ts >= r.ts`` + max-per-left) materializes O(|L|·|R|) rows per key.
The scalable shape used here is the **union-marker single-window
pass**: interleave both streams, sort once per key, and carry the
bracketing right-side attributes with ``last``/``first`` over
``IGNORE NULLS`` frames. Cost = ONE shuffle of (|L|+|R|) rows on the
join key — the same plan a sort-merge as-of would produce, expressed
with existing operators so Catalyst/AQE still see a plain window.
(``nearest`` resolves both brackets: same single shuffle, two window
sorts over it.)

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
    direction: str = "backward",
) -> DataFrame:
    """As-of join with pandas ``merge_asof`` semantics.

    * ``direction='backward'`` (default): latest right row with
      ``right.ts <= left.ts``; ``'forward'``: earliest right row with
      ``right.ts >= left.ts``; ``'nearest'``: whichever bracket is
      closer, backward winning exact-distance ties.
    * ``right_cols`` maps right column -> output alias.
    * Equal timestamps match in every direction.
    * Ties among right rows at one timestamp resolve deterministically
      by ``right_tiebreak`` (greatest wins backward, smallest wins
      forward); without it the tie order is partition-dependent.
    * ``tolerance_us`` drops matches farther than the tolerance
      (left rows keep a NULL match, as pandas ``merge_asof`` does).

    Returns all left columns + aliased right columns + ``right_ts_alias``.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    lcols = left.columns
    rtag_type = (
        right.schema[right_tiebreak].dataType.simpleString()
        if right_tiebreak is not None
        else "long"
    )
    l = left.withColumn("_side", F.lit(1)).withColumn(
        "_rtag", F.lit(None).cast(rtag_type)
    )
    for src, dst in right_cols.items():
        l = l.withColumn(dst, F.lit(None).cast(right.schema[src].dataType))
    # right rows contribute only key, ts and the carried columns; the
    # tiebreak keeps its own (orderable) type — casting it would turn
    # e.g. string ids into NULLs and silently lose determinism
    rtag = (
        F.col(right_tiebreak)
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

    dsts = list(right_cols.values())
    # The whole right row is carried as ONE struct (non-null for every
    # right row even when its fields are NULL), so all carried attributes
    # come from the SAME matched row — per-column ignorenulls carries
    # would skip a legitimately-NULL field and pair it with a stale value
    # from an older row (attribute tearing).
    right_row = F.when(
        F.col("_side") == 0,
        F.struct(F.col(ts).alias("_rts"), *[F.col(d).alias(d) for d in dsts]),
    )
    need_b = direction in ("backward", "nearest")
    need_f = direction in ("forward", "nearest")
    if need_b:
        # right (_side=0) sorts before left at equal ts => "<=" matches;
        # last() then favors the greatest tiebreak among equal-ts rights
        wb = (
            Window.partitionBy(by)
            .orderBy(F.col(ts).asc(), F.col("_side").asc(), F.col("_rtag").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        u = u.withColumn("_b", F.last(right_row, ignorenulls=True).over(wb))
    if need_f:
        # left sorts before equal-ts rights here, so the following frame
        # still sees them => ">=" matches; first() favors the smallest
        # tiebreak among equal-ts rights
        wf = (
            Window.partitionBy(by)
            .orderBy(F.col(ts).asc(), F.col("_side").desc(), F.col("_rtag").asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        u = u.withColumn("_f", F.first(right_row, ignorenulls=True).over(wf))

    out = u.filter(F.col("_side") == 1)
    if direction == "backward":
        picked = {dst: F.col(f"_b.{dst}") for dst in dsts}
        rts = F.col("_b._rts")
    elif direction == "forward":
        picked = {dst: F.col(f"_f.{dst}") for dst in dsts}
        rts = F.col("_f._rts")
    else:
        lag_b = F.col(ts) - F.col("_b._rts")
        lag_f = F.col("_f._rts") - F.col(ts)
        use_b = F.col("_f._rts").isNull() | (
            F.col("_b._rts").isNotNull() & (lag_b <= lag_f)
        )
        picked = {
            dst: F.when(use_b, F.col(f"_b.{dst}")).otherwise(F.col(f"_f.{dst}"))
            for dst in dsts
        }
        rts = F.when(use_b, F.col("_b._rts")).otherwise(F.col("_f._rts"))
    for dst in dsts:
        out = out.withColumn(dst, picked[dst])
    out = out.withColumn(right_ts_alias, rts).withColumnRenamed(ts, left_ts_alias)

    if tolerance_us is not None:
        lag = F.abs(F.col(left_ts_alias) - F.col(right_ts_alias))
        for dst in [*dsts, right_ts_alias]:
            out = out.withColumn(
                dst, F.when(lag > tolerance_us, F.lit(None)).otherwise(F.col(dst))
            )
    keep = [c for c in lcols if c != ts] + [left_ts_alias, *dsts, right_ts_alias]
    return out.select(*keep)
