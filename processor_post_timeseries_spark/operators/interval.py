"""Interval (range) join — match point rows into ``[start, end)``
intervals WITHOUT an equi-key, the second classic timeseries join Spark
lacks natively (as-of is the first — see ``asof.py``).

The naive plan is a broadcast-nested-loop / cartesian theta-join:
O(|points| x |intervals|) comparisons. The scalable shape used here is
**grid bucketing**: pick a grid cell width, explode each interval into
the cells it covers, bucket each point into its single cell, equi-join
on the cell, then apply the exact containment filter. Each (point,
interval) match is produced exactly once (a point owns one cell), so no
dedup pass is needed.

At 100 TB: cost = one shuffle of points on cell + |interval| x
(width/grid) exploded rows. Choose ``grid_us`` near the median interval
width so intervals explode into O(1) cells; AQE's skew splitting covers
hot cells, and when the interval side is small Catalyst broadcasts it
(the exploded cells DataFrame is still the dimension side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    grid_us: int,
) -> DataFrame:
    """Inner range join: point rows paired with every interval where
    ``start <= ts < end`` (start inclusive, end exclusive — half-open,
    matching the engine's window semantics everywhere else).

    ``ts_col``/``start_col``/``end_col`` are integer epoch-µs columns.
    Column names must not collide between the two inputs (alias first).
    Empty/inverted intervals (``end <= start``) match nothing.
    """
    # cell id = the cell's START TIMESTAMP (ts - pmod(ts, grid)): pure
    # int64 subtraction, so cell assignment is exact for ALL int64 inputs
    # — the earlier floor(ts / grid) went through a double and could land
    # one cell off beyond 2^53, silently dropping/duplicating matches
    # relative to the containment semantics (and the oracle's exact
    # integer division)
    def cell_of(col):
        return col - F.pmod(col, F.lit(grid_us))

    cells = (
        intervals.filter(F.col(end_col) > F.col(start_col))
        .withColumn(
            "_cell",
            F.explode(
                F.sequence(
                    cell_of(F.col(start_col)),
                    cell_of(F.col(end_col) - 1),
                    F.lit(grid_us),
                )
            ),
        )
    )
    pts = points.withColumn("_cell", cell_of(F.col(ts_col)))
    return (
        pts.join(cells, "_cell")
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("_cell")
    )
