"""M4 visualization downsampling — the width-aware min/max/first/last
aggregation that renders a billion-point channel into w pixel columns
without losing extremes (Jugel et al., VLDB 2014, "M4: A
Visualization-Oriented Time Series Data Aggregation"). The reference's
viewer consumes pre-rolled tiers (processor/pipeline.py); M4 is the
query-time complement for arbitrary zoom widths.

Plan shape: ONE map-side-combined groupBy on (doc, bucket) computing
min/max/min_by/max_by — no window, no sort, linear scan; bucket ids are
a pure projection. At 100 TB this is scan-bound, the optimal shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def m4_downsample(
    seq: DataFrame,
    n_buckets: int,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per doc and pixel bucket: (doc_id, bucket, min_v, max_v, first_v,
    last_v, n) over the token stream. Bucket of sample i (0-based) in a
    doc of n samples = floor(i * n_buckets / n) — the fixed-width pixel
    mapping; docs shorter than ``n_buckets`` simply fill fewer buckets.
    first/last are the values at the bucket's smallest/largest index
    (min_by/max_by — deterministic, indices are unique)."""
    t = F.col(tokens_col)
    pts = seq.filter(F.size(t) > 0).select(
        F.col(id_col), F.size(t).alias("_n"), F.posexplode(t).alias("_i", "v")
    )
    bucket = F.floor(F.col("_i") * F.lit(n_buckets) / F.col("_n")).cast("int")
    return (
        pts.groupBy(id_col, bucket.alias("bucket"))
        .agg(
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
            F.min_by("v", "_i").alias("first_v"),
            F.max_by("v", "_i").alias("last_v"),
            F.count(F.lit(1)).alias("n"),
        )
    )
