"""Similarity search over an embedding column (``array<float>``).

* ``cosine_topk`` — exact brute-force top-k: query set × broadcast(corpus)
  with the dot product as JVM-side array expressions (``zip_with`` +
  ``aggregate`` fold — sequential, deterministic summation order). At
  100 TB the corpus side streams per task while the (small) query set is
  the broadcast; for corpus×corpus use the LSH variant.
* ``lsh_buckets`` / ``ann_lsh_topk`` — random-hyperplane LSH (Charikar'02
  sign sketch). Hyperplanes are deterministic pseudo-planes derived from
  md5 parity (portable to the DuckDB oracle). Buckets bound candidate
  scans: top-k is computed within bucket, trading recall for a
  corpus-size-independent probe cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a, b):
    """Deterministic (left-fold) double dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def with_norm(df: DataFrame, vec: str = "embedding") -> DataFrame:
    return df.withColumn("norm", F.sqrt(_dot(F.col(vec), F.col(vec))))


def cosine_topk(
    emb: DataFrame,
    k: int = 5,
    n_queries: int = 20,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` ids:
    (query_id, neighbor_id, rank, cos_sim). Deterministic: sim rounded
    to 6 dp, ties broken by neighbor id."""
    corpus = with_norm(emb, vec).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec).alias("v_n"), F.col("norm").alias("norm_n")
    )
    queries = (
        with_norm(emb, vec)
        .filter(F.col(id_col) < n_queries)
        .select(F.col(id_col).alias("query_id"), F.col(vec).alias("v_q"), F.col("norm").alias("norm_q"))
    )
    sims = (
        F.broadcast(queries)
        .join(corpus, F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_sim",
            F.round(_dot(F.col("v_q"), F.col("v_n")) / (F.col("norm_q") * F.col("norm_n")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def _plane_sign(p: int, i):
    """Deterministic ±1 from md5 parity of (plane, dim) — portable to SQL:
    +1 iff first hex char of md5('p:i') is 0-7 (i.e. top bit clear)."""
    first = F.substring(F.md5(F.concat_ws(":", F.lit(str(p)), i.cast("string"))), 1, 1)
    return F.when(first.isin(*list("01234567")), F.lit(1.0)).otherwise(F.lit(-1.0))


def lsh_buckets(emb: DataFrame, n_planes: int = 8, vec: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Sign-sketch bucket per vector: (vec_id, bucket) with bucket =
    sum over planes of bit_p * 2^p, bit_p = [dot(plane_p, v) > 0]."""
    out = emb.select(id_col, vec)
    bucket = F.lit(0)
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                F.col(vec),
                F.sequence(F.lit(0), F.size(F.col(vec)) - 1),
                lambda x, i: x.cast("double") * _plane_sign(p, i),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(2**p)).otherwise(F.lit(0))
    return out.withColumn("bucket", bucket.cast("int")).select(id_col, "bucket")


def ann_lsh_topk(
    emb: DataFrame, k: int = 5, n_planes: int = 8, vec: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Approximate top-k: exact cosine ranking *within* LSH bucket."""
    b = lsh_buckets(emb, n_planes, vec, id_col)
    v = with_norm(emb, vec).join(b, id_col)
    a = v.select(
        F.col(id_col).alias("query_id"), F.col(vec).alias("v_q"), F.col("norm").alias("norm_q"), "bucket"
    )
    c = v.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec).alias("v_n"), F.col("norm").alias("norm_n"), "bucket"
    )
    sims = (
        a.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_sim",
            F.round(_dot(F.col("v_q"), F.col("v_n")) / (F.col("norm_q") * F.col("norm_n")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )
