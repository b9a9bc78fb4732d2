"""Deduplication operators over the ``documents`` table.

Training-corpus dedup at 100 TB, Spark-first:

* ``exact_dedup`` — hash-groupBy on a content digest. One shuffle on the
  digest; group sizes are tiny, AQE coalesces. The keeper rule (min
  doc_id) is deterministic.
* ``shingles`` / ``ngram_jaccard_pairs`` — exact n-gram Jaccard via the
  inverted-index join (explode shingles, pair docs sharing a shingle,
  |A∩B| by count, |A∪B| = |A|+|B|−|A∩B|). Exact but O(pairs-sharing-a-
  shingle) — at corpus scale this is the *verification* stage run AFTER
  LSH candidate generation, never on the full corpus.
* ``minhash_signatures`` / ``lsh_candidate_pairs`` — MinHash+LSH banding
  (Broder'97 resemblance sketch; banding per Leskovec et al., "Mining of
  Massive Datasets" ch.3). Hashes are ``md5(seed || ':' || shingle)``
  hex-string minima: engine-portable (DuckDB reproduces them verbatim,
  unlike murmur/xxhash), deterministic, and uniformly distributed.
  Scale path: signatures are a narrow agg (one shuffle on doc); band
  buckets shuffle only (band_no, band_hash) pairs; candidate pairs are
  then verified with exact Jaccard on the (small) candidate set.
* ``simhash64`` — Charikar'02 sign-random-projection over word md5 bits,
  vectorized in a pandas UDF (bit tricks are not SQL-expressible; the
  driver records a rows-only check for it).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content-hash groups: (text_hash, n_docs, keeper_id)."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keeper_id"))
    )


def shingles(docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Distinct word n-gram shingles per doc: (doc_id, shingle).

    Built with array expressions (JVM-side, codegen'd): sliding n-gram =
    transform over a 1-based index sequence joining n consecutive words.
    """
    words = F.split(F.col(text_col), " ")
    k = F.size(words) - (n - 1)
    grams = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(
                " ", *[F.element_at(words, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array())
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(F.array_distinct(grams)).alias("shingle"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.8, id_col: str = "doc_id"
) -> DataFrame:
    """Exact pairwise n-gram Jaccard ≥ threshold: (doc_a, doc_b, jaccard).

    Inverted-index pair generation — only doc pairs sharing ≥1 shingle
    are ever materialized (never a cross join). The shingle table is NOT
    cached: at corpus scale it dwarfs RAM, and this op is documented as a
    post-LSH verification stage over a small candidate set anyway.
    """
    sh = shingles(docs, n, id_col=id_col)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a")
    sb = sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b")
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(docs: DataFrame, n_hashes: int = 16, n: int = 3, id_col: str = "doc_id") -> DataFrame:
    """MinHash signature per doc: (doc_id, h00..hNN) — min md5 hex string
    per seeded hash family. Portable across engines (md5 is md5)."""
    sh = shingles(docs, n, id_col=id_col)
    aggs = [
        F.min(F.md5(F.concat_ws(":", F.lit(str(k)), F.col("shingle")))).alias(f"h{k:02d}")
        for k in range(n_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    docs: DataFrame, n_hashes: int = 16, n_bands: int = 4, n: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """LSH banding: docs sharing any band bucket: (doc_a, doc_b, n_bands_shared)."""
    assert n_hashes % n_bands == 0
    r = n_hashes // n_bands
    sig = minhash_signatures(docs, n_hashes, n, id_col=id_col)
    bands = []
    for b in range(n_bands):
        cols = [f"h{b * r + i:02d}" for i in range(r)]
        bands.append(
            sig.select(
                "doc_id",
                F.lit(b).alias("band_no"),
                F.md5(F.concat_ws("|", *cols)).alias("band_hash"),
            )
        )
    allbands = bands[0]
    for b in bands[1:]:
        allbands = allbands.unionByName(b)
    return (
        allbands.alias("a")
        .join(allbands.alias("b"), ["band_no", "band_hash"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_bands_shared"))
    )


_SIMHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("simhash", T.LongType(), False),
    ]
)


def simhash64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over word features (Charikar'02): per word take an
    md5-derived 64-bit fingerprint, sum ±1 per bit position, sign -> bit.
    Vectorized numpy inside mapInPandas; not SQL-expressible."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for doc, text in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in str(text).split(" ") if w]
                if not words:
                    ids.append(str(doc))
                    hashes.append(0)
                    continue
                fps = np.frombuffer(
                    b"".join(hashlib.md5(w.encode()).digest()[:8] for w in set(words)),
                    dtype=np.uint64,
                )
                bits = ((fps[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
                    np.int64
                )
                votes = (2 * bits - 1).sum(axis=0)
                sim = np.uint64(0)
                sim = (votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
                ids.append(str(doc))
                hashes.append(int(sim.sum().astype(np.int64)))
            yield pd.DataFrame({"doc_id": ids, "simhash": pd.array(hashes, dtype="int64")})

    return docs.select(F.col(id_col).cast("string").alias(id_col), text_col).mapInPandas(
        run, schema=_SIMHASH_SCHEMA
    )


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ k, banded on 16-bit
    chunks (a pair within hamming 3 shares at least one of 4 chunks)."""
    sig = simhash64(docs)
    chunks = [
        sig.select(
            "doc_id",
            "simhash",
            F.lit(c).alias("chunk_no"),
            F.shiftright("simhash", 16 * c).bitwiseAND(F.lit(0xFFFF)).alias("chunk"),
        )
        for c in range(4)
    ]
    allc = chunks[0]
    for c in chunks[1:]:
        allc = allc.unionByName(c)
    cand = (
        allc.alias("a")
        .join(allc.alias("b"), ["chunk_no", "chunk"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.withColumn("hamming", hamming).filter(
        F.col("hamming") <= max_hamming
    ).select("doc_a", "doc_b", "hamming")
