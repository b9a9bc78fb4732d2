"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Real image/audio decode libraries are absent in this environment, so the
decode kernels are STUBS behind ``PTS_FAKE_DECODE``:

* default: raise ``NotImplementedError`` naming the real dependency —
  the Spark-side plumbing (schema, Arrow batching, partition shape) is
  exactly what production would use; only the innermost numpy call
  changes.
* ``deterministic_fake=True``: derive a seeded fake decode from the
  payload bytes so the distributed path is testable end to end.

Design notes for 100 TB of media: payloads stay in ``BinaryType`` columns
colocated with metadata (never driver-collected); feature extraction is
``mapInPandas`` so each Arrow batch amortizes model/codec setup;
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory
(media rows are MBs, so batches must be small); partition by
``(modality, bucket)`` like every other table in this engine.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("content_sha", T.StringType(), False),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("feat_dim", T.IntegerType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from documents (payload = utf-8 text bytes;
    modality round-robins) — a deterministic stand-in with the exact
    production schema."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        F.concat(F.lit("m-"), F.col("doc_id").cast("string")).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
        payload.alias("payload"),
        F.octet_length(payload).cast("int").alias("n_bytes"),
        F.sha2(payload, 256).alias("content_sha"),
    )


def _decode_stub(payload: bytes, modality: str, deterministic_fake: bool) -> np.ndarray:
    if not deterministic_fake:
        raise NotImplementedError(
            f"real {modality} decode requires Pillow/torchaudio/av — not "
            "installed in this environment; run with deterministic_fake=True"
        )
    # seeded fake: 16 float features derived from the payload digest
    digest = hashlib.sha256(bytes(payload)).digest()
    raw = np.frombuffer(digest, dtype=np.uint16).astype(np.float32)
    return (raw / 65535.0)[:16]


def extract_features(media: DataFrame, deterministic_fake: bool = False) -> DataFrame:
    """Arrow-batched feature extraction (decode -> embed stub)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(p, m, deterministic_fake)
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["n_bytes"],
                    "feat_dim": [len(f) for f in feats],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Video frame-sampling *plan* (pure metadata math, no decode): which
    byte offsets a sampler would decode — demonstrates pushdown-friendly
    planning before any expensive UDF runs."""
    return media.filter(F.col("modality") == "video").select(
        "media_id",
        "n_bytes",
        F.sequence(F.lit(0), F.greatest(F.col("n_bytes") - 1, F.lit(0)), F.lit(every_n_bytes)).alias(
            "sample_offsets"
        ),
    ).withColumn("n_samples", F.size("sample_offsets"))
