"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Optional-dependency decode seam (the ``sources/nwb.py`` pattern): real
codecs are TRY-IMPORTED at module load — Pillow for images, PyAV for
audio/video — and the kernels use them when present. When a codec is
absent (this sandbox has neither; verified):

* default: raise ``NotImplementedError`` naming the real dependency —
  the Spark-side plumbing (schema, Arrow batching, partition shape) is
  exactly what production runs; only the innermost decode call changes.
* ``deterministic_fake=True``: derive a seeded fake decode from the
  payload bytes so the distributed path is testable end to end.

Feature semantics with real codecs (deterministic, no ML model — the
embedding-model seam is the ``features`` column contract itself):
images decode -> grayscale 4×4 grid means; audio -> RMS over 16 equal
sample chunks; video -> up to 4 sampled frames × 2×2 grid means. All
16-dim float32 in [0, 1], matching the fake's shape.

Design notes for 100 TB of media: payloads stay in ``BinaryType`` columns
colocated with metadata (never driver-collected); feature extraction is
``mapInPandas`` so each Arrow batch amortizes model/codec setup;
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory
(media rows are MBs, so batches must be small); partition by
``(modality, bucket)`` like every other table in this engine.
"""

from __future__ import annotations

import hashlib
import io
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # optional dependency — see module docstring
    from PIL import Image as _PILImage  # type: ignore
except ImportError:  # pragma: no cover - exercised when Pillow is absent
    _PILImage = None

try:  # optional dependency — see module docstring
    import av as _av  # type: ignore
except ImportError:  # pragma: no cover - exercised when PyAV is absent
    _av = None

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


_NEEDS = {"image": "Pillow", "audio": "PyAV (av)", "video": "PyAV (av)"}


def _grid_means(gray: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """Mean over an rows×cols grid of a 2-D array — deterministic image
    features without any resampling codec dependence."""
    out = np.empty(rows * cols, dtype=np.float32)
    for i, r in enumerate(np.array_split(gray, rows, axis=0)):
        for j, c in enumerate(np.array_split(r, cols, axis=1)):
            out[i * cols + j] = float(c.mean()) if c.size else 0.0
    return out


def decode_image(payload: bytes) -> np.ndarray:
    """Pillow decode -> HxWx3 uint8 RGB array. Raises the documented
    NotImplementedError when Pillow is absent."""
    if _PILImage is None:
        raise NotImplementedError(
            "real image decode requires Pillow — not installed in this "
            "environment; run with deterministic_fake=True"
        )
    with _PILImage.open(io.BytesIO(bytes(payload))) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def _image_features(payload: bytes) -> np.ndarray:
    rgb = decode_image(payload)
    gray = rgb.astype(np.float32).mean(axis=2)
    return np.clip(_grid_means(gray, 4, 4) / 255.0, 0.0, 1.0).astype(np.float32)


def _frame_to_mono(frame) -> np.ndarray:
    """Downmix one PyAV audio frame to mono, handling BOTH layouts
    ``to_ndarray()`` can return: planar formats give (channels, samples)
    — average across axis 0 — while PACKED formats (e.g. s16) give
    (1, samples*channels) interleaved, where a naive ``mean(axis=0)``
    is a no-op that leaves channels interleaved in time. Packed frames
    are de-interleaved by reshaping to (samples, channels) first."""
    arr = frame.to_ndarray().astype(np.float64)
    if arr.ndim == 1:
        arr = arr[None, :]
    nch = len(frame.layout.channels)
    if nch > 1 and arr.shape[0] == 1 and not frame.format.is_planar:
        arr = arr.reshape(-1, nch).T
    return arr.mean(axis=0)


def _audio_features(payload: bytes) -> np.ndarray:
    if _av is None:
        raise NotImplementedError(
            "real audio decode requires PyAV (av) — not installed in this "
            "environment; run with deterministic_fake=True"
        )
    with _av.open(io.BytesIO(bytes(payload))) as container:
        frames = [
            _frame_to_mono(f) for f in container.decode(audio=0)
        ]
    samples = np.concatenate(frames) if frames else np.zeros(16)
    chunks = np.array_split(samples, 16)
    rms = np.array(
        [np.sqrt(np.mean(np.square(c))) if c.size else 0.0 for c in chunks],
        dtype=np.float32,
    )
    peak = float(rms.max()) or 1.0
    return (rms / peak).astype(np.float32)


def _video_features(payload: bytes, max_frames: int = 4) -> np.ndarray:
    if _av is None:
        raise NotImplementedError(
            "real video decode requires PyAV (av) — not installed in this "
            "environment; run with deterministic_fake=True"
        )
    feats = []
    with _av.open(io.BytesIO(bytes(payload))) as container:
        for i, frame in enumerate(container.decode(video=0)):
            if len(feats) >= max_frames:
                break
            gray = frame.to_ndarray(format="gray").astype(np.float32)
            feats.append(_grid_means(gray, 2, 2) / 255.0)
    out = np.zeros(16, dtype=np.float32)
    if feats:
        flat = np.concatenate(feats)[:16]
        out[: len(flat)] = np.clip(flat, 0.0, 1.0)
    return out


def _decode_stub(payload: bytes, modality: str, deterministic_fake: bool) -> np.ndarray:
    if not deterministic_fake:
        raise NotImplementedError(
            f"real {modality} decode requires {_NEEDS.get(modality, 'a codec')} "
            "— not installed in this environment; run with "
            "deterministic_fake=True"
        )
    # seeded fake: 16 float features derived from the payload digest
    digest = hashlib.sha256(bytes(payload)).digest()
    raw = np.frombuffer(digest, dtype=np.uint16).astype(np.float32)
    return (raw / 65535.0)[:16]


def _features_one(payload: bytes, modality: str, deterministic_fake: bool) -> np.ndarray:
    """Real decode when the codec import succeeded, else the stub path
    (fake if requested, documented NotImplementedError otherwise)."""
    if modality == "image" and _PILImage is not None:
        return _image_features(payload)
    if modality == "audio" and _av is not None:
        return _audio_features(payload)
    if modality == "video" and _av is not None:
        return _video_features(payload)
    return _decode_stub(payload, modality, deterministic_fake)


def extract_features(media: DataFrame, deterministic_fake: bool = False) -> DataFrame:
    """Arrow-batched feature extraction: decode (real codec when
    importable — module docstring) -> deterministic 16-dim features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _features_one(p, m, deterministic_fake)
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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("rgb", T.BinaryType(), False),  # raw H*W*3 uint8
    ]
)


def resize_images(media: DataFrame, height: int, width: int) -> DataFrame:
    """Decode + bilinear-resize every image payload to (height, width),
    emitting raw RGB bytes — the normalize-before-embed step of a
    vision training pipeline. Pillow-gated like ``decode_image``; the
    mapInPandas plumbing (schema, batching, partition shape) is the
    production path either way."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if _PILImage is None:
                    raise NotImplementedError(
                        "resize_images requires Pillow — not installed in "
                        "this environment"
                    )
                with _PILImage.open(io.BytesIO(bytes(payload))) as im:
                    small = im.convert("RGB").resize(
                        (width, height), _PILImage.BILINEAR
                    )
                rows.append(
                    (mid, height, width, np.asarray(small, np.uint8).tobytes())
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZED_SCHEMA.fields]
            )

    return media.filter(F.col("modality") == "image").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


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
