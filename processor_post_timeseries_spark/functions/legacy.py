"""Byte-exact legacy block format of the reference processor.

A user of the reference can switch to this engine and still produce
``.bin.gz`` payloads with bit-identical *decompressed content* (and
deterministic container bytes: gzip mtime pinned to 0) plus identical
object keys:

* payload: values as **big-endian float64**, gzip-compressed at level 0
  (framing only, speed over ratio) — semantics from
  ``/root/reference/processor/writer.py:73-99`` (endianness at
  ``:87-88`` via ``/root/reference/processor/utils.py:16-20``, gzip at
  ``:98-99``); special floats pass through byte-exact (their
  ``tests/test_writer.py:300-317`` golden).
* key: ``channel-{index:05d}_{start_us}_{end_us}.bin.gz`` with µs int
  bounds (``/root/reference/processor/writer.py:90-95``,
  ``constants.py:1``).

Exposed as a pandas UDF so the modern pipeline can emit legacy-format
blocks where a consumer still expects them.
"""

from __future__ import annotations

import gzip

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

GZIP_LEVEL = 0  # reference: compresslevel=0, framing only


def encode_legacy_block(values: np.ndarray) -> bytes:
    """float64 array -> big-endian bytes -> gzip(level 0).

    ``mtime=0`` pins the gzip header so identical inputs yield identical
    bytes (content-hash dedup / lineage checksums depend on it). The
    reference's ``gzip.open`` embeds FNAME+mtime in its header, so parity
    with reference files is decompressed-content-exact, not container-
    byte-exact."""
    be = np.ascontiguousarray(np.asarray(values, dtype=np.float64)).astype(">f8")
    return gzip.compress(be.tobytes(), compresslevel=GZIP_LEVEL, mtime=0)


def decode_legacy_block(payload: bytes) -> np.ndarray:
    return np.frombuffer(gzip.decompress(bytes(payload)), dtype=">f8").astype(np.float64)


@F.pandas_udf(T.BinaryType())
def legacy_encode(values: pd.Series) -> pd.Series:
    return values.apply(lambda a: encode_legacy_block(np.asarray(a, np.float64)))


@F.pandas_udf(T.ArrayType(T.DoubleType()))
def legacy_decode(payload: pd.Series) -> pd.Series:
    return payload.apply(lambda b: decode_legacy_block(b))


def legacy_key(index: Column, start_us: Column, end_us: Column) -> Column:
    """``channel-%05d_%d_%d.bin.gz`` (reference writer.py:90-95)."""
    return F.format_string("channel-%05d_%d_%d.bin.gz", index, start_us, end_us)


def legacy_metadata_key(index: Column) -> Column:
    """``channel-%05d.metadata.json`` (reference constants.py:2)."""
    return F.format_string("channel-%05d.metadata.json", index)


def channel_metadata_json(
    name: Column, start_us: Column, end_us: Column, rate: Column, group: Column
) -> Column:
    """Reference channel-metadata JSON shape (S6):
    ``/root/reference/processor/timeseries_channel.py:37-53`` — fixed
    unit 'uV', CONTINUOUS type, trimmed name."""
    return F.to_json(
        F.struct(
            F.trim(name).alias("name"),
            start_us.alias("start"),
            end_us.alias("end"),
            F.lit("uV").alias("unit"),
            rate.alias("rate"),
            F.lit("CONTINUOUS").alias("type"),
            group.alias("group"),
            F.lit(None).cast("string").alias("lastAnnotation"),
        )
    )
