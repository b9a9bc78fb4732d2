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
    name: Column,
    start_us: Column,
    end_us: Column,
    rate: Column,
    group: Column,
    channel_type: Column | None = None,
    last_annotation: Column | None = None,
    properties: Column | None = None,
    id: Column | None = None,  # noqa: A002 - reference field name
) -> Column:
    """Reference channel-metadata JSON (S6), full ``as_dict`` field set:
    ``/root/reference/processor/timeseries_channel.py:37-53`` — fixed
    unit 'uV', trimmed name/group, ``lastAnnotation`` default 0,
    ``properties`` default ``[]`` (typed here as key/value structs), and
    ``id`` appended last and OMITTED when null (Spark's to_json drops
    null fields, matching the reference's conditional ``resp["id"]``)."""
    if channel_type is None:
        channel_type = F.lit("CONTINUOUS")
    if last_annotation is None:
        last_annotation = F.lit(0).cast("bigint")
    if properties is None:
        properties = F.array().cast(_PROPS_TYPE)
    fields = [
        F.trim(name).alias("name"),
        start_us.cast("bigint").alias("start"),
        end_us.cast("bigint").alias("end"),
        F.lit("uV").alias("unit"),
        rate.alias("rate"),
        F.upper(channel_type).alias("type"),
        F.trim(group).alias("group"),
        last_annotation.cast("bigint").alias("lastAnnotation"),
        F.coalesce(properties, F.array().cast(_PROPS_TYPE)).alias("properties"),
    ]
    if id is not None:
        fields.append(id.alias("id"))
    return F.to_json(F.struct(*fields))


_PROPS_TYPE = "array<struct<key:string,value:string>>"

# parse schema accepts BOTH spellings of the type field — the reference
# ingests API payloads carrying ``channelType`` and files carrying
# ``type`` (timeseries_channel.py:63: channelType wins when both exist)
CHANNEL_JSON_SCHEMA = (
    # start/end/lastAnnotation parsed as strings then cast: the reference
    # coerces with int(...) so quoted numbers ("start": "100") must work
    "name string, start string, end string, unit string, rate double, "
    "type string, channelType string, group string, lastAnnotation string, "
    f"properties {_PROPS_TYPE}, id string"
)


def channel_from_json(j: Column) -> Column:
    """``from_dict``-equivalent ingest (S6/P12 parity): parse a channel
    metadata JSON string into a normalized struct, applying the
    reference's alias + defaulting rules
    (``/root/reference/processor/timeseries_channel.py:55-69``):

    * ``channelType`` beats ``type`` when both present;
    * type upper-cased; ``type_valid`` flags CONTINUOUS/UNIT (the
      reference asserts — a declarative engine surfaces the flag so the
      caller can fail the batch);
    * ``lastAnnotation`` defaults to 0, ``properties`` to ``[]``;
    * ``unit`` in the payload is ignored (always uV), ``id`` optional;
    * ``index`` is not serialized — restored as -1.
    """
    p = F.from_json(j, CHANNEL_JSON_SCHEMA)
    typ = F.upper(F.coalesce(p["channelType"], p["type"]))
    return F.struct(
        F.lit(-1).alias("index"),
        F.trim(p["name"]).alias("name"),
        p["rate"].alias("rate"),
        p["start"].cast("bigint").alias("start"),
        p["end"].cast("bigint").alias("end"),
        typ.alias("type"),
        typ.isin("CONTINUOUS", "UNIT").alias("type_valid"),
        F.trim(p["group"]).alias("group"),
        F.coalesce(p["lastAnnotation"].cast("bigint"), F.lit(0)).alias("last_annotation"),
        F.coalesce(p["properties"], F.array().cast(_PROPS_TYPE)).alias("properties"),
        p["id"].alias("id"),
    )


def channels_equal(
    name_a: Column, type_a: Column, rate_a: Column,
    name_b: Column, type_b: Column, rate_b: Column,
) -> Column:
    """Reference channel equality (timeseries_channel.py:71-80): names and
    types casefold-equal, rates within a strict 2% ratio band."""
    return (
        (F.lower(name_a) == F.lower(name_b))
        & (F.lower(type_a) == F.lower(type_b))
        & (F.abs(F.lit(1.0) - rate_a / rate_b) < 0.02)
    )
