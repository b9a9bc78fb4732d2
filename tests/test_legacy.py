"""Byte-exact parity with the reference's writer goldens
(cf. /root/reference/tests/test_writer.py:60-108, 239-264, 300-317 —
reimplemented independently against the published format)."""

from __future__ import annotations

import gzip

import numpy as np

from processor_post_timeseries_spark.functions.legacy import (
    decode_legacy_block,
    encode_legacy_block,
)


def test_roundtrip_exact_float64():
    v = np.array([1.1234567890123456, -2.5, 0.0, 1e308, 5e-324])
    out = decode_legacy_block(encode_legacy_block(v))
    assert out.tolist() == v.tolist()  # full float64 precision


def test_payload_is_big_endian_f64_gzip():
    v = np.array([1.0, -2.0])
    raw = gzip.decompress(encode_legacy_block(v))
    assert raw == v.astype(">f8").tobytes()
    # big-endian check: 1.0 as BE f64 starts 0x3F F0
    assert raw[:2] == b"\x3f\xf0"


def test_special_floats_byte_exact():
    v = np.array([np.nan, np.inf, -np.inf, -0.0])
    out = decode_legacy_block(encode_legacy_block(v))
    assert out.view(np.uint64).tolist() == v.view(np.uint64).tolist()


def test_empty_and_large():
    assert decode_legacy_block(encode_legacy_block(np.array([]))).size == 0
    big = np.arange(1_000_000, dtype=np.float64)
    assert np.array_equal(decode_legacy_block(encode_legacy_block(big)), big)


def test_keys_and_metadata_json(spark):
    from pyspark.sql import functions as F

    from processor_post_timeseries_spark.functions.legacy import (
        channel_metadata_json,
        legacy_key,
        legacy_metadata_key,
    )

    df = spark.createDataFrame(
        [(7, 1_000_000, 1_049_000, "  ch-7  ", 1000.0, "g")],
        "idx int, start_us long, end_us long, name string, rate double, group string",
    ).select(
        legacy_key(F.col("idx"), F.col("start_us"), F.col("end_us")).alias("key"),
        legacy_metadata_key(F.col("idx")).alias("mkey"),
        channel_metadata_json(
            F.col("name"), F.col("start_us"), F.col("end_us"), F.col("rate"), F.col("group")
        ).alias("meta"),
    )
    r = df.collect()[0]
    # golden filename shape from reference tests (e.g. "1000000_1049000")
    assert r["key"] == "channel-00007_1000000_1049000.bin.gz"
    assert r["mkey"] == "channel-00007.metadata.json"
    import json

    meta = json.loads(r["meta"])
    assert meta["name"] == "ch-7" and meta["unit"] == "uV" and meta["type"] == "CONTINUOUS"
    assert meta["start"] == 1_000_000 and meta["rate"] == 1000.0


def test_spark_udf_roundtrip(spark):
    from pyspark.sql import functions as F

    from processor_post_timeseries_spark.functions.legacy import legacy_decode, legacy_encode

    df = spark.createDataFrame(
        [(i, [float(i), i * 1.5, -i / 3.0]) for i in range(20)], "id long, vals array<double>"
    )
    rt = df.withColumn("back", legacy_decode(legacy_encode("vals")))
    assert rt.filter(~(F.col("back") == F.col("vals"))).count() == 0
