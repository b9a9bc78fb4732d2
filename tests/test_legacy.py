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


def test_channel_metadata_full_roundtrip(spark):
    """Mirror of the reference round-trip suite
    (/root/reference/tests/test_timeseries_channel.py:193-303):
    as_dict -> from_dict preserves every field, id omitted when absent,
    channelType alias wins over type, defaults applied."""
    import json

    from pyspark.sql import functions as F

    from processor_post_timeseries_spark.functions.legacy import (
        channel_from_json,
        channel_metadata_json,
    )

    df = spark.createDataFrame(
        [(5, 500_000, 1_500_000, "Round Trip Channel", 20000.0, " test_group ",
          "unit", 50, "N:channel:round-trip")],
        "idx int, start_us long, end_us long, name string, rate double, "
        "grp string, ctype string, last_ann long, cid string",
    )
    props = F.array(F.struct(F.lit("key").alias("key"), F.lit("value").alias("value")))
    j = df.select(
        channel_metadata_json(
            F.col("name"), F.col("start_us"), F.col("end_us"), F.col("rate"),
            F.col("grp"), channel_type=F.col("ctype"),
            last_annotation=F.col("last_ann"), properties=props, id=F.col("cid"),
        ).alias("meta")
    )
    raw = j.collect()[0]["meta"]
    d = json.loads(raw)
    # serialized field set and reference key order (id last)
    assert list(d) == ["name", "start", "end", "unit", "rate", "type", "group",
                       "lastAnnotation", "properties", "id"]
    assert d["unit"] == "uV" and d["type"] == "UNIT" and d["group"] == "test_group"
    assert d["lastAnnotation"] == 50 and d["properties"] == [{"key": "key", "value": "value"}]
    # parse back through the from_dict equivalent
    r = j.select(channel_from_json(F.col("meta")).alias("c")).select("c.*").collect()[0]
    assert r["name"] == "Round Trip Channel" and r["rate"] == 20000.0
    assert r["start"] == 500_000 and r["end"] == 1_500_000
    assert r["type"] == "UNIT" and r["type_valid"]
    assert r["group"] == "test_group" and r["last_annotation"] == 50
    assert [p.asDict() for p in r["properties"]] == [{"key": "key", "value": "value"}]
    assert r["id"] == "N:channel:round-trip"
    assert r["index"] == -1  # index is never serialized


def test_channel_metadata_id_omitted_and_defaults(spark):
    """as_dict without id has no 'id' key; from_dict defaults
    lastAnnotation->0, properties->[], and accepts the channelType alias
    (reference timeseries_channel.py:55-69)."""
    import json

    from pyspark.sql import functions as F

    from processor_post_timeseries_spark.functions.legacy import (
        channel_from_json,
        channel_metadata_json,
    )

    j = spark.range(1).select(
        channel_metadata_json(
            F.lit("Test"), F.lit(0), F.lit(1000), F.lit(1000.0), F.lit("default")
        ).alias("meta")
    )
    d = json.loads(j.collect()[0]["meta"])
    assert "id" not in d
    assert d["lastAnnotation"] == 0 and d["properties"] == []
    assert d["type"] == "CONTINUOUS"

    # channelType alias beats type; missing optionals default
    api_payload = ('{"name":" N ","start":"100","end":"200","rate":250.0,'
                   '"group":"g","channelType":"unit","type":"continuous"}')
    r = (
        spark.createDataFrame([(api_payload,)], "j string")
        .select(channel_from_json(F.col("j")).alias("c")).select("c.*").collect()[0]
    )
    assert r["type"] == "UNIT" and r["type_valid"]
    assert r["name"] == "N" and r["start"] == 100 and r["end"] == 200
    assert r["last_annotation"] == 0 and list(r["properties"]) == []
    assert r["id"] is None
    # invalid type is flagged, not silently accepted
    bad = ('{"name":"x","start":1,"end":2,"rate":1.0,"group":"g","type":"WEIRD"}')
    rb = (
        spark.createDataFrame([(bad,)], "j string")
        .select(channel_from_json(F.col("j")).alias("c")).select("c.*").collect()[0]
    )
    assert rb["type"] == "WEIRD" and not rb["type_valid"]


def test_channels_equal_predicate(spark):
    """Reference equality semantics (timeseries_channel.py:71-80):
    casefold name+type, strict 2% rate ratio band — boundary values from
    their test_equality_boundary_exactly_2_percent."""
    from pyspark.sql import functions as F

    from processor_post_timeseries_spark.functions.legacy import channels_equal

    rows = [
        ("Test Channel", "CONTINUOUS", 30000.0, "TEST CHANNEL", "continuous", 30000.0, True),
        ("Test", "CONTINUOUS", 30000.0, "Test", "CONTINUOUS", 30450.0, True),   # 1.5%
        ("Test", "CONTINUOUS", 30000.0, "Test", "CONTINUOUS", 30600.0, True),   # 0.0196 < 0.02
        ("Test", "CONTINUOUS", 30000.0, "Test", "CONTINUOUS", 30700.0, False),  # 0.0228
        ("Test", "CONTINUOUS", 30000.0, "Test", "UNIT", 30000.0, False),
        ("Channel A", "CONTINUOUS", 1.0, "Channel B", "CONTINUOUS", 1.0, False),
    ]
    df = spark.createDataFrame(
        rows, "na string, ta string, ra double, nb string, tb string, rb double, want boolean"
    ).withColumn(
        "got",
        channels_equal(F.col("na"), F.col("ta"), F.col("ra"),
                       F.col("nb"), F.col("tb"), F.col("rb")),
    )
    assert df.filter(F.col("got") != F.col("want")).count() == 0


def test_export_legacy_channels_artifact_set(spark, tmp_path):
    """Full reference-workflow export: chunked .bin.gz blocks with µs
    frame-bound names, metadata sidecars, ordered import manifest —
    decodable back to the exact per-channel sample streams."""
    import datetime as dt
    import glob
    import gzip
    import json
    import os

    import numpy as np
    from pyspark.sql import functions as F

    from processor_post_timeseries_spark.plans.legacy_export import export_legacy_channels

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for ch in (0, 1, 2):
        for s in range(257):  # 257 samples -> 3 blocks of 100 + 57
            rows.append((ch, eid, base + dt.timedelta(seconds=s), float(ch * 1000 + s)))
            eid += 1
    ev = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, value double")
    out = str(tmp_path / "legacy")
    paths = export_legacy_channels(spark, ev, out, chunk_size=100)

    bins = sorted(glob.glob(os.path.join(out, "*.bin.gz")))
    assert len(bins) == 9  # 3 channels x ceil(257/100)
    # decode every block; per channel the concatenation equals the stream
    per_ch: dict[int, list] = {}
    for p in bins:
        name = os.path.basename(p)
        ch, start_us, end_us = name[8:13], *name[14:-7].split("_")
        vals = np.frombuffer(gzip.decompress(open(p, "rb").read()), dtype=">f8")
        per_ch.setdefault(int(ch), []).append((int(start_us), vals))
        assert name.startswith(f"channel-{int(ch):05d}_")
    for ch in (0, 1, 2):
        stream = np.concatenate([v for _s, v in sorted(per_ch[ch])])
        assert np.array_equal(stream, np.arange(257) + ch * 1000)

    metas = sorted(glob.glob(os.path.join(out, "*.metadata.json")))
    assert len(metas) == 3
    m0 = json.load(open(metas[0]))
    assert m0["name"] == "channel-0" and m0["unit"] == "uV"
    assert m0["type"] == "CONTINUOUS" and m0["properties"] == []

    man = spark.read.parquet(paths["manifest"]).orderBy("global_pos").collect()
    assert len(man) == 9
    keys = [r["upload_key"] for r in man]
    assert keys == sorted(keys)  # (channel, start) order == global order
    assert [r["global_pos"] for r in man] == list(range(9))
    # every manifest entry points at a real file
    assert all(os.path.exists(r["file_path"]) for r in man)


def test_legacy_import_roundtrip(spark, tmp_path):
    """import(export(events)) reproduces every sample value and block
    bound; metadata sidecars parse to valid channels; synthesized
    timestamps follow the reference's index/rate rule."""
    import datetime as dt

    from pyspark.sql import functions as F

    from processor_post_timeseries_spark.plans.legacy_export import export_legacy_channels
    from processor_post_timeseries_spark.plans.legacy_import import (
        legacy_samples,
        read_legacy_blocks,
        read_legacy_channels,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for ch in (0, 1):
        for s in range(130):  # exact 10 Hz so rate round-trips cleanly
            rows.append((ch, eid, base + dt.timedelta(milliseconds=100 * s),
                         float(ch * 10_000 + s)))
            eid += 1
    ev = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, value double")
    out = str(tmp_path / "legacy")
    export_legacy_channels(spark, ev, out, chunk_size=50)

    blocks = read_legacy_blocks(spark, out)
    assert blocks.count() == 2 * 3  # ceil(130/50) per channel
    # every value survives, per channel, in order
    got = legacy_samples(blocks, read_legacy_channels(spark, out))
    exp = ev.select(
        F.col("user_id").alias("channel_index"),
        F.unix_micros("ts").alias("ts_us"),
        "value",
    )
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0
    # inferred-rate variant (no channels frame) reproduces values too
    got2 = legacy_samples(blocks)
    assert got2.exceptAll(exp).count() == 0 and exp.exceptAll(got2).count() == 0

    chans = {r["channel_index"]: r for r in read_legacy_channels(spark, out).collect()}
    assert len(chans) == 2
    assert chans[0]["type"] == "CONTINUOUS" and chans[0]["type_valid"]
    assert abs(chans[0]["rate"] - 10.0) < 1e-6
    assert chans[0]["name"] == "channel-0" and chans[0]["last_annotation"] == 0


def test_legacy_export_rejects_filename_collisions(spark, tmp_path):
    """Two blocks of one channel with identical (start,end) would clobber
    each other under the reference key format — must raise, not lose data."""
    import datetime as dt

    import pytest

    from processor_post_timeseries_spark.plans.legacy_export import export_legacy_channels

    base = dt.datetime(2024, 1, 1)
    # 6 samples all at the SAME timestamp, chunk_size 2 -> 3 colliding blocks
    rows = [(1, i, base, float(i)) for i in range(6)]
    ev = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, value double")
    with pytest.raises(ValueError, match="collision"):
        export_legacy_channels(spark, ev, str(tmp_path / "x"), chunk_size=2)


def test_legacy_import_six_digit_channel_index(spark, tmp_path):
    """%05d pads but never truncates: channel 100000 exports as a 6-digit
    key and must import back (regex is {5,} not {5})."""
    import datetime as dt

    from processor_post_timeseries_spark.plans.legacy_export import export_legacy_channels
    from processor_post_timeseries_spark.plans.legacy_import import read_legacy_blocks

    base = dt.datetime(2024, 1, 1)
    rows = [(100000, i, base + dt.timedelta(seconds=i), float(i)) for i in range(5)]
    ev = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, value double")
    out = str(tmp_path / "big")
    export_legacy_channels(spark, ev, out, chunk_size=10)
    got = read_legacy_blocks(spark, out).collect()
    assert len(got) == 1 and got[0]["channel_index"] == 100000
    assert list(got[0]["values"]) == [0.0, 1.0, 2.0, 3.0, 4.0]
