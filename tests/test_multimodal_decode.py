"""Optional-dependency media decode seam (functions/multimodal.py):
real Pillow/PyAV paths when importable (skip cleanly otherwise, the
sources/nwb.py convention), pure-numpy feature math always."""

from __future__ import annotations

import numpy as np
import pytest

from processor_post_timeseries_spark.functions import multimodal as mm


@pytest.fixture(scope="module")
def spark():
    from processor_post_timeseries_spark.session import get_spark

    return get_spark("test-mmdecode", master="local[4]")


def test_grid_means_known_values():
    # 4x4 image of known quadrant values -> 2x2 grid means are exact
    g = np.array(
        [[0, 0, 100, 100], [0, 0, 100, 100], [200, 200, 50, 50], [200, 200, 50, 50]],
        dtype=np.float32,
    )
    got = mm._grid_means(g, 2, 2)
    np.testing.assert_allclose(got, [0.0, 100.0, 200.0, 50.0])


def test_grid_means_smaller_than_grid():
    # 1x1 input split into a 4x4 grid: empty cells are 0, not NaN
    got = mm._grid_means(np.array([[42.0]]), 4, 4)
    assert got[0] == 42.0 and not np.isnan(got).any() and got.sum() == 42.0


def test_absent_codecs_raise_documented_error():
    if mm._PILImage is not None:
        pytest.skip("Pillow installed — absence path not reachable")
    with pytest.raises(NotImplementedError, match="Pillow"):
        mm.decode_image(b"\x89PNG...")
    with pytest.raises(NotImplementedError, match="Pillow"):
        mm._features_one(b"x", "image", deterministic_fake=False)
    # the fake path still works without the codec
    assert mm._features_one(b"x", "image", deterministic_fake=True).shape == (16,)


def test_absent_av_raises_documented_error():
    if mm._av is not None:
        pytest.skip("PyAV installed — absence path not reachable")
    # non-WAV audio payloads still need PyAV; WAV is the numpy fallback
    with pytest.raises(NotImplementedError, match="PyAV"):
        mm._audio_features(b"OggS\x00\x02")
    with pytest.raises(NotImplementedError, match="PyAV"):
        mm._video_features(b"\x00\x00\x00 ftyp")


@pytest.fixture()
def png_payloads():
    PIL = pytest.importorskip("PIL.Image")
    import io

    out = []
    for shade in (0, 128, 255):
        im = PIL.new("RGB", (8, 8), (shade, shade, shade))
        buf = io.BytesIO()
        im.save(buf, format="PNG")
        out.append((shade, buf.getvalue()))
    return out


def test_real_image_decode_and_features(png_payloads):
    for shade, payload in png_payloads:
        rgb = mm.decode_image(payload)
        assert rgb.shape == (8, 8, 3) and rgb.dtype == np.uint8
        assert int(rgb[0, 0, 0]) == shade
        feats = mm._features_one(payload, "image", deterministic_fake=False)
        assert feats.shape == (16,)
        np.testing.assert_allclose(feats, shade / 255.0, atol=1e-6)


def test_real_image_distributed_extract(spark, png_payloads):
    pytest.importorskip("PIL.Image")
    rows = [
        (f"m-{i}", "image", payload, len(payload), "sha")
        for i, (_s, payload) in enumerate(png_payloads)
    ]
    media = spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)
    feats = {r["media_id"]: r["features"] for r in mm.extract_features(media).collect()}
    assert len(feats) == 3
    assert all(len(v) == 16 for v in feats.values())


def test_real_resize_images(spark, png_payloads):
    pytest.importorskip("PIL.Image")
    rows = [
        (f"m-{i}", "image", payload, len(payload), "sha")
        for i, (_s, payload) in enumerate(png_payloads)
    ]
    media = spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)
    out = mm.resize_images(media, height=4, width=6).collect()
    assert len(out) == 3
    for r in out:
        assert (r["height"], r["width"]) == (4, 6)
        assert len(r["rgb"]) == 4 * 6 * 3


# ---------------------------------------------------------------------------
# Codec-free BMP/WAV paths (round 5): the decode seam EXECUTES in this
# env — no skips, real bytes through encode -> decode -> features.
# ---------------------------------------------------------------------------


def test_bmp_roundtrip_and_seam():
    rng = np.random.RandomState(3)
    for h, w in [(16, 16), (23, 17), (1, 5)]:  # incl. non-4-multiple strides
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(mm._decode_bmp_numpy(mm.encode_bmp(img)), img)
        assert np.array_equal(mm.decode_image(mm.encode_bmp(img)), img)


def test_bmp_unsupported_depth_raises():
    # a valid-magic BMP the numpy fallback can't parse names Pillow
    b = bytearray(mm.encode_bmp(np.zeros((4, 4, 3), np.uint8)))
    b[28:30] = (8).to_bytes(2, "little")  # 8-bit palette BMP
    if mm._PILImage is None:
        with pytest.raises(NotImplementedError, match="Pillow"):
            mm._decode_bmp_numpy(bytes(b))


def test_wav_roundtrip_mono_and_stereo():
    rng = np.random.RandomState(4)
    mono = rng.randint(-32768, 32767, 500).astype(np.int16)
    planar, rate = mm.decode_wav_pcm16(mm.encode_wav_pcm16(mono, rate=8000))
    assert rate == 8000 and planar.shape == (1, 500)
    assert np.array_equal(planar[0].astype(np.int16), mono)
    stereo = rng.randint(-32768, 32767, (400, 2)).astype(np.int16)
    planar2, _ = mm.decode_wav_pcm16(mm.encode_wav_pcm16(stereo, channels=2))
    assert planar2.shape == (2, 400)
    assert np.array_equal(planar2.T.astype(np.int16), stereo)


def test_audio_features_on_wav_match_numpy():
    if mm._av is not None:
        pytest.skip("PyAV installed — this pins the numpy WAV fallback")
    rng = np.random.RandomState(5)
    stereo = rng.randint(-20000, 20000, (1600, 2)).astype(np.int16)
    feats = mm._audio_features(mm.encode_wav_pcm16(stereo, channels=2))
    mono = stereo.astype(np.float64).mean(axis=1)
    rms = np.sqrt(np.square(mono).reshape(16, 100).mean(axis=1)).astype(np.float32)
    expected = (rms / (rms.max() or 1.0)).astype(np.float32)
    np.testing.assert_array_equal(feats, expected)
    assert feats.shape == (16,) and feats.max() == pytest.approx(1.0)


def test_image_features_on_bmp_grid_sums_exact():
    # the multimodal_features contract formula: round(f*4080) == cell sum
    y, x = np.mgrid[0:16, 0:16]
    for d in (0, 7, 250):
        v = ((3 * y + 7 * x + d) % 256).astype(np.uint8)
        f = mm._image_features(mm.encode_bmp(np.repeat(v[:, :, None], 3, 2)))
        got = np.rint(f.astype(np.float64) * 4080).astype(np.int64)
        want = v.astype(np.int64).reshape(4, 4, 4, 4).transpose(0, 2, 1, 3).reshape(16, 16).sum(axis=1)
        np.testing.assert_array_equal(got, want)


def test_distributed_extract_codec_free(spark):
    """extract_features runs REAL decodes on executors with zero codec
    deps: BMP images + WAV audio through mapInPandas."""
    import pandas as pd
    from pyspark.sql import functions as F

    rng = np.random.RandomState(6)
    rows = []
    for i in range(6):
        if i % 2 == 0:
            payload = mm.encode_bmp(rng.randint(0, 256, (16, 16, 3), dtype=np.uint8))
            modality = "image"
        else:
            payload = mm.encode_wav_pcm16(
                rng.randint(-30000, 30000, 320).astype(np.int16)
            )
            modality = "audio"
        rows.append((f"m{i}", modality, payload, len(payload), f"sha{i}"))
    media = spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)
    out = mm.extract_features(media).collect()  # deterministic_fake NOT set
    assert len(out) == 6
    for r in out:
        assert r["feat_dim"] == 16
        assert all(0.0 <= f <= 1.0 for f in r["features"])


def test_resize_images_codec_free_exact_on_gradient(spark):
    y, x = np.mgrid[0:16, 0:16]
    v = (3 * y + 5 * x + 20).astype(np.uint8)
    payload = mm.encode_bmp(np.repeat(v[:, :, None], 3, 2))
    media = spark.createDataFrame(
        [("g1", "image", payload, len(payload), "s")], schema=mm.MEDIA_SCHEMA
    )
    rows = mm.resize_images(media, 8, 8).collect()
    assert len(rows) == 1 and rows[0]["height"] == 8 and rows[0]["width"] == 8
    got = np.frombuffer(rows[0]["rgb"], np.uint8).reshape(8, 8, 3)
    k, l = np.mgrid[0:8, 0:8]
    want = (6 * k + 10 * l + 4 + 20).astype(np.uint8)
    if mm._PILImage is None:
        # numpy bilinear: exact everywhere on an affine ramp
        np.testing.assert_array_equal(got, np.repeat(want[:, :, None], 3, 2))
    else:
        # Pillow clamps its kernel at borders; interior is exact
        np.testing.assert_array_equal(
            got[1:7, 1:7], np.repeat(want[1:7, 1:7, None], 3, 2)
        )
