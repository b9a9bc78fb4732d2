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
    with pytest.raises(NotImplementedError, match="PyAV"):
        mm._audio_features(b"RIFF")
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
