"""P14 size parsing/math goldens (reference
scripts/generate_test_nwb.py:27-61 semantics). Pure-Python — the column
variant is certified by the p14_size_parsing contract oracle."""

from __future__ import annotations

import pytest

from processor_post_timeseries_spark.sources.synth import parse_size, samples_for_size


def test_parse_size_units_and_fractions():
    assert parse_size("10MB") == 10 * 1024**2
    assert parse_size("1GB") == 1024**3
    assert parse_size(" 1.5 gb ") == int(1.5 * 1024**3)
    assert parse_size("50tb") == 50 * 1024**4
    assert parse_size("123B") == 123
    assert parse_size("0.5KB") == 512


@pytest.mark.parametrize("bad", ["", "MB", "10 XB", "ten MB", "10MBs", "-5MB"])
def test_parse_size_invalid_raises(bad):
    with pytest.raises(ValueError, match="Invalid size format"):
        parse_size(bad)


def test_samples_for_size():
    # 10MB at 2 channels x 8B with 5% overhead margin
    assert samples_for_size(10 * 1024**2) == int(10 * 1024**2 * 0.95 / 16)
    # floor at 1000 samples
    assert samples_for_size(100) == 1000
