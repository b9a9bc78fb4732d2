"""Property tests: asof_join vs pandas.merge_asof and resample_linear
vs numpy.interp on randomized streams. Hypothesis drives the stream
shapes; the independent references pin the semantics (not our own code
run twice)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from processor_post_timeseries_spark.operators.asof import asof_join
from processor_post_timeseries_spark.operators.resample import resample_linear


@pytest.fixture(scope="module")
def spark():
    from processor_post_timeseries_spark.session import get_spark

    return get_spark("test-prop", master="local[4]")


ts_lists = st.lists(st.integers(min_value=0, max_value=2000), min_size=1, max_size=25)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    lts=ts_lists,
    rts=ts_lists,
    tol=st.one_of(st.none(), st.integers(1, 500)),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
)
def test_asof_matches_pandas_merge_asof(spark, lts, rts, tol, direction):
    # unique per-side timestamps (merge_asof's tie rule for duplicate
    # right keys is positional, ours is by tiebreak column — dedupe to
    # compare the shared semantics; our tie rule has its own unit test)
    lts, rts = sorted(set(lts)), sorted(set(rts))
    left = spark.createDataFrame([(1, t, i) for i, t in enumerate(lts)], "k int, ts long, lid int")
    right = spark.createDataFrame(
        [(1, t, float(t) * 0.5, i) for i, t in enumerate(rts)], "k int, ts long, v double, rid int"
    )
    got = {
        r["ts_l"]: r["rv"]
        for r in asof_join(
            left, right, by="k", ts="ts", right_cols={"v": "rv"},
            tolerance_us=tol, right_tiebreak="rid", direction=direction,
        ).collect()
    }
    lp = pd.DataFrame({"ts": pd.Series(lts, dtype="int64")})
    rp = pd.DataFrame({"ts": pd.Series(rts, dtype="int64"), "v": [t * 0.5 for t in rts]})
    kw = {"tolerance": tol} if tol is not None else {}
    exp = pd.merge_asof(lp, rp, on="ts", direction=direction, **kw)
    for ts, v in zip(exp["ts"], exp["v"]):
        g = got[int(ts)]
        assert (g is None and pd.isna(v)) or (g == v), (ts, g, v)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 1000), st.integers(-50, 50)),
        min_size=1, max_size=20, unique_by=lambda p: p[0],
    ),
    step=st.integers(7, 200),
)
def test_resample_matches_numpy_interp(spark, pts, step):
    pts = sorted(pts)
    df = spark.createDataFrame(
        [(1, t, float(v), i) for i, (t, v) in enumerate(pts)],
        "k int, ts long, v double, i int",
    )
    got = {
        r["grid_ts_us"]: r["v"]
        for r in resample_linear(df, "k", "ts", "v", step_us=step, tiebreak="i").collect()
    }
    xs = np.array([t for t, _ in pts], dtype=np.int64)
    ys = np.array([v for _, v in pts], dtype=np.float64)
    lo, hi = xs.min(), xs.max()
    grid = np.arange(-(-lo // step) * step, hi + 1, step, dtype=np.int64)
    assert set(got) == set(int(g) for g in grid)
    for g in grid:
        expected = float(np.interp(g, xs, ys))
        assert got[int(g)] == pytest.approx(expected, abs=1e-6), (g, got[int(g)], expected)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pts=st.lists(st.integers(0, 500), min_size=0, max_size=30),
    ivs=st.lists(st.tuples(st.integers(0, 500), st.integers(0, 500)), min_size=0, max_size=10),
    grid=st.integers(1, 100),
)
def test_interval_join_matches_brute_force(spark, pts, ivs, grid):
    from processor_post_timeseries_spark.operators.interval import interval_join

    pts_df = spark.createDataFrame(
        [(t, i) for i, t in enumerate(pts)] or [(None, None)], "ts long, pid int"
    ).filter("ts is not null")
    iv_df = spark.createDataFrame(
        [(s, e, i) for i, (s, e) in enumerate(ivs)] or [(None, None, None)],
        "s long, e long, iid int",
    ).filter("s is not null")
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(pts_df, iv_df, "ts", "s", "e", grid_us=grid).collect()
    )
    want = sorted(
        (pi, ii)
        for pi, t in enumerate(pts)
        for ii, (s, e) in enumerate(ivs)
        if s <= t < e
    )
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    sizes=st.lists(st.integers(1, 40), min_size=1, max_size=5),
    num=st.integers(1, 5),
    den=st.integers(5, 20),
)
def test_stratified_sample_matches_exact_reference(spark, sizes, num, den):
    import hashlib
    import math

    from processor_post_timeseries_spark.operators.sampling import stratified_sample

    rows = [(f"g{g}", g * 1000 + i) for g, n in enumerate(sizes) for i in range(n)]
    df = spark.createDataFrame(rows, "grp string, id long")
    got = sorted(
        (r["grp"], r["id"]) for r in stratified_sample(df, "grp", "id", num, den).collect()
    )
    want = []
    for g, n in enumerate(sizes):
        ids = [g * 1000 + i for i in range(n)]
        quota = math.ceil(n * num / den)
        picked = sorted(ids, key=lambda x: (hashlib.md5(str(x).encode()).hexdigest(), x))[:quota]
        want += [(f"g{g}", x) for x in picked]
    assert got == sorted(want)
