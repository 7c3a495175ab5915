"""resample (regular-grid ffill / linear interpolation) vs a pandas
reference implementation, plus shape/edge cases."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from blueetl_spark.operators.timeseries import resample


@pytest.fixture(scope="module")
def series(spark):
    rng = np.random.default_rng(11)
    rows = []
    for g in range(5):
        n = 5 + int(rng.integers(0, 20))
        ts = np.sort(rng.uniform(0, 100, n))
        for t, v in zip(ts, rng.standard_normal(n)):
            rows.append((g, float(t), float(v)))
    return spark.createDataFrame(rows, "gid long, time double, value double")


def _pandas_reference(pdf: pd.DataFrame, step: float, method: str) -> list[tuple]:
    out = []
    for g, grp in pdf.groupby("gid"):
        grp = grp.sort_values("time")
        t0 = np.ceil(grp.time.min() / step) * step
        t1 = np.floor(grp.time.max() / step) * step
        grid = np.arange(t0, t1 + step / 2, step)
        if method == "ffill":
            idx = np.searchsorted(grp.time.to_numpy(), grid, side="right") - 1
            vals = [grp.value.to_numpy()[i] if i >= 0 else None for i in idx]
        else:
            vals = np.interp(grid, grp.time.to_numpy(), grp.value.to_numpy())
        for t, v in zip(grid, vals):
            out.append((g, round(float(t), 9), None if v is None else round(float(v), 9)))
    return sorted(out)


@pytest.mark.parametrize("method", ["ffill", "linear"])
def test_resample_matches_pandas(series, method):
    got = sorted(
        (r.gid, round(r.time, 9), None if r.value is None else round(r.value, 9))
        for r in resample(series, step=7.5, method=method).collect()
    )
    want = _pandas_reference(series.toPandas(), 7.5, method)
    assert len(got) == len(want)
    for (gg, gt, gv), (wg, wt, wv) in zip(got, want):
        assert (gg, gt) == (wg, wt)
        if gv is None or wv is None:
            assert gv == wv
        else:
            assert gv == pytest.approx(wv, abs=1e-9)


def test_resample_observation_on_grid_point(spark):
    df = spark.createDataFrame(
        [(1, 0.0, 10.0), (1, 5.0, 20.0), (1, 10.0, 40.0)],
        "gid long, time double, value double",
    )
    got = {r.time: r.value for r in resample(df, step=5.0, method="linear").collect()}
    # grid points coincide with observations -> exact values, no smoothing
    assert got == {0.0: 10.0, 5.0: 20.0, 10.0: 40.0}


def test_resample_common_grid_and_edge_hold(spark):
    df = spark.createDataFrame(
        [(1, 3.0, 30.0), (1, 6.0, 60.0)], "gid long, time double, value double"
    )
    lin = {
        r.time: r.value
        for r in resample(
            df, step=2.0, method="linear", t_start=0.0, t_stop=10.0
        ).collect()
    }
    # before first obs: hold first value; after last: hold last value
    assert lin[0.0] == 30.0 and lin[2.0] == 30.0
    assert lin[8.0] == 60.0 and lin[10.0] == 60.0
    assert lin[4.0] == pytest.approx(30.0 + 30.0 / 3)
    ff = {
        r.time: r.value
        for r in resample(
            df, step=2.0, method="ffill", t_start=0.0, t_stop=10.0
        ).collect()
    }
    assert ff[0.0] is None and ff[2.0] is None  # nothing observed yet
    assert ff[4.0] == 30.0 and ff[6.0] == 60.0 and ff[10.0] == 60.0


def test_resample_single_shuffle(spark, series):
    """One hash exchange on the group keys serves grid generation, both
    window passes, and the final projection."""
    import re

    df = resample(series, step=10.0, method="linear")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    exchanges = [
        l for l in plan.splitlines() if re.match(r"\(\d+\) Exchange", l.strip())
    ]
    # grid agg needs its own exchange; the union/window side reuses one
    assert len(exchanges) <= 2, plan


def test_resample_rejects_unknown_method(series):
    with pytest.raises(ValueError, match="method"):
        resample(series, step=1.0, method="cubic")
