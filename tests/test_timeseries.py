"""Ordered-time operators: as-of join, sessionization, group quantiles."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from blueetl_spark.operators import timeseries as ts


@pytest.fixture(scope="module")
def left_right(spark):
    left = spark.createDataFrame(
        [(1, 1.0, "a"), (1, 5.0, "b"), (1, 9.0, "c"), (2, 3.0, "d"), (3, 2.0, "e")],
        "gid long, time double, tag string",
    )
    right = spark.createDataFrame(
        [(1, 0.5, 10.0), (1, 5.0, 11.0), (1, 7.0, 12.0), (2, 4.0, 13.0)],
        "gid long, time double, v double",
    )
    return left, right


def test_asof_join_backward_inclusive(spark, left_right):
    left, right = left_right
    out = ts.asof_join(left, right, on="time", by=["gid"]).orderBy("gid", "time")
    rows = [(r.gid, r.time, r.time_asof, r.v_asof) for r in out.collect()]
    assert rows == [
        (1, 1.0, 0.5, 10.0),
        (1, 5.0, 5.0, 11.0),   # tie resolves to the right row (inclusive)
        (1, 9.0, 7.0, 12.0),
        (2, 3.0, None, None),  # right exists but only in the future
        (3, 2.0, None, None),  # no right rows for this key at all
    ]


def test_asof_join_tolerance(spark, left_right):
    left, right = left_right
    out = ts.asof_join(left, right, on="time", by=["gid"], tolerance=1.0)
    got = {(r.gid, r.time): r.time_asof for r in out.collect()}
    assert got[(1, 5.0)] == 5.0      # gap 0 <= 1
    assert got[(1, 1.0)] == 0.5      # gap 0.5 <= 1
    assert got[(1, 9.0)] is None     # gap 2 > 1 nulled out


def test_asof_join_single_shuffle_no_blowup(spark, left_right):
    """The whole point vs a range join: one hash exchange on the by keys,
    no nested-loop/cartesian pair explosion anywhere in the plan."""
    import re

    from tests.test_plans import _formatted_plan

    left, right = left_right
    plan = _formatted_plan(ts.asof_join(left, right, on="time", by=["gid"]))
    phys = plan.split("== Physical Plan ==")[-1]
    assert "BroadcastNestedLoopJoin" not in phys
    assert "CartesianProduct" not in phys
    exchanges = [
        l for l in phys.splitlines() if re.match(r"\(\d+\) Exchange", l.strip())
    ]
    assert len(exchanges) == 1, exchanges


def test_sessionize(spark):
    ev = spark.createDataFrame(
        [(1, t) for t in (0.0, 1.0, 2.0, 10.0, 11.0)] + [(2, 5.0)],
        "gid long, time double",
    )
    out = ts.sessionize(ev, gap=3.0, by=["gid"]).orderBy("gid", "session")
    rows = [
        (r.gid, r.session, r.t_start, r.t_end, r.n_events, r.duration)
        for r in out.collect()
    ]
    assert rows == [
        (1, 1, 0.0, 2.0, 3, 2.0),
        (1, 2, 10.0, 11.0, 2, 1.0),
        (2, 1, 5.0, 5.0, 1, 0.0),
    ]


def test_group_quantiles_matches_numpy(spark):
    rng = np.random.default_rng(11)
    vals = rng.uniform(0, 100, 501)
    df = spark.createDataFrame(
        [("g", float(v)) for v in vals], "k string, value double"
    )
    out = ts.group_quantiles(df, "value", ["k"], probs=(0.5, 0.9)).collect()[0]
    assert out.n == 501
    assert out.q_0_5 == pytest.approx(np.percentile(vals, 50), abs=1e-9)
    assert out.q_0_9 == pytest.approx(np.percentile(vals, 90), abs=1e-9)
    approx = ts.group_quantiles(
        df, "value", ["k"], probs=(0.5,), exact=False
    ).collect()[0]
    assert approx.q_0_5 == pytest.approx(np.percentile(vals, 50), rel=0.02)


def test_asof_join_bucketed_parity_random(spark):
    """The skew-parallel bucketed variant must agree with the plain
    as-of join exactly, across bucket widths (within-bucket matches,
    carry-ins over empty buckets, tolerance interplay)."""
    rng = np.random.default_rng(5)
    left = spark.createDataFrame(
        [(int(g), float(t)) for g, t in
         zip(rng.integers(0, 8, 400), rng.uniform(0, 100, 400))],
        "gid long, time double",
    )
    right = spark.createDataFrame(
        [(int(g), float(t), float(v)) for g, t, v in
         zip(rng.integers(0, 8, 60), rng.uniform(0, 100, 60),
             rng.uniform(0, 1, 60))],
        "gid long, time double, v double",
    )
    for tol in (None, 10.0):
        plain = ts.asof_join(left, right, by=["gid"], tolerance=tol).toPandas()
        key = ["gid", "time"]
        plain = plain.sort_values(key, ignore_index=True)
        for width in (5.0, 33.0, 1000.0):  # many buckets … one bucket
            b = ts.asof_join_bucketed(
                left, right, bucket_width=width, by=["gid"], tolerance=tol
            ).toPandas().sort_values(key, ignore_index=True)
            assert b.equals(plain), (width, tol)


def test_asof_join_matches_pandas_merge_asof(spark):
    """Property test: asof_join ≡ pandas merge_asof(direction='backward')
    per key, over generated histories (ties, empty keys, tolerance)."""
    import pandas as pd
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    row = st.tuples(st.integers(0, 3), st.integers(0, 50))

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        lrows=st.lists(row, min_size=1, max_size=25),
        rrows=st.lists(row, min_size=0, max_size=15),
        tol=st.sampled_from([None, 5.0]),
    )
    def run(lrows, rrows, tol):
        lpdf = pd.DataFrame(
            {"gid": [g for g, _ in lrows], "time": [float(t) for _, t in lrows]}
        )
        rpdf = (
            pd.DataFrame(
                {
                    "gid": [g for g, _ in rrows],
                    "time": [float(t) for _, t in rrows],
                    "v": [float(g * 100 + t) for g, t in rrows],
                }
            )
            # dedupe (gid, time): both engines would otherwise pick an
            # arbitrary row among exact ties
            .groupby(["gid", "time"], as_index=False)
            .agg(v=("v", "max"))
            .astype({"gid": "int64", "time": "float64", "v": "float64"})
        )
        left = spark.createDataFrame(lpdf.astype({"gid": "int64"}))
        right = (
            spark.createDataFrame(rpdf.astype({"gid": "int64"}))
            if len(rpdf)
            else spark.createDataFrame([], "gid long, time double, v double")
        )
        got = (
            ts.asof_join(left, right, on="time", by=["gid"], tolerance=tol)
            .toPandas()
            .sort_values(["gid", "time"], ignore_index=True)
        )
        want = pd.merge_asof(
            lpdf.sort_values("time", kind="stable"),
            rpdf.sort_values("time", kind="stable").rename(
                columns={"time": "time_asof", "v": "v_asof"}
            ),
            left_on="time",
            right_on="time_asof",
            by="gid",
            direction="backward",
            tolerance=tol,
        ).sort_values(["gid", "time"], ignore_index=True)
        pd.testing.assert_frame_equal(
            got[["gid", "time", "time_asof", "v_asof"]],
            want[["gid", "time", "time_asof", "v_asof"]],
        )

    run()


def test_rolling_agg_matches_pandas_with_duplicate_times(spark):
    """RANGE-frame semantics: duplicate-timestamp peers share one frame
    (every row at time t sees ALL rows in [t-span, t], including its
    co-timed peers); checked against a brute-force per-row filter."""
    import pandas as pd

    from blueetl_spark.operators import timeseries as ts

    rows = [
        # (gid, time, value) — dup times at 10.0 on gid 1
        (1, 0.0, 1.0), (1, 5.0, 2.0), (1, 10.0, 4.0), (1, 10.0, 8.0),
        (1, 16.0, 16.0), (2, 0.0, 3.0), (2, 100.0, 5.0),
    ]
    pdf = pd.DataFrame(rows, columns=["gid", "time", "value"])
    df = spark.createDataFrame(pdf)
    got = (
        ts.rolling_agg(df, span=10.0, by=("gid",),
                       aggs=("avg", "count", "sum", "min", "max"))
        .toPandas()
        .sort_values(["gid", "time", "value"], ignore_index=True)
    )
    for _, r in got.iterrows():
        frame = pdf[
            (pdf.gid == r.gid)
            & (pdf.time >= r.time - 10.0)
            & (pdf.time <= r.time)
        ].value
        assert r.rolling_count == len(frame)
        assert r.rolling_avg == pytest.approx(frame.mean())
        assert r.rolling_sum == pytest.approx(frame.sum())
        assert r.rolling_min == frame.min() and r.rolling_max == frame.max()


def test_rolling_agg_rejects_unknown_agg(spark):
    import pandas as pd

    from blueetl_spark.operators import timeseries as ts

    df = spark.createDataFrame(pd.DataFrame({"gid": [1], "time": [0.0], "value": [1.0]}))
    with pytest.raises(ValueError, match="unknown rolling aggregates"):
        ts.rolling_agg(df, span=1.0, aggs=("median",))


def test_winsorize_matches_numpy_clip(spark):
    import pandas as pd

    from blueetl_spark.operators import timeseries as ts

    vals = [float(x) for x in range(100)] + [1e6, -1e6]
    pdf = pd.DataFrame({"v": vals})
    out = (
        ts.winsorize(spark.createDataFrame(pdf), "v", 0.1, 0.9, out_col="w")
        .toPandas()
        .sort_values("v", ignore_index=True)
    )
    lo, hi = np.percentile(vals, [10, 90])  # linear interp == F.percentile
    exp = np.clip(np.sort(vals), lo, hi)
    assert np.allclose(out.w.to_numpy(), exp)


def test_winsorize_grouped_and_bad_bounds(spark):
    import pandas as pd

    from blueetl_spark.operators import timeseries as ts

    g = pd.DataFrame(
        {"grp": ["a"] * 5 + ["b"] * 5,
         "v": [0.0, 1, 2, 3, 100, 0.0, 10, 20, 30, 1000]}
    )
    out = ts.winsorize(
        spark.createDataFrame(g), "v", 0.0, 0.8, by="grp", out_col="w"
    ).toPandas()
    # per-group hi bound: a -> percentile(…, .8)=3*? use numpy per group
    for grp, sub in g.groupby("grp"):
        hi = np.percentile(sub.v, 80)
        got = out[out.grp == grp].sort_values("v").w.to_numpy()
        assert np.allclose(got, np.clip(np.sort(sub.v), None, hi))
    with pytest.raises(ValueError, match="p_lo"):
        ts.winsorize(spark.createDataFrame(g), "v", 0.9, 0.1)


def test_rolling_agg_validation_and_global_window(spark):
    import pandas as pd

    from blueetl_spark.operators import timeseries as ts

    df = spark.createDataFrame(
        pd.DataFrame({"gid": [1, 2], "time": [0.0, 1.0], "value": [1.0, 3.0]})
    )
    with pytest.raises(ValueError, match="span"):
        ts.rolling_agg(df, span=0.0)
    with pytest.raises(ValueError, match="backtick"):
        ts.rolling_agg(df.withColumnRenamed("value", "v`x"), span=1.0,
                       value_col="v`x")
    # empty by = one global trailing window across all rows
    out = (
        ts.rolling_agg(df, span=10.0, by=(), aggs=("sum",))
        .toPandas()
        .sort_values("time")
    )
    assert out.rolling_sum.tolist() == [1.0, 4.0]


def test_winsorize_preserves_nulls(spark):
    import pandas as pd

    from blueetl_spark.operators import timeseries as ts

    pdf = pd.DataFrame({"v": [1.0, 2.0, 3.0, None]})
    out = ts.winsorize(spark.createDataFrame(pdf), "v", 0.0, 0.5, out_col="w")
    got = out.toPandas()
    assert got.w.isna().sum() == 1  # NULL stays NULL, never the hi bound


def test_robust_outlier_stats_flags_and_degenerate_mad(spark):
    import pandas as pd

    from blueetl_spark.operators import timeseries as ts

    # group a: tight cluster + one wild point; group b: >50% identical
    # values -> MAD 0 -> degenerate, zero outliers by convention
    pdf = pd.DataFrame(
        {
            "g": ["a"] * 9 + ["b"] * 4,
            "v": [10.0, 11, 9, 10, 12, 10, 11, 9, 1000, 5.0, 5, 5, 99],
        }
    )
    out = {
        r.g: r
        for r in ts.robust_outlier_stats(
            spark.createDataFrame(pdf), "v", by="g"
        ).collect()
    }
    assert out["a"].n == 9 and out["a"].n_outliers == 1
    assert out["a"].median == 10.0
    assert out["b"].mad == 0.0 and out["b"].n_outliers == 0


def test_interval_overlap_join_matches_bruteforce(spark):
    """Bucketized overlap equals the quadratic check on random
    intervals — incl. boundary cases (half-open: touching intervals
    don't match) and multi-bucket spans (no duplicate pairs)."""
    import random

    import pandas as pd

    from blueetl_spark.operators import timeseries as ts

    rng = random.Random(13)
    L = [(i, rng.uniform(0, 50), rng.uniform(0.1, 20)) for i in range(25)]
    R = [(j, rng.uniform(0, 50), rng.uniform(0.1, 20)) for j in range(25)]
    lp = pd.DataFrame(
        [(i, s, s + d) for i, s, d in L], columns=["lid", "t_start", "t_end"]
    )
    rp = pd.DataFrame(
        [(j, s, s + d) for j, s, d in R], columns=["rid", "t_start", "t_end"]
    )
    got = ts.interval_overlap_join(
        spark.createDataFrame(lp), spark.createDataFrame(rp),
        bucket_width=5.0,
    ).toPandas()
    pairs = set(zip(got.lid, got.rid))
    exp = {
        (i, j)
        for i, ls, le in ((i, s, s + d) for i, s, d in L)
        for j, rs, re in ((j, s, s + d) for j, s, d in R)
        if ls < re and rs < le
    }
    assert pairs == exp
    assert len(got) == len(exp)  # canonical-bucket rule: no dup rows

    # half-open: [0,10) and [10,20) do not overlap
    a = spark.createDataFrame(pd.DataFrame({"lid": [1], "t_start": [0.0], "t_end": [10.0]}))
    b = spark.createDataFrame(pd.DataFrame({"rid": [2], "t_start": [10.0], "t_end": [20.0]}))
    assert ts.interval_overlap_join(a, b, bucket_width=5.0).count() == 0
    with pytest.raises(ValueError, match="bucket_width"):
        ts.interval_overlap_join(a, b, bucket_width=0.0)


def test_ohlc_resample_endpoints_and_ties(spark):
    """OHLC bars: open/close pick the (time, tie) extremes — equal-time
    endpoints resolve on the tie column deterministically; one aggregate,
    no window/sort in the plan."""
    from blueetl_spark.operators import timeseries as ts

    rows = [
        # key "s": bucket 0 has a time tie at t=1 (ids 1 < 2)
        ("s", 1.0, 10, 1.0), ("s", 1.0, 20, 2.0), ("s", 5.0, 30, 3.0),
        # key "s": bucket 1 single row
        ("s", 12.0, 40, 4.0),
        # key "t": descending values
        ("t", 3.0, 9, 5.0), ("t", 4.0, 7, 6.0),
    ]
    df = spark.createDataFrame(rows, "k string, t double, v long, eid double")
    out = {
        (r.k, r.bucket): r
        for r in ts.ohlc_resample(
            df, "t", "v", 10.0, by=["k"], tie_col="eid"
        ).collect()
    }
    b0 = out[("s", 0)]
    assert (b0.open, b0.high, b0.low, b0.close, b0.n) == (10.0, 30.0, 10.0, 30.0, 3)
    assert b0.mean == 20.0 and b0.t_start == 0.0
    b1 = out[("s", 1)]
    assert (b1.open, b1.close, b1.n, b1.t_start) == (40.0, 40.0, 1, 10.0)
    t0 = out[("t", 0)]
    assert (t0.open, t0.close, t0.high, t0.low) == (9.0, 7.0, 9.0, 7.0)

    plan = (
        ts.ohlc_resample(df, "t", "v", 10.0, by=["k"], tie_col="eid")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one map-side-combined aggregate (struct-keyed min_by/max_by plans
    # as SortAggregate: per-partition grouping-key sort, with partials
    # before the single exchange), never a window or a global sort
    assert "Window" not in plan
    assert "partial_min_by" in plan and plan.count("Exchange") == 1
    assert "rangepartitioning" not in plan  # no global sort
    with pytest.raises(ValueError, match="bucket_width"):
        ts.ohlc_resample(df, "t", "v", 0.0)


def test_interval_overlap_end_bucket_no_epsilon(spark):
    """End-bucket edge cases an absolute epsilon gets wrong: a sub-1e-9
    sliver past a bucket boundary must keep its last slice (the old
    eps subtraction dropped the match), and ms-scale end values where
    the eps is absorbed by float64 rounding must still honor the
    half-open boundary exactly."""
    import pandas as pd

    from blueetl_spark.operators import timeseries as ts

    # right ends 5e-10 past the slice boundary at 1.0; the only overlap
    # with left [1.0, 1.5) lives entirely in that sliver
    lf = pd.DataFrame({"lid": [1], "t_start": [1.0], "t_end": [1.5]})
    rf = pd.DataFrame({"rid": [2], "t_start": [0.5], "t_end": [1.0 + 5e-10]})
    got = ts.interval_overlap_join(
        spark.createDataFrame(lf), spark.createDataFrame(rf), bucket_width=1.0
    )
    assert [(r.lid, r.rid) for r in got.collect()] == [(1, 2)]

    # ms-scale timestamps: end exactly on a boundary is half-open —
    # touching intervals never match even where eps-subtraction no-ops
    lf = pd.DataFrame({"lid": [1], "t_start": [1e7], "t_end": [1e7 + 1.0]})
    rf = pd.DataFrame({"rid": [2], "t_start": [1e7 - 1.0], "t_end": [1e7]})
    assert ts.interval_overlap_join(
        spark.createDataFrame(lf), spark.createDataFrame(rf), bucket_width=1.0
    ).count() == 0


def test_ohlc_shard_string_tie_column(spark):
    """The shard path keeps the tie column's NATIVE type: a string tie
    must still break equal-time open/close endpoints deterministically
    (casting it to double would NULL it out and lose the tie-break),
    and shards must merge to the same bars ohlc_resample produces."""
    from blueetl_spark.operators import timeseries as ts

    rows = [
        # bucket 0 has a time tie at t=1.0: string ids "a" < "b"
        ("s", 1.0, "a", 10.0),
        ("s", 1.0, "b", 20.0),
        ("s", 9.0, "c", 30.0),
        ("s", 12.0, "d", 40.0),
    ]
    df = spark.createDataFrame(rows, "k string, t double, eid string, v double")
    whole = {
        (r["k"], r["bucket"]): (r["open"], r["close"])
        for r in ts.ohlc_resample(
            df, "t", "v", 10.0, by=["k"], tie_col="eid"
        ).collect()
    }
    assert whole[("s", 0)] == (10.0, 30.0)  # open = tie-min "a"
    shards = ts.ohlc_shard(
        df.filter("t < 5"), "t", "v", 10.0, by=["k"], tie_col="eid",
        batch_id="b0",
    ).unionByName(
        ts.ohlc_shard(
            df.filter("t >= 5"), "t", "v", 10.0, by=["k"], tie_col="eid",
            batch_id="b1",
        )
    )
    # native type survives the shard schema
    assert dict(shards.dtypes)["open_tie"] == "string"
    merged = {
        (r["k"], r["bucket"]): (r["open"], r["close"])
        for r in ts.merge_ohlc_shards(shards, by=["k"]).collect()
    }
    assert merged == whole


def test_merge_ohlc_shards_rejects_old_and_mixed_schema_dirs(spark, tmp_path):
    """merge_ohlc_shards refuses shard dirs from pre-versioning builds:
    a dir with NO __schema_version column (written entirely by a v1
    build) and a MIXED dir (v1 rows surfacing as NULL markers under
    mergeSchema) both raise actionable ValueErrors at merge time —
    replacing the old 'clear your shard dirs when upgrading' footnote
    with an enforced check. Current-version shards still merge."""
    import pytest as _pytest

    from blueetl_spark.operators import timeseries as ts

    df = spark.createDataFrame(
        [("s", 1.0, 10.0), ("s", 9.0, 30.0)], "k string, t double, v double"
    )
    cur = ts.ohlc_shard(df, "t", "v", 10.0, by=["k"], batch_id="b0")
    assert "__schema_version" in cur.columns

    # v-old dir: the exact layout a pre-versioning build wrote
    old_dir = str(tmp_path / "old_shards")
    cur.drop("__schema_version").write.parquet(old_dir)
    with _pytest.raises(ValueError, match="pre-versioning build"):
        ts.merge_ohlc_shards(spark.read.parquet(old_dir), by=["k"])

    # mixed dir: old appends + new appends, read the way a restart
    # reads it (mergeSchema) — old rows carry NULL markers
    mixed_dir = str(tmp_path / "mixed_shards")
    cur.drop("__schema_version").write.parquet(mixed_dir)
    ts.ohlc_shard(df, "t", "v", 10.0, by=["k"], batch_id="b1").write.mode(
        "append"
    ).parquet(mixed_dir)
    mixed = spark.read.option("mergeSchema", "true").parquet(mixed_dir)
    # version check is LAZY now (ADVICE r11: no eager job at call
    # time): building the merge plan succeeds; the raise_error guard
    # fires at action time, wrapped in Spark's job failure
    merged = ts.merge_ohlc_shards(mixed, by=["k"])
    with _pytest.raises(Exception, match="schema version"):
        merged.collect()

    # happy path: a current-version round-tripped dir merges fine
    ok_dir = str(tmp_path / "ok_shards")
    cur.write.parquet(ok_dir)
    out = ts.merge_ohlc_shards(spark.read.parquet(ok_dir), by=["k"]).head()
    assert (out["open"], out["close"], out["n"]) == (10.0, 30.0, 2)


def test_cusum_changepoint_finds_level_shift(spark):
    """A clean level shift peaks |S| exactly at the last pre-shift
    point; flat series stay near zero; matches a sequential replay."""
    from blueetl_spark.operators import timeseries as ts

    rows = []
    # key "shift": 0,0,0,0,0 then 10,10,10,10,10 -> mean 5, S ramps to
    # -25 at t=4 (the last low point)
    for i in range(5):
        rows.append(("shift", float(i), 0.0, i))
    for i in range(5, 10):
        rows.append(("shift", float(i), 10.0, i))
    # key "flat": constant 3.0 -> every S_i == 0, earliest time wins
    for i in range(6):
        rows.append(("flat", float(i), 3.0, i))
    df = spark.createDataFrame(rows, "k string, t double, v double, eid long")
    got = {
        r["k"]: (r["n"], r["mean"], r["max_dev"], r["t_at_max"])
        for r in ts.cusum_changepoint(
            df, "v", time_col="t", by=["k"], tie_col="eid"
        ).collect()
    }
    assert got["shift"] == (10, 5.0, 25.0, 4.0)
    assert got["flat"] == (6, 3.0, 0.0, 0.0)


def test_cusum_changepoint_matches_sequential_replay(spark):
    """Pseudo-random series: the Spark result equals a plain-Python
    sequential fold (the CUSUM definition)."""
    import random

    from blueetl_spark.operators import timeseries as ts

    rng = random.Random(3)
    rows = [
        (f"k{g}", float(t), round(rng.uniform(-5, 5), 3), t)
        for g in range(4)
        for t in range(200)
    ]
    df = spark.createDataFrame(rows, "k string, t double, v double, eid long")
    got = {
        r["k"]: (r["n"], r["max_dev"], r["t_at_max"])
        for r in ts.cusum_changepoint(
            df, "v", time_col="t", by=["k"], tie_col="eid"
        ).collect()
    }
    from collections import defaultdict

    series = defaultdict(list)
    for k, t, v, _ in rows:
        series[k].append((t, v))
    for k, pts in series.items():
        pts.sort()
        mean = round(sum(v for _, v in pts) / len(pts), 9)
        s, best, best_t = 0.0, -1.0, None
        for t, v in pts:
            s += v - mean
            if abs(s) > best:
                best, best_t = abs(s), t
        assert got[k][0] == len(pts)
        assert abs(got[k][1] - round(best, 6)) < 1e-9, k
        assert got[k][2] == best_t, k


def test_cusum_changepoint_single_data_shuffle_plan(spark):
    """The data crosses ONE hash exchange: the running-sum window and
    the peak-picking window share the same (key) partitioning, and the
    mean joins back as a broadcast. The only other exchange is the mean
    aggregate's map-side-combined partials (group-count-sized)."""
    from blueetl_spark.operators import timeseries as ts

    df = spark.createDataFrame(
        [("a", 1.0, 2.0, 1)], "k string, t double, v double, eid long"
    )
    plan = (
        ts.cusum_changepoint(df, "v", time_col="t", by=["k"], tie_col="eid")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    agg_partial_exchanges = sum(
        "partial_avg" in ln for ln in plan.splitlines()
    )
    # 2 windows, but exactly 1 data exchange + 1 partial-agg exchange
    assert len(exchanges) == 2, plan
    assert agg_partial_exchanges >= 1, plan
    assert plan.count("+- Window [") == 2, plan
    assert "BroadcastExchange" in plan


def test_ks_drift_matches_scipy_style_replay(spark):
    """D equals the sequential two-sample KS over sorted distinct
    values (tie-correct); identical distributions give 0; disjoint
    supports give 1; one-sided groups report NULL d_stat with the
    missing side's count 0."""
    from blueetl_spark.operators import timeseries as ts

    a_rows = [("k", float(v)) for v in [1, 2, 2, 3, 5, 8]]
    b_rows = [("k", float(v)) for v in [2, 3, 3, 4, 9]]
    a = spark.createDataFrame(a_rows + [("same", 1.0), ("same", 2.0)]
                              + [("disj", 1.0)] + [("only_a", 7.0)],
                              "g string, v double")
    b = spark.createDataFrame(b_rows + [("same", 1.0), ("same", 2.0)]
                              + [("disj", 9.0)],
                              "g string, v double")
    got = {
        r["g"]: (r["n_a"], r["n_b"], r["d_stat"])
        for r in ts.ks_drift(a, b, "v", by=["g"]).collect()
    }

    def brute(xs, ys):
        vals = sorted(set(xs) | set(ys))
        best = 0.0
        for v in vals:
            fa = sum(1 for x in xs if x <= v) / len(xs)
            fb = sum(1 for y in ys if y <= v) / len(ys)
            best = max(best, abs(fa - fb))
        return round(best, 6)

    xs = [v for _, v in a_rows]
    ys = [v for _, v in b_rows]
    assert got["k"] == (6, 5, brute(xs, ys))
    assert got["same"] == (2, 2, 0.0)
    assert got["disj"] == (1, 1, 1.0)
    assert got["only_a"] == (1, 0, None)


def test_compact_states_keeps_only_changes(spark):
    """Runs of identical state compact to their first row; NULL→NULL is
    unchanged while NULL→value is a change; multi-column state changes
    on ANY tracked column; ties order on the tie column; all original
    columns survive."""
    from blueetl_spark.operators import timeseries as ts

    rows = [
        ("a", 1.0, 1, "on", 5),
        ("a", 2.0, 2, "on", 5),      # unchanged -> dropped
        ("a", 3.0, 3, "off", 5),     # type changed -> kept
        ("a", 4.0, 4, "off", 6),     # second col changed -> kept
        ("a", 5.0, 5, None, 6),      # value -> NULL: a change
        ("a", 6.0, 6, None, 6),      # NULL -> NULL: unchanged
        ("b", 1.0, 7, "x", 1),       # first row of a key: kept
    ]
    df = spark.createDataFrame(
        rows, "g string, t double, e long, state string, lvl int"
    )
    kept = sorted(
        r["e"]
        for r in ts.compact_states(
            df, ["state", "lvl"], time_col="t", by=["g"], tie_col="e"
        ).collect()
    )
    assert kept == [1, 3, 4, 5, 7]
    # columns survive intact
    cols = ts.compact_states(
        df, ["state"], time_col="t", by=["g"], tie_col="e"
    ).columns
    assert cols == ["g", "t", "e", "state", "lvl"]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="state_cols"):
        ts.compact_states(df, [], time_col="t", by=["g"])


def test_theil_sen_robust_to_outliers(spark):
    """The median pairwise slope matches a sequential reference, shrugs
    off an outlier that wrecks OLS, skips same-timestamp pairs, and
    reports NULL slope when no pair has distinct times."""
    from itertools import combinations

    from blueetl_spark.operators import timeseries as ts

    # clean slope 2 with one wild outlier
    pts = [(0.0, 1.0), (1.0, 3.0), (2.0, 5.0), (3.0, 7.0), (4.0, 1000.0),
           (2.0, 5.0)]  # duplicate timestamp too
    rows = [("g", t, v) for t, v in pts] + [("const_t", 1.0, 5.0),
                                            ("const_t", 1.0, 9.0)]
    df = spark.createDataFrame(rows, "g string, t double, v double")
    got = {
        r["g"]: (r["n"], r["n_pairs"], r["slope"])
        for r in ts.theil_sen(df, "v", time_col="t", by=["g"],
                              round_to=None).collect()
    }

    srt = sorted(pts)
    slopes = sorted(
        (b[1] - a[1]) / (b[0] - a[0])
        for a, b in combinations(srt, 2)
        if a[0] != b[0]
    )
    ref = slopes[(len(slopes) + 1) // 2 - 1]  # lower median
    assert got["g"] == (6, len(slopes), ref)
    assert got["g"][2] == 2.0  # the outlier does not drag the median
    assert got["const_t"] == (2, 0, None)


def test_theil_sen_windowed_matches_sequential_reference(spark):
    """window= buckets points into fixed time windows, runs exact TS
    per window, and returns the lower median of window slopes —
    matching a sequential two-level replay; cross-window pairs are
    never considered; single-point windows contribute points but no
    slope; window<=0 raises."""
    from itertools import combinations

    import pytest as _pytest

    from blueetl_spark.operators import timeseries as ts

    # 3 windows of width 10: slopes 1, 3, and a single-point window
    pts = [(0.0, 0.0), (2.0, 2.0), (4.0, 4.0),          # w0: slope 1
           (10.0, 0.0), (13.0, 9.0), (16.0, 18.0),      # w1: slope 3
           (25.0, 7.0)]                                  # w2: no pair
    df = spark.createDataFrame([("g", t, v) for t, v in pts],
                               "g string, t double, v double")
    r = ts.theil_sen(df, "v", time_col="t", by=["g"], round_to=None,
                     window=10.0).head()

    # sequential reference
    def lower_median(xs):
        xs = sorted(xs)
        return xs[(len(xs) + 1) // 2 - 1]

    wins = {}
    for t_, v_ in pts:
        wins.setdefault(int(t_ // 10), []).append((t_, v_))
    wslopes, n_pairs = [], 0
    for w in wins.values():
        sl = [(b[1] - a[1]) / (b[0] - a[0])
              for a, b in combinations(sorted(w), 2) if a[0] != b[0]]
        n_pairs += len(sl)
        if sl:
            wslopes.append(lower_median(sl))
    assert (r["n"], r["n_windows"], r["n_pairs"]) == (7, 2, n_pairs)
    assert r["slope"] == lower_median(wslopes) == 1.0

    # a group whose only window has no distinct-time pair: NULL slope
    flat = spark.createDataFrame([("h", 1.0, 5.0), ("h", 1.0, 9.0)],
                                 "g string, t double, v double")
    fr = ts.theil_sen(flat, "v", time_col="t", by=["g"], round_to=None,
                      window=10.0).head()
    assert (fr["n"], fr["n_windows"], fr["n_pairs"], fr["slope"]) == (
        2, 0, 0, None)

    with _pytest.raises(ValueError, match="window must be positive"):
        ts.theil_sen(df, "v", time_col="t", by=["g"], window=0.0)


def test_ewma_level_replays_sequential_recurrence(spark):
    """The folded EWMA equals the sequential per-step recurrence seeded
    with the first observation; a one-point series returns that point;
    nulls are not observations; ties break on the tie column."""
    from pyspark.sql import functions as F  # noqa: F401

    from blueetl_spark.operators import timeseries as ts

    rows = [("a", 1.0, 0, 10.0), ("a", 2.0, 0, 20.0), ("a", 3.0, 0, 5.0),
            ("a", 3.0, 1, 7.0),            # tie on time -> event order
            ("a", 4.0, 0, None),           # null: not an observation
            ("b", 1.0, 0, 42.0)]
    df = spark.createDataFrame(rows, "g string, t double, e int, v double")
    got = {
        r["g"]: (r["n"], r["ewma"])
        for r in ts.ewma_level(df, "v", time_col="t", by=["g"],
                               alpha=0.3, tie_col="e").collect()
    }
    acc = 10.0
    for x in [20.0, 5.0, 7.0]:
        acc = 0.3 * x + 0.7 * acc
    assert got["a"] == (4, round(acc, 6))
    assert got["b"] == (1, 42.0)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="alpha"):
        ts.ewma_level(df, "v", time_col="t", alpha=0.0)


def test_psi_drift_replays_sequential_reference(spark):
    """PSI equals a sequential reimplementation (integer disc-quantile
    edges, tie-to-lower buckets, eps floor, bucket-ordered fold);
    identical samples give 0; a hard shift scores large; a group with
    no new rows reports NULL psi; a group absent from the reference is
    omitted."""
    import math

    from pyspark.sql import functions as F

    from blueetl_spark.operators import timeseries as ts

    B, EPS = 4, 1e-6
    ref_vals = [float(x) for x in [1, 1, 2, 3, 4, 5, 6, 7, 8, 8, 9, 12]]
    new_vals = [float(x) for x in [1, 2, 2, 2, 9, 10, 11, 12, 12, 13]]
    a = spark.createDataFrame(
        [("k", v) for v in ref_vals] + [("same", 1.0), ("same", 2.0),
                                        ("only_ref", 5.0)],
        "g string, v double",
    )
    b = spark.createDataFrame(
        [("k", v) for v in new_vals] + [("same", 1.0), ("same", 2.0),
                                        ("no_ref", 3.0)],
        "g string, v double",
    )
    got = {
        r["g"]: (r["n_ref"], r["n_new"], r["psi"])
        for r in ts.psi_drift(a, b, "v", by=["g"], buckets=B,
                              eps=EPS).collect()
    }

    def brute(xs, ys, buckets):
        n = len(xs)
        svals = sorted(xs)
        counts = {}
        cum = 0
        edges = {}
        # integer order-statistic edges over per-value counts
        from collections import Counter, OrderedDict
        cnt = OrderedDict(sorted(Counter(xs).items()))
        for v, c in cnt.items():
            prev, cum = cum, cum + c
            for i in range(prev * buckets // n + 1,
                           min(cum * buckets // n, buckets - 1) + 1):
                if i >= 1:
                    edges[i] = v
        es = [edges[i] for i in sorted(edges)]
        bx = lambda v: sum(1 for e in es if v > e)  # noqa: E731
        pc = Counter(bx(v) for v in xs)
        qc = Counter(bx(v) for v in ys)
        acc = 0.0
        for j in range(buckets):
            p = max(pc.get(j, 0) / len(xs), EPS)
            q = max(qc.get(j, 0) / len(ys), EPS)
            acc += (p - q) * math.log(p / q)
        return round(acc, 6)

    assert got["k"] == (12, 10, brute(ref_vals, new_vals, B))
    assert got["same"] == (2, 2, 0.0)
    assert got["only_ref"] == (1, 0, None)
    assert "no_ref" not in got
    assert got["k"][2] > 0.2  # the planted shift is a real drift score

    import pytest as _pytest

    with _pytest.raises(ValueError, match="buckets"):
        ts.psi_drift(a, b, "v", by=["g"], buckets=1)


def test_ks_drift_binned_bounds_window_input(spark):
    """The scale-caveat case: ONE group whose values are all distinct
    (distinct count == row count, the shape where the exact variant
    serializes in one task). bins=N caps the CDF window input at N
    rows per group, detects a real location shift, reports ~0 for
    identical samples, and replays the sequential brute-force binned
    statistic exactly."""
    from pyspark.sql import functions as F

    from blueetl_spark.operators import timeseries as ts

    n, bins = 5_000, 64
    base = spark.range(n).select(
        F.lit("g").alias("g"), (F.col("id") * 1.000001).alias("v")
    )
    shifted = spark.range(n).select(
        F.lit("g").alias("g"), (F.col("id") * 1.000001 + n / 2.0).alias("v")
    )
    out = ts.ks_drift(base, shifted, "v", by=["g"], bins=bins)
    row = out.head()
    assert (row["n_a"], row["n_b"]) == (n, n)
    # half the mass is disjoint → exact D = 0.5; 64 bins resolve it
    # to within one bucket's CDF mass
    assert abs(row["d_stat"] - 0.5) < 1.5 / bins

    # sequential replay of the binned statistic (same quantization)
    xs = [i * 1.000001 for i in range(n)]
    ys = [i * 1.000001 + n / 2.0 for i in range(n)]
    lo, hi = min(xs + ys), max(xs + ys)
    w = (hi - lo) / bins

    import math

    def bucket(v):
        # same expression shape as the operator: divide, then floor
        return min(int(math.floor((v - lo) / w)), bins - 1)

    bx, by_ = [bucket(v) for v in xs], [bucket(v) for v in ys]
    best = max(
        abs(
            sum(1 for x in bx if x <= t) / n
            - sum(1 for y in by_ if y <= t) / n
        )
        for t in range(bins)
    )
    assert row["d_stat"] == round(best, 6)

    # identical samples → 0 even through quantization; all-equal group
    # (hi == lo) degenerates to one bucket without dividing by zero
    same = ts.ks_drift(base, base, "v", by=["g"], bins=bins).head()
    assert same["d_stat"] == 0.0
    const = spark.range(10).select(
        F.lit("c").alias("g"), F.lit(3.0).alias("v")
    )
    degen = ts.ks_drift(const, const, "v", by=["g"], bins=bins).head()
    assert degen["d_stat"] == 0.0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bins"):
        ts.ks_drift(base, shifted, "v", by=["g"], bins=0)


def test_mann_whitney_known_case_and_edges(spark):
    """U and tie-corrected z match a sequential average-rank reference;
    identical samples give z 0 with u_a = n_a*n_b/2; an all-tied group
    gives NULL z (zero variance) but a defined U; one-sided groups
    report NULL u/z with the missing side's count 0."""
    from blueetl_spark.operators import timeseries as ts

    a_rows = [1.0, 2.0, 3.0]
    b_rows = [2.0, 3.0, 4.0]
    a = spark.createDataFrame(
        [("k", v) for v in a_rows]
        + [("same", 1.0), ("same", 2.0)]
        + [("tied", 5.0), ("tied", 5.0)]
        + [("only_a", 7.0)],
        "g string, v double",
    )
    b = spark.createDataFrame(
        [("k", v) for v in b_rows]
        + [("same", 1.0), ("same", 2.0)]
        + [("tied", 5.0), ("tied", 5.0)],
        "g string, v double",
    )
    got = {
        r["g"]: (r["n_a"], r["n_b"], r["u_a"], r["u_b"], r["z"])
        for r in ts.mann_whitney(a, b, "v", by=["g"]).collect()
    }

    def brute(xs, ys):
        import math
        from collections import Counter

        allv = sorted(xs + ys)
        ranks = {}
        cnt = Counter(allv)
        before = 0
        for v in sorted(cnt):
            ranks[v] = before + (cnt[v] + 1) / 2
            before += cnt[v]
        na, nb, n = len(xs), len(ys), len(xs) + len(ys)
        ra = sum(ranks[v] for v in xs)
        ua = ra - na * (na + 1) / 2
        ties = sum(t**3 - t for t in cnt.values())
        var = na * nb / 12 * ((n + 1) - ties / (n * (n - 1)))
        z = (ua - na * nb / 2) / math.sqrt(var) if var > 0 else None
        return (
            na,
            nb,
            round(ua, 6),
            round(na * nb - ua, 6),
            round(z, 6) if z is not None else None,
        )

    assert got["k"] == brute(a_rows, b_rows)
    # hand numbers for the docstring case: ranks 1, 2.5, 2.5, 4.5, 4.5, 6
    assert got["k"][2] == 2.0 and got["k"][3] == 7.0
    assert got["same"][2:] == (2.0, 2.0, 0.0)
    assert got["tied"] == (2, 2, 2.0, 2.0, None)
    assert got["only_a"] == (1, 0, None, None, None)


def test_mann_whitney_single_exchange_plan(spark):
    """The tagged union pre-aggregates to per-(group, value) counts in
    ONE data-sized exchange; the rank window and the final group
    aggregate reuse that partitioning (no second data shuffle)."""
    from blueetl_spark.operators import timeseries as ts

    a = spark.range(1000).selectExpr("id % 7 AS g", "id % 31 AS v")
    b = spark.range(1000).selectExpr("id % 7 AS g", "(id + 3) % 29 AS v")
    plan = (
        ts.mann_whitney(a, b, "v", by=["g"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    # one exchange on (g, v) for the pre-agg; the window repartitions to
    # (g) once; the final aggregate rides the window's partitioning
    assert len(exchanges) <= 2, plan


def test_seasonal_anomalies_flags_shifted_hour(spark):
    """A cell whose mean deviates from its own phase's baseline is
    flagged with the reference z; cells in line with their phase are
    not; zero-variance phases flag nothing."""
    from blueetl_spark.operators import timeseries as ts

    period, bucket = 100.0, 10.0
    rows = []
    # phase 0: baseline value 10 across 10 periods, but period 3 runs hot
    for p in range(10):
        for i in range(5):
            rows.append(("a", p * period + i, 100.0 if p == 3 else 10.0))
    # phase 1: identical everywhere -> zero variance, never flagged
    for p in range(10):
        rows.append(("a", p * period + 10.0, 7.0))
    df = spark.createDataFrame(rows, "g string, t double, v double")
    out = ts.seasonal_anomalies(
        df, "t", "v", by=["g"], period=period, bucket=bucket, z_thresh=2.0,
        scale=1000,
    ).collect()
    flagged = {(r["phase"], r["period_idx"]): r for r in out}
    assert (0, 3) in flagged
    r = flagged[(0, 3)]
    # milli-space reference over 45x10000 + 5x100000
    mu = (45 * 10000 + 5 * 100000) / 50
    var = (45 * 10000**2 + 5 * 100000**2) / 50 - mu * mu
    assert r["cell_mean"] == 100.0 and r["base_mean"] == round(mu / 1000, 6)
    assert r["z"] == round((100000 - mu) / var**0.5, 6)
    assert all(ph == 0 for ph, _ in flagged)


def test_grouped_ols2_matches_lstsq(spark):
    """Coefficients and R² match numpy's normal-equation solve on
    integer-quantization-exact data; collinear features and n<3 groups
    report NULLs; ridge shrinks slopes toward zero."""
    import numpy as np

    from blueetl_spark.operators import timeseries as ts

    rng_rows = []
    # integer-valued features/targets so quantization is lossless
    for i in range(40):
        x1, x2 = i % 7, (i * 3) % 5
        y = 2 * x1 - 3 * x2 + 5 + (i % 4)  # deterministic "noise"
        rng_rows.append(("g", float(y), float(x1), float(x2)))
    rng_rows += [("col", float(i), float(i), float(2 * i)) for i in range(9)]
    rng_rows += [("tiny", 1.0, 1.0, 2.0), ("tiny", 2.0, 2.0, 3.0)]
    df = spark.createDataFrame(rng_rows, "g string, y double, x1 double, x2 double")
    got = {
        r["g"]: r
        for r in ts.grouped_ols2(df, "y", "x1", "x2", by=["g"]).collect()
    }

    sub = [(y, x1, x2) for g, y, x1, x2 in rng_rows if g == "g"]
    A = np.array([[1.0, x1, x2] for _, x1, x2 in sub])
    yv = np.array([y for y, _, _ in sub])
    beta = np.linalg.solve(A.T @ A, A.T @ yv)
    pred = A @ beta
    r2 = 1 - ((yv - pred) ** 2).sum() / ((yv - yv.mean()) ** 2).sum()
    r = got["g"]
    assert abs(r["b0"] - beta[0]) < 1e-4
    assert abs(r["b1"] - beta[1]) < 1e-4
    assert abs(r["b2"] - beta[2]) < 1e-4
    assert abs(r["r2"] - r2) < 1e-4

    assert got["col"]["b1"] is None and got["col"]["r2"] is None
    assert got["tiny"]["b0"] is None

    shrunk = {
        r["g"]: r
        for r in ts.grouped_ols2(
            df, "y", "x1", "x2", by=["g"], ridge=10.0
        ).collect()
    }
    assert abs(shrunk["g"]["b1"]) < abs(got["g"]["b1"])
    assert abs(shrunk["g"]["b2"]) < abs(got["g"]["b2"])
    # ridge regularizes the collinear group into a solvable system
    assert shrunk["col"]["b1"] is not None


def test_theil_sen_exact_path_group_bound(spark):
    """VERDICT r11 #6: the exact O(n^2) path enforces its bounded-group
    contract — a group past max_group_points fails the job with an
    error naming the window= escape hatch (pareto_frontier candidate-
    gate discipline); the window path is the documented default for
    unbounded groups and ignores the bound by construction."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from blueetl_spark.operators.timeseries import theil_sen

    df = spark.range(100).select(
        (F.col("id") % 2).alias("g"),
        F.col("id").cast("double").alias("time"),
        (F.col("id") * 2).cast("double").alias("v"),
    )
    with _pytest.raises(Exception, match="max_group_points=10.*window="):
        theil_sen(df, "v", by=["g"], max_group_points=10).collect()
    with _pytest.raises(ValueError, match="max_group_points"):
        theil_sen(df, "v", by=["g"], max_group_points=1)
    # within the bound: exact slope of the clean line
    rows = theil_sen(df, "v", by=["g"]).collect()
    assert all(r.slope == 2.0 for r in rows)
    # bounded estimator unaffected by the gate
    assert theil_sen(
        df, "v", by=["g"], window=25.0, max_group_points=10
    ).count() == 2


def test_theil_sen_slope_kernel_evaluated_once(spark):
    """Optimization r13: the O(n²) pairwise-slope HOF is interpreted
    (no codegen CSE), so it must appear exactly ONCE in the optimized
    plan of each path — not repeated per output column (n_pairs + the
    two median references used to re-evaluate the quadratic kernel
    3-4× per group). `flatten(` is the kernel's unique marker."""
    from pyspark.sql import functions as F

    from blueetl_spark.operators.timeseries import theil_sen

    df = spark.range(40).select(
        (F.col("id") % 2).alias("g"),
        F.col("id").cast("double").alias("time"),
        (F.col("id") * 3).cast("double").alias("v"),
    )
    exact = theil_sen(df, "v", by=["g"])
    plan = exact._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("flatten(") == 1, plan
    windowed = theil_sen(df, "v", by=["g"], window=10.0)
    wplan = windowed._jdf.queryExecution().optimizedPlan().toString()
    assert wplan.count("flatten(") == 1, wplan
