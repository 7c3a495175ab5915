"""Funnel + retention-cohort operators (``operators/behavior.py``).

The sf0.01 gates (`funnel_conversion`, `retention_cohorts`) hash-verify
against DuckDB; these pin the strict-ordering semantics, edge cases,
and the plan shape (one user-key shuffle, no window/sort)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from blueetl_spark.operators.behavior import funnel, retention_cohorts


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        # user 1 completes a -> b -> c in order
        (1, "a", 1.0), (1, "b", 2.0), (1, "c", 3.0),
        # user 2: b before a -> stage 0 only
        (2, "b", 4.0), (2, "a", 5.0),
        # user 3: b at the SAME time as a (strict: not counted), then c
        (3, "a", 1.0), (3, "b", 1.0), (3, "c", 2.0),
        # user 4: c between first b and a later b -> full funnel
        (4, "a", 1.0), (4, "b", 2.0), (4, "b", 5.0), (4, "c", 3.0),
        # user 5: only c -> appears nowhere
        (5, "c", 9.0),
        # user 6: unrelated types only
        (6, "x", 1.0),
    ]
    return spark.createDataFrame(rows, "user_id long, event_type string, time double")


def test_funnel_strict_sequential_min(spark, ev):
    got = {r.stage: (r.step, r.users) for r in funnel(ev, ["a", "b", "c"]).collect()}
    assert got == {0: ("a", 4), 1: ("b", 2), 2: ("c", 2)}


def test_funnel_zero_tail_and_order(spark, ev):
    out = funnel(ev, ["c", "x", "a"]).collect()
    # c first: users 1,3,4,5 have c; x after c: nobody (6's x has no c);
    # zero tail stays zero rows with explicit 0 counts
    assert [(r.stage, r.step, r.users) for r in out] == [
        (0, "c", 4), (1, "x", 0), (2, "a", 0)
    ]


def test_funnel_single_step_and_errors(spark, ev):
    assert funnel(ev, ["b"]).collect()[0].users == 4  # users 1,2,3,4
    with pytest.raises(ValueError, match="non-empty"):
        funnel(ev, [])
    with pytest.raises(ValueError, match="distinct"):
        funnel(ev, ["a", "a"])


def test_funnel_plan_one_user_shuffle_no_window(spark, ev):
    plan = (
        funnel(ev, ["a", "b", "c"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan and "SortMergeJoin" not in plan
    # the only wide ops: the user-key groupBy and the k-row final tally
    assert plan.count("Exchange hashpartitioning") <= 1


def test_funnel_times_gap_stats(spark):
    from blueetl_spark.operators.behavior import funnel_times

    rows = [
        (1, "a", 1.0), (1, "b", 3.0), (1, "c", 7.0),
        (2, "a", 0.0), (2, "b", 10.0),
        (3, "a", 5.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, time double")
    got = {
        r.stage: (r.users, r.median_gap, r.avg_gap)
        for r in funnel_times(df, ["a", "b", "c"]).collect()
    }
    assert got[0] == (3, None, None)
    assert got[1] == (2, 6.0, 6.0)  # gaps 2 and 10
    assert got[2] == (1, 4.0, 4.0)
    # unreached tail stage: zero users, null gaps
    got2 = {
        r.stage: (r.users, r.median_gap)
        for r in funnel_times(df, ["c", "a"]).collect()
    }
    assert got2[1] == (0, None)


def test_event_transitions_row_normalized(spark):
    from blueetl_spark.operators.behavior import event_transitions

    rows = [
        (1, "a", 1.0, 1), (1, "b", 2.0, 2), (1, "a", 3.0, 3),
        (1, "c", 4.0, 4),
        (2, "a", 1.0, 5), (2, "b", 2.0, 6),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, time double, eid long"
    )
    got = {
        (r.from_type, r.to_type): (r.n, r.prob)
        for r in event_transitions(df, tie_col="eid").collect()
    }
    # from a: a->b twice, a->c once
    assert got[("a", "b")] == (2, round(2 / 3, 6))
    assert got[("a", "c")] == (1, round(1 / 3, 6))
    assert got[("b", "a")] == (1, 1.0)
    # single-event user 3 contributes nothing
    assert ("c", "a") not in got


def test_event_transitions_equal_time_tie_break(spark):
    from blueetl_spark.operators.behavior import event_transitions

    rows = [(1, "x", 1.0, 2), (1, "y", 1.0, 1)]  # y first by eid
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, time double, eid long"
    )
    got = {(r.from_type, r.to_type) for r in
           event_transitions(df, tie_col="eid").collect()}
    assert got == {("y", "x")}


def test_event_sequences_ngrams(spark):
    from blueetl_spark.operators.behavior import event_sequences

    rows = [
        (1, "a", 1.0), (1, "b", 2.0), (1, "c", 3.0),
        (2, "a", 1.0), (2, "b", 2.0),
        (3, "z", 9.0),  # shorter than n: contributes nothing
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, time double")
    got = {r.seq: r.n_occ for r in event_sequences(df, n=2).collect()}
    assert got == {"a b": 2, "b c": 1}
    assert {r.seq for r in event_sequences(df, n=3).collect()} == {"a b c"}
    # min_count filter
    assert {r.seq for r in event_sequences(df, n=2, min_count=2).collect()} == {"a b"}
    with pytest.raises(ValueError, match="n must be"):
        event_sequences(df, n=0)


def test_funnel_property_random_streams_match_fixpoint(spark):
    """Property check of the fold: on random event streams the funnel
    counts must equal a brute-force sequential-min fixpoint computed in
    plain Python (the SQL oracle's semantics)."""
    import random

    rng = random.Random(99)
    steps = ["a", "b", "c", "d"]
    rows = []
    for u in range(60):
        n = rng.randrange(0, 12)
        ts = rng.sample(range(1000), n)
        for t in ts:
            rows.append((u, rng.choice(steps + ["x", "y"]), float(t)))
    if not rows:
        rows = [(0, "a", 1.0)]
    df = spark.createDataFrame(rows, "user_id long, event_type string, time double")

    # brute force: per user, t_k = min{t : type==steps[k], t > t_{k-1}}
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, ty, t in rows:
        by_user[u].append((t, ty))
    expected = [0] * len(steps)
    for evs in by_user.values():
        prev = None
        for k, s in enumerate(steps):
            cand = [
                t for t, ty in evs
                if ty == s and (k == 0 or (prev is not None and t > prev))
            ]
            if not cand or (k > 0 and prev is None):
                prev = None
                break
            prev = min(cand)
            expected[k] += 1

    got = {r.stage: r.users for r in funnel(df, steps).collect()}
    assert [got[k] for k in range(len(steps))] == expected


def test_retention_cohorts_matrix(spark):
    rows = [
        (1, dt.datetime(2024, 1, 5)), (1, dt.datetime(2024, 2, 7)),
        (1, dt.datetime(2024, 2, 9)),  # active twice in offset 1 -> one
        (2, dt.datetime(2024, 1, 20)), (2, dt.datetime(2024, 3, 2)),
        (3, dt.datetime(2024, 2, 1)),
    ]
    df = spark.createDataFrame(rows, "u long, d timestamp")
    got = {
        (r.cohort, r.month_offset): r.n_users
        for r in retention_cohorts(df, "u", "d").collect()
    }
    assert got == {
        ("2024-01", 0): 2, ("2024-01", 1): 1, ("2024-01", 2): 1,
        ("2024-02", 0): 1,
    }


def test_retention_cohorts_year_boundary(spark):
    rows = [(1, dt.datetime(2023, 12, 31)), (1, dt.datetime(2024, 1, 1))]
    df = spark.createDataFrame(rows, "u long, d timestamp")
    got = {
        (r.cohort, r.month_offset): r.n_users
        for r in retention_cohorts(df, "u", "d").collect()
    }
    assert got == {("2023-12", 0): 1, ("2023-12", 1): 1}


def test_funnel_quoted_step_names(spark):
    """A quote in a step name must not break the generated plan (labels
    are typed lit() columns, not interpolated SQL literals)."""
    rows = [
        (1, "sign'up", 1.0),
        (1, "buy", 2.0),
        (2, "sign'up", 1.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, time double")
    got = {r["step"]: r["users"] for r in funnel(df, ["sign'up", "buy"]).collect()}
    assert got == {"sign'up": 2, "buy": 1}


def test_touch_attribution_first_and_last(spark):
    """Per conversion: first touch ever, latest touch before it;
    conversions never attribute to each other; a conversion with no
    prior touch gets NULL; equal-time ties resolve on the tie column."""
    from blueetl_spark.operators.behavior import touch_attribution

    rows = [
        # user A: view -> click -> BUY -> email -> BUY
        ("A", 1.0, 1, "view", 0.0),
        ("A", 2.0, 2, "click", 0.0),
        ("A", 3.0, 3, "purchase", 9.0),
        ("A", 4.0, 4, "email", 0.0),
        ("A", 5.0, 5, "purchase", 5.0),
        # user B: cold conversion (no touches)
        ("B", 1.0, 6, "purchase", 3.0),
        # user C: touch and purchase at the SAME time -> tie on event_id
        ("C", 1.0, 7, "ad", 0.0),
        ("C", 1.0, 8, "purchase", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "gid string, time double, event_id long, "
              "event_type string, value double"
    )
    out = {
        (r["gid"], r["event_id"]): (r["first_touch"], r["last_touch"])
        for r in touch_attribution(
            df, "purchase", user_col="gid", time_col="time",
            tie_col="event_id", keep_cols=["value"],
        ).collect()
    }
    assert out[("A", 3)] == ("view", "click")
    assert out[("A", 5)] == ("view", "email")   # first ever, latest before
    assert out[("B", 6)] == (None, None)        # cold conversion
    assert out[("C", 8)] == ("ad", "ad")        # same-time touch counts


def test_rfm_scores_exact_rank_binning(spark):
    """Scores are exact integer rank quintiles with a (metric, user)
    total order: the top spender/most frequent/most recent user lands
    in the top bin, the weakest in bin 1, and the segment code
    concatenates the three scores."""
    from blueetl_spark.operators.behavior import rfm_scores

    rows = []
    for u in range(10):
        # user u: u+1 events at times 1..u+1 with value 10*(u+1)
        for t in range(u + 1):
            rows.append((u, float(t + 1), 10 * (u + 1)))
    df = spark.createDataFrame(rows, "u long, t double, v long")
    got = {r["u"]: r for r in
           rfm_scores(df, "u", "t", "v", bins=5).collect()}
    # user 9: latest time 10, 10 events, monetary 1000 -> top on all
    assert got[9]["segment"] == "555"
    assert got[0]["segment"] == "111"
    # metrics are exact
    assert (got[9]["frequency"], got[9]["monetary"]) == (10, 1000)
    # exact rank binning: 10 users over 5 bins = 2 per bin on every axis
    from collections import Counter

    for col in ("r_score", "f_score", "m_score"):
        assert Counter(r[col] for r in got.values()) == Counter(
            {1: 2, 2: 2, 3: 2, 4: 2, 5: 2}
        )

    import pytest as _pytest

    with _pytest.raises(ValueError, match="bins"):
        rfm_scores(df, "u", "t", "v", bins=0)


def test_kaplan_meier_textbook_curve(spark):
    """Matches the hand-computed KM curve: censor-only times don't
    step the curve but shrink the at-risk set; tied events share a
    step; the curve hits 0 when the last at-risk subject events; a
    censored-only group emits no rows."""
    from blueetl_spark.operators.behavior import kaplan_meier

    rows = [
        ("g", 1.0, True), ("g", 2.0, True), ("g", 3.0, False),
        ("g", 4.0, True), ("g", 5.0, False), ("g", 6.0, True),
        ("tie", 1.0, True), ("tie", 1.0, True), ("tie", 2.0, False),
        ("cens", 1.0, False), ("cens", 2.0, False),
    ]
    df = spark.createDataFrame(rows, "grp string, duration double, event boolean")
    out = kaplan_meier(df, "duration", "event", by=["grp"]).collect()
    got = {
        (r["grp"], r["t"]): (r["n_risk"], r["n_events"], r["n_censored"],
                             r["survival"])
        for r in out
    }
    assert got[("g", 1.0)] == (6, 1, 0, round(5 / 6, 6))
    assert got[("g", 2.0)] == (5, 1, 0, round(5 / 6 * 4 / 5, 6))
    assert ("g", 3.0) not in got  # censor-only time: no step
    assert got[("g", 4.0)] == (3, 1, 0, round(5 / 6 * 4 / 5 * 2 / 3, 6))
    assert got[("g", 6.0)] == (1, 1, 0, 0.0)
    assert got[("tie", 1.0)] == (3, 2, 0, round(1 / 3, 6))
    assert not any(g == "cens" for g, _ in got)


def test_log_rank_reference_and_edges(spark):
    """chi2 matches a sequential hypergeometric reference; identical
    samples give ~0; a one-sided comparison is NULL; an all-censored
    pair emits no row."""
    import pytest

    from blueetl_spark.operators.behavior import log_rank

    def mk(rows):
        return spark.createDataFrame(rows, "duration double, event boolean")

    a = mk([(1.0, True), (2.0, True), (4.0, False), (6.0, True)])
    b = mk([(3.0, True), (5.0, True), (5.0, False), (7.0, True), (8.0, False)])
    r = log_rank(a, b, "duration", "event").head()

    def brute(xs, ys):
        times = sorted({t for t, e in xs + ys if e})
        u = v = 0.0
        for t in times:
            na = sum(1 for d, _ in xs if d >= t)
            nb = sum(1 for d, _ in ys if d >= t)
            da = sum(1 for d, e in xs if d == t and e)
            db = sum(1 for d, e in ys if d == t and e)
            n, d = na + nb, da + db
            u += da - d * na / n
            if n > 1:
                v += d * (na / n) * ((n - na) / n) * ((n - d) / (n - 1))
        return u * u / v

    xs = [(1.0, True), (2.0, True), (4.0, False), (6.0, True)]
    ys = [(3.0, True), (5.0, True), (5.0, False), (7.0, True), (8.0, False)]
    assert (r.n_a, r.n_b) == (4, 5)
    assert r.chi2 == pytest.approx(brute(xs, ys), abs=1e-6)

    same = mk([(1.0, True), (2.0, True), (3.0, False)])
    s = log_rank(same, same, "duration", "event").head()
    assert s.chi2 == 0.0

    one = log_rank(a, mk([]), "duration", "event").head()
    assert (one.n_a, one.n_b, one.chi2) == (4, 0, None)

    cens = mk([(1.0, False), (2.0, False)])
    assert log_rank(cens, cens, "duration", "event").count() == 0


def test_cohort_ltv_hand_curve(spark):
    """Cumulative value accrues per cohort in offset order; the per-user
    denominator is frozen at month-0 size; cents are floor-exact; a
    second cohort gets its own curve."""
    from datetime import datetime

    from blueetl_spark.operators.behavior import cohort_ltv

    d = datetime
    rows = [
        # cohort 2024-01: users 1, 2 acquired; u1 spends again in March
        (1, d(2024, 1, 5), 10.00), (2, d(2024, 1, 20), 5.559),
        (1, d(2024, 3, 1), 4.00),
        # cohort 2024-02: user 3 alone
        (3, d(2024, 2, 2), 7.00),
    ]
    df = spark.createDataFrame(rows, "u long, dt timestamp, v double")
    out = {
        (r["cohort"], r["month_offset"]): r
        for r in cohort_ltv(df, "u", "dt", "v").collect()
    }
    m0 = out[("2024-01", 0)]
    assert (m0["cohort_size"], m0["n_active"]) == (2, 2)
    assert m0["value_c"] == 1000 + 555  # floor(5.559*100) = 555
    assert m0["cum_value_c"] == 1555
    assert m0["ltv_per_user"] == round(15.55 / 2, 6)
    m2 = out[("2024-01", 2)]
    assert (m2["n_active"], m2["value_c"]) == (1, 400)
    assert m2["cum_value_c"] == 1955
    assert m2["ltv_per_user"] == round(19.55 / 2, 6)
    assert ("2024-01", 1) not in out  # no activity that month
    b0 = out[("2024-02", 0)]
    assert (b0["cohort_size"], b0["cum_value_c"]) == (1, 700)


def test_cuped_matches_numpy_reference_and_reduces_variance(spark):
    """theta/means/variances match a sequential numpy replay of the
    CUPED definition on a correlated synthetic A/B; the adjusted
    variance is genuinely smaller; a constant covariate NULLs the
    cuped columns; NULL-field rows are excluded."""
    import numpy as np

    from blueetl_spark.operators.behavior import cuped

    rng = np.random.default_rng(5)
    x = rng.integers(0, 1000, size=400)
    noise = rng.integers(-50, 50, size=400)
    variant = np.where(np.arange(400) % 2 == 0, "A", "B")
    lift = np.where(variant == "A", 0, 30)
    y = 2 * x + noise + lift  # strongly covariate-driven metric
    rows = [
        (str(variant[i]), int(y[i]), int(x[i])) for i in range(400)
    ] + [("A", None, 5), (None, 3, 5), ("B", 7, None)]
    df = spark.createDataFrame(rows, "variant string, y long, x long")
    got = {r["variant"]: r for r in cuped(df, "y", "x", "variant").collect()}

    theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    pmx = x.mean()
    for v in ("A", "B"):
        m = variant == v
        r = got[v]
        assert r["n"] == int(m.sum())
        assert r["theta"] == round(float(theta), 6)
        assert abs(r["mean_y"] - y[m].mean()) < 1e-6
        yc = y[m] - theta * (x[m] - pmx)
        assert abs(r["mean_y_cuped"] - yc.mean()) < 1e-6
        assert abs(r["var_y_cuped"] - yc.var()) < 1e-4
        # the whole point: the covariate-driven variance is gone
        assert r["var_y_cuped"] < 0.05 * r["var_y"]
        assert r["var_reduction"] > 0.95
    # the A-vs-B lift survives the adjustment (~30)
    assert abs((got["B"]["mean_y_cuped"] - got["A"]["mean_y_cuped"]) - 30) < 10

    const = cuped(
        spark.createDataFrame(
            [("A", 5, 7), ("A", 9, 7), ("B", 6, 7)],
            "variant string, y long, x long",
        ),
        "y",
        "x",
        "variant",
    ).collect()
    assert all(r["theta"] is None and r["mean_y_cuped"] is None for r in const)
    assert all(r["mean_y"] is not None for r in const)


def test_exact_moment_ops_reject_fractional_inputs(spark):
    """ADVICE r11: cuped / jackknife_ratio / target_encode_kfold cast
    their value columns to BIGINT for exact moments; a fractional input
    would silently truncate (0.9 -> 0). The documented integer-
    quantization precondition is now enforced with an actionable
    SchemaError naming the quantize recipe."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from blueetl_spark.operators.behavior import cuped
    from blueetl_spark.operators.profile import jackknife_ratio
    from blueetl_spark.operators.sampling import target_encode_kfold

    df = spark.range(10).select(
        F.col("id").alias("unit"),
        (F.col("id") % 2).cast("string").alias("variant"),
        (F.col("id") * 0.9).alias("y_frac"),
        F.col("id").alias("y_int"),
        F.col("id").alias("x_int"),
        F.lit("c").alias("cat"),
    )
    with _pytest.raises(Exception, match="fractional"):
        cuped(df, "y_frac", "x_int", "variant")
    with _pytest.raises(Exception, match="fractional"):
        cuped(df, "y_int", "y_frac", "variant")
    with _pytest.raises(Exception, match="fractional"):
        jackknife_ratio(df, "unit", "y_frac", "x_int")
    with _pytest.raises(Exception, match="fractional"):
        target_encode_kfold(df, "cat", "y_frac", key_col="unit")
    # integer inputs still pass construction
    assert cuped(df, "y_int", "x_int", "variant").count() > 0
    assert jackknife_ratio(df, "unit", "y_int", "x_int").count() > 0
    assert target_encode_kfold(df, "cat", "y_int", key_col="unit").count() > 0


def test_nelson_aalen_hand_example(spark):
    """H(t) and its variance replicate the textbook hand calculation on
    a small censored cohort; censor-only times never emit a row but do
    shrink the at-risk set."""
    data = [(6, 1), (6, 1), (6, 1), (6, 0), (7, 1), (9, 0), (10, 1),
            (10, 0), (11, 0), (13, 1)]
    df = spark.createDataFrame(data, "d int, e int")
    from blueetl_spark.operators.behavior import nelson_aalen

    rows = {r.t: r for r in nelson_aalen(df, "d", "e").collect()}
    assert set(rows) == {6, 7, 10, 13}  # t=9,11 censor-only: no step
    assert (rows[6].n_risk, rows[6].n_events, rows[6].n_censored) == (10, 3, 1)
    assert rows[6].cum_hazard == 0.3
    assert rows[7].cum_hazard == 0.466667   # 0.3 + 1/6
    assert rows[10].cum_hazard == 0.716667  # + 1/4
    assert rows[13].cum_hazard == 1.716667  # + 1/1
    assert rows[6].var_hazard == 0.03       # 3/100
    assert rows[13].var_hazard == 1.120278


def test_nelson_aalen_tracks_kaplan_meier(spark):
    """-log(S_KM) ~= H_NA on a no-tie cohort (the estimators agree to
    first order); both see identical at-risk/event columns."""
    import math

    from blueetl_spark.operators.behavior import kaplan_meier, nelson_aalen

    data = [(float(t), int(t % 3 != 0)) for t in range(1, 40)]
    df = spark.createDataFrame(data, "d double, e int")
    km = {r.t: r for r in kaplan_meier(df, "d", "e").collect()}
    na = {r.t: r for r in nelson_aalen(df, "d", "e").collect()}
    assert set(km) == set(na)
    for t in km:
        assert (km[t].n_risk, km[t].n_events) == (na[t].n_risk, na[t].n_events)
        # -log(1-x) >= x term-by-term, so H is always below -log(S);
        # the gap accumulates Sum d/(2n^2) and only blows up in the tail
        assert na[t].cum_hazard <= -math.log(km[t].survival) + 1e-9
        if na[t].n_risk >= 5:
            assert -math.log(km[t].survival) - na[t].cum_hazard < 0.1
