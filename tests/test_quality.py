"""Declarative constraint checking (``operators/quality.py``).

The sf0.01 gate (`quality_checks`) hash-verifies the full suite against
DuckDB; these pin per-rule semantics (NULL handling, composite
uniqueness, FK), error cases, and the single-scan plan shape."""

from __future__ import annotations

import pytest

from blueetl_spark.operators.quality import check_constraints


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 50.0), (2, "b", None), (None, "zz", 7.0)],
        "k long, s string, v double",
    )


def test_rule_semantics(spark, df):
    ref = spark.createDataFrame([(1,), (9,)], "r long")
    rules = [
        {"type": "not_null", "column": "k"},
        {"type": "range", "column": "v", "lo": 0.0, "hi": 10.0},
        {"type": "range", "column": "k", "lo": 0.0},  # one-sided
        {"type": "regex", "column": "s", "pattern": "[a-b]"},
        {"type": "isin", "column": "s", "values": ["a", "b"]},
        {"type": "unique", "columns": ["k"]},
        {"type": "unique", "columns": ["k", "s"]},
        {"type": "ref", "column": "k", "ref": ref, "ref_col": "r"},
    ]
    got = {
        (r.rule, r.column): (r.n_checked, r.n_violations, r.passed)
        for r in check_constraints(df, rules).collect()
    }
    assert got[("not_null", "k")] == (4, 1, False)
    # NULL v is not checked by range (compose with not_null to forbid)
    assert got[("range", "v")] == (3, 1, False)
    assert got[("range", "k")] == (3, 0, True)  # one-sided bound
    assert got[("regex", "s")] == (4, 1, False)
    assert got[("isin", "s")] == (4, 1, False)
    # non-null k tuples: 1,2,2 -> 1 surplus duplicate
    assert got[("unique", "k")] == (3, 1, False)
    assert got[("unique", "k,s")] == (3, 1, False)
    # k in {1,2,2}; ref holds {1,9} -> both 2-rows missing
    assert got[("ref", "k")] == (3, 2, False)


def test_all_passing_suite(spark, df):
    out = check_constraints(
        df, [{"type": "isin", "column": "s", "values": ["a", "b", "zz"]}]
    ).collect()
    assert out[0].passed and out[0].n_violations == 0


def test_errors(spark, df):
    with pytest.raises(ValueError, match="non-empty"):
        check_constraints(df, [])
    with pytest.raises(ValueError, match="unknown rule"):
        check_constraints(df, [{"type": "nope", "column": "k"}])


def test_row_local_rules_fold_into_one_scan(spark, df):
    """Everything except FK rules must cost exactly one pass over the
    data — one aggregate (with Expand for the distinct), no joins."""
    rules = [
        {"type": "not_null", "column": "k"},
        {"type": "range", "column": "v", "lo": 0.0, "hi": 10.0},
        {"type": "unique", "columns": ["k"]},
    ]
    plan = (
        check_constraints(df, rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert plan.count("Scan ExistingRDD") == 1


def test_empty_frame_zero_counts(spark):
    empty = spark.createDataFrame([], "k long")
    out = check_constraints(
        empty, [{"type": "not_null", "column": "k"},
                {"type": "unique", "columns": ["k"]}]
    ).collect()
    assert all(r.n_checked == 0 and r.passed for r in out)


def test_rule_idx_distinguishes_duplicate_rules(spark, df):
    """Two rules of the same (type, column) stay separate rows, keyed
    by their position in the rules list."""
    rules = [
        {"type": "range", "column": "v", "lo": 0.0, "hi": 10.0},
        {"type": "range", "column": "v", "lo": 0.0, "hi": 100.0},
    ]
    got = {
        r.rule_idx: (r.n_checked, r.n_violations, r.passed)
        for r in check_constraints(df, rules).collect()
    }
    assert got[0] == (3, 1, False)
    assert got[1] == (3, 0, True)


def test_quoted_column_names_are_safe(spark):
    """A quote in a column name must not break the generated plan
    (labels are typed lit() columns, not interpolated SQL literals)."""
    df = spark.createDataFrame([(1,), (None,)], ["long"]).toDF("it's")
    out = check_constraints(
        df, [{"type": "not_null", "column": "it's"}]
    ).collect()
    assert out[0].column == "it's"
    assert (out[0].n_checked, out[0].n_violations) == (2, 1)


def test_k_anonymity_classes_and_report(spark):
    """Class sizes, k-violation flags, l-diversity counts and the
    release-gate summary all replicate a hand-checkable fixture; NULL
    quasi values form their own class; guards raise."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from blueetl_spark.operators.quality import k_anonymity, k_anonymity_report

    rows = (
        [("10001", "M", "flu") for _ in range(5)]
        + [("10001", "F", "flu"), ("10001", "F", "cold")]
        + [("10002", "M", "flu"), (None, "F", "cold")]
    )
    df = spark.createDataFrame(rows, "zip string, sex string, dx string")
    classes = {
        (r.zip, r.sex): (r.class_size, r.violates_k, r.l_distinct)
        for r in k_anonymity(
            df, ["zip", "sex"], k=3, sensitive_col="dx"
        ).collect()
    }
    assert classes == {
        ("10001", "M"): (5, False, 1),   # k-anonymous but l=1: leaks dx
        ("10001", "F"): (2, True, 2),
        ("10002", "M"): (1, True, 1),
        (None, "F"): (1, True, 1),       # NULL zip is its own class
    }
    rep = k_anonymity_report(
        df, ["zip", "sex"], k=3, sensitive_col="dx", l=2
    ).head()
    assert (rep.n_rows, rep.n_classes, rep.min_class_size) == (9, 4, 1)
    assert (rep.violating_classes, rep.violating_rows) == (3, 4)
    assert rep.l_violating_classes == 3
    assert rep.at_risk_fraction == round(4 / 9, 6)

    with _pytest.raises(ValueError, match="quasi_cols"):
        k_anonymity(df, [])
    with _pytest.raises(ValueError, match="k must"):
        k_anonymity(df, ["zip"], k=1)
