"""Grouped OLS (``timeseries.grouped_linear_fit``) and market-basket
association rules (``operators/basket.py``).

The sf0.01 gates (`value_trend`, `basket_rules`) hash-verify against
DuckDB; these pin the closed-form fit on known points, degenerate
groups, NULL pairing, hand-computed basket metrics, duplicate collapse,
and the mega-basket valve."""

from __future__ import annotations

import pytest

from blueetl_spark.operators.basket import association_rules
from blueetl_spark.operators.timeseries import grouped_linear_fit


def test_linear_fit_exact_line_and_noise(spark):
    rows = (
        # g "a": exact y = 2x + 1 -> slope 2, intercept 1, r2 1
        [("a", float(x), 2.0 * x + 1.0) for x in range(5)]
        # g "b": constant x -> zero variance -> NULL fit
        + [("b", 3.0, 1.0), ("b", 3.0, 5.0)]
        # g "c": single point -> NULL fit
        + [("c", 1.0, 1.0)]
        # g "d": constant y -> slope 0, vy = 0 -> r2 NULL
        + [("d", 0.0, 7.0), ("d", 1.0, 7.0), ("d", 2.0, 7.0)]
    )
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {
        r.g: (r.n, r.slope, r.intercept, r.r2)
        for r in grouped_linear_fit(df, "x", "y", by=["g"]).collect()
    }
    assert got["a"] == (5, 2.0, 1.0, 1.0)
    assert got["b"] == (2, None, None, None)
    assert got["c"] == (1, None, None, None)
    assert got["d"] == (3, 0.0, 7.0, None)


def test_linear_fit_pairwise_complete_nulls(spark):
    rows = [
        ("a", 0.0, 1.0), ("a", 1.0, 3.0),
        ("a", None, 100.0), ("a", 50.0, None),  # excluded from the sums
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    r = grouped_linear_fit(df, "x", "y", by=["g"]).collect()[0]
    assert (r.n, r.slope, r.intercept) == (2, 2.0, 1.0)


def test_linear_fit_global_no_groups(spark):
    df = spark.createDataFrame(
        [(float(x), 3.0 * x) for x in range(4)], "x double, y double"
    )
    r = grouped_linear_fit(df, "x", "y").collect()[0]
    assert (r.slope, r.intercept, r.r2) == (3.0, 0.0, 1.0)


def test_association_rules_hand_computed(spark):
    # baskets: 1:{A,B}, 2:{A,B}, 3:{A,C}, 4:{B} -> 4 baskets
    rows = [
        (1, "A"), (1, "B"), (1, "B"),  # duplicate (1,B) collapses
        (2, "A"), (2, "B"),
        (3, "A"), (3, "C"),
        (4, "B"),
    ]
    df = spark.createDataFrame(rows, "b long, i string")
    out = {
        (r.item_a, r.item_b): r
        for r in association_rules(df, "b", "i", min_pair_count=1).collect()
    }
    ab = out[("A", "B")]
    # pair in 2 of 4 baskets; A in 3, B in 3
    assert ab.n_pairs == 2
    assert ab.support == round(2 / 4, 6)
    assert ab.confidence_a_b == round(2 / 3, 6)
    assert ab.lift == round((2 / 4) / ((3 / 4) * (3 / 4)), 6)
    assert out[("A", "C")].n_pairs == 1
    # min_pair_count filters singletons
    kept = association_rules(df, "b", "i", min_pair_count=2).collect()
    assert {(r.item_a, r.item_b) for r in kept} == {("A", "B")}


def test_association_rules_mega_basket_valve(spark):
    rows = [(1, f"i{k}") for k in range(10)] + [(2, "i0"), (2, "i1")]
    df = spark.createDataFrame(rows, "b long, i string")
    # basket 1 excluded by the valve: only basket 2's pair remains, and
    # totals/item counts exclude the dropped basket too
    out = association_rules(
        df, "b", "i", min_pair_count=1, max_basket_size=5
    ).collect()
    assert len(out) == 1 and out[0].n_pairs == 1
    assert out[0].support == 1.0  # 1 pair basket / 1 surviving basket
    with pytest.raises(ValueError, match="min_pair_count"):
        association_rules(df, "b", "i", min_pair_count=0)
