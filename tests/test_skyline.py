"""Distributed Pareto frontier (``operators/skyline.py``).

The sf0.01 gate (`pareto_parts`) hash-verifies the operator against
DuckDB's quadratic NOT EXISTS; these pin the kernel's exactness on
random data (ties, duplicates, 1-4 objectives), partition invariance,
the null rule, and the candidate size gate."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from blueetl_spark.operators.skyline import _frontier_mask, pareto_frontier


def _bruteforce(x: np.ndarray) -> np.ndarray:
    le = np.all(x[:, None, :] <= x[None, :, :], axis=2)
    lt = np.any(x[:, None, :] < x[None, :, :], axis=2)
    return ~np.any(le & lt, axis=0)


@pytest.mark.parametrize("d", [1, 2, 3, 4])
@pytest.mark.parametrize("n", [0, 1, 7, 400])
def test_kernel_exact_vs_bruteforce(d, n):
    rng = np.random.default_rng(100 * d + n)
    x = np.round(rng.normal(size=(n, d)), 1)  # coarse grid -> many ties
    if n:
        x = np.vstack([x, x[: max(1, n // 5)]])  # exact duplicates kept
    got = _frontier_mask(x)
    assert (got == _bruteforce(x)).all()


def test_kernel_duplicates_all_kept():
    x = np.array([[1.0, 1.0], [1.0, 1.0], [2.0, 0.5], [2.0, 2.0]])
    # (2,2) dominated by (1,1); duplicates of (1,1) both kept;
    # (2,0.5) incomparable
    assert _frontier_mask(x).tolist() == [True, True, True, False]


def test_operator_matches_pandas_and_partition_invariant(spark):
    rng = np.random.default_rng(11)
    pdf = pd.DataFrame(
        {
            "id": np.arange(500),
            "cost": np.round(rng.uniform(0, 10, 500), 1),
            "gain": np.round(rng.uniform(0, 10, 500), 1),
            "score": np.round(rng.uniform(0, 10, 500), 1),
        }
    )
    x = np.column_stack([pdf.cost, -pdf.gain, -pdf.score])
    exp = set(pdf.id[_bruteforce(x)])
    df = spark.createDataFrame(pdf)
    for parts in (1, 7):
        out = pareto_frontier(
            df.repartition(parts),
            minimize=["cost"],
            maximize=["gain", "score"],
        )
        assert {r.id for r in out.collect()} == exp


def test_null_objectives_excluded(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 5.0), (2, None, 9.0), (3, 0.5, None), (4, 2.0, 1.0)],
        "id long, cost double, gain double",
    )
    out = pareto_frontier(df, minimize=["cost"], maximize=["gain"])
    assert {r.id for r in out.collect()} == {1}  # 4 dominated by 1


def test_candidate_size_gate(spark):
    # an anti-diagonal: every point is on the frontier
    pdf = pd.DataFrame({"a": np.arange(100.0), "b": -np.arange(100.0)})
    df = spark.createDataFrame(pdf)
    # the gate fires inside the single-partition global kernel at action
    # time (the operator is one lazy plan now), so the ValueError arrives
    # wrapped in Spark's PythonException — match on the message
    with pytest.raises(Exception, match="max_candidate_rows"):
        pareto_frontier(df, minimize=["a", "b"], max_candidate_rows=10).count()
    # within the gate it returns everything
    assert pareto_frontier(df, minimize=["a", "b"]).count() == 100


def test_requires_objectives(spark):
    df = spark.createDataFrame([(1, 2.0)], "id long, v double")
    with pytest.raises(ValueError, match="objective"):
        pareto_frontier(df)
