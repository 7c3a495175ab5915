"""Edit-distance similarity join: exact-recall q-gram blocking tests.

The sf0.01 part-name surface is additionally hash-verified against
DuckDB's quadratic levenshtein join by the ``edit_distance_pairs``
oracle entry; these tests pin the corner cases the blocking proof
depends on (tiny strings with vacuous bounds, duplicates, nulls).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from blueetl_spark.operators.linkage import edit_distance_pairs


def _brute(rows, d):
    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    out = []
    for i, (ia, va) in enumerate(rows):
        for ib, vb in rows[i + 1 :]:
            if va is None or vb is None:
                continue
            dist = lev(va, vb)
            if dist <= d:
                out.append((min(ia, ib), max(ia, ib), dist))
    return sorted(out)


@pytest.mark.parametrize("d,q", [(1, 2), (2, 2), (2, 3), (3, 2)])
def test_matches_bruteforce_incl_tiny_strings(spark, d, q):
    # tiny strings exercise the short path (vacuous count-filter bound:
    # "a" vs "b" share ZERO grams yet are within distance 1)
    rows = [
        (1, "a"), (2, "b"), (3, ""), (4, "ab"), (5, "ba"),
        (6, "small ring"), (7, "small rang"), (8, "small ring"),
        (9, "large bolt"), (10, "x" * 12), (11, "x" * 11 + "y"),
        (12, None), (13, "abc"), (14, "abcd"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_pairs(df, "name", "id", max_dist=d, q=q).collect()
    )
    assert got == _brute(rows, d)


def test_duplicate_values_pair_at_distance_zero(spark):
    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "same")], "id long, name string"
    )
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_pairs(df, "name", "id", max_dist=1).collect()
    )
    assert got == [(1, 2, 0), (1, 3, 0), (2, 3, 0)]


def test_short_distinct_gate_raises(spark):
    df = spark.createDataFrame(
        [(i, f"{i % 7}") for i in range(20)], "id long, name string"
    )
    with pytest.raises(ValueError, match="max_short_distinct"):
        edit_distance_pairs(df, "name", "id", max_dist=2, max_short_distinct=3)


def test_plan_has_no_cartesian_on_main_path(spark):
    # The value-space blocking must reach the verify via equi-joins; the
    # only cross join is the size-gated tiny-string path (broadcast,
    # bounded by max_short_distinct).
    df = spark.createDataFrame(
        [(i, f"prefix word {i}") for i in range(50)], "id long, name string"
    )
    out = edit_distance_pairs(df, "name", "id", max_dist=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # the short path only
