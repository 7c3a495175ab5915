"""Property-based q-DSL tests (hypothesis): the Spark compilation must
agree with a direct Python evaluation of the same query on random data,
and ``is_subfilter`` must be sound (never claims containment that the
data refutes)."""

import math
import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from blueetl_spark.functions.qdsl import compile_query, is_subfilter

COLS = ["a", "b"]
VALUES = st.integers(min_value=-3, max_value=3)
OPS = ["eq", "ne", "le", "lt", "ge", "gt"]


def constraint_strategy():
    return st.one_of(
        VALUES,  # scalar equality
        st.lists(VALUES, min_size=1, max_size=3),  # isin
        st.dictionaries(
            st.sampled_from(OPS), VALUES, min_size=1, max_size=2
        ),
    )


def query_strategy():
    d = st.dictionaries(st.sampled_from(COLS), constraint_strategy(), max_size=2)
    return st.one_of(d, st.lists(d, min_size=1, max_size=3))


def eval_constraint(value, constraint) -> bool:
    if isinstance(constraint, dict):
        checks = {
            "eq": lambda v, b: v == b, "ne": lambda v, b: v != b,
            "le": lambda v, b: v <= b, "lt": lambda v, b: v < b,
            "ge": lambda v, b: v >= b, "gt": lambda v, b: v > b,
            "isin": lambda v, b: v in b,
            "regex": lambda v, b: re.search(b, str(v)) is not None,
        }
        return all(checks[op](value, bound) for op, bound in constraint.items())
    if isinstance(constraint, list):
        return value in constraint
    return value == constraint


def eval_query(row: dict, query) -> bool:
    if isinstance(query, list):
        return any(eval_query(row, d) for d in query)
    return all(eval_constraint(row[k], c) for k, c in query.items())


ROWS = [{"a": a, "b": b} for a in range(-3, 4) for b in range(-3, 4)]


@pytest.fixture(scope="module")
def data(spark):
    df = spark.createDataFrame(ROWS, "a int, b int")
    df.persist().count()
    return df


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(query=query_strategy())
def test_compiled_query_matches_python_semantics(data, query):
    got = sorted(
        (r.a, r.b) for r in data.filter(compile_query(query)).collect()
    )
    expected = sorted(
        (row["a"], row["b"]) for row in ROWS if eval_query(row, query)
    )
    assert got == expected, query


@settings(max_examples=300, deadline=None)
@given(f1=query_strategy(), f2=query_strategy())
def test_is_subfilter_soundness(f1, f2):
    """If is_subfilter says f1 ⊆ f2, then the row sets (evaluated in pure
    Python over the full grid) must actually be contained."""
    if is_subfilter(f1, f2):
        s1 = {i for i, row in enumerate(ROWS) if eval_query(row, f1)}
        s2 = {i for i, row in enumerate(ROWS) if eval_query(row, f2)}
        assert s1 <= s2, (f1, f2)


def test_is_subfilter_known_cases():
    assert is_subfilter({"a": 1}, {})  # anything ⊆ no-op
    assert is_subfilter({"a": 1}, {"a": [1, 2]})
    assert is_subfilter({"a": {"gt": 2}}, {"a": {"gt": 1}})
    assert not is_subfilter({}, {"a": 1})
    assert not is_subfilter({"a": [1, 3]}, {"a": [1, 2]})
