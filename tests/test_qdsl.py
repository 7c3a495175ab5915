"""Table-driven tests for the q-DSL compiler, mirroring the reference's
documented notebook-01 semantics (SURVEY §2.2 P1-P11)."""

from __future__ import annotations

import pandas as pd
import pytest

from blueetl_spark.functions.qdsl import compile_query, is_subfilter, q, query_to_sql

ROWS = [
    # (id, layer, synapse_class, value)
    (0, "Rt", "EXC", 1.0),
    (1, "Rt", "INH", 2.5),
    (2, "VPL", "EXC", 3.0),
    (3, "VPL", "INH", 4.5),
    (4, "SomaLayer", "EXC", 5.0),
    (5, None, "INH", 6.0),
]


@pytest.fixture(scope="module")
def df(spark):
    pdf = pd.DataFrame(ROWS, columns=["id", "layer", "synapse_class", "value"])
    return spark.createDataFrame(pdf).cache()


def ids(df, query):
    return sorted(r.id for r in q(df, query).select("id").collect())


CASES = [
    # P1 equality
    ({"layer": "Rt"}, [0, 1]),
    # P2 membership via list
    ({"layer": ["Rt", "VPL"]}, [0, 1, 2, 3]),
    # P3 comparison ops, AND within dict
    ({"value": {"ge": 2.5, "lt": 5.0}}, [1, 2, 3]),
    ({"value": {"gt": 2.5}}, [2, 3, 4, 5]),
    ({"value": {"le": 1.0}}, [0]),
    ({"id": {"ne": 0}}, [1, 2, 3, 4, 5]),
    # P4 explicit isin
    ({"synapse_class": {"isin": ["EXC"]}}, [0, 2, 4]),
    # P5 regex = unanchored re.search
    ({"layer": {"regex": "Layer"}}, [4]),
    ({"layer": {"regex": "^R"}}, [0, 1]),
    # P6 list-of-dicts = OR
    ([{"layer": "Rt"}, {"synapse_class": "EXC"}], [0, 1, 2, 4]),
    # P7 AND across keys
    ({"layer": "Rt", "synapse_class": "EXC"}, [0]),
    # P8 no-op
    ({}, [0, 1, 2, 3, 4, 5]),
    (None, [0, 1, 2, 3, 4, 5]),
    ([], [0, 1, 2, 3, 4, 5]),
    # combined ops + isin in one dict
    ({"value": {"ge": 1.0, "isin": [1.0, 4.5, 6.0]}}, [0, 3, 5]),
]


@pytest.mark.parametrize("query,expected", CASES)
def test_q_semantics(df, query, expected):
    assert ids(df, query) == expected


def test_q_kwargs(df):
    assert sorted(r.id for r in q(df, layer="Rt").collect()) == [0, 1]
    with pytest.raises(ValueError):
        q(df, {"layer": "Rt"}, layer="VPL")


def test_unknown_operator(df):
    with pytest.raises(ValueError, match="unknown operator"):
        compile_query({"layer": {"like": "R%"}})


def test_query_to_sql_matches_spark(df, spark):
    df.createOrReplaceTempView("qdsl_t")
    for query, expected in CASES:
        sql = query_to_sql(query)
        # Spark can't run duckdb's regexp_matches; map it for the cross-check
        sql = sql.replace("regexp_matches(layer,", "(layer rlike")
        got = sorted(
            r.id for r in spark.sql(f"SELECT id FROM qdsl_t WHERE {sql}").collect()
        )
        assert got == expected, (query, sql)


SUBFILTER_CASES = [
    # (f1, f2, expected)
    ({}, {}, True),
    ({"a": 1}, {}, True),               # narrower than unconstrained
    ({}, {"a": 1}, False),              # broader
    ({"a": 1}, {"a": 1}, True),
    ({"a": 1}, {"a": [1, 2]}, True),
    ({"a": [1, 2]}, {"a": 1}, False),
    ({"a": [1]}, {"a": [1, 2, 3]}, True),
    ({"a": {"isin": [1, 2]}}, {"a": {"isin": [2, 1, 3]}}, True),
    ({"a": 2}, {"a": {"gt": 1}}, True),
    ({"a": 0}, {"a": {"gt": 1}}, False),
    ({"a": {"gt": 5}}, {"a": {"gt": 1}}, True),
    ({"a": {"gt": 1}}, {"a": {"gt": 5}}, False),
    ({"a": {"ge": 5}}, {"a": {"gt": 1}}, True),
    ({"a": {"le": 3, "ge": 1}}, {"a": {"le": 10}}, True),
    ({"a": {"lt": 3}}, {"a": {"le": 3}}, True),
    ({"a": {"le": 3}}, {"a": {"lt": 3}}, False),
    ({"a": {"regex": "x"}}, {"a": {"regex": "x"}}, True),
    ({"a": {"regex": "xy"}}, {"a": {"regex": "x"}}, False),  # not provable
    ({"a": 1, "b": 2}, {"a": 1}, True),
    ({"a": 1}, {"a": 1, "b": 2}, False),
    # OR branches: every f1 branch inside some f2 branch
    ([{"a": 1}, {"a": 2}], [{"a": [1, 2]}], True),
    ([{"a": 1}, {"a": 9}], [{"a": [1, 2]}], False),
    ({"a": 1}, [{"a": [1, 2]}, {"b": 5}], True),
]


@pytest.mark.parametrize("f1,f2,expected", SUBFILTER_CASES)
def test_is_subfilter(f1, f2, expected):
    assert is_subfilter(f1, f2) is expected


def test_is_subfilter_strict():
    assert is_subfilter({"a": 1}, {"a": 1}, strict=False)
    assert not is_subfilter({"a": 1}, {"a": 1}, strict=True)
    assert is_subfilter({"a": 1, "b": 2}, {"a": 1}, strict=True)


def test_ne_keeps_null_rows(spark):
    """Pandas `col != v` keeps NaN rows, so q-DSL `ne` must keep NULL rows
    (null-safe inequality) — in both the Spark and the SQL compilation."""
    import duckdb

    from blueetl_spark.functions.qdsl import compile_query, query_to_sql

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "id long, s string"
    )
    got = sorted(
        r.id for r in df.filter(compile_query({"s": {"ne": "a"}})).collect()
    )
    assert got == [2, 3]
    sql = query_to_sql({"s": {"ne": "a"}})
    rows = duckdb.sql(
        f"SELECT id FROM (VALUES (1, 'a'), (2, NULL), (3, 'b')) t(id, s) "
        f"WHERE {sql} ORDER BY id"
    ).fetchall()
    assert [r[0] for r in rows] == [2, 3]


def test_is_subfilter_contradictory_eq_isin():
    """{eq: 2, isin: [3]} selects nothing; implication into it must be
    False for any non-empty filter (the eq/isin INTERSECTION is the
    selected set)."""
    from blueetl_spark.functions.qdsl import is_subfilter

    assert not is_subfilter({"a": {"eq": 2}}, {"a": {"eq": 2, "isin": [3]}})
    assert is_subfilter({"a": {"eq": 2}}, {"a": {"eq": 2, "isin": [2, 3]}})
    # the empty-set filter itself implies anything
    assert is_subfilter({"a": {"eq": 2, "isin": [3]}}, {"a": {"eq": 5}})


def test_query_to_sql_empty_isin():
    from blueetl_spark.functions.qdsl import query_to_sql

    assert "FALSE" in query_to_sql({"a": {"isin": []}})
    assert "IN ()" not in query_to_sql({"a": {"isin": []}})
    assert "FALSE" in query_to_sql({"a": []})
