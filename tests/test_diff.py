"""Corpus snapshot diff: status semantics, null handling, multi-column
compare, and the no-output-on-identical contract."""

from __future__ import annotations

import pytest

from blueetl_spark.operators.diff import corpus_diff


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_diff_statuses(spark):
    old = _df(spark, [(1, "a", "en"), (2, "b", "en"), (3, "c", "en")])
    new = _df(spark, [(1, "a", "en"), (2, "B", "en"), (4, "d", "en")])
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}


def test_identical_yields_empty(spark):
    old = _df(spark, [(1, "a", "en"), (2, "b", "fr")])
    assert corpus_diff(old, old).count() == 0


def test_null_vs_sentinel_distinct(spark):
    # NULL text and the literal sentinel byte must not collide
    old = _df(spark, [(1, None, "en")])
    new = _df(spark, [(1, "\x00", "en")])
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {1: "changed"}


def test_separator_injection_detected(spark):
    # a value containing the old separator byte must not shift content
    # across column boundaries: ('a\x1fvb', '') vs ('a', 'b\x1fv')
    # serialized identically under the flag+separator scheme and hashed
    # as unchanged — the length prefix makes them distinct
    old = _df(spark, [(1, "a\x1fvb", "")])
    new = _df(spark, [(1, "a", "b\x1fv")])
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {1: "changed"}


def test_compare_cols_subset(spark):
    old = _df(spark, [(1, "a", "en")])
    new = _df(spark, [(1, "a", "fr")])
    # full compare sees the lang change; text-only compare does not
    assert corpus_diff(old, new).count() == 1
    assert corpus_diff(old, new, compare_cols=["text"]).count() == 0


def test_no_shared_columns_raises(spark):
    old = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    new = spark.createDataFrame([(1, 2.0)], "doc_id long, other double")
    with pytest.raises(ValueError, match="no columns to compare"):
        corpus_diff(old, new)
