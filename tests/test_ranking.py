"""Hand-computed pins for the ranking-evaluation kit
(``operators/ranking.py``) — every metric checked against values worked
out on paper for a tiny judged frame, plus the degenerate cases (no
relevant doc, under-filled list, linear gains)."""

from __future__ import annotations

import math

import pytest


def _frame(spark):
    # q1: 5 docs ranked 1..5, rels 0,1,0,2,0  (k=3 sees 0,1,0)
    # q2: nothing relevant
    # q3: 2 docs (under-filled vs k=3), both relevant
    rows = [
        ("q1", 1, 0.0),
        ("q1", 2, 1.0),
        ("q1", 3, 0.0),
        ("q1", 4, 2.0),
        ("q1", 5, 0.0),
        ("q2", 1, 0.0),
        ("q2", 2, 0.0),
        ("q3", 1, 1.0),
        ("q3", 2, 1.0),
    ]
    return spark.createDataFrame(rows, "q string, rnk int, rel double")


def test_ranking_metrics_hand_computed(spark):
    from blueetl_spark.operators.ranking import ranking_metrics

    out = {
        r["q"]: r
        for r in ranking_metrics(
            _frame(spark), ["q"], rank_col="rnk", rel_col="rel", k=3
        ).collect()
    }

    q1 = out["q1"]
    assert q1["n_judged"] == 5 and q1["n_relevant"] == 2
    dcg = 1.0 / math.log2(3.0)  # rel 1 at rank 2
    idcg = 3.0 / math.log2(2.0) + 1.0 / math.log2(3.0)  # ideal [2,1,0]
    assert q1["ndcg"] == pytest.approx(dcg / idcg, abs=1e-12)
    assert q1["rr"] == pytest.approx(0.5)
    assert q1["ap"] == pytest.approx((1.0 / 2.0) / 2.0)  # one hit at rank 2
    assert q1["precision"] == pytest.approx(1.0 / 3.0)
    assert q1["recall"] == pytest.approx(0.5)

    q2 = out["q2"]
    assert q2["n_relevant"] == 0
    assert q2["ndcg"] == 0.0 and q2["rr"] == 0.0 and q2["ap"] == 0.0
    assert q2["precision"] == 0.0
    assert q2["recall"] is None  # undefined, not silently perfect

    q3 = out["q3"]
    dcg3 = 1.0 / math.log2(2.0) + 1.0 / math.log2(3.0)
    assert q3["ndcg"] == pytest.approx(1.0)  # already ideal
    assert q3["rr"] == 1.0
    assert q3["ap"] == pytest.approx((1.0 / 1.0 + 2.0 / 2.0) / 2.0)
    assert q3["precision"] == pytest.approx(2.0 / 3.0)  # k, not list length
    assert q3["recall"] == 1.0
    assert dcg3 > 0  # sanity on the hand formula


def test_ranking_metrics_linear_gains(spark):
    from blueetl_spark.operators.ranking import ranking_metrics

    out = {
        r["q"]: r
        for r in ranking_metrics(
            _frame(spark), ["q"], rank_col="rnk", rel_col="rel", k=3,
            graded=False,
        ).collect()
    }
    dcg = 1.0 / math.log2(3.0)
    idcg = 2.0 / math.log2(2.0) + 1.0 / math.log2(3.0)
    assert out["q1"]["ndcg"] == pytest.approx(dcg / idcg, abs=1e-12)


def test_ranking_metrics_k_validation(spark):
    from blueetl_spark.operators.ranking import ranking_metrics

    with pytest.raises(ValueError, match="k must be"):
        ranking_metrics(_frame(spark), ["q"], k=0)


def test_ranking_summary_macro_means(spark):
    from blueetl_spark.operators.ranking import (
        ranking_metrics,
        ranking_summary,
    )

    m = ranking_metrics(
        _frame(spark), ["q"], rank_col="rnk", rel_col="rel", k=3
    )
    s = ranking_summary(m).collect()[0]
    per = {r["q"]: r for r in m.collect()}
    assert s["n_queries"] == 3
    assert s["mean_ndcg"] == pytest.approx(
        (per["q1"]["ndcg"] + per["q2"]["ndcg"] + per["q3"]["ndcg"]) / 3.0
    )
    # mean_recall skips the undefined q2 (NULL), averaging q1 and q3 only
    assert s["mean_recall"] == pytest.approx((0.5 + 1.0) / 2.0)
    assert s["mrr"] == pytest.approx((0.5 + 0.0 + 1.0) / 3.0)


def test_rrf_fuse_hand_computed(spark):
    from blueetl_spark.operators.ranking import rrf_fuse

    a = spark.createDataFrame(
        [("q1", "d1", 1), ("q1", "d2", 2), ("q1", "d3", 3)],
        "q string, doc_id string, rank int",
    )
    b = spark.createDataFrame(
        [("q1", "d2", 1), ("q1", "d1", 2)],
        "q string, doc_id string, rank int",
    )
    out = {
        r["doc_id"]: r
        for r in rrf_fuse([a, b], ["q"], k=60).collect()
    }
    # d1 and d2 hold rank sets {1,2} in some order -> identical scores;
    # the doc-id tiebreak puts d1 first
    s12 = 1.0 / 61.0 + 1.0 / 62.0
    assert out["d1"]["rrf_score"] == pytest.approx(s12, abs=1e-15)
    assert out["d2"]["rrf_score"] == pytest.approx(s12, abs=1e-15)
    assert out["d3"]["rrf_score"] == pytest.approx(1.0 / 63.0, abs=1e-15)
    assert (out["d1"]["fused_rank"], out["d2"]["fused_rank"]) == (1, 2)
    assert out["d3"]["fused_rank"] == 3
    assert out["d1"]["n_systems"] == 2 and out["d3"]["n_systems"] == 1

    top = rrf_fuse([a, b], ["q"], k=60, top_n=2).collect()
    assert sorted(r["doc_id"] for r in top) == ["d1", "d2"]

    with pytest.raises(ValueError, match=">= 2 ranked lists"):
        rrf_fuse([a], ["q"])
    with pytest.raises(ValueError, match="k must be"):
        rrf_fuse([a, b], ["q"], k=0)


def test_fleiss_kappa_hand_computed(spark):
    from blueetl_spark.operators.profile import fleiss_kappa

    # 3 items x 3 raters: [a,a,a], [a,b,b], [b,b,b]
    # P_bar = 7/9, P_e = 41/81 -> kappa = 22/40 = 0.55 exactly
    votes = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "a"),
         (2, "a"), (2, "b"), (2, "b"),
         (3, "b"), (3, "b"), (3, "b")],
        "item int, cat string",
    )
    row = fleiss_kappa(votes, "item", "cat").collect()[0]
    assert (row["n_items"], row["n_raters"], row["n_cats"]) == (3, 3, 2)
    assert row["p_bar"] == pytest.approx(7.0 / 9.0, abs=1e-6)
    assert row["p_e"] == pytest.approx(41.0 / 81.0, abs=1e-6)
    assert row["kappa"] == pytest.approx(0.55, abs=1e-9)


def test_fleiss_kappa_guards(spark):
    from blueetl_spark.operators.profile import fleiss_kappa

    ragged = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "a")], "item int, cat string"
    )
    with pytest.raises(Exception, match="vote counts per item"):
        fleiss_kappa(ragged, "item", "cat").collect()

    solo = spark.createDataFrame(
        [(1, "a"), (2, "b")], "item int, cat string"
    )
    with pytest.raises(Exception, match="vote counts per item"):
        fleiss_kappa(solo, "item", "cat").collect()

    # unanimous single category: p_e = 1 -> kappa undefined (NULL)
    unanimous = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "a"), (2, "a")], "item int, cat string"
    )
    row = fleiss_kappa(unanimous, "item", "cat").collect()[0]
    assert row["p_e"] == 1.0 and row["kappa"] is None


def test_krippendorff_alpha_hand_computed(spark):
    from blueetl_spark.operators.profile import krippendorff_alpha

    # u1: [a,a] (r=2), u2: [a,b] (r=2), u3: [b,b,b] (r=3); n=7
    # D_o = 2/7, D_e = 24/42 = 4/7 -> alpha = 1 - 1/2 = 0.5 exactly
    votes = spark.createDataFrame(
        [(1, "a"), (1, "a"),
         (2, "a"), (2, "b"),
         (3, "b"), (3, "b"), (3, "b")],
        "u int, cat string",
    )
    row = krippendorff_alpha(votes, "u", "cat").collect()[0]
    assert (row["n_units"], row["n_ratings"], row["n_cats"]) == (3, 7, 2)
    assert row["d_o"] == pytest.approx(2.0 / 7.0, abs=1e-6)
    assert row["d_e"] == pytest.approx(4.0 / 7.0, abs=1e-6)
    assert row["alpha"] == pytest.approx(0.5, abs=1e-9)


def test_krippendorff_alpha_ragged_and_degenerate(spark):
    from blueetl_spark.operators.profile import krippendorff_alpha

    # single-rating units are EXCLUDED: u9's lone vote contributes
    # nothing, so the result equals the hand-computed frame above
    votes = spark.createDataFrame(
        [(1, "a"), (1, "a"),
         (2, "a"), (2, "b"),
         (3, "b"), (3, "b"), (3, "b"),
         (9, "a")],
        "u int, cat string",
    )
    row = krippendorff_alpha(votes, "u", "cat").collect()[0]
    assert (row["n_units"], row["n_ratings"]) == (3, 7)
    assert row["alpha"] == pytest.approx(0.5, abs=1e-9)

    # perfect agreement across 2 categories: D_o = 0 -> alpha = 1
    perfect = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (2, "b")], "u int, cat string"
    )
    prow = krippendorff_alpha(perfect, "u", "cat").collect()[0]
    assert prow["d_o"] == 0.0 and prow["alpha"] == 1.0

    # one category total: D_e = 0 -> alpha NULL (not a fake 1.0)
    mono = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "a"), (2, "a")], "u int, cat string"
    )
    mrow = krippendorff_alpha(mono, "u", "cat").collect()[0]
    assert mrow["d_e"] == 0.0 and mrow["alpha"] is None

    # everything excluded (all units single-rating): NULLs, no crash
    sparse = spark.createDataFrame(
        [(1, "a"), (2, "b")], "u int, cat string"
    )
    srow = krippendorff_alpha(sparse, "u", "cat").collect()[0]
    assert srow["n_units"] == 0 and srow["n_ratings"] == 0
    assert srow["alpha"] is None


def test_rbo_hand_computed(spark):
    from blueetl_spark.operators.ranking import rbo

    a = spark.createDataFrame(
        [("q", "d1", 1), ("q", "d2", 2), ("q", "d3", 3)],
        "q string, doc_id string, rank int",
    )
    b = spark.createDataFrame(
        [("q", "d1", 1), ("q", "d3", 2), ("q", "d4", 3)],
        "q string, doc_id string, rank int",
    )
    # shared docs enter at max-rank: d1 -> 1, d3 -> 3, so X = [1, 1, 2]
    # rbo = 0.1*(1/1) + 0.1*0.9*(1/2) + 0.1*0.81*(2/3) = 0.199
    row = rbo(a, b, ["q"], k=3, p=0.9).collect()[0]
    assert row["overlap_k"] == 2
    assert row["rbo"] == pytest.approx(0.199, abs=1e-12)

    # identical lists -> rbo = (1-p) * sum p^(d-1) (X_d/d = 1 at all d)
    same = rbo(a, a, ["q"], k=3, p=0.9).collect()[0]
    assert same["rbo"] == pytest.approx(0.1 * (1 + 0.9 + 0.81), abs=1e-12)

    # disjoint lists and either-side-only queries -> 0.0, still emitted
    z = spark.createDataFrame([("z", "x", 1)], "q string, doc_id string, rank int")
    rows = {r["q"]: r for r in rbo(a, z, ["q"], k=3).collect()}
    assert rows["q"]["rbo"] == 0.0 and rows["z"]["rbo"] == 0.0
    assert rows["q"]["overlap_k"] == 0

    with pytest.raises(ValueError, match="p must be"):
        rbo(a, b, ["q"], p=1.0)
    with pytest.raises(ValueError, match="k must be"):
        rbo(a, b, ["q"], k=0)
