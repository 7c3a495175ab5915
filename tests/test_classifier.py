"""Quality classifier: separability on a synthetic corpus, scoring
schema, save/load round-trip, and the feature-width guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from blueetl_spark.operators.classifier import (
    filter_by_quality,
    load_quality_classifier,
    score_documents,
    train_quality_classifier,
)

GOOD_WORDS = "analysis careful rigorous method evidence review detailed".split()
BAD_WORDS = "click free winner prize buy cheap offer".split()


def _corpus(spark, n=120, seed_words=None):
    """Deterministic two-class corpus: class words cycled into 8-token docs."""
    rows = []
    for i in range(n):
        good = i % 2 == 0
        words = GOOD_WORDS if good else BAD_WORDS
        text = " ".join(words[(i + j) % len(words)] for j in range(8))
        rows.append((i, text, 1.0 if good else 0.0))
    return spark.createDataFrame(rows, "doc_id long, text string, label double")


@pytest.fixture(scope="module")
def model_and_corpus(spark):
    corpus = _corpus(spark)
    train = corpus.filter(F.col("doc_id") < 100)
    test = corpus.filter(F.col("doc_id") >= 100)
    model = train_quality_classifier(train, n_features=1 << 12, max_iter=50)
    return model, train, test


def test_classifier_separates_heldout(model_and_corpus):
    model, _, test = model_and_corpus
    scored = score_documents(model, test).join(
        test.select("doc_id", "label"), "doc_id"
    )
    rows = scored.collect()
    assert len(rows) == 20
    correct = sum(
        1 for r in rows if (r["quality_prob"] >= 0.5) == (r["label"] == 1.0)
    )
    assert correct == len(rows)  # fully separable vocabularies
    assert all(0.0 <= r["quality_prob"] <= 1.0 for r in rows)


def test_score_schema_and_passthrough(model_and_corpus):
    model, train, _ = model_and_corpus
    out = score_documents(model, train, passthrough=("label",))
    assert out.columns == ["doc_id", "quality_prob", "label"]


def test_filter_by_quality(model_and_corpus):
    model, _, test = model_and_corpus
    kept = filter_by_quality(model, test, threshold=0.5)
    assert kept.columns == test.columns  # stage form: rows, not scores
    labels = [r["label"] for r in kept.collect()]
    assert labels and all(l == 1.0 for l in labels)


def test_save_load_roundtrip(model_and_corpus, tmp_path):
    model, _, test = model_and_corpus
    path = str(tmp_path / "qmodel")
    model.write().overwrite().save(path)
    loaded = load_quality_classifier(path)
    a = {r["doc_id"]: r["quality_prob"] for r in score_documents(model, test).collect()}
    b = {r["doc_id"]: r["quality_prob"] for r in score_documents(loaded, test).collect()}
    assert a == b


def test_save_load_persists_featurization(spark, tmp_path):
    """The sidecar round-trips the featurization: a unigram-trained model
    reloaded with NO extra arguments must score bit-identically — before
    the sidecar, load + default bigrams=True silently scrambled the
    hashed feature space."""
    from blueetl_spark.operators.classifier import save_quality_classifier

    corpus = _corpus(spark, n=40)
    model = train_quality_classifier(
        corpus, n_features=1 << 10, bigrams=False, max_iter=30
    )
    assert model.featurization == {"n_features": 1 << 10, "bigrams": False}
    path = str(tmp_path / "qmodel_uni")
    save_quality_classifier(model, path)
    loaded = load_quality_classifier(path)
    assert loaded.featurization == {"n_features": 1 << 10, "bigrams": False}
    a = {r["doc_id"]: r["quality_prob"]
         for r in score_documents(model, corpus, bigrams=False).collect()}
    b = {r["doc_id"]: r["quality_prob"]
         for r in score_documents(loaded, corpus).collect()}  # no args
    assert a == b
    # explicit override is still accepted (featurizes with bigrams; on
    # this saturated toy corpus the rounded probabilities may coincide,
    # so only the contract — no error, full output — is asserted)
    assert score_documents(loaded, corpus, bigrams=True).count() == 40


def test_load_without_sidecar_falls_back(model_and_corpus, tmp_path):
    """Models saved through the raw Spark ML writer (no sidecar) load
    with bigrams defaulting to the training default."""
    model, _, test = model_and_corpus
    path = str(tmp_path / "qmodel_raw")
    model.write().overwrite().save(path)
    loaded = load_quality_classifier(path)
    assert loaded.featurization["bigrams"] is True
    a = {r["doc_id"]: r["quality_prob"] for r in score_documents(model, test).collect()}
    b = {r["doc_id"]: r["quality_prob"] for r in score_documents(loaded, test).collect()}
    assert a == b


def test_feature_width_guard(model_and_corpus):
    model, train, _ = model_and_corpus
    with pytest.raises(ValueError, match="does not match"):
        score_documents(model, train, n_features=1 << 10)


def test_unigram_only_mode(spark):
    corpus = _corpus(spark, n=40)
    model = train_quality_classifier(
        corpus, n_features=1 << 10, bigrams=False, max_iter=30
    )
    scored = score_documents(model, corpus, bigrams=False).join(
        corpus.select("doc_id", "label"), "doc_id"
    )
    rows = scored.collect()
    correct = sum(
        1 for r in rows if (r["quality_prob"] >= 0.5) == (r["label"] == 1.0)
    )
    assert correct == len(rows)


def test_scoring_survives_session_observations(spark):
    """Scoring must work in a session whose ObservationManager holds
    registered Observations (any adapter/write in the session does this):
    the fitted model would otherwise drag the training summary — and with
    it the live SparkSession — into the task closure and die
    non-serializable in SparkContext.clean."""
    from pyspark.sql import Observation

    obs = Observation("clf_probe")
    spark.range(5).observe(obs, F.count(F.lit(1)).alias("n")).count()
    assert obs.get["n"] == 5

    corpus = _corpus(spark, n=40)
    model = train_quality_classifier(corpus, n_features=1 << 10, max_iter=10)
    assert not model.hasSummary  # summary stripped at train time
    assert score_documents(model, corpus).count() == 40


def test_score_linear_hashed_matches_manual(spark):
    """The zero-shuffle hashed linear scorer reproduces a by-hand
    sigmoid(b + sum w[hash mod m]) computation, and blank text scores
    exactly sigmoid(intercept)."""
    import hashlib
    import math

    from blueetl_spark.operators.classifier import score_linear_hashed

    weights = [0.25 * j - 1.0 for j in range(8)]
    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "   "), (3, "gamma")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.quality_score
        for r in score_linear_hashed(
            docs, weights, hash_fn="md5", intercept=0.75
        ).collect()
    }

    def bucket(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 8

    for doc_id, text in [(1, "alpha beta alpha"), (3, "gamma")]:
        z = 0.75 + sum(weights[bucket(t)] for t in text.split())
        assert out[doc_id] == pytest.approx(1.0 / (1.0 + math.exp(-z)), rel=1e-12)
    assert out[2] == pytest.approx(1.0 / (1.0 + math.exp(-0.75)), rel=1e-12)


def test_score_linear_hashed_validates_inputs(spark):
    from blueetl_spark.operators.classifier import score_linear_hashed

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        score_linear_hashed(docs, [])
    with pytest.raises(ValueError, match="hash_fn"):
        score_linear_hashed(docs, [0.1], hash_fn="sha9")


def test_calibration_bins_hand_example(spark):
    """A perfectly calibrated bin contributes 0 to ECE; a confident
    wrong bin dominates it; bins are densified with NULL rates; NULL
    scores/labels are excluded."""
    from blueetl_spark.operators.classifier import calibration_bins

    rows = (
        [(0.25, True)] + [(0.25, False)] * 3   # bin 2: mean .25, rate .25
        + [(0.95, False)] * 2                  # bin 9: mean .95, rate 0
        + [(None, True), (0.5, None)]          # excluded
    )
    df = spark.createDataFrame(rows, "sc double, y boolean")
    out = {r["bin"]: r for r in calibration_bins(df, "sc", "y").collect()}
    assert len(out) == 10
    assert (out[2]["n"], out[2]["n_pos"]) == (4, 1)
    assert out[2]["mean_score"] == 0.25 and out[2]["pos_rate"] == 0.25
    assert (out[9]["n"], out[9]["n_pos"]) == (2, 0)
    assert out[9]["pos_rate"] == 0.0 and out[9]["mean_score"] == 0.95
    assert out[0]["n"] == 0 and out[0]["pos_rate"] is None
    # ECE = (4*0 + 2*0.95) / 6
    expected = round(2 * 0.95 / 6, 6)
    assert all(r["ece"] == expected for r in out.values())
    assert out[2]["lo"] == 0.2 and out[2]["hi"] == 0.3


def test_calibration_bins_out_of_range_clamps_symmetrically(spark):
    """Scores outside [0, 1] clamp into the EDGE bins on both sides —
    the r10-advice regression where scores > 1 clamped into the top
    bin but negative scores produced negative bin ids that vanished
    in the spine left-join (excluded from n and the ECE denominator
    with no error)."""
    from blueetl_spark.operators.classifier import calibration_bins

    rows = [(-0.3, False), (-0.01, False), (1.7, True), (0.55, True)]
    df = spark.createDataFrame(rows, "sc double, y boolean")
    out = {r["bin"]: r for r in calibration_bins(df, "sc", "y").collect()}
    assert len(out) == 10
    assert (out[0]["n"], out[0]["n_pos"]) == (2, 0)   # both negatives
    assert (out[9]["n"], out[9]["n_pos"]) == (1, 1)   # the > 1 score
    assert out[5]["n"] == 1
    # every input row is accounted for in the ECE denominator
    assert sum(r["n"] for r in out.values()) == 4


def test_roc_auc_known_cases(spark):
    """Perfect separation gives 1, inverted gives 0, random-tie block
    gives 0.5; ties across classes get half credit (matches the
    sequential average-rank reference); one-class groups report NULL."""
    from blueetl_spark.operators.classifier import roc_auc

    rows = (
        [("sep", 0.9, True), ("sep", 0.8, True), ("sep", 0.2, False),
         ("sep", 0.1, False)]
        + [("inv", 0.1, True), ("inv", 0.9, False)]
        + [("tie", 0.5, True), ("tie", 0.5, False)]
        + [("one", 0.7, True)]
        + [("mix", 0.9, True), ("mix", 0.5, True), ("mix", 0.5, False),
           ("mix", 0.3, False), ("mix", 0.1, True)]
    )
    df = spark.createDataFrame(rows, "g string, sc double, y boolean")
    got = {
        r["g"]: (r["n_pos"], r["n_neg"], r["auc"])
        for r in roc_auc(df, "sc", "y", by=["g"]).collect()
    }
    assert got["sep"] == (2, 2, 1.0)
    assert got["inv"] == (1, 1, 0.0)
    assert got["tie"] == (1, 1, 0.5)
    assert got["one"] == (1, 0, None)

    def brute(pairs):
        pos = [s for s, yy in pairs if yy]
        neg = [s for s, yy in pairs if not yy]
        wins = sum(
            1.0 if p > q else 0.5 if p == q else 0.0
            for p in pos for q in neg
        )
        return round(wins / (len(pos) * len(neg)), 6)

    mix = [(s, yy) for g, s, yy in rows if g == "mix"]
    assert got["mix"] == (3, 2, brute(mix))


def test_conformal_calibrate_threshold_and_coverage(spark):
    """qhat is the ceil((n+1)(1-alpha)) order statistic (checked against
    numpy), k > n yields NULL qhat, and keeping scores <= qhat on the
    calibration set itself covers >= 1 - alpha."""
    import numpy as np
    from pyspark.sql import functions as F

    from blueetl_spark.operators.classifier import conformal_calibrate

    rng = np.random.default_rng(3)
    scores = np.round(rng.uniform(0, 10, 97), 4)
    df = spark.createDataFrame([(float(s),) for s in scores], "s double")
    for alpha in (0.1, 0.25, 0.5):
        row = conformal_calibrate(df, "s", alpha=alpha).head()
        k = int(np.ceil((len(scores) + 1) * (1 - alpha)))
        assert (row.n, row.k) == (len(scores), k)
        assert row.qhat == float(np.sort(scores)[k - 1])
        coverage = float(np.mean(scores <= row.qhat))
        assert coverage >= 1 - alpha
    tiny = spark.createDataFrame([(1.0,), (2.0,)], "s double")
    row = conformal_calibrate(tiny, "s", alpha=0.1).head()
    assert row.k == 3 and row.qhat is None  # ceil(3*0.9)=3 > n=2
    grouped = conformal_calibrate(
        spark.createDataFrame(
            [("a", float(i)) for i in range(1, 11)] + [("b", 5.0)],
            "g string, s double",
        ),
        "s", by=["g"], alpha=0.2,
    )
    got = {r.g: (r.n, r.k, r.qhat) for r in grouped.collect()}
    assert got == {"a": (10, 9, 9.0), "b": (1, 2, None)}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="alpha"):
        conformal_calibrate(tiny, "s", alpha=1.5)


def test_auc_delong_matches_numpy_placements(spark):
    """DeLong variance replicates an independent numpy placement replay
    (ties included); the point estimate agrees with roc_auc exactly;
    one-class and singleton groups degrade to NULLs, not garbage."""
    import numpy as np

    from blueetl_spark.operators.classifier import auc_delong, roc_auc

    rng = np.random.default_rng(5)
    n = 300
    y = (rng.random(n) < 0.4).astype(int)
    s = np.round(rng.random(n) + 0.7 * y, 2)  # discriminative, with ties
    df = spark.createDataFrame(
        [(float(si), int(yi)) for si, yi in zip(s, y)], "s double, y int"
    )
    row = auc_delong(df, "s", "y").head()
    pos, neg = s[y == 1], s[y == 0]
    m, nn = len(pos), len(neg)
    v10 = np.array(
        [(np.sum(neg < p) + 0.5 * np.sum(neg == p)) / nn for p in pos]
    )
    v01 = np.array(
        [(np.sum(pos > q) + 0.5 * np.sum(pos == q)) / m for q in neg]
    )
    var = v10.var(ddof=1) / m + v01.var(ddof=1) / nn
    assert (row.n_pos, row.n_neg) == (m, nn)
    assert abs(row.auc - v10.mean()) < 1e-6
    assert abs(row.var_auc - var) < 1e-6
    assert abs(row.se - np.sqrt(var)) < 1e-6
    assert row.ci_lo < row.auc < row.ci_hi
    assert row.auc == roc_auc(df, "s", "y").head().auc

    # degenerate groups: one-class -> NULL auc; singletons -> NULL var/CI
    deg = spark.createDataFrame(
        [("one_class", 1.0, 1), ("one_class", 2.0, 1),
         ("single", 2.0, 1), ("single", 1.0, 0)],
        "g string, s double, y int",
    )
    got = {r.g: r for r in auc_delong(deg, "s", "y", by=["g"]).collect()}
    assert got["one_class"].auc is None
    assert got["single"].auc == 1.0
    assert got["single"].var_auc is None
    assert got["single"].ci_lo is None and got["single"].ci_hi is None


def test_isotonic_calibrate_pav_reference(spark):
    """PAV blocks replicate the hand calculation (rates strictly
    increasing, violator runs pooled, equal-rate neighbors pooled);
    grouped variant isolates groups; integer sums survive exactly."""
    from blueetl_spark.operators.classifier import isotonic_calibrate

    rows = [(1.0, 0), (2.0, 1), (3.0, 0), (4.0, 0),
            (5.0, 1), (6.0, 0), (7.0, 1), (8.0, 1)]
    df = spark.createDataFrame(rows, "s double, y int")
    blocks = [
        (r.x_lo, r.x_hi, r.n, r.n_pos, r.rate)
        for r in isotonic_calibrate(df, "s", "y").orderBy("x_lo").collect()
    ]
    assert blocks == [
        (1.0, 1.0, 1, 0, 0.0),
        (2.0, 4.0, 3, 1, 1 / 3),
        (5.0, 6.0, 2, 1, 0.5),
        (7.0, 8.0, 2, 2, 1.0),
    ]
    rates = [b[4] for b in blocks]
    assert rates == sorted(rates) and len(set(rates)) == len(rates)

    # grouped: a second group with perfectly monotone labels stays
    # unpooled per distinct score
    two = spark.createDataFrame(
        [("a", s, y) for s, y in rows] + [("b", 1.0, 0), ("b", 2.0, 1)],
        "g string, s double, y int",
    )
    got = {
        (r.g, r.x_lo): r.rate
        for r in isotonic_calibrate(two, "s", "y", by=["g"]).collect()
    }
    assert got[("b", 1.0)] == 0.0 and got[("b", 2.0)] == 1.0
    assert got[("a", 2.0)] == 1 / 3
