"""Quality classification: fastText-style linear classifier on hashed
n-gram features, for corpus filtering.

Beyond-reference addition: CCNet/fastText-style quality filtering —
train a linear model that separates a high-quality seed corpus from
random crawl text, then score every document and keep by threshold or
use the probability as a sampling weight. The reference has no ML; this
is the standard curation step between heuristic quality gates
(``text.quality_features``) and human/LLM labeling.

Scale design — everything stays JVM-side and model-parallel-free:

- **Featurization is the hashing trick** (``HashingTF`` over unigrams +
  bigram shingles): no vocabulary build, no shuffle, fixed-width sparse
  vectors whose memory is bounded by ``n_features`` regardless of corpus
  size. The bigram shingles reuse ``text.shingles`` (JVM higher-order
  functions, evaluated once per row).
- **Training is Spark ML logistic regression** (L-BFGS over
  ``treeAggregate``'d gradients): each iteration is one map-side-combined
  pass over the cached training frame; driver state is the coefficient
  vector (``n_features`` floats), not data. Elastic-net regularization
  keeps hashed-collision noise down.
- **Inference is a broadcast dot product**: the fitted coefficients ship
  to executors once; scoring is a map-only pass, no shuffle, safe to run
  over the full 100 TB corpus.
- **Persistence** uses Spark ML's native save/load, so a model trained
  on one cluster scores on another.

The training *labels* come from the caller (seed-corpus membership, LLM
judgments, heuristic composites); :func:`score_documents` is
deliberately separate from training so the common deployment — train
once on a small labeled set, score everything forever — maps onto the
API directly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from blueetl_spark.operators.text import shingles, tokens


def _featurize(df: DataFrame, text_col: str, n_features: int, bigrams: bool) -> DataFrame:
    from pyspark.ml.feature import HashingTF

    grams = tokens(text_col)
    if bigrams:
        grams = F.concat(
            grams,
            # prefix-tag bigrams so "a b" the bigram never collides by
            # construction with "a b"-ish unigram content
            F.transform(shingles(text_col, 2), lambda s: F.concat(F.lit("2:"), s)),
        )
    with_grams = df.withColumn("__grams", grams)
    tf = HashingTF(
        inputCol="__grams", outputCol="__features", numFeatures=n_features
    )
    return tf.transform(with_grams).drop("__grams")


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    n_features: int = 1 << 18,
    bigrams: bool = True,
    max_iter: int = 100,
    reg_param: float = 1e-4,
    elastic_net: float = 0.0,
):
    """Fit the classifier on a labeled frame (``label_col``: 1.0 = keep /
    high quality, 0.0 = discard). Returns a fitted Spark ML
    ``LogisticRegressionModel`` carrying its featurization params
    (``model.featurization``); pass it to :func:`score_documents`, or
    persist with :func:`save_quality_classifier` and reload via
    :func:`load_quality_classifier` — the save/load pair round-trips the
    featurization params so scoring is bit-identical with no extra
    arguments (a silently different ``bigrams``/``n_features`` at
    scoring time is a feature scramble, not an error message)."""
    from pyspark.ml.classification import LogisticRegression

    feats = _featurize(
        labeled.select(F.col(label_col).cast("double").alias("__label"), text_col),
        text_col, n_features, bigrams,
    )
    lr = LogisticRegression(
        featuresCol="__features", labelCol="__label",
        maxIter=max_iter, regParam=reg_param, elasticNetParam=elastic_net,
        standardization=False,  # hashed-TF features share one scale already
    )
    model = lr.fit(feats)
    # Drop the training summary: model.transform's task closure captures
    # the model, the summary holds the live SparkSession, and the
    # session's ObservationManager is not java-serializable once any
    # Observation has been registered in the session — scoring would then
    # die in SparkContext.clean. The summary is training-time-only
    # diagnostics; a save/load round-trip would shed it too, this does it
    # without the I/O. (Scala-private setter, public at the JVM level.)
    try:
        from pyspark import SparkContext

        jvm = SparkContext._active_spark_context._jvm
        model._java_obj.setSummary(jvm.scala.Option.empty())
    except Exception:  # pragma: no cover - connect-mode or API drift
        pass
    model.featurization = {"n_features": int(n_features), "bigrams": bool(bigrams)}
    return model


def save_quality_classifier(model, path: str) -> None:
    """Persist the model AND its featurization params under one
    directory. The params ride as a one-row JSON dataset written through
    Spark (``<path>/featurization``), so the sidecar lands on whatever
    filesystem the model itself lands on (HDFS/S3A/local alike) — no
    driver-local ``open()`` that would break on a cluster store."""
    from pyspark.sql import SparkSession

    model.write().overwrite().save(path)
    feat = getattr(model, "featurization", None) or {
        "n_features": int(model.numFeatures),
        "bigrams": True,
    }
    spark = SparkSession.getActiveSession()
    spark.createDataFrame(
        [(int(feat["n_features"]), bool(feat["bigrams"]))],
        "n_features long, bigrams boolean",
    ).coalesce(1).write.mode("overwrite").json(f"{path}/featurization")


def load_quality_classifier(path: str):
    """Load a model saved by :func:`save_quality_classifier`; the stored
    featurization params re-attach so :func:`score_documents` needs no
    extra arguments. Models saved through the raw Spark ML writer (no
    sidecar) still load — ``n_features`` comes from the coefficient
    width and ``bigrams`` falls back to the training default (True)."""
    from pyspark.ml.classification import LogisticRegressionModel
    from pyspark.sql import SparkSession
    from pyspark.sql.utils import AnalysisException

    model = LogisticRegressionModel.load(path)
    feat = {"n_features": int(model.numFeatures), "bigrams": True}
    try:
        spark = SparkSession.getActiveSession()
        row = spark.read.schema("n_features long, bigrams boolean").json(
            f"{path}/featurization"
        ).first()
        if row is not None and row["bigrams"] is not None:
            feat = {"n_features": int(row["n_features"]),
                    "bigrams": bool(row["bigrams"])}
    except AnalysisException:  # pre-sidecar model dir
        pass
    if feat["n_features"] != model.numFeatures:
        raise ValueError(
            f"featurization sidecar says n_features={feat['n_features']} but "
            f"the model has {model.numFeatures}-wide coefficients"
        )
    model.featurization = feat
    return model


def score_documents(
    model,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int | None = None,
    bigrams: bool | None = None,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """(id, quality_prob) for every document — map-only, broadcast
    coefficients, no shuffle. ``n_features`` defaults to the model's own
    coefficient width (they must agree; a mismatch is a silent feature
    scramble, so it is derived rather than trusted to the caller), and
    ``bigrams`` defaults to the model's persisted featurization (same
    scramble hazard — scoring unigram-only against bigram-trained
    coefficients degrades silently)."""
    from pyspark.ml.functions import vector_to_array

    width = model.numFeatures if n_features is None else n_features
    if width != model.numFeatures:
        raise ValueError(
            f"n_features={width} does not match the model's "
            f"{model.numFeatures}-wide coefficients"
        )
    if bigrams is None:
        bigrams = bool(
            (getattr(model, "featurization", None) or {}).get("bigrams", True)
        )
    feats = _featurize(df, text_col, width, bigrams)
    scored = model.transform(feats)
    return scored.select(
        F.col(id_col),
        F.round(vector_to_array("probability")[1], 6).alias("quality_prob"),
        *[F.col(c) for c in passthrough],
    )


def score_linear_hashed(
    df: DataFrame,
    weights: list[float],
    text_col: str = "text",
    intercept: float = 0.0,
    hash_fn: str = "xxhash64",
    out_col: str = "quality_score",
) -> DataFrame:
    """Score documents with an externally-supplied hashing-trick linear
    model (fastText-style exported weights) as a ZERO-shuffle JVM
    expression: ``score = σ(b + Σ_tokens w[hash(token) mod m])``.

    The deployment this serves: a linear text classifier trained
    elsewhere (or exported from :func:`train_quality_classifier` via its
    coefficients) scored over the full corpus. The weight vector rides
    in the plan as an array literal — no join, no Python, no shuffle;
    the per-row sum is an ``aggregate`` higher-order function over the
    token array, so a 100 TB scan scores at I/O speed and any filter on
    ``out_col`` stays pushed into the same map stage.

    ``hash_fn="md5"`` (60-bit md5 prefix) makes the bucket assignment
    reproducible in DuckDB for oracle parity; ``xxhash64`` is the cheap
    default. Empty-string tokens (the tokenization of blank text) score
    zero contribution.
    """
    m = len(weights)
    if m == 0:
        raise ValueError("weights must be non-empty")
    warr = F.lit([float(w) for w in weights])

    def bucket(tok):
        if hash_fn == "xxhash64":
            h = F.xxhash64(tok)
        elif hash_fn == "md5":
            h = F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")
        else:
            raise ValueError(f"unknown hash_fn {hash_fn!r}")
        return F.pmod(h, F.lit(m))

    z = F.aggregate(
        F.filter(tokens(text_col), lambda t: t != ""),
        F.lit(float(intercept)),
        lambda acc, t: acc
        + F.element_at(warr, (bucket(t) + 1).cast("int")),
    )
    return df.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))


def filter_by_quality(
    model,
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    bigrams: bool | None = None,
) -> DataFrame:
    """Keep documents scoring at or above ``threshold`` — the composable
    curation-stage form (returns the input rows, not just scores)."""
    scores = score_documents(
        model, df, text_col=text_col, id_col=id_col, bigrams=bigrams
    )
    keep = scores.filter(F.col("quality_prob") >= threshold).select(id_col)
    return df.join(keep, id_col, "left_semi")


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 10,
    round_to: int | None = 6,
) -> DataFrame:
    """Reliability diagram + Expected Calibration Error for a
    probabilistic scorer — "when the model says 0.8, is it right 80%
    of the time?", the standard health check before using a quality
    classifier's scores as sampling weights or thresholds. Scores must
    lie in [0, 1]. One row per bin (DENSIFIED — an empty bin still
    shows; a score distribution that never visits half its range is
    itself a finding): ``(bin, lo, hi, n, n_pos, mean_score,
    pos_rate, ece)`` with ``ece = Σ_b (n_b/n)·|pos_rate_b −
    mean_score_b|`` repeated on every row for one-glance thresholding
    (same presentation as the Benford screen's tvd). Rows with a NULL
    score or label are excluded; empty bins report NULL rates and
    contribute 0 to ECE. Out-of-range scores clamp SYMMETRICALLY into
    the edge bins (< 0 into bin 0, > 1 into bin ``bins-1``) so a
    miscalibrated scorer shows up as edge-bin mass instead of rows
    silently vanishing from every bin and the ECE denominator.

    Engine-exact: bin assignment is one floor on a fixed IEEE
    product; per-bin score mass is summed as ``floor(score·10⁹)``
    BIGINT nanos (order-insensitive), labels as integer counts; the
    ECE folds over the ≤ ``bins`` bin-ordered terms. Scale shape: ONE
    map-side-combined aggregate over the data; everything after is
    bin-count-sized.
    """
    s, y = F.col(score_col).cast("double"), F.col(label_col)
    rows = df.filter(s.isNotNull() & y.isNotNull()).select(
        F.greatest(F.least(F.floor(s * bins), F.lit(bins - 1)), F.lit(0))
        .cast("long")
        .alias("__b"),
        F.floor(s * F.lit(1e9)).cast("long").alias("__nano"),
        F.when(y.cast("boolean"), 1).otherwise(0).alias("__y"),
    )
    per_bin = rows.groupBy("__b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__y").alias("n_pos"),
        F.sum("__nano").alias("__nanos"),
    )
    spine = df.sparkSession.range(bins).select(F.col("id").alias("__b"))
    dense = spine.join(per_bin, "__b", "left").select(
        "__b",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.coalesce("n_pos", F.lit(0)).alias("n_pos"),
        F.coalesce("__nanos", F.lit(0)).alias("__nanos"),
    )
    mean_score = F.when(
        F.col("n") > 0,
        F.col("__nanos").cast("double") / 1e9 / F.col("n").cast("double"),
    )
    pos_rate = F.when(
        F.col("n") > 0, F.col("n_pos").cast("double") / F.col("n").cast("double")
    )
    terms = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("__b"), F.col("n"), F.col("n_pos"), F.col("__nanos")
                )
            )
        ),
        lambda t: F.when(
            t["n"] > 0,
            t["n"].cast("double")
            * F.abs(
                t["n_pos"].cast("double") / t["n"].cast("double")
                - t["__nanos"].cast("double") / 1e9 / t["n"].cast("double")
            ),
        ).otherwise(F.lit(0.0)),
    )
    tot = dense.agg(
        F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t).alias("__num"),
        F.sum("n").alias("__n_tot"),
    ).select(
        F.when(
            F.col("__n_tot") > 0, F.col("__num") / F.col("__n_tot").cast("double")
        ).alias("__ece")
    )

    def rnd(c):
        return (F.round(c, round_to) + 0.0) if round_to is not None else c

    return (
        dense.crossJoin(F.broadcast(tot))
        .select(
            F.col("__b").alias("bin"),
            (F.col("__b").cast("double") / bins).alias("lo"),
            ((F.col("__b") + 1).cast("double") / bins).alias("hi"),
            "n",
            "n_pos",
            rnd(mean_score).alias("mean_score"),
            rnd(pos_rate).alias("pos_rate"),
            rnd(F.col("__ece")).alias("ece"),
        )
    )


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    by: Sequence[str] = (),
    round_to: int | None = 6,
) -> DataFrame:
    """ROC-AUC per group via the rank (Mann–Whitney) identity — the
    ranking-quality companion to :func:`calibration_bins` (calibration
    asks "are the probabilities honest", AUC asks "does sorting by
    score separate the classes"):
    ``AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻)`` over average ranks, which
    equals the trapezoidal area under the tie-corrected ROC curve.
    Output: ``(by…, n_pos, n_neg, auc)``; one-class groups report
    NULL auc with the missing side's count 0. Rows with a NULL score
    or label are excluded.

    Engine-exact: average ranks are carried as ``2·rank`` INTEGERS, so
    the positive rank sum is an exact BIGINT and
    ``auc = (Σ 2r⁺ − n⁺(n⁺+1)) / (2·n⁺·n⁻)`` is a single terminal
    division. Scale shape: ONE map-side-combined shuffle to
    per-(group, score) pos/neg counts, then one ordered window over
    DISTINCT scores per group — same shape and same giant-group caveat
    as ``timeseries.ks_drift`` (scores are near-continuous; quantize
    upstream if one group dominates).
    """
    by = list(by)
    s, y = F.col(score_col), F.col(label_col)
    g = (
        df.filter(s.isNotNull() & y.isNotNull())
        .select(
            *by,
            s.alias("__s"),
            F.when(y.cast("boolean"), 1).otherwise(0).alias("__p"),
        )
        .groupBy(*by, "__s")
        .agg(
            F.sum("__p").alias("__cp"),
            F.sum(1 - F.col("__p")).alias("__cn"),
        )
    )
    w_run = (
        Window.partitionBy(*by)
        .orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = (F.col("__cp") + F.col("__cn")).cast("long")
    cum = F.sum(F.col("__cp") + F.col("__cn")).over(w_run).cast("long")
    rank2 = 2 * (cum - t) + t + 1
    agg = g.select(
        *by,
        F.col("__cp").cast("long").alias("__cp"),
        F.col("__cn").cast("long").alias("__cn"),
        (F.col("__cp").cast("long") * rank2).alias("__r2p"),
    ).groupBy(*by).agg(
        F.sum("__cp").alias("n_pos"),
        F.sum("__cn").alias("n_neg"),
        F.sum("__r2p").alias("__r2p"),
    )
    np_, nn = F.col("n_pos"), F.col("n_neg")
    auc = F.when(
        (np_ > 0) & (nn > 0),
        (F.col("__r2p") - np_ * (np_ + 1)).cast("double")
        / (2 * np_ * nn).cast("double"),
    )

    def rnd(c):
        return (F.round(c, round_to) + 0.0) if round_to is not None else c

    return agg.select(*by, "n_pos", "n_neg", rnd(auc).alias("auc"))


def conformal_calibrate(
    df: DataFrame,
    score_col: str,
    by: Sequence[str] = (),
    alpha: float = 0.1,
) -> DataFrame:
    """Split-conformal calibration threshold per group — the
    distribution-free way to turn ANY model's nonconformity scores
    into sets with guaranteed ``1 − alpha`` coverage (Vovk et al.;
    Angelopoulos & Bates 2021 survey): given a held-out calibration
    frame of scores, ``qhat`` is the ``k``-th smallest score with
    ``k = ceil((n+1)(1−alpha))`` — the finite-sample-corrected
    quantile. At serving time, keep every candidate whose score is
    ``<= qhat``; marginal coverage ``>= 1 − alpha`` holds for
    exchangeable data regardless of the model. One row per group:
    ``(by…, n, k, qhat)`` — ``qhat`` NULL when ``k > n`` (calibration
    set too small for this alpha: every candidate must be kept).

    Engine-exact: ``qhat`` is an ORDER STATISTIC (no interpolation,
    no summation) — both engines pick the same element; ``k`` is
    integer arithmetic (``ceil`` of an exact rational via integer
    ceil-division on the alpha expressed as a fraction of 1e6).

    Scale shape: one count per group + one ordered window to the
    k-th element — per-group sort, same giant-group caveat as every
    rank statistic here; quantize scores upstream if a single group
    holds billions of rows.
    """
    if not 0.0 < alpha < 1.0:
        raise ValueError("alpha must be in (0, 1)")
    by = list(by)
    # a constant internal group key keeps the no-`by` path on the same
    # left-join plan (a missing k-th row must yield NULL qhat, which a
    # crossJoin against an empty frame would silently drop)
    grp = by if by else ["__g"]
    s = F.col(score_col).cast("double")
    src = df.filter(s.isNotNull()).select(
        *by, *([] if by else [F.lit(1).alias("__g")]), s.alias("__s")
    )
    # k = ceil((n+1)(1-alpha)) with alpha as an exact micro-fraction:
    # integer ceil-division, no float round-trip near the boundary
    a_micro = round(alpha * 1_000_000)
    n_grp = src.groupBy(*grp).agg(F.count(F.lit(1)).alias("n"))
    k_expr = -F.floor(
        -((F.col("n") + 1) * F.lit(1_000_000 - a_micro)) / F.lit(1_000_000)
    ).cast("long")
    n_grp = n_grp.select(*grp, "n", k_expr.alias("k"))
    w = Window.partitionBy(*grp).orderBy("__s")
    ranked = src.select(*grp, "__s", F.row_number().over(w).alias("__r"))
    at_k = (
        ranked.join(F.broadcast(n_grp), grp)
        .filter(F.col("__r") == F.col("k"))
        .select(*grp, F.col("__s").alias("qhat"))
    )
    return n_grp.join(at_k, grp, "left").select(*by, "n", "k", "qhat")


def auc_delong(
    df: DataFrame,
    score_col: str,
    label_col: str,
    by: Sequence[str] = (),
    round_to: int | None = 6,
) -> DataFrame:
    """ROC-AUC with DeLong variance and 95% CI per group — the answer
    to "is this 0.71 vs 0.69 AUC difference real or noise" that a bare
    :func:`roc_auc` point estimate cannot give (DeLong, DeLong &
    Clarke-Pearson 1988: the AUC is a two-sample U-statistic; its
    variance comes from the per-observation PLACEMENT values, no
    bootstrap needed). Output: ``(by…, n_pos, n_neg, auc, var_auc, se,
    ci_lo, ci_hi)`` (normal interval, clamped to [0, 1]); ``var_auc``
    and the interval are NULL when either class has < 2 observations.

    Engine-exact: each positive's placement ``(#neg below + ½·#neg
    tied)/n`` is carried as the INTEGER ``2·cum_neg − neg_at`` (and
    symmetrically for negatives), so all four moment sums are exact
    BIGINTs and every output is one fixed float tree over them —
    the ``roc_auc``/``spearman`` discipline. Bound: ``Σ w·P²`` needs
    ``4·n²·m < 2^63`` (n·√m ≲ 1.5e9 — quantize scores upstream long
    before that).

    Scale shape: identical to :func:`roc_auc` — ONE map-side-combined
    shuffle to per-(group, score) class counts, one ordered window
    over distinct scores, one final aggregate.
    """
    by = list(by)
    s, y = F.col(score_col), F.col(label_col)
    g = (
        df.filter(s.isNotNull() & y.isNotNull())
        .select(
            *by,
            s.alias("__s"),
            F.when(y.cast("boolean"), 1).otherwise(0).alias("__p"),
        )
        .groupBy(*by, "__s")
        .agg(
            F.sum("__p").cast("long").alias("__cp"),
            F.sum(1 - F.col("__p")).cast("long").alias("__cn"),
        )
    )
    w_all = Window.partitionBy(*by) if by else Window.partitionBy(F.lit(1))
    w_run = w_all.orderBy("__s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum_cn = F.sum("__cn").over(w_run)
    cum_cp = F.sum("__cp").over(w_run)
    tot_cp = F.sum("__cp").over(w_all)
    # integer placement twins: P10 = 2·(neg strictly below) + neg tied,
    # P01 = 2·(pos strictly above) + pos tied
    p10 = 2 * cum_cn - F.col("__cn")
    p01 = 2 * tot_cp - 2 * cum_cp + F.col("__cp")
    agg = g.select(
        *by,
        "__cp",
        "__cn",
        (F.col("__cp") * p10).alias("__sp"),
        (F.col("__cp") * p10 * p10).alias("__spp"),
        (F.col("__cn") * p01).alias("__sq"),
        (F.col("__cn") * p01 * p01).alias("__sqq"),
    ).groupBy(*by).agg(
        F.sum("__cp").alias("n_pos"),
        F.sum("__cn").alias("n_neg"),
        F.sum("__sp").alias("__sp"),
        F.sum("__spp").alias("__spp"),
        F.sum("__sq").alias("__sq"),
        F.sum("__sqq").alias("__sqq"),
    )

    def d(c):
        return F.col(c).cast("double")

    m, n = d("n_pos"), d("n_neg")
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        d("__sp") / (2.0 * n * m),
    )
    s10 = (
        (d("__spp") - d("__sp") * d("__sp") / m)
        / (m - 1.0)
        / (2.0 * n * (2.0 * n))
    )
    s01 = (
        (d("__sqq") - d("__sq") * d("__sq") / n)
        / (n - 1.0)
        / (2.0 * m * (2.0 * m))
    )
    var = F.when(
        (F.col("n_pos") > 1) & (F.col("n_neg") > 1), s10 / m + s01 / n
    )
    se = F.sqrt(var)
    z975 = 1.959963984540054
    # explicit NULL guard: Spark's greatest() IGNORES nulls, so an
    # unguarded greatest(0.0, NULL) would report ci_lo = 0.0 for a
    # group whose variance is undefined
    ci_lo = F.when(
        se.isNotNull(), F.greatest(F.lit(0.0), auc - F.lit(z975) * se)
    )
    ci_hi = F.when(
        se.isNotNull(), F.least(F.lit(1.0), auc + F.lit(z975) * se)
    )

    def rnd(c):
        return (F.round(c, round_to) + 0.0) if round_to is not None else c

    return agg.select(
        *by,
        "n_pos",
        "n_neg",
        rnd(auc).alias("auc"),
        rnd(var).alias("var_auc"),
        rnd(se).alias("se"),
        rnd(ci_lo).alias("ci_lo"),
        rnd(ci_hi).alias("ci_hi"),
    )


def isotonic_calibrate(
    df: DataFrame,
    score_col: str,
    label_col: str,
    by: Sequence[str] = (),
) -> DataFrame:
    """Isotonic (PAV) probability calibration per group — the
    non-parametric companion to :func:`calibration_bins`: instead of
    fixed-width bins, pool-adjacent-violators finds the best
    monotone-nondecreasing fit of the empirical positive rate to the
    score (Zadrozny & Elkan 2002 — the standard when a model's scores
    rank well but their magnitudes are dishonest, which
    :func:`roc_auc` vs :func:`calibration_bins` disagreement reveals).
    Output: one row per pooled block: ``(by…, x_lo, x_hi, n, n_pos,
    rate)`` with ``rate = n_pos/n`` strictly increasing block-to-block
    (equal-rate neighbors pool). Calibrate a serving score by looking
    up the block whose ``[x_lo, x_hi]`` brackets it (step function;
    broadcast-join friendly — the block table is tiny).

    Exactness: the per-block rate is ONE division of exact integer
    sums (PAV pooling only ever adds integer (n, n_pos) pairs), so
    the output is engine-portable even though the pooling itself is a
    sequential stack algorithm with no SQL twin (rows-only gate; the
    pytest pins a hand-replayable reference).

    Scale shape: one map-side-combined aggregate to per-(group, score)
    grain, then an Arrow ``applyInPandas`` PAV over DISTINCT scores
    per group — kernel input is distinct-score-sized, not row-sized
    (quantize scores upstream if a group has billions of distinct
    scores; same contract as ``roc_auc``).
    """
    import numpy as np
    import pandas as pd

    by = list(by)
    s, y = F.col(score_col), F.col(label_col)
    g = (
        df.filter(s.isNotNull() & y.isNotNull())
        .select(
            *by,
            s.cast("double").alias("__s"),
            F.when(y.cast("boolean"), 1).otherwise(0).alias("__p"),
        )
        .groupBy(*by, "__s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum("__p").cast("long").alias("__np"),
        )
    )
    by_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.select(*by).schema
    )
    out_schema = (
        (by_fields + ", " if by_fields else "")
        + "x_lo double, x_hi double, n long, n_pos long, rate double"
    )

    def pav(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__s", ignore_index=True)
        # stack of blocks [x_lo, x_hi, n, n_pos]; pool while the new
        # block's rate <= the top's (weighted-average merge keeps
        # integer sums exact)
        stack: list[list] = []
        for xs, n, np_ in zip(pdf["__s"], pdf["__n"], pdf["__np"]):
            blk = [xs, xs, int(n), int(np_)]
            while stack and blk[3] * stack[-1][2] <= stack[-1][3] * blk[2]:
                top = stack.pop()
                blk = [top[0], blk[1], top[2] + blk[2], top[3] + blk[3]]
            stack.append(blk)
        out = pd.DataFrame(
            stack, columns=["x_lo", "x_hi", "n", "n_pos"]
        )
        out["rate"] = out["n_pos"] / out["n"]
        for c in by:
            out[c] = pdf[c].iloc[0]
        return out[[*by, "x_lo", "x_hi", "n", "n_pos", "rate"]]

    if by:
        return g.groupBy(*by).applyInPandas(pav, out_schema)
    # no-`by` path: one synthetic constant group so the same grouped
    # kernel runs (and the schema stays identical after the drop)
    return (
        g.withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandas(
            lambda pdf: pav(pdf.drop(columns="__g")).assign(__g=1),
            "__g int, " + out_schema,
        )
        .drop("__g")
    )
