"""Deterministic corpus sampling for training-data mixtures.

A training run samples each source/domain/language at its own rate to hit
a target mixture (e.g. 3× Wikipedia, 0.5× CommonCrawl). Doing that with
``df.sample`` ties the result to partition layout and RNG state; these
operators instead gate each row on a **hash of its id**, so the decision
is a pure per-row function — reproducible across runs, cluster sizes,
partitionings, and engines (the md5 variant is bit-for-bit replayable in
DuckDB/Trino for auditing). No shuffle: sampling is a filter.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Denominator of the hash bucket space. 2**20 keeps the md5-prefix
# arithmetic exact in any engine's 64-bit integers while giving ~1e-6
# rate resolution.
BUCKETS = 1 << 20


def hash_bucket(key: Column | str, seed: str = "", method: str = "xxhash64") -> Column:
    """Uniform bucket in [0, BUCKETS) from a row key.

    ``xxhash64`` is the fast JVM path; ``md5`` (first 15 hex chars → int,
    i.e. the top 60 bits) is the engine-portable path — the same
    expression written in DuckDB reproduces it exactly, which is what
    makes a sample *auditable* after the fact.
    """
    k = F.concat(F.lit(seed), (F.col(key) if isinstance(key, str) else key).cast("string"))
    if method == "xxhash64":
        h = F.xxhash64(k)
    elif method == "md5":
        h = F.conv(F.substring(F.md5(k), 1, 15), 16, 10).cast("long")
    else:
        raise ValueError(f"unknown method {method!r}")
    return F.pmod(h, F.lit(BUCKETS))


def hash_sample(
    df: DataFrame,
    rate: float,
    key_col: str = "doc_id",
    seed: str = "",
    method: str = "xxhash64",
) -> DataFrame:
    """Keep each row iff ``hash(seed ‖ key) mod BUCKETS < rate · BUCKETS``.

    Deterministic Bernoulli(rate) sampling keyed on the row id: the same
    (key, seed) always makes the same decision, and disjoint seeds give
    independent samples (held-out splits are ``seed="val"`` vs
    ``seed="test"``). Pure filter — no shuffle, predicate stays in the
    scan stage.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    return df.filter(hash_bucket(key_col, seed, method) < int(rate * BUCKETS))


def stratified_sample_k(
    df: DataFrame,
    k: int,
    group_col: str = "source",
    key_col: str = "doc_id",
    seed: str = "",
    method: str = "xxhash64",
    prefilter_rate: float | None = None,
) -> DataFrame:
    """EXACTLY ``k`` rows per group (fewer if the group is smaller),
    chosen deterministically: rank by ``hash(seed ‖ key)`` within each
    group and keep the first ``k`` (key ascending as the tie-break).
    A pure function of (keys, seed) — re-running, re-partitioning, or
    re-ordering the input cannot change the sample, and ``method="md5"``
    makes the selection replayable in ANSI SQL (auditable after the
    fact). Complements :func:`hash_sample` (rate-based, size varies) and
    :func:`mixture_sample` (per-group rates): this is the per-group
    *budget* form ("50k docs per source").

    Scale: the rank window sorts each group in one task — fine up to
    ~10⁸ rows/group. Past that, pass ``prefilter_rate`` (e.g.
    ``4 * k / group_size``): rows are pre-thinned by the SAME hash
    (``bucket < rate · BUCKETS``) before ranking, which preserves the
    exact selection — the k smallest hashes survive any prefix filter
    that keeps ≥ k rows — and the guard verifies per group that the
    pre-filter kept ``min(k, group_size)`` rows, falling back to the
    full window for any group it under-sampled (two config-sized
    aggregates; Chernoff-rare at 4× oversampling).
    """
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError("k must be positive")
    b = hash_bucket(key_col, seed, method)
    w = Window.partitionBy(group_col).orderBy(b.asc(), F.col(key_col))

    def topk(frame: DataFrame) -> DataFrame:
        return (
            frame.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= k)
            .drop("__rk")
        )

    if prefilter_rate is None:
        return topk(df)
    if not 0.0 < prefilter_rate <= 1.0:
        raise ValueError("prefilter_rate must be in (0, 1]")
    pre = df.filter(b < int(prefilter_rate * BUCKETS))
    full_n = {
        r[group_col]: r["n"]
        for r in df.groupBy(group_col).agg(F.count("*").alias("n")).collect()
    }
    pre_n = {
        r[group_col]: r["n"]
        for r in pre.groupBy(group_col).agg(F.count("*").alias("n")).collect()
    }
    short = [
        g for g, n in full_n.items() if pre_n.get(g, 0) < min(k, n)
    ]
    if not short:
        return topk(pre)
    redo = F.col(group_col).isin(short)
    return topk(pre.filter(~redo).unionByName(df.filter(redo)))


def weighted_sample_k(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
    seed: str = "",
    method: str = "xxhash64",
    log_weights: bool = False,
    round_score: int | None = None,
    by: Sequence[str] = (),
) -> DataFrame:
    """Exactly ``k`` rows sampled WITHOUT replacement with probability
    proportional to ``weight_col`` — Efraimidis–Spirakis (2006) weighted
    reservoir sampling, derandomized: each row's exponential race key is
    ``score = ln(u) / w`` with ``u = (hash_bucket + 0.5) / BUCKETS``,
    and the k largest scores win.

    This is the resampling half of DSIR (pair with
    :func:`blueetl_spark.operators.text.dsir_logweights` and
    ``log_weights=True``: ``w = exp(log_weight)`` is applied as
    ``ln(u) · exp(−log_weight)``, so astronomically down-weighted rows
    underflow to −inf and simply never win, never NaN).

    Deterministic: a pure function of (key, seed, weight) — re-runs,
    re-partitioning and input order cannot change the sample, the same
    contract as :func:`stratified_sample_k`. Non-positive weights are
    excluded (zero probability). Scale: the global top-k is Spark's
    ``TakeOrderedAndProject`` — per-partition heaps of size k, one
    k-row merge at the driver, no full sort and no shuffle of the data.

    ``round_score`` is the engine-portable audit mode: rank on the score
    rounded to that many digits (with the key as tie-break) so an ANSI
    replay under ``method="md5"`` selects the identical set even though
    the two engines' float summation order may differ in the weights'
    last ulp.

    ``by`` turns the global budget into a PER-GROUP one ("k docs per
    language, weighted by quality"): the race runs independently inside
    each group via a rank window — one shuffle on the group keys, each
    group's top-k in its own partition (the same scale caveat as
    :func:`stratified_sample_k`'s window path). Without ``by`` the
    global top-k is Spark's ``TakeOrderedAndProject`` (per-partition
    heaps, no full sort).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    u = (hash_bucket(key_col, seed, method) + 0.5) / float(BUCKETS)
    wcol = F.col(weight_col)
    if log_weights:
        score = F.log(u) * F.exp(-wcol)
        eligible = df
    else:
        score = F.log(u) / wcol
        eligible = df.filter(wcol > 0)
    if round_score is not None:
        score = F.round(score, round_score)
    by = list(by)
    if by:
        from pyspark.sql import Window

        w = Window.partitionBy(*by).orderBy(
            F.col("__score").desc(), F.col(key_col)
        )
        return (
            eligible.withColumn("__score", score)
            .withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= k)
            .drop("__score", "__rk")
        )
    return (
        eligible.withColumn("__score", score)
        .orderBy(F.col("__score").desc(), F.col(key_col))
        .limit(k)
        .drop("__score")
    )


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "source",
    key_col: str = "doc_id",
    seed: str = "",
    method: str = "xxhash64",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-group deterministic sampling: group ``g`` is kept at
    ``rates[g]`` (groups absent from ``rates`` at ``default_rate``) — the
    mixture-weighting step of corpus assembly.

    The rate table becomes a CASE expression, not a join: mixtures have
    tens of groups, so the lookup belongs in the row's own filter
    predicate where Catalyst can push it into the scan (and skip whole
    partitions when the data is partitioned by ``group_col``).
    """
    for g, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {g!r} must be in [0, 1]")
    thr: Column = F.lit(int(default_rate * BUCKETS))
    for g, r in sorted(rates.items()):
        thr = F.when(F.col(group_col) == g, F.lit(int(r * BUCKETS))).otherwise(thr)
    return df.filter(hash_bucket(key_col, seed, method) < thr)


def temperature_mixture(
    df: DataFrame,
    alpha: float = 0.5,
    group_col: str = "source",
    key_col: str = "doc_id",
    seed: str = "",
    method: str = "xxhash64",
) -> DataFrame:
    """Temperature-flattened mixture: downsample each group so post-sample
    counts are proportional to ``n_g ** alpha`` (multilingual-training
    style rebalancing; alpha=1 keeps everything, alpha=0 equalizes all
    groups to the smallest).

    Per-group keep rate ``r_g = (n_min / n_g) ** (1 - alpha)`` — the
    smallest group keeps 100% and no group is upsampled (subsampling
    never replicates rows). Rates derive from one map-side-combined
    groupBy count collected to the driver (config-sized: mixtures have
    tens to thousands of groups), then the sample itself is the same
    pure per-row hash filter as :func:`mixture_sample` — deterministic,
    shuffle-free, engine-replayable.

    The threshold arithmetic sticks to IEEE-exact steps (sqrt, one
    divide, one multiply, floor) so an auditing engine recomputing
    ``floor(sqrt(n_min)/sqrt(n_g)*BUCKETS)`` lands on the identical
    integer for alpha=0.5; other alphas use ``pow`` and are
    deterministic per-engine.
    """
    import math

    if not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha must be in [0, 1]")
    counts = {
        r[0]: r[1]
        for r in df.groupBy(group_col).agg(F.count("*").alias("n")).collect()
    }
    if not counts:
        return df
    n_min = min(counts.values())
    thr: Column = F.lit(0)
    # sort with a None-safe key (a null group is a real group — groupBy
    # emits it, and plain sorted() would raise comparing None to str);
    # eqNullSafe makes the CASE arm actually match those rows instead of
    # silently dropping them through the == NULL never-true comparison
    for g, n in sorted(counts.items(), key=lambda kv: (kv[0] is None, str(kv[0]))):
        if alpha == 0.5:  # sqrt is correctly rounded in IEEE 754: replayable
            r = math.sqrt(n_min) / math.sqrt(n)
        else:
            r = (n_min / n) ** (1.0 - alpha)
        thr = F.when(
            F.col(group_col).eqNullSafe(F.lit(g)), F.lit(math.floor(r * BUCKETS))
        ).otherwise(thr)
    return df.filter(hash_bucket(key_col, seed, method) < thr)


def plan_epochs(
    token_counts: dict[str, int],
    weights: dict[str, float],
    budget_tokens: int,
) -> dict[str, float]:
    """Token-budget mixture plan: how many epochs of each source fill a
    training budget at the requested mixture weights.

    ``epochs_g = budget · w_g / Σw / tokens_g`` — may exceed 1.0
    (up-sampling: small high-weight sources repeat) or fall below
    (down-sampling). Pure driver-side arithmetic on config-sized dicts;
    feed the result to :func:`epoch_mixture` to materialize it.
    """
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    missing = set(weights) - set(token_counts)
    if missing:
        raise ValueError(f"weights name sources without token counts: {sorted(missing)}")
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    out = {}
    for g, w in weights.items():
        n = token_counts[g]
        if n <= 0:
            raise ValueError(f"source {g!r} has no tokens")
        out[g] = budget_tokens * (w / total_w) / n
    return out


def epoch_mixture(
    df: DataFrame,
    epochs: dict[str, float],
    group_col: str = "source",
    key_col: str = "doc_id",
    seed: str = "",
    method: str = "xxhash64",
) -> DataFrame:
    """Materialize an epoch plan, up-sampling included: a row in group
    ``g`` with ``epochs[g] = k + f`` appears ``k`` times always, plus
    once more iff its hash bucket falls under ``f`` — so group-level
    expectation is exactly ``epochs[g]`` while every decision stays a
    pure per-row function (deterministic, partitioning-independent,
    engine-replayable like :func:`mixture_sample`).

    Output adds an ``epoch`` column (1-based replica index) so
    downstream shuffling/packing can interleave replicas; rows from
    groups absent from ``epochs`` are dropped. Map-only: per-row CASE →
    ``sequence`` → ``explode``, no shuffle, no join.
    """
    for g, e in epochs.items():
        if e < 0:
            raise ValueError(f"epochs for {g!r} must be >= 0")
    full: Column = F.lit(None).cast("int")
    thr: Column = F.lit(None).cast("int")
    for g in sorted(epochs, key=lambda k: (k is None, str(k))):
        e = epochs[g]
        k = int(e)
        frac_thr = int(round((e - k) * BUCKETS))
        full = F.when(F.col(group_col).eqNullSafe(F.lit(g)), F.lit(k)).otherwise(full)
        thr = F.when(F.col(group_col).eqNullSafe(F.lit(g)), F.lit(frac_thr)).otherwise(thr)
    n = full + (hash_bucket(key_col, seed, method) < thr).cast("int")
    # sequence(1, 0) runs DESCENDING in Spark — guard the n == 0 case
    # with an empty array instead
    reps = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    return df.filter(n.isNotNull()).withColumn("epoch", F.explode(reps))


def quantile_buckets(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 10,
    by: str | None = None,
) -> DataFrame:
    """Assign each row an equi-depth bucket in ``[1, n_buckets]`` —
    the scale-correct form of ``ntile``.

    ``ntile(n) OVER (ORDER BY v)`` is a GLOBAL sort: every row funnels
    through one ordering, which at 100 TB means a single-task bottleneck
    (or a full range-exchange just to number rows). Equi-depth bucketing
    doesn't need the sort: the n-1 interior quantile boundaries are ONE
    map-side-combined aggregate (n-1 doubles), broadcast back, and the
    bucket is a per-row count of boundaries ≤ value — a map-only second
    pass. Rows tied across a boundary land in the same bucket (ntile
    would split them arbitrarily), which is the reproducible contract.

    ``by`` adds per-group boundaries (one boundary row per group,
    broadcast equi-join). Output: input columns + ``bucket``.

    Exact ``F.percentile`` matches DuckDB ``quantile_cont`` for the
    oracle; swap in ``approx_percentile`` at 100 TB (mergeable sketch,
    same call shape) — the bucket loop is unchanged.
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    ps = [i / n_buckets for i in range(1, n_buckets)]
    v = F.col(value_col).cast("double")
    bounds = (df.groupBy(by) if by else df.groupBy()).agg(
        F.percentile(v, F.array(*[F.lit(p) for p in ps])).alias("__bounds")
    )
    joined = (
        df.join(F.broadcast(bounds), on=by)
        if by
        else df.crossJoin(F.broadcast(bounds))
    )
    bucket = F.lit(1) + F.aggregate(
        "__bounds",
        F.lit(0),
        lambda acc, b: acc + F.when(v >= b, F.lit(1)).otherwise(F.lit(0)),
    )
    # NULL values: every (v >= b) is NULL -> otherwise(0) would silently
    # file them under bucket 1; keep them out of the depth count, as the
    # boundary percentile already did
    bucket = F.when(v.isNotNull(), bucket)
    return joined.select(*df.columns, bucket.cast("int").alias("bucket"))


def split_assign(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    seed: str = "",
    method: str = "xxhash64",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row's split is a
    pure function of ``hash(seed‖key)`` — stable across runs, cluster
    sizes, partitionings, and (with ``method="md5"``) engines. The
    ``df.randomSplit`` alternative ties membership to partition layout
    and RNG state, so a re-run (or the same row arriving in a later
    batch) can change sides — exactly the leakage a held-out split must
    never have.

    ``weights`` maps split name → proportion (normalized); boundaries
    are cumulative bucket thresholds in the ``BUCKETS`` space, assigned
    with one CASE chain — map-only, no shuffle, no state.
    """
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative and non-empty")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    b = hash_bucket(key_col, seed=seed, method=method)
    # deterministic boundary order: insertion order of the dict (callers
    # write {'train': .9, 'val': .05, 'test': .05} and mean exactly that)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        cond = b < int(cum * BUCKETS)
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, out)


def leakage_safe_split(
    df: DataFrame,
    weights: dict[str, float],
    group_col: str,
    key_col: str,
    seed: str = "",
    method: str = "xxhash64",
    out_col: str = "split",
) -> DataFrame:
    """Group-aware :func:`split_assign`: every row of a group lands in
    the SAME split, so duplicate clusters / domains / document families
    never straddle train and test — the held-out-contamination control
    a per-row split cannot give (near-identical rows on both sides of
    the boundary leak the test set into training).

    Assignment hashes the group's CANONICAL member (min ``key_col``),
    not the group value itself, so renumbering group ids (e.g. a re-run
    of connected components) cannot move a group across splits as long
    as membership is unchanged. Cost: one aggregate on the group key
    plus a join that reuses the aggregate's own hash distribution —
    one effective shuffle at any scale.

    Rows with a NULL ``group_col`` belong to no group: each is routed
    through per-row :func:`split_assign` on its own ``key_col`` (the
    group key coalesced to the row key), so every input row receives a
    split — an inner join on a NULL group key would silently drop them
    from a train/test splitter.
    """
    grouped = df.filter(F.col(group_col).isNotNull())
    ungrouped = df.filter(F.col(group_col).isNull())
    canon = grouped.groupBy(group_col).agg(F.min(key_col).alias("__canon"))
    joined = grouped.join(canon, group_col)
    part = split_assign(
        joined, weights, key_col="__canon", seed=seed, method=method,
        out_col=out_col,
    ).drop("__canon")
    return part.unionByName(
        split_assign(
            ungrouped, weights, key_col=key_col, seed=seed, method=method,
            out_col=out_col,
        )
    )


def target_encode_kfold(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    key_col: str = "doc_id",
    k: int = 5,
    alpha: float = 20.0,
    seed: str = "",
    method: str = "md5",
    round_to: int | None = 6,
) -> DataFrame:
    """Leakage-free K-fold target encoding — the classic high-
    cardinality-categorical feature for tabular models, computed so
    that no row's own target leaks into its feature: fold membership
    is a pure hash of the row key (``split_assign`` discipline — stable
    across runs, partitionings and engines), and the encoding a fold
    sees is built ONLY from the other folds' rows, smoothed toward the
    other folds' global mean:
    ``enc(c, f) = (sum_other + alpha * prior_f) / (n_other + alpha)``
    with ``prior_f = mean(target over all rows outside fold f)``.
    Output is the DENSIFIED encoding table — one row per (category,
    fold) including categories absent from a fold (``n_other`` = the
    category's full count; apply-time joins must always find a row):
    ``(category, fold, n_other, encoded)``. Apply with a broadcast
    join on (category, fold of each row's key). NULL categories encode
    like any other category (apply time can't drop them); rows with a
    NULL target are excluded from the sums.

    Engine-exact: all sums are order-insensitive BIGINTs when the
    target is integer (quantize money first); ``encoded`` is one fixed
    float tree per row over once-cast moments. Scale shape: ONE
    map-side-combined count per (category, fold); everything after
    re-aggregates that table (category-cardinality x k sized); the
    fold spine is a k-row cross join.
    """
    if k < 2:
        raise ValueError("k must be >= 2 (leave-one-fold-out needs folds)")
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    from blueetl_spark.schemas import require_integral

    require_integral(df, target_col, op="target_encode_kfold")
    c = F.col(cat_col).cast("string")
    t = F.col(target_col).cast("long")
    fold = F.pmod(hash_bucket(key_col, seed, method), F.lit(k)).alias("fold")
    src = df.filter(t.isNotNull()).select(
        c.alias("category"), fold, t.alias("__t")
    )
    cf = src.groupBy("category", "fold").agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__t").alias("__s")
    )
    cat_tot = cf.groupBy("category").agg(
        F.sum("__n").alias("__nc"), F.sum("__s").alias("__sc")
    )
    fold_tot = cf.groupBy("fold").agg(
        F.sum("__n").alias("__nf"), F.sum("__s").alias("__sf")
    )
    grand = cf.agg(F.sum("__n").alias("__ng"), F.sum("__s").alias("__sg"))
    spark = df.sparkSession
    spine = cat_tot.crossJoin(
        F.broadcast(spark.range(k).select(F.col("id").alias("fold")))
    )
    # eqNullSafe on category (the r10-advice chi2 lesson): a NULL
    # category must find its own per-fold counts, or its rows silently
    # self-leak (n=0 -> n_other = the full count, own fold included)
    dense = (
        spine.join(
            cf.select(
                F.col("category").alias("__cfc"),
                F.col("fold").alias("__cff"),
                "__n",
                "__s",
            ),
            spine["category"].eqNullSafe(F.col("__cfc"))
            & (spine["fold"] == F.col("__cff")),
            "left",
        )
        .select(
            "category",
            "fold",
            "__nc",
            "__sc",
            F.coalesce("__n", F.lit(0)).alias("__n"),
            F.coalesce("__s", F.lit(0)).alias("__s"),
        )
        .join(F.broadcast(fold_tot), "fold", "left")
        .crossJoin(F.broadcast(grand))
    )
    n_other = F.col("__nc") - F.col("__n")
    s_other = F.col("__sc") - F.col("__s")
    ng_other = F.col("__ng") - F.coalesce("__nf", F.lit(0))
    sg_other = F.col("__sg") - F.coalesce("__sf", F.lit(0))
    prior = F.when(
        ng_other > 0, sg_other.cast("double") / ng_other.cast("double")
    )
    enc = (s_other.cast("double") + F.lit(float(alpha)) * prior) / (
        n_other.cast("double") + F.lit(float(alpha))
    )
    if round_to is not None:
        enc = F.round(enc, round_to) + 0.0
    return dense.select(
        "category",
        "fold",
        n_other.alias("n_other"),
        enc.alias("encoded"),
    )
