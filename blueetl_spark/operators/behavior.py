"""User-behavior analytics: ordered funnels and retention cohorts.

Beyond-reference additions in the reference's own domain (grouped event
analytics — the reference's feature engine folds each group's spike
train to scalar features, ``src/blueetl/features.py``): these cover the
two classic *product/event* analytics shapes a large pipeline needs —
"how far do users get through an ordered sequence of actions" (funnel)
and "how many of each signup cohort are still active k months later"
(retention).

Scale design:

- **Funnel**: the sequential dependency (stage ``k``'s earliest
  completion depends on stage ``k-1``'s) makes k separate conditional
  aggregates a k-shuffle plan. Implemented instead as ONE shuffle on
  the user key: events are pre-filtered to the funnel's own step types
  (predicate pushed to the scan), collected per user as a
  time-sorted array, and folded by a JVM higher-order ``aggregate``
  whose state is the per-stage earliest-completion array. Because the
  fold runs in time order and each state slot is written at most once
  (first qualifying event = earliest), the fold equals the
  "min time of step k strictly after min time of step k-1" fixpoint —
  the exact SQL-expressible semantics the oracle replays. The per-user
  array is bounded by that user's *matching* events (same bound as any
  per-user window); the final stage tally is a single k-row aggregate.
- **Retention cohorts**: first-activity month per user (one aggregate),
  joined back on the user key — co-partitioned with the aggregate's own
  hash distribution, so the join adds no exchange — then a second
  aggregate on (cohort month, month offset) with ``countDistinct``.
  Two shuffles total at any scale; the output is bounded by
  months × months, never by users.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _stage_completion_times(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str,
    type_col: str,
    time_col: str,
) -> tuple[DataFrame, list[str]]:
    """Shared funnel core: one row per user with ``__arr`` — the array
    of earliest per-stage completion times (null = unreached), computed
    by a JVM higher-order fold over the user's time-sorted matching
    events. ONE user-key shuffle; the step-type filter is pushed to the
    scan."""
    steps = list(steps)
    if not steps:
        raise ValueError("steps must be non-empty")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct")
    k = len(steps)
    steps_lit = F.array(*[F.lit(s) for s in steps])

    ev = df.filter(F.col(type_col).isin(steps)).select(
        F.col(user_col).alias("__u"),
        F.col(type_col).alias("__t"),
        F.col(time_col).cast("double").alias("__ts"),
    )
    # time-sorted (ts, type) per user; struct sort orders by ts first
    seq = ev.groupBy("__u").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("__ts"), F.col("__t")))
        ).alias("__seq")
    )
    # fold state: arr[j] = earliest completion time of stage j (null =
    # unreached). In time order each slot is written at most once, and
    # stage j-1's final value is always set before any event that could
    # complete stage j (strictly later), so the fold equals the
    # sequential-min fixpoint.
    init = F.array(*[F.lit(None).cast("double") for _ in range(k)])
    fold = F.aggregate(
        F.col("__seq"),
        init,
        lambda acc, x: F.transform(
            acc,
            lambda a, j: F.when(
                a.isNull()
                & (x["__t"] == F.element_at(steps_lit, j + F.lit(1)))
                # F.get is 0-based and null-safe: j=0 reads index -1 ->
                # null, and the OR's true left arm absorbs it (no
                # element_at(..., 0) error under non-short-circuit codegen)
                & ((j == F.lit(0)) | (F.get(acc, j - F.lit(1)) < x["__ts"])),
                x["__ts"],
            ).otherwise(a),
        ),
    )
    return seq.select(F.col("__u"), fold.alias("__arr")), steps


def funnel(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "time",
) -> DataFrame:
    """Ordered-funnel completion counts: for each stage ``k`` of
    ``steps``, the number of users with an event of type ``steps[k]``
    STRICTLY after their earliest completion of stage ``k-1`` (stage 0
    = earliest event of ``steps[0]``).

    Returns ``(stage, step, users)``, one row per stage in order.
    Result is deterministic (counts of earliest-completion fixpoints;
    equal-time events never satisfy the strict ordering, in either
    engine).
    """
    reached, steps = _stage_completion_times(
        df, steps, user_col, type_col, time_col
    )
    k = len(steps)
    tallies = reached.agg(
        *[
            F.sum(F.col("__arr")[j].isNotNull().cast("long")).alias(f"__s{j}")
            for j in range(k)
        ]
    )
    # typed lit() labels, not interpolated SQL literals: a quote in a
    # step name can't break the generated plan
    entries = [
        F.struct(
            F.lit(j).cast("long").alias("stage"),
            F.lit(steps[j]).alias("step"),
            F.coalesce(F.col(f"__s{j}"), F.lit(0))
            .cast("long")
            .alias("users"),
        )
        for j in range(k)
    ]
    return (
        tallies.select(F.explode(F.array(*entries)).alias("__r"))
        .select("__r.*")
        .orderBy("stage")
    )


def funnel_times(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "time",
    round_to: int = 6,
) -> DataFrame:
    """:func:`funnel` plus time-to-convert: for each stage, the users
    reaching it and the median / mean gap from the PREVIOUS stage's
    earliest completion (stage 0 has null gaps). Same single user-key
    shuffle — the gap stats are one k-column aggregate over the fold's
    per-user stage times; medians use exact linear-interpolation
    ``percentile`` (DuckDB ``quantile_cont`` semantics)."""
    reached, steps = _stage_completion_times(
        df, steps, user_col, type_col, time_col
    )
    k = len(steps)
    arr = F.col("__arr")
    aggs = []
    for j in range(k):
        aggs.append(F.sum(arr[j].isNotNull().cast("long")).alias(f"__n{j}"))
        if j:
            gap = arr[j] - arr[j - 1]  # non-null iff stage j reached
            aggs += [
                F.percentile(gap, F.lit(0.5)).alias(f"__med{j}"),
                F.avg(gap).alias(f"__avg{j}"),
            ]
    wide = reached.agg(*aggs)
    null_d = F.lit(None).cast("double")
    entries = [
        F.struct(
            F.lit(j).cast("long").alias("stage"),
            F.lit(steps[j]).alias("step"),
            F.coalesce(F.col(f"__n{j}"), F.lit(0))
            .cast("long")
            .alias("users"),
            (F.round(F.col(f"__med{j}"), round_to) if j else null_d)
            .alias("median_gap"),
            (F.round(F.col(f"__avg{j}"), round_to) if j else null_d)
            .alias("avg_gap"),
        )
        for j in range(k)
    ]
    return (
        wide.select(F.explode(F.array(*entries)).alias("__r"))
        .select("__r.*")
        .orderBy("stage")
    )


def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "time",
    tie_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """First-order transition matrix of each user's event stream:
    ``(from_type, to_type, n, prob)`` where ``prob`` is row-normalized
    (P(next | current)). One keyed window (lead) + two
    map-side-combined aggregates; the from-type totals are
    types-cardinality-sized and broadcast back. Equal-time events order
    deterministically on ``tie_col``."""
    order = [F.col(time_col)] + (
        [F.col(tie_col)] if tie_col is not None else []
    )
    w = Window.partitionBy(user_col).orderBy(*order)
    nxt = F.lead(type_col).over(w)
    pairs = (
        df.select(F.col(type_col).alias("from_type"), nxt.alias("to_type"))
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("__tot"))
    return (
        pairs.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(
                F.col("n").cast("double") / F.col("__tot").cast("double"),
                round_to,
            ).alias("prob"),
        )
    )


def event_sequences(
    df: DataFrame,
    n: int = 3,
    min_count: int = 1,
    user_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "time",
    tie_col: str | None = None,
) -> DataFrame:
    """Corpus-wide counts of length-``n`` event-type sequences
    (sliding n-grams over each user's time-ordered stream):
    ``(seq, n_occ)`` with ``seq`` space-joined. The behavioral-path
    mining primitive ("what do users do right before churning").

    One user-key shuffle: per-user ordered collect, n-grams emitted by
    a JVM ``transform`` over index windows (users with fewer than ``n``
    events contribute nothing), then a map-side-combined global count.
    Per-user arrays are bounded by that user's events — the same bound
    as any per-user window; equal-time events order on ``tie_col``.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    tie = F.col(tie_col) if tie_col is not None else F.lit(0)
    ev = df.select(
        F.col(user_col).alias("__u"),
        F.struct(
            F.col(time_col).cast("double").alias("t"),
            tie.alias("tie"),
            F.col(type_col).alias("ty"),
        ).alias("__e"),
    )
    seqs = ev.groupBy("__u").agg(
        F.transform(
            F.sort_array(F.collect_list("__e")), lambda e: e["ty"]
        ).alias("__ts")
    ).filter(F.size("__ts") >= n)
    grams = seqs.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("__ts") - n),
                lambda i: F.concat_ws(
                    " ", F.slice(F.col("__ts"), i + F.lit(1), n)
                ),
            )
        ).alias("seq")
    )
    return (
        grams.groupBy("seq")
        .agg(F.count("*").alias("n_occ"))
        .filter(F.col("n_occ") >= min_count)
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    date_col: str,
) -> DataFrame:
    """Monthly retention-cohort matrix: users are cohorted by the
    calendar month of their FIRST activity; for each (cohort,
    month_offset) cell, the number of distinct cohort users active in
    that offset month.

    Returns ``(cohort, month_offset, n_users)`` with ``cohort`` as
    ``yyyy-MM``. Month arithmetic is integer (year*12 + month), exact
    in any engine.
    """
    u, d = F.col(user_col), F.col(date_col)
    months = F.year(d) * 12 + F.month(d)
    first = df.groupBy(u.alias("__u")).agg(
        F.min(d).alias("__first_dt"), F.min(months).alias("__first_m")
    )
    joined = df.select(u.alias("__u"), months.alias("__m")).join(
        first, "__u"
    )
    return (
        joined.groupBy(
            F.date_format(F.date_trunc("month", F.col("__first_dt")), "yyyy-MM").alias(
                "cohort"
            ),
            (F.col("__m") - F.col("__first_m")).cast("long").alias("month_offset"),
        )
        .agg(F.countDistinct("__u").alias("n_users"))
    )


def touch_attribution(
    events: DataFrame,
    conversion_type: str,
    user_col: str = "gid",
    type_col: str = "event_type",
    time_col: str = "time",
    tie_col: str | None = None,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """First- and last-touch attribution: for every CONVERSION event,
    the first touch the user ever made before it and the latest touch
    preceding it — the two classic credit-assignment answers ("which
    channel started this user" vs "which channel closed the sale").
    Output: one row per conversion with ``first_touch`` / ``last_touch``
    (the touch's ``type_col`` value; NULL when the user converted with
    no prior touch) plus any ``keep_cols`` carried through for the
    downstream revenue rollup.

    One pass, ONE user-key exchange: a single ordered window per user
    computes both answers with ``first``/``last(..., ignorenulls=True)``
    over a CASE that nulls out conversion rows — so conversions never
    attribute to each other, equal-time touches resolve by the
    ``tie_col`` total order (pass the event id; without it, equal-time
    attribution is engine-arbitrary), and no self-join of the event
    table anywhere (the textbook implementation joins conversions to
    touches as-of, shuffling the table twice).
    """
    order = [F.col(time_col)] + ([F.col(tie_col)] if tie_col else [])
    w = (
        Window.partitionBy(user_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch = F.when(F.col(type_col) != conversion_type, F.col(type_col))
    out = events.select(
        user_col,
        type_col,
        time_col,
        *([tie_col] if tie_col else []),
        *keep_cols,
        F.first(touch, ignorenulls=True).over(w).alias("first_touch"),
        F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
    )
    return out.filter(F.col(type_col) == conversion_type).drop(type_col)


def rfm_scores(
    df: DataFrame,
    user_col: str,
    time_col: str,
    value_col: str,
    bins: int = 5,
) -> DataFrame:
    """RFM segmentation — the classic customer-value grid: per user,
    Recency (latest activity), Frequency (event count), Monetary
    (value sum), each scored 1..``bins`` by EXACT rank-based binning
    (``score = (rank−1)·bins div n + 1`` — pure integer arithmetic, no
    float quantile), higher = better on every axis (most recent, most
    frequent, biggest spender = ``bins,bins,bins``). Output: one row
    per user with the raw metrics, the three scores, and ``segment``
    (the concatenated score code, e.g. ``"543"``).

    Determinism: ranks order by (metric, user) — a total order — so
    tied metrics split across a bin boundary identically in every
    engine. Pass an INTEGER value column (quantize money to cents
    upstream) so the monetary sum is exact.

    Scale shape: one groupBy to the user-sized summary, then three
    rank windows over that summary. The windows are GLOBAL (scoring is
    a whole-population statement), so the user summary passes through
    single partitions — fine for summaries up to tens of millions;
    shard by a coarse key and score within shards beyond that.
    """
    if bins < 1:
        raise ValueError("bins must be >= 1")
    per_user = df.groupBy(user_col).agg(
        F.max(F.col(time_col)).alias("recency"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col(value_col).cast("long")).alias("monetary"),
    )
    n = per_user.agg(F.count(F.lit(1)).alias("__n"))
    out = per_user.crossJoin(F.broadcast(n))
    for metric, score in (
        ("recency", "r_score"),
        ("frequency", "f_score"),
        ("monetary", "m_score"),
    ):
        w = Window.orderBy(F.col(metric).asc(), F.col(user_col).asc())
        out = out.withColumn("__rk", F.row_number().over(w)).withColumn(
            score,
            F.expr(f"(__rk - 1) * {int(bins)} div __n + 1").cast("int"),
        ).drop("__rk")
    return out.drop("__n").withColumn(
        "segment",
        F.concat_ws("", "r_score", "f_score", "m_score"),
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    by: Sequence[str] = (),
    round_to: int | None = 6,
) -> DataFrame:
    """Kaplan–Meier survival estimator per group — time-to-event
    analytics with right-censoring done correctly (naive "mean time to
    conversion over converters only" is biased by exactly the users
    who never converted): churn/retention curves, time-to-first-
    purchase, incident time-to-resolution. Input: ONE ROW PER SUBJECT
    with a numeric ``duration`` and an ``event`` flag (truthy = the
    event was observed, falsy = censored at that duration). Output:
    one row per (group, distinct event time): ``(by…, t, n_risk,
    n_events, n_censored, survival)`` with
    ``S(t) = Π_{t_i ≤ t} (n_i − d_i)/n_i`` over event times —
    censor-only times don't step the curve (their factor is exactly
    1.0, multiplicatively invisible) but DO shrink the at-risk set,
    which is the entire point of KM.

    Engine-exact: ``n_risk``/``d``/``c`` are integer window sums; the
    survival product is a RUNNING window product of per-time factors —
    both engines fold a cumulative frame sequentially in time order
    over identical IEEE ratios, and censor-only times contribute an
    exact 1.0, so the float sequence is bit-identical cross-engine.

    Scale shape: ONE map-side-combined aggregate to per-(group,
    duration) event/censor counts, then one ordered window over
    DISTINCT durations per group (same shape and same giant-group
    caveat as ``timeseries.ks_drift`` — durations are usually
    quantized; bucket upstream if not).
    """
    by = list(by)
    dur, ev = F.col(duration_col), F.col(event_col)
    g = (
        df.filter(dur.isNotNull())
        .select(
            *by,
            dur.alias("__t"),
            F.when(ev.cast("boolean"), 1).otherwise(0).alias("__e"),
        )
        .groupBy(*by, "__t")
        .agg(
            F.sum("__e").alias("__d"),
            F.sum(1 - F.col("__e")).alias("__c"),
        )
    )
    w_all = Window.partitionBy(*by)
    w_run = (
        Window.partitionBy(*by)
        .orderBy("__t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    total = F.sum(F.col("__d") + F.col("__c")).over(w_all)
    cum = F.sum(F.col("__d") + F.col("__c")).over(w_run)
    n_risk = total - cum + (F.col("__d") + F.col("__c"))
    factor = (n_risk - F.col("__d")).cast("double") / n_risk.cast("double")
    surv = F.product(F.col("__f")).over(w_run)
    if round_to is not None:
        surv = F.round(surv, round_to) + 0.0
    stepped = g.select(
        *by,
        "__t",
        "__d",
        "__c",
        n_risk.alias("n_risk"),
        factor.alias("__f"),
    )
    return (
        stepped.select(
            *by,
            F.col("__t").alias("t"),
            "n_risk",
            F.col("__d").alias("n_events"),
            F.col("__c").alias("n_censored"),
            surv.alias("survival"),
        )
        .filter(F.col("n_events") > 0)
    )


def log_rank(
    df_a: DataFrame,
    df_b: DataFrame,
    duration_col: str,
    event_col: str,
    by: Sequence[str] = (),
    round_to: int | None = 6,
) -> DataFrame:
    """Log-rank test per group — "do these two survival curves differ?",
    the significance companion to :func:`kaplan_meier` (eyeballing two
    KM curves is not a test; censoring breaks naive mean comparisons).
    Inputs are two subject frames with the same (duration, event)
    contract as ``kaplan_meier``. Output: ``(by…, n_a, n_b, chi2)``
    where ``chi2 = (Σ_t (d_a − E_a))² / Σ_t V_t`` over distinct pooled
    event times, with the hypergeometric mean
    ``E_a = d·n_a/n`` and variance
    ``V = d·(n_a/n)·(n_b/n)·(n−d)/(n−1)`` at each time (compare
    against χ²₁: 3.84 at α=0.05). Groups with either side empty report
    NULL chi2; a group with NO pooled events emits no row at all (there
    is no curve to compare — every subject is censored).

    Engine-exact: at-risk counts, event counts, and censor counts are
    integer window sums over the pooled per-(group, duration) table;
    each time's E and V terms are fixed float expressions over those
    integers, and both float sums fold over TIME-ORDERED term lists
    (never commutative float aggregates). Scale shape: one
    map-side-combined pre-agg of the tagged union, one ordered window
    over distinct durations per group, then a duration-count-sized
    fold — the ks_drift shape, with its same giant-group caveat.
    """
    by = list(by)
    dur, ev = F.col(duration_col), F.col(event_col)

    def side(df, tag):
        return df.filter(dur.isNotNull()).select(
            *by,
            dur.alias("__t"),
            F.when(ev.cast("boolean"), 1).otherwise(0).alias("__e"),
            F.lit(tag).alias("__side"),
        )

    u = side(df_a, 0).unionByName(side(df_b, 1))
    g = u.groupBy(*by, "__t").agg(
        F.sum(F.when(F.col("__side") == 0, F.col("__e")).otherwise(0)).alias("__da"),
        F.sum(F.when(F.col("__side") == 1, F.col("__e")).otherwise(0)).alias("__db"),
        F.sum(F.when(F.col("__side") == 0, 1).otherwise(0)).alias("__ta"),
        F.sum(F.when(F.col("__side") == 1, 1).otherwise(0)).alias("__tb"),
    )
    w_all = Window.partitionBy(*by)
    w_run = (
        Window.partitionBy(*by)
        .orderBy("__t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    na_risk = (
        F.sum("__ta").over(w_all) - F.sum("__ta").over(w_run) + F.col("__ta")
    ).cast("long")
    nb_risk = (
        F.sum("__tb").over(w_all) - F.sum("__tb").over(w_run) + F.col("__tb")
    ).cast("long")
    rows = g.select(
        *by,
        "__t",
        F.col("__da").cast("long").alias("__da"),
        (F.col("__da") + F.col("__db")).cast("long").alias("__d"),
        na_risk.alias("__na"),
        (na_risk + nb_risk).alias("__n"),
        F.sum("__ta").over(w_all).cast("long").alias("n_a"),
        F.sum("__tb").over(w_all).cast("long").alias("n_b"),
    ).filter(F.col("__d") > 0)
    # E and V at each event time are fixed float expressions over exact
    # integers; both sums fold in time order
    folded = rows.groupBy(*by).agg(
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
        F.array_sort(
            F.collect_list(F.struct("__t", "__da", "__d", "__na", "__n"))
        ).alias("__terms"),
    )
    term_u = lambda s: (  # noqa: E731
        s["__da"].cast("double")
        - s["__d"].cast("double") * s["__na"].cast("double") / s["__n"].cast("double")
    )
    term_v = lambda s: F.when(  # noqa: E731
        s["__n"] > 1,
        s["__d"].cast("double")
        * (s["__na"].cast("double") / s["__n"].cast("double"))
        * ((s["__n"] - s["__na"]).cast("double") / s["__n"].cast("double"))
        * ((s["__n"] - s["__d"]).cast("double") / (s["__n"] - 1).cast("double")),
    ).otherwise(F.lit(0.0))
    usum = F.aggregate(
        F.transform(F.col("__terms"), term_u), F.lit(0.0), lambda a, t: a + t
    )
    vsum = F.aggregate(
        F.transform(F.col("__terms"), term_v), F.lit(0.0), lambda a, t: a + t
    )
    chi2 = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0) & (vsum > 0),
        usum * usum / vsum,
    )

    def rnd(c):
        return (F.round(c, round_to) + 0.0) if round_to is not None else c

    return (
        folded.select(*by, "n_a", "n_b", rnd(chi2).alias("chi2"))
        # an ungrouped aggregate over zero event times still emits one
        # all-NULL row (Spark's global-agg semantics) — drop it so the
        # no-events contract holds with and without group keys
        .filter(F.col("n_a").isNotNull())
    )


def cohort_ltv(
    df: DataFrame,
    user_col: str,
    date_col: str,
    value_col: str,
    scale: int = 100,
    round_to: int | None = 6,
) -> DataFrame:
    """Cumulative cohort LTV curves — the revenue companion to
    :func:`retention_cohorts` (retention asks "did they come back";
    LTV asks "what are they worth by month N", the number payback
    windows and acquisition budgets are set against). Users cohort by
    the calendar month of their first activity; for each (cohort,
    month_offset) cell: active distinct users, the cell's value, the
    cohort's CUMULATIVE value through that offset, and cumulative
    value per cohort user (cohort size = month-0 distinct users, the
    denominator fixed at acquisition so curves are comparable across
    cohorts). Returns ``(cohort, month_offset, cohort_size, n_active,
    value_c, cum_value_c, ltv_per_user)`` with values in integer
    ``floor(value·scale)`` units (cents by default) — sums stay exact
    and mergeable; only the terminal per-user ratio touches floats.

    Scale shape: one first-activity aggregate (reusing its
    distribution for the join back, same as retention_cohorts), one
    (cohort, offset) cell aggregate, then a running window over the
    months²-bounded cell table — every post-join stage is
    calendar-sized, never user-sized.
    """
    u, d, v = F.col(user_col), F.col(date_col), F.col(value_col)
    months = F.year(d) * 12 + F.month(d)
    first = df.groupBy(u.alias("__u")).agg(
        F.min(d).alias("__first_dt"), F.min(months).alias("__first_m")
    )
    joined = df.select(
        u.alias("__u"),
        months.alias("__m"),
        F.floor(v * F.lit(scale)).cast("long").alias("__vc"),
    ).join(first, "__u")
    cells = joined.groupBy(
        F.date_format(
            F.date_trunc("month", F.col("__first_dt")), "yyyy-MM"
        ).alias("cohort"),
        (F.col("__m") - F.col("__first_m")).cast("long").alias("month_offset"),
    ).agg(
        F.countDistinct("__u").alias("n_active"),
        F.sum("__vc").alias("value_c"),
    )
    w_run = (
        Window.partitionBy("cohort")
        .orderBy("month_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("cohort")
    size = F.max(
        F.when(F.col("month_offset") == 0, F.col("n_active"))
    ).over(w_all)
    cum = F.sum("value_c").over(w_run)
    ltv = F.when(
        size > 0, cum.cast("double") / F.lit(float(scale)) / size.cast("double")
    )

    def rnd(c):
        return (F.round(c, round_to) + 0.0) if round_to is not None else c

    return cells.select(
        "cohort",
        "month_offset",
        size.alias("cohort_size"),
        "n_active",
        "value_c",
        cum.alias("cum_value_c"),
        rnd(ltv).alias("ltv_per_user"),
    )


def cuped(
    df: DataFrame,
    metric_col: str,
    covariate_col: str,
    variant_col: str,
    by: Sequence[str] = (),
    round_to: int | None = 6,
) -> DataFrame:
    """CUPED variance reduction for experiment readouts (Deng et al.,
    WSDM'13: Controlled experiments Using Pre-Experiment Data) — the
    standard trick that shrinks an A/B metric's variance by regressing
    out a pre-period covariate: ``theta = cov(x, y)/var(x)`` POOLED
    across variants (per ``by`` group), ``y_cuped = y − θ·(x − x̄)``.
    One row per (by…, variant): ``(by…, variant, n, theta, mean_y,
    mean_y_cuped, var_y, var_y_cuped, var_reduction)`` where
    ``var_reduction = 1 − var_cuped/var_y`` (population variances;
    NULL when ``var_y = 0``). When the pooled covariate is constant
    (``var(x) = 0``) there is nothing to regress out: theta and the
    cuped columns are NULL. Rows missing any of metric / covariate /
    variant are excluded (the adjustment needs all three).

    Engine-exact: per-variant moments (n, Σy, Σx, Σxy, Σx², Σy²) are
    order-insensitive sums — EXACT BIGINTs when the inputs are
    integers (quantize money to integer units first; Σx² must fit
    BIGINT → |x| ≲ 10⁶ over 10⁶ rows), and every output is a fixed
    IEEE expression over the once-cast moments (the spearman
    discipline), so no float ever enters a sum. Scale shape: ONE
    map-side-combined aggregate per (by…, variant); the pooled moments
    re-aggregate the VARIANT table (group-count-sized) and broadcast
    back — no second data pass.
    """
    from blueetl_spark.schemas import require_integral

    require_integral(df, metric_col, covariate_col, op="cuped")
    by = list(by)
    y = F.col(metric_col).cast("long")
    x = F.col(covariate_col).cast("long")
    v = F.col(variant_col)
    src = df.filter(
        y.isNotNull() & x.isNotNull() & v.isNotNull()
    ).select(*by, v.alias("variant"), y.alias("__y"), x.alias("__x"))
    per_v = src.groupBy(*by, "variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__y").alias("__sy"),
        F.sum("__x").alias("__sx"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
    )
    pooled = per_v.groupBy(*by).agg(
        F.sum("n").alias("__pn"),
        F.sum("__sy").alias("__psy"),
        F.sum("__sx").alias("__psx"),
        F.sum("__sxy").alias("__psxy"),
        F.sum("__sxx").alias("__psxx"),
    )
    j = (
        per_v.join(F.broadcast(pooled), by)
        if by
        else per_v.crossJoin(F.broadcast(pooled))
    )

    def d(c):
        return F.col(c).cast("double")

    # pooled theta and mean_x: fixed float trees over once-cast moments
    pvarx_num = d("__pn") * d("__psxx") - d("__psx") * d("__psx")
    theta = F.when(
        pvarx_num != 0.0,
        (d("__pn") * d("__psxy") - d("__psx") * d("__psy")) / pvarx_num,
    )
    pmean_x = d("__psx") / d("__pn")
    n, sy, sx = d("n"), d("__sy"), d("__sx")
    mean_y = sy / n
    mean_x = sx / n
    var_y = d("__syy") / n - mean_y * mean_y
    var_x = d("__sxx") / n - mean_x * mean_x
    cov = d("__sxy") / n - mean_x * mean_y
    mean_y_cuped = mean_y - theta * (mean_x - pmean_x)
    var_y_cuped = var_y - 2.0 * theta * cov + theta * theta * var_x
    var_reduction = F.when(var_y > 0.0, 1.0 - var_y_cuped / var_y)

    def rnd(c):
        return (F.round(c, round_to) + 0.0) if round_to is not None else c

    return j.select(
        *by,
        "variant",
        "n",
        rnd(theta).alias("theta"),
        rnd(mean_y).alias("mean_y"),
        rnd(mean_y_cuped).alias("mean_y_cuped"),
        rnd(var_y).alias("var_y"),
        rnd(var_y_cuped).alias("var_y_cuped"),
        rnd(var_reduction).alias("var_reduction"),
    )


def nelson_aalen(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    by: Sequence[str] = (),
    round_to: int | None = 6,
) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimator per group — the
    additive companion to :func:`kaplan_meier` (same one-row-per-
    subject duration/censor-flag contract): ``H(t) = Σ_{t_i ≤ t}
    d_i/n_i`` over event times. Preferred over ``-log(KM)`` for small
    at-risk sets, and the quantity whose between-group DIFFERENCE is
    the integrated hazard contrast the :func:`log_rank` test weighs.
    Output: one row per (group, event time): ``(by…, t, n_risk,
    n_events, n_censored, cum_hazard, var_hazard)`` with the standard
    variance ``Σ d_i/n_i²``.

    Engine-exact: the same integer window sums as ``kaplan_meier``;
    the two running totals are ordered cumulative SUMS over identical
    IEEE ratios (censor-only times add exactly 0.0), so both engines
    fold the same floats in time order.

    Scale shape: identical to ``kaplan_meier`` — one map-side-combined
    aggregate to (group, duration) grain, one ordered window over
    distinct durations.
    """
    by = list(by)
    dur, ev = F.col(duration_col), F.col(event_col)
    g = (
        df.filter(dur.isNotNull())
        .select(
            *by,
            dur.alias("__t"),
            F.when(ev.cast("boolean"), 1).otherwise(0).alias("__e"),
        )
        .groupBy(*by, "__t")
        .agg(
            F.sum("__e").alias("__d"),
            F.sum(1 - F.col("__e")).alias("__c"),
        )
    )
    w_all = Window.partitionBy(*by)
    w_run = (
        Window.partitionBy(*by)
        .orderBy("__t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    total = F.sum(F.col("__d") + F.col("__c")).over(w_all)
    cum = F.sum(F.col("__d") + F.col("__c")).over(w_run)
    n_risk = total - cum + (F.col("__d") + F.col("__c"))
    dn = F.col("__d").cast("double") / n_risk.cast("double")
    dn2 = F.col("__d").cast("double") / (n_risk * n_risk).cast("double")
    stepped = g.select(
        *by, "__t", "__d", "__c", n_risk.alias("n_risk"),
        dn.alias("__h"), dn2.alias("__v"),
    )
    haz = F.sum("__h").over(w_run)
    var = F.sum("__v").over(w_run)
    if round_to is not None:
        haz = F.round(haz, round_to) + 0.0
        var = F.round(var, round_to) + 0.0
    return (
        stepped.select(
            *by,
            F.col("__t").alias("t"),
            "n_risk",
            F.col("__d").alias("n_events"),
            F.col("__c").alias("n_censored"),
            haz.alias("cum_hazard"),
            var.alias("var_hazard"),
        )
        .filter(F.col("n_events") > 0)
    )
