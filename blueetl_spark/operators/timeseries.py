"""Ordered-time operators: as-of join, sessionization, group quantiles.

Beyond-reference additions in the reference's own domain (event/time
analytics): the reference slices events into *fixed* windows
(``extract/spikes.py:22-29``); these cover the ordered-in-time queries a
pipeline needs next — "latest state at the time of each event" (as-of),
"activity bursts" (sessions), "distribution summaries" (quantiles).

Scale design:

- **As-of join**: Spark has no native as-of join, and the naive range
  join (``l.time >= r.time`` + greatest-per-key) explodes to the full
  left×right-history cross product within each key before aggregating
  it back down. Implemented instead as **union + ordered window**: tag
  right rows 0 / left rows 1, union by name, then one window partitioned
  by the ``by`` keys ordered by (time, tag) carries the latest right
  payload forward with ``last(struct, ignorenulls=True)``. Exactly one
  shuffle, output size = left size, no intermediate blow-up. Ties
  (equal time) resolve to the right row (inclusive ``>=`` — the same
  default as DuckDB/pandas as-of semantics).
- **Sessionize**: gaps-and-islands — a lag-window marks session starts,
  a running sum numbers them, a groupBy folds each session to one row.
  ONE shuffle total: the fold groups on ``by + session``, and the
  window's hash partitioning on ``by`` (a subset of the grouping keys)
  already satisfies that distribution, so Catalyst elides the second
  exchange (pinned by a plan test). The streaming twin is
  ``streaming/windows.py::session_windows``.
- **Quantiles**: ``F.percentile`` — exact, linear-interpolation, one
  map-side-combined aggregate; identical semantics to DuckDB's
  ``quantile_cont`` so results are oracle-verifiable bit-for-bit after
  rounding. For 100 TB use ``approx_percentile`` (t-digest-style sketch,
  mergeable, bounded memory) — same call shape, documented trade.

Skew note: both window operators partition by the ``by`` keys; a single
hyperactive key serializes through one task. The mitigation is the same
as for any keyed window — pre-split hot keys (salt + merge) or bound
per-key history upstream; the operators keep the declarative shape so
AQE handles moderate skew.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _asof_tag_sides(left, right, on, by, suffix, bucket_expr=None):
    """Shared prep for both as-of variants: suffixed right-payload struct,
    tagged (right=0 before left=1 at equal times → inclusive backward)
    union inputs, optionally carrying a time-bucket column."""
    payload = [c for c in right.columns if c not in (*by, on)]
    extra = [bucket_expr(on).alias("__b")] if bucket_expr is not None else []
    r = right.select(
        *by,
        *extra,
        F.col(on).alias("__t"),
        F.lit(0).alias("__tag"),
        F.struct(
            F.col(on).alias(f"{on}{suffix}"),
            *[F.col(c).alias(f"{c}{suffix}") for c in payload],
        ).alias("__r"),
    )
    l = left.select(
        "*",
        *extra,
        F.col(on).alias("__t"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
    )
    return l, r, payload


def _asof_finalize(out, left_cols, on, payload, suffix, tolerance):
    """Shared tail: tolerance nulls stale matches, then unpack the match
    struct into suffixed columns next to the original left columns."""
    if tolerance is not None:
        out = out.withColumn(
            "__m",
            F.when(
                F.col(f"__m.{on}{suffix}") >= F.col("__t") - F.lit(tolerance),
                F.col("__m"),
            ),
        )
    return out.select(
        *left_cols,
        F.col(f"__m.{on}{suffix}").alias(f"{on}{suffix}"),
        *[F.col(f"__m.{c}{suffix}").alias(f"{c}{suffix}") for c in payload],
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "time",
    by: Sequence[str] = ("gid",),
    tolerance: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row, attach the latest right row with
    ``right.on <= left.on`` within the same ``by`` group (backward
    as-of, inclusive). Right payload columns are suffixed; left rows
    with no prior right row keep nulls.

    ``tolerance`` (same unit as ``on``) nulls matches older than
    ``left.on - tolerance``, like pandas ``merge_asof(tolerance=...)``.
    """
    by = list(by)
    l, r, payload = _asof_tag_sides(left, right, on, by, suffix)
    w = (
        Window.partitionBy(*by)
        .orderBy("__t", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l.unionByName(r.select(*by, "__t", "__tag", "__r"), allowMissingColumns=True)
    matched = matched.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
    out = matched.filter(F.col("__tag") == 1)
    return _asof_finalize(out, left.columns, on, payload, suffix, tolerance)


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    bucket_width: float,
    on: str = "time",
    by: Sequence[str] = ("gid",),
    tolerance: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """:func:`asof_join` with intra-key parallelism for skewed keys.

    The plain as-of join partitions by the ``by`` keys, so one
    hyperactive key's entire history serializes through a single task.
    This variant splits time into ``bucket_width`` slices and runs the
    ordered window per (key, bucket) — a hot key's work spreads over
    ``history / bucket_width`` tasks:

    1. *Local pass*: union-window within (by, bucket) → latest right row
       at-or-before each left row **within its own bucket**.
    2. *Carry-in*: per (by, bucket), the bucket's latest right payload
       (one ``max_by`` row per occupied bucket — key×bucket sized, tiny
       relative to the data), then a per-key window over the bucket
       *spine* takes the latest payload from any **strictly earlier**
       bucket.
    3. *Merge*: ``coalesce(local, carry_in)`` — latest-in-bucket wins,
       else the newest payload from a previous bucket.

    Three shuffles of the big tables instead of one; worth it exactly
    when per-key history is too deep for a single task. Semantics are
    identical to :func:`asof_join` (inclusive backward, tolerance
    nulls stale matches) — pinned by a parity test on random data.
    """
    by = list(by)
    bucket = lambda c: F.floor(F.col(c) / F.lit(bucket_width))  # noqa: E731
    l, r, payload = _asof_tag_sides(left, right, on, by, suffix, bucket_expr=bucket)
    w_local = (
        Window.partitionBy(*by, "__b")
        .orderBy("__t", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = (
        l.unionByName(r.select(*by, "__b", "__t", "__tag", "__r"),
                      allowMissingColumns=True)
        .withColumn("__m", F.last("__r", ignorenulls=True).over(w_local))
        .filter(F.col("__tag") == 1)
    )

    # carry-in: latest right payload per occupied (by, bucket)…
    bucket_last = r.groupBy(*by, "__b").agg(
        F.max_by("__r", "__t").alias("__r_last")
    )
    # …joined onto the spine of every bucket either side touches, then the
    # newest payload from any strictly earlier bucket via an exclusive
    # window (small table: one row per key×bucket).
    spine = (
        l.select(*by, "__b").distinct()
        .unionByName(r.select(*by, "__b").distinct())
        .distinct()
    )
    w_carry = (
        Window.partitionBy(*by)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        spine.join(bucket_last, [*by, "__b"], "left")
        .withColumn("__carry", F.last("__r_last", ignorenulls=True).over(w_carry))
        .select(*by, "__b", "__carry")
    )
    out = local.join(carry, [*by, "__b"], "left").withColumn(
        "__m", F.coalesce("__m", "__carry")
    )
    return _asof_finalize(out, left.columns, on, payload, suffix, tolerance)


def sessionize(
    events: DataFrame,
    gap: float,
    by: Sequence[str] = ("gid",),
    time_col: str = "time",
) -> DataFrame:
    """Fold each ``by`` group's event stream into sessions separated by
    silences longer than ``gap``: (by…, session, t_start, t_end,
    n_events, duration). ``session`` numbers a group's sessions from 1
    in time order — the batch twin of the streaming session window.
    """
    by = list(by)
    w = Window.partitionBy(*by).orderBy(time_col)
    new_session = (
        F.col(time_col) - F.lag(time_col).over(w) > F.lit(gap)
    ) | F.lag(time_col).over(w).isNull()
    numbered = events.withColumn(
        "session",
        F.sum(new_session.cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return numbered.groupBy(*by, "session").agg(
        F.min(time_col).alias("t_start"),
        F.max(time_col).alias("t_end"),
        F.count("*").alias("n_events"),
        (F.max(time_col) - F.min(time_col)).alias("duration"),
    )


def group_quantiles(
    df: DataFrame,
    value_col: str,
    keys: Sequence[str],
    probs: Sequence[float] = (0.5, 0.9, 0.99),
    exact: bool = True,
) -> DataFrame:
    """Per-group value quantiles: (keys…, n, q_<p> …).

    ``exact=True`` uses ``percentile`` (full sort within the aggregate —
    fine up to the point where one group's values overflow a task;
    semantics identical to DuckDB ``quantile_cont``). ``exact=False``
    switches to ``approx_percentile``, the mergeable-sketch path that
    holds constant memory per group at any scale (accuracy 1/10000).
    """
    fn = (
        (lambda c, p: F.percentile(c, F.lit(p)))
        if exact
        else (lambda c, p: F.approx_percentile(c, F.lit(p), F.lit(10000)))
    )
    aggs = [
        fn(F.col(value_col), p).alias(f"q_{str(p).replace('.', '_')}")
        for p in probs
    ]
    return df.groupBy(*keys).agg(F.count("*").alias("n"), *aggs)


def resample(
    df: DataFrame,
    step: float,
    by: Sequence[str] = ("gid",),
    time_col: str = "time",
    value_col: str = "value",
    method: str = "ffill",
    t_start: float | None = None,
    t_stop: float | None = None,
) -> DataFrame:
    """Resample each group's irregular time series onto a regular grid:
    (by…, time, value) with ``time`` at multiples of ``step``.

    ``method``:

    - ``"ffill"`` — value of the latest observation at or before the grid
      point (NULL before the first observation).
    - ``"linear"`` — linear interpolation between the surrounding
      observations; before the first / after the last observation the
      nearest edge value is held (pandas ``interpolate`` +
      ffill/bfill-at-edges semantics).

    Grid bounds default to each group's own [min, max] observation times
    (grid points at ``ceil(min/step)·step … max``); pass ``t_start`` /
    ``t_stop`` for a common grid across groups.

    Scale shape: grid rows are generated per group with ``sequence`` +
    ``explode`` (never a driver-side range), unioned with the
    observations, and resolved in ONE window pass per direction over one
    hash exchange on the ``by`` keys: ``last(..., ignorenulls)`` carries
    the previous observation forward, its mirror over the reversed
    ordering carries the next observation backward, and the interpolation
    is row-local arithmetic. Output size = grid size; per-group state in
    the window is one struct. No join, no per-group collect; skew note at
    module top applies.
    """
    if method not in ("ffill", "linear"):
        raise ValueError(f"unknown resample method {method!r}")
    by = list(by)
    lo = F.lit(t_start) if t_start is not None else F.min(time_col)
    hi = F.lit(t_stop) if t_stop is not None else F.max(time_col)
    grid = (
        df.groupBy(*by)
        .agg(
            F.ceil(lo / F.lit(step)).cast("long").alias("__i0"),
            F.floor(hi / F.lit(step)).cast("long").alias("__i1"),
        )
        .filter(F.col("__i1") >= F.col("__i0"))
        .select(
            *by,
            F.explode(F.sequence("__i0", "__i1")).alias("__i"),
        )
        .select(
            *by,
            (F.col("__i") * F.lit(step)).cast("double").alias(time_col),
            F.lit(None).cast("double").alias("__obs"),
            F.lit(1).alias("__is_grid"),
        )
    )
    obs = df.select(
        *by,
        F.col(time_col).cast("double").alias(time_col),
        F.col(value_col).cast("double").alias("__obs"),
        F.lit(0).alias("__is_grid"),
    )
    # observations sort before grid points at equal time, so a grid point
    # coinciding with an observation picks it up as "previous"; __obs as
    # the final sort key makes duplicate-timestamp observations resolve
    # deterministically (prev takes the max value at its timestamp, next
    # the min) instead of by partition-internal row order
    u = obs.unionByName(grid)
    w_prev = (
        Window.partitionBy(*by)
        .orderBy(time_col, "__is_grid", "__obs")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(*by)
        .orderBy(
            F.col(time_col).desc(), F.col("__is_grid").desc(), F.col("__obs").desc()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    point = F.when(
        F.col("__is_grid") == 0, F.struct(F.col(time_col).alias("t"), F.col("__obs").alias("v"))
    )
    u = u.withColumn("__prev", F.last(point, ignorenulls=True).over(w_prev)).withColumn(
        "__next", F.last(point, ignorenulls=True).over(w_next)
    )
    prev_t, prev_v = F.col("__prev.t"), F.col("__prev.v")
    next_t, next_v = F.col("__next.t"), F.col("__next.v")
    if method == "ffill":
        value = prev_v
    else:
        span = next_t - prev_t
        value = (
            F.when(prev_t.isNull(), next_v)
            .when(next_t.isNull(), prev_v)
            .when(span == 0, prev_v)
            .otherwise(
                prev_v + (next_v - prev_v) * (F.col(time_col) - prev_t) / span
            )
        )
    return (
        u.filter(F.col("__is_grid") == 1)
        .select(*by, F.col(time_col), value.alias(value_col))
    )


def rolling_agg(
    df: DataFrame,
    span: float,
    by: Sequence[str] = ("gid",),
    time_col: str = "time",
    value_col: str = "value",
    aggs: Sequence[str] = ("avg", "count"),
) -> DataFrame:
    """Trailing time-window aggregates per group: for every observation,
    statistics over the rows within ``[t - span, t]`` of the same group
    (RANGE frame — peers at equal times all see the same frame, per
    ANSI; contrast a ROWS frame, which would be order-dependent under
    duplicate timestamps and thus not reproducible).

    Output: the ``by`` keys, ``time_col``, ``value_col``, plus one
    ``rolling_<agg>`` column per requested aggregate
    (``avg``/``count``/``sum``/``min``/``max``).

    Scale shape: ONE hash exchange on the ``by`` keys, then a single
    window pass — Spark's RANGE frame maintains a sliding aggregate
    buffer per partition (it never materializes the frame per row), so
    cost is O(rows) per group regardless of how many observations fall
    inside ``span``. Module skew note applies.
    """
    known = {"avg", "count", "sum", "min", "max"}
    bad = set(aggs) - known
    if bad:
        raise ValueError(f"unknown rolling aggregates {sorted(bad)}")
    if not float(span) > 0.0:
        raise ValueError(f"span must be positive, got {span!r}")
    for name in (*by, time_col, value_col):
        if "`" in name:
            raise ValueError(f"backtick in column name {name!r}")
    # the Python Window.rangeBetween API only takes integer bounds; the
    # SQL frame accepts any numeric ordering type, so build the OVER
    # clause as an expression (same Catalyst RangeFrame either way).
    # Empty ``by`` = one whole-frame window (single-task ordering — the
    # same scale caveat as any unpartitioned window).
    part = (
        f"PARTITION BY {', '.join(f'`{b}`' for b in by)} " if by else ""
    )
    over = (
        f"OVER ({part}"
        f"ORDER BY CAST(`{time_col}` AS DOUBLE) "
        f"RANGE BETWEEN {float(span)!r} PRECEDING AND CURRENT ROW)"
    )
    return df.select(
        *by,
        time_col,
        value_col,
        *[
            F.expr(f"{a}(`{value_col}`) {over}").alias(f"rolling_{a}")
            for a in aggs
        ],
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    p_lo: float = 0.05,
    p_hi: float = 0.95,
    by: str | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Clip a column to its [p_lo, p_hi] quantiles (optionally per
    group) — the standard outlier-taming step before means/regressions
    on heavy-tailed columns (doc lengths, latencies, prices).

    Same scale shape as equi-depth bucketing: the two boundaries are
    ONE map-side-combined aggregate (two doubles per group), broadcast
    back, and the clamp is a per-row ``greatest(lo, least(hi, v))`` —
    no sort, no window, no second shuffle of the data. Exact
    ``F.percentile`` matches DuckDB ``quantile_cont``; swap
    ``approx_percentile`` at 100 TB.
    """
    if not 0.0 <= p_lo < p_hi <= 1.0:
        raise ValueError("need 0 <= p_lo < p_hi <= 1")
    v = F.col(value_col).cast("double")
    bounds = (df.groupBy(by) if by else df.groupBy()).agg(
        F.percentile(v, F.lit(p_lo)).alias("__lo"),
        F.percentile(v, F.lit(p_hi)).alias("__hi"),
    )
    joined = (
        df.join(F.broadcast(bounds), on=by)
        if by
        else df.crossJoin(F.broadcast(bounds))
    )
    # greatest/least SKIP null arguments, so a bare clamp would turn a
    # NULL value into the hi boundary — preserve NULL explicitly
    clipped = F.when(
        v.isNotNull(), F.greatest(F.col("__lo"), F.least(F.col("__hi"), v))
    )
    return joined.select(
        *df.columns, clipped.alias(out_col or f"{value_col}_winsorized")
    )


def robust_outlier_stats(
    df: DataFrame,
    value_col: str,
    by: str | None = None,
    z_threshold: float = 3.5,
) -> DataFrame:
    """Robust (median/MAD) outlier summary per group: the modified
    z-score ``0.6745·(v − median)/MAD`` flags heavy-tail outliers
    without the mean/stddev's own sensitivity to them — the screening
    step before trusting distribution stats on scraped data.

    Output: (by?, n, n_outliers, median, mad). Scale shape: TWO
    boundary aggregates (median, then median of |v − median| — the
    second genuinely needs the first, so two passes is the floor),
    each a few doubles per group broadcast back; the flag count is a
    third map-side-combined pass. No sort, no window. A zero MAD
    (>50% of the group at one value) yields n_outliers = 0 rather
    than dividing by zero — documented, matching scipy's convention
    of treating such groups as degenerate.
    """
    v = F.col(value_col).cast("double")
    med = (df.groupBy(by) if by else df.groupBy()).agg(
        F.percentile(v, F.lit(0.5)).alias("__med")
    )
    j1 = (
        df.join(F.broadcast(med), on=by)
        if by
        else df.crossJoin(F.broadcast(med))
    )
    mad = (j1.groupBy(by) if by else j1.groupBy()).agg(
        F.first("__med").alias("__med"),
        F.percentile(F.abs(v - F.col("__med")), F.lit(0.5)).alias("__mad"),
    )
    j2 = (
        df.join(F.broadcast(mad), on=by)
        if by
        else df.crossJoin(F.broadcast(mad))
    )
    z = F.lit(0.6745) * (v - F.col("__med")) / F.col("__mad")
    is_out = (F.col("__mad") > 0) & (F.abs(z) > z_threshold)
    keys = [by] if by else []
    return j2.groupBy(*keys).agg(
        F.count(v).alias("n"),
        F.sum(is_out.cast("long")).alias("n_outliers"),
        F.first("__med").alias("median"),
        F.first("__mad").alias("mad"),
    )


def ohlc_resample(
    df: DataFrame,
    time_col: str,
    value_col: str,
    bucket_width: float,
    by: Sequence[str] = (),
    tie_col: str | None = None,
) -> DataFrame:
    """Per (keys…, fixed time bucket) OHLC bars: ``open`` = value at the
    earliest time in the bucket, ``close`` at the latest, ``high``/
    ``low`` the extremes, plus ``n`` and ``mean`` — the market-data /
    telemetry downsampling shape (:func:`resample_events` keeps only
    mean-style stats; OHLC needs order-aware endpoints).

    ONE map-side-combined aggregate, no window and no global sort:
    ``min_by``/``max_by`` keyed on ``(time, tie_col)`` pick the
    endpoint values during partial aggregation, so each group costs
    O(1) state regardless of bucket population. The struct ordering key
    plans as SortAggregate — a per-partition sort on the grouping key
    only (partials still combine before the single exchange), never a
    global order-by. ``tie_col`` (e.g. an event id) makes
    equal-timestamp endpoints deterministic — required for engine-exact
    replays.
    """
    if not bucket_width > 0:
        raise ValueError("bucket_width must be positive")
    t = F.col(time_col).cast("double")
    v = F.col(value_col).cast("double")
    ordk = F.struct(t, F.col(tie_col)) if tie_col is not None else F.struct(t)
    bucket = F.floor(t / F.lit(bucket_width)).cast("long")
    return (
        df.groupBy(*by, bucket.alias("bucket"))
        .agg(
            F.min_by(v, ordk).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max_by(v, ordk).alias("close"),
            F.count(v).alias("n"),
            F.avg(v).alias("mean"),
        )
        .withColumn("t_start", F.col("bucket") * F.lit(bucket_width))
    )


def grouped_linear_fit(
    df: DataFrame,
    x_col: str,
    y_col: str,
    by: Sequence[str] = (),
    round_to: int | None = 6,
) -> DataFrame:
    """Per-group ordinary-least-squares fit of ``y ~ x`` from sufficient
    statistics: ``(by…, n, slope, intercept, r2)`` in ONE map-side-
    combined aggregate — the closed-form moments
    ``slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)`` need five running sums
    and no second pass, the scalable shape for millions of groups
    (per-group `ml.LinearRegression` would be one job per group).

    Only rows with BOTH values non-null enter the sums (pairwise-
    complete, the ``regr_*`` SQL convention). Degenerate groups (n < 2
    or zero x-variance) yield NULL slope/intercept/r2. Keep ``x`` in
    units sized to the question (days, not epoch-ms) — the moment
    formula's cancellation is benign only when Σx² doesn't dwarf the
    centered variance.
    """
    both = F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    x = F.when(both, F.col(x_col).cast("double"))
    y = F.when(both, F.col(y_col).cast("double"))
    agg = df.groupBy(*by).agg(
        F.count(x).alias("n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(y * y).alias("__syy"),
        F.sum(x * y).alias("__sxy"),
    )
    n = F.col("n").cast("double")
    vx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    vy = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    cxy = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    slope = F.when((F.col("n") >= 2) & (vx != 0), cxy / vx)
    intercept = (F.col("__sy") - slope * F.col("__sx")) / n
    r2 = F.when(
        slope.isNotNull() & (vy != 0), (cxy * cxy) / (vx * vy)
    )

    def rnd(c):
        return F.round(c, round_to) if round_to is not None else c

    return agg.select(
        *by,
        "n",
        rnd(slope).alias("slope"),
        rnd(intercept).alias("intercept"),
        rnd(r2).alias("r2"),
    )


#: Bump when ohlc_shard's row layout changes semantically. v1 (the
#: unmarked era) cast open_tie/close_tie to double; v2 keeps the tie
#: column's native type and carries this marker.
OHLC_SHARD_SCHEMA_VERSION = 2


def ohlc_shard(
    df: DataFrame,
    time_col: str,
    value_col: str,
    bucket_width: float,
    by: Sequence[str] = (),
    tie_col: str | None = None,
    batch_id: str = "",
) -> DataFrame:
    """One mergeable partial-bar row per (keys…, bucket) for this
    batch: the :func:`ohlc_resample` stats plus the (time, tie) keys of
    the open/close endpoints, so bars MERGE exactly — the merged open
    is the partial open with the smallest endpoint key, a deterministic
    fold in any order (unlike a t-digest, replay- and oracle-safe).
    ``sum_v`` rides along so the merged mean never needs the raw data.
    Rows per batch are bounded by (groups × buckets touched) — the
    incremental contract of ``profile_shard``/``histogram_shard``.

    Every shard row carries a ``__schema_version`` marker column
    (current: :data:`OHLC_SHARD_SCHEMA_VERSION`). Version history:
    v1 (unmarked) cast ``open_tie``/``close_tie`` to double; v2 keeps
    the tie column's NATIVE type. :func:`merge_ohlc_shards` refuses
    unmarked or mixed-version shard frames with an actionable error
    instead of silently mis-merging a dir that accumulated appends
    from two builds.
    """
    if not bucket_width > 0:
        raise ValueError("bucket_width must be positive")
    t = F.col(time_col).cast("double")
    v = F.col(value_col).cast("double")
    # keep the tie column's NATIVE type (like ohlc_resample): casting to
    # double would NULL out string ties (silently losing the
    # deterministic open/close tie-break) and lose precision on int ids
    # above 2^53; struct ordering handles any orderable type, and a
    # non-orderable one fails analysis with a clear Spark error
    tie = F.col(tie_col) if tie_col is not None else F.lit(0.0)
    ordk = F.struct(t.alias("t"), tie.alias("tie"))
    bucket = F.floor(t / F.lit(bucket_width)).cast("long")
    return (
        df.filter(v.isNotNull())
        .groupBy(*by, bucket.alias("bucket"))
        .agg(
            F.min(ordk).alias("__ok"),
            F.min_by(v, ordk).alias("open"),
            F.max(ordk).alias("__ck"),
            F.max_by(v, ordk).alias("close"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.count(v).alias("n"),
            F.sum(v).alias("sum_v"),
        )
        .select(
            *by,
            "bucket",
            F.lit(batch_id).alias("batch_id"),
            F.col("__ok.t").alias("open_t"),
            F.col("__ok.tie").alias("open_tie"),
            "open",
            "high",
            "low",
            F.col("__ck.t").alias("close_t"),
            F.col("__ck.tie").alias("close_tie"),
            "close",
            "n",
            "sum_v",
            F.lit(OHLC_SHARD_SCHEMA_VERSION).alias("__schema_version"),
        )
    )


def merge_ohlc_shards(shards: DataFrame, by: Sequence[str] = ()) -> DataFrame:
    """Fold partial bars to final OHLC bars. Replay-safe: an
    at-least-once writer re-appends an IDENTICAL row under the same
    (keys…, bucket, batch_id) — deduped before the fold. One aggregate
    over shard rows (bounded by batches × groups × buckets, never by
    the ingested data).

    Version-guarded: shard rows must carry the current
    ``__schema_version`` marker. A frame with no marker column (a dir
    written entirely by a pre-versioning build) raises immediately
    (schema-only check, no job). A NULL marker (a mixed dir read with
    ``mergeSchema`` — old rows surface as NULL) or a stale/unknown
    version fails LAZILY, inside the merge plan itself: the marker is
    checked per-row by a ``raise_error`` guard folded into the ``n``
    column, so the merge stays a lazy plan builder (no eager
    distinct/collect job at call time — ADVICE r11) and a caller
    composing merges inside a larger pipeline pays nothing until the
    pipeline actually runs; the first offending row aborts the job
    with the fix named (re-shard from source or start a new shard
    path) instead of silently folding incompatible tie encodings.
    """
    if "__schema_version" not in shards.columns:
        raise ValueError(
            "ohlc shard frame has no __schema_version column: this shard "
            "dir was written by a pre-versioning build (v1, double-cast "
            "tie keys). Re-shard from source with the current ohlc_shard, "
            "or point the stream at a fresh shard_path."
        )
    bad_version = F.col("__schema_version").isNull() | (
        F.col("__schema_version") != F.lit(OHLC_SHARD_SCHEMA_VERSION)
    )
    version_guard = F.when(
        bad_version,
        F.raise_error(
            F.concat(
                F.lit("ohlc shard frame carries schema version "),
                F.coalesce(
                    F.col("__schema_version").cast("string"),
                    F.lit("NULL (unmarked pre-versioning rows merged in "
                          "via mergeSchema)"),
                ),
                F.lit(
                    f" (current: {OHLC_SHARD_SCHEMA_VERSION}). Re-shard "
                    "from source with the current ohlc_shard, or start a "
                    "new shard_path and let old dirs age out."
                ),
            )
        ).cast("long"),
    ).otherwise(F.col("n"))
    keys = [*by, "bucket"]
    return (
        shards.withColumn("n", version_guard)
        .dropDuplicates([*keys, "batch_id"])
        .groupBy(*keys)
        .agg(
            F.min_by("open", F.struct("open_t", "open_tie")).alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", F.struct("close_t", "close_tie")).alias("close"),
            F.sum("n").alias("n"),
            (F.sum("sum_v") / F.sum("n")).alias("mean"),
        )
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    bucket_width: float,
    on: Sequence[str] = (),
    l_start: str = "t_start",
    l_end: str = "t_end",
    r_start: str = "t_start",
    r_end: str = "t_end",
    suffix: str = "_r",
) -> DataFrame:
    """Interval×interval overlap join (half-open: ``l.start < r.end AND
    r.start < l.end``), optionally also matching on the ``on`` keys —
    "which maintenance windows intersect which sessions".

    Scale shape — the naive form is a range cross product (every left
    interval against every right interval per key). Instead both sides
    explode into fixed ``bucket_width`` time slices and equi-join on
    (keys…, slice): candidates are pairs sharing a slice, cost tracks
    genuine temporal locality. A pair sharing k slices would emit k
    duplicates; rather than a pair-distinct shuffle, each match is
    emitted ONLY from its canonical slice — the one containing the
    overlap's own start (``max(l.start, r.start)``) — a per-row
    predicate, so the join output is exactly the result. Pick
    ``bucket_width`` near the typical interval length: slices per
    interval ≈ length/width + 1 drive the explode factor.
    """
    if not bucket_width > 0:
        raise ValueError("bucket_width must be positive")
    on = list(on)

    def explode_buckets(df, start, end, names):
        b0 = F.floor(F.col(start) / F.lit(bucket_width)).cast("long")
        # half-open end: an interval ending exactly on a slice boundary
        # does not reach into that slice.  Computed WITHOUT an epsilon —
        # an absolute eps is absorbed by float64 rounding for large end
        # values (harmless extra slice) and clips genuine sub-eps
        # slivers for small ones (dropped matches): floor(end/width),
        # stepped back one only when end sits exactly on the boundary.
        bf = F.floor(F.col(end) / F.lit(bucket_width)).cast("long")
        b1 = F.when(
            F.col(end).cast("double")
            == bf.cast("double") * F.lit(bucket_width),
            bf - 1,
        ).otherwise(bf)
        return df.select(
            *names, F.explode(F.sequence(b0, F.greatest(b0, b1))).alias("__b")
        )

    lcols = list(left.columns)
    rmap = {
        c: (c + suffix if c in lcols and c not in on else c)
        for c in right.columns
    }
    r = right.select(*[F.col(c).alias(rmap[c]) for c in right.columns])
    le = explode_buckets(left, l_start, l_end, lcols)
    re_ = explode_buckets(r, rmap[r_start], rmap[r_end], list(r.columns))
    ls, le_c = F.col(l_start), F.col(l_end)
    rs, re_c = F.col(rmap[r_start]), F.col(rmap[r_end])
    overlap_start = F.greatest(ls, rs)
    cond = (ls < re_c) & (rs < le_c) & (
        F.col("__b")
        == F.floor(overlap_start / F.lit(bucket_width)).cast("long")
    )
    out = le.join(re_, on + ["__b"]).filter(cond).drop("__b")
    return out


def cusum_changepoint(
    df: DataFrame,
    value_col: str,
    time_col: str = "time",
    by: Sequence[str] = (),
    tie_col: str | None = None,
    round_to: int | None = 6,
) -> DataFrame:
    """CUSUM level-shift detection per group: the classic screening
    question "did this series' mean shift, and when?" for drifting
    sensors / regime changes in event streams.

    For each group, walk the series in time order and accumulate
    ``S_i = Σ_{j≤i} (v_j − v̄)`` (the cumulative deviation from the
    group mean — flat noise hovers near 0, a level shift makes |S|
    ramp to a peak AT the shift point). Output one row per group:
    ``(by…, n, mean, max_dev, t_at_max)`` where ``max_dev`` is
    ``max|S_i|`` (compare against a bootstrap/threshold downstream)
    and ``t_at_max`` its time — earliest on ties, tie_col as the
    within-time order tie-break.

    Scale shape: ONE shuffle — the group-mean aggregate broadcasts
    back (config-sized rows per group), then a single ordered window
    per group computes the running sum and a row_number picks the
    peak; both windows share the same hash partitioning so Catalyst
    plans one exchange. The running sum is sequential-in-time in any
    engine, so the float result is replay-exact and the SQL oracle
    reproduces it bit-for-bit (the mean is rounded to ``round_to + 3``
    before differencing so the two engines' aggregate summation order
    cannot leak last-ulp drift into the cumsum).
    """
    by = list(by)
    v = F.col(value_col).cast("double")
    means = (df.groupBy(*by) if by else df.groupBy()).agg(
        F.avg(v).alias("__mean"), F.count(v).alias("__n")
    )
    j = (
        df.join(F.broadcast(means), on=by)
        if by
        else df.crossJoin(F.broadcast(means))
    )
    mean = (
        F.round(F.col("__mean"), round_to + 3)
        if round_to is not None
        else F.col("__mean")
    )
    order = [F.col(time_col).asc()]
    if tie_col is not None:
        order.append(F.col(tie_col).asc())
    w_run = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = F.sum(v - mean).over(w_run)
    ranked = j.filter(v.isNotNull()).select(
        *by,
        F.col(time_col).alias("__t"),
        F.col("__n").alias("n"),
        mean.alias("__m"),
        F.abs(s).alias("__abs_s"),
    )
    w_pick = Window.partitionBy(*by).orderBy(
        F.col("__abs_s").desc(), F.col("__t").asc()
    )

    def rnd(c):
        return F.round(c, round_to) if round_to is not None else c

    return (
        ranked.withColumn("__rk", F.row_number().over(w_pick))
        .filter(F.col("__rk") == 1)
        .select(
            *by,
            "n",
            rnd(F.col("__m")).alias("mean"),
            rnd(F.col("__abs_s")).alias("max_dev"),
            F.col("__t").alias("t_at_max"),
        )
    )


def ks_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    round_to: int | None = 6,
    bins: int | None = None,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic per group — "did
    this column's distribution shift between corpus/feed versions?":
    ``D = max_v |F_a(v) − F_b(v)|`` over the empirical CDFs, the
    standard pre-retrain drift screen (compare D against the
    ``c(α)·sqrt((n+m)/(n·m))`` threshold downstream).

    Output: ``(by…, n_a, n_b, d_stat)``. NULL values are not
    observations. Groups present in only one side get ``d_stat`` NULL
    (no two-sample comparison exists) with the missing side's count 0
    — dropping them would hide exactly the drift signal (a group
    appearing/vanishing) the caller cares most about.

    Scale shape: pre-aggregate to per-(group, value) counts (ONE
    map-side-combined shuffle over the tagged union), then a single
    ordered window over DISTINCT values per group computes both
    running CDFs — tie-correct by construction (equal values fold into
    one row, so the CDFs step together). Every post-aggregate stage is
    distinct-value-sized. Numerically exact across engines: integer
    cumulative counts, one division each, no summation-order
    sensitivity anywhere.

    **Scale caveat / ``bins``:** the ordered window puts each group's
    distinct values in ONE partition. That's the right shape for
    per-entity / per-event-type series (distinct values per group stay
    bounded), but on a continuous column with one giant group the
    distinct count approaches the row count and a single task walks it
    all — run ``profile.key_skew`` on the group key first if unsure.
    Passing ``bins=N`` quantizes values into N equal-width buckets
    between the group's min and max BEFORE the CDF window (one extra
    group-sized aggregate, broadcast back), bounding the window input
    to ≤ N rows per group at the cost of bounded statistic error (the
    binned D understates the exact D by at most the largest
    within-bucket CDF mass — ≲ 1/N for smooth distributions). Binning
    requires a numeric value column; it is exactly replayable across
    engines (min/max are exact selections and the bucket arithmetic is
    a fixed IEEE expression, no order-sensitive float sums).
    """
    by = list(by)
    v = F.col(value_col)
    a = df_a.filter(v.isNotNull()).select(
        *by, v.alias("__v"), F.lit(1).alias("__a"), F.lit(0).alias("__b")
    )
    b = df_b.filter(v.isNotNull()).select(
        *by, v.alias("__v"), F.lit(0).alias("__a"), F.lit(1).alias("__b")
    )
    u = a.unionByName(b)
    if bins is not None:
        if bins < 1:
            raise ValueError("bins must be >= 1")
        ext = (u.groupBy(*by) if by else u.groupBy()).agg(
            F.min(F.col("__v").cast("double")).alias("__lo"),
            F.max(F.col("__v").cast("double")).alias("__hi"),
        )
        j = (
            u.join(F.broadcast(ext), on=by)
            if by
            else u.crossJoin(F.broadcast(ext))
        )
        vv = F.col("__v").cast("double")
        lo, hi = F.col("__lo"), F.col("__hi")
        width = (hi - lo) / F.lit(float(bins))
        bucket = (
            F.when(hi == lo, F.lit(0))
            .otherwise(
                F.least(F.floor((vv - lo) / width), F.lit(bins - 1))
            )
            .cast("long")
        )
        u = j.select(*by, bucket.alias("__v"), "__a", "__b")
    g = (
        u.groupBy(*by, "__v")
        .agg(F.sum("__a").alias("__ca"), F.sum("__b").alias("__cb"))
    )
    w_run = (
        Window.partitionBy(*by)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*by)
    cum_a, cum_b = F.sum("__ca").over(w_run), F.sum("__cb").over(w_run)
    n_a, n_b = F.sum("__ca").over(w_all), F.sum("__cb").over(w_all)
    # guard each CDF: a one-sided group would divide by zero under ANSI
    # mode; NULL propagates through the difference so max() ignores it
    f_a = F.when(n_a > 0, cum_a / n_a.cast("double"))
    f_b = F.when(n_b > 0, cum_b / n_b.cast("double"))
    d = F.abs(f_a - f_b)
    stat = F.max(F.col("__d"))
    if round_to is not None:
        stat = F.round(stat, round_to)
    return (
        g.select(
            *by,
            n_a.alias("__na"),
            n_b.alias("__nb"),
            d.alias("__d"),
        )
        .groupBy(*by)
        .agg(
            F.first("__na").alias("n_a"),
            F.first("__nb").alias("n_b"),
            stat.alias("d_stat"),
        )
    )


def mann_whitney(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    round_to: int | None = 6,
) -> DataFrame:
    """Two-sample Mann–Whitney U (Wilcoxon rank-sum) per group — the
    rank-based complement to :func:`ks_drift`: KS reports the worst
    CDF gap anywhere; U asks the directional question "do values from
    B stochastically dominate values from A?" (the standard
    nonparametric A/B screen when the distribution is skewed and a
    t-test's mean is the wrong summary).

    Output: ``(by…, n_a, n_b, u_a, u_b, z)`` where ``u_a`` counts
    (a, b) pairs with a > b (ties ½), ``u_b = n_a·n_b − u_a``, and
    ``z`` is the tie-corrected normal approximation
    ``(u_a − n_a·n_b/2) / sqrt(n_a·n_b/12 · ((n+1) − Σ(t³−t)/(n(n−1))))``
    (compare |z| against 1.96/2.58 downstream; the exact-permutation
    p-value is a driver-side lookup for tiny samples, out of scope).
    NULL values are not observations. One-sided groups report NULL
    ``u_a``/``u_b``/``z`` with the missing side's count 0 (same
    rationale as ks_drift: appearing/vanishing groups ARE the
    signal); ``z`` is also NULL when every value ties (zero variance).

    Engine-exact: average ranks are computed as ``2·rank`` INTEGERS
    (``2·cum_before + t + 1`` for a run of ``t`` ties), so the rank
    sum, U numerator, and the tie term ``Σ(t³−t)`` are all exact
    BIGINT arithmetic; the single division and sqrt at the end are
    fixed IEEE expressions — no summation-order sensitivity anywhere
    before the one terminal rounding.

    Scale shape: identical to :func:`ks_drift` — ONE map-side-combined
    shuffle of the tagged union to per-(group, value) counts, then one
    ordered window over DISTINCT values per group. Same scale caveat:
    a continuous column with one giant group serializes its distinct
    values through one task — quantize upstream (ks_drift's ``bins``
    construction applies verbatim) or screen with ``profile.key_skew``
    first.
    """
    by = list(by)
    v = F.col(value_col)
    a = df_a.filter(v.isNotNull()).select(
        *by, v.alias("__v"), F.lit(1).alias("__a"), F.lit(0).alias("__b")
    )
    b = df_b.filter(v.isNotNull()).select(
        *by, v.alias("__v"), F.lit(0).alias("__a"), F.lit(1).alias("__b")
    )
    g = (
        a.unionByName(b)
        .groupBy(*by, "__v")
        .agg(F.sum("__a").alias("__ca"), F.sum("__b").alias("__cb"))
    )
    w_run = (
        Window.partitionBy(*by)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = (F.col("__ca") + F.col("__cb")).cast("long")
    cum = F.sum(F.col("__ca") + F.col("__cb")).over(w_run).cast("long")
    # twice the average 1-based rank of a value in a run of t ties
    # starting after (cum - t) smaller observations — an exact integer
    rank2 = 2 * (cum - t) + t + 1
    per_v = g.select(
        *by,
        F.col("__ca").cast("long").alias("__ca"),
        F.col("__cb").cast("long").alias("__cb"),
        (F.col("__ca").cast("long") * rank2).alias("__r2a"),
        (t * t * t - t).alias("__tie"),
    )
    agg = per_v.groupBy(*by).agg(
        F.sum("__ca").alias("n_a"),
        F.sum("__cb").alias("n_b"),
        F.sum("__r2a").alias("__r2a"),
        F.sum("__tie").alias("__ties"),
    )
    na, nb = F.col("n_a"), F.col("n_b")
    n = na + nb
    # 2·U_a = 2·R_a − n_a(n_a+1); halving is exact (one power-of-two div)
    u2a = F.col("__r2a") - na * (na + 1)
    u_a = u2a.cast("double") / 2.0
    u_b = (na * nb).cast("double") - u_a
    # tie divisor guarded: a group with a single observation (one-sided,
    # so z is NULL anyway) would divide by n(n-1) = 0 under ANSI mode
    tie_adj = F.when(
        n > 1, F.col("__ties").cast("double") / (n * (n - 1)).cast("double")
    ).otherwise(F.lit(0.0))
    var = (na * nb).cast("double") / 12.0 * ((n + 1).cast("double") - tie_adj)
    z = F.when(
        (na > 0) & (nb > 0) & (var > 0),
        (u_a - (na * nb).cast("double") / 2.0) / F.sqrt(var),
    )
    both = (na > 0) & (nb > 0)

    def rnd(c):
        return (F.round(c, round_to) + 0.0) if round_to is not None else c

    return agg.select(
        *by,
        "n_a",
        "n_b",
        F.when(both, rnd(u_a)).alias("u_a"),
        F.when(both, rnd(u_b)).alias("u_b"),
        rnd(z).alias("z"),
    )


def psi_drift(
    df_ref: DataFrame,
    df_new: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    buckets: int = 10,
    eps: float = 1e-6,
    round_to: int | None = 6,
) -> DataFrame:
    """Population Stability Index per group — the scorecard-industry
    drift metric that complements :func:`ks_drift` (KS reports the
    worst single CDF gap; PSI sums relative shifts over the whole
    distribution): bucket the REFERENCE sample into ``buckets``
    equal-population bins (discrete quantile edges), share both samples
    across those bins, and report
    ``PSI = Σ_j (p_j − q_j) · ln(p_j / q_j)`` with both shares floored
    at ``eps`` so empty bins stay finite (rule of thumb: < 0.1 stable,
    0.1–0.25 drifting, > 0.25 shifted). Output:
    ``(by…, n_ref, n_new, psi)``; a group with no NEW rows reports
    NULL psi (nothing to compare) with ``n_new`` 0, and a group absent
    from the REFERENCE is omitted entirely (there is no binning basis
    — surface those with an anti-join upstream if they matter).

    Engine-exact by construction, stage by stage: (1) edge SELECTION is
    pure integer arithmetic — over the reference's per-(group, value)
    counts, cumulative count ``cum`` makes value ``v`` the ``i``-th
    discrete ``b``-quantile edge exactly when
    ``i ∈ (prev·b div n, cum·b div n]`` (BIGINT products, no float
    rank); (2) bucket ASSIGNMENT is "count of edges strictly below v"
    (ties fall to the lower bucket in any engine); (3) the PSI sum is a
    LEFT FOLD over bucket-ordered terms, not a commutative aggregate,
    so float summation order cannot differ between engines.

    Scale shape: each side is scanned EXACTLY once. Reference: one
    map-side-combined per-(group, value) count aggregate + one ordered
    window over the DISTINCT values (same per-group partition caveat
    as :func:`ks_drift` — distinct-value-sized, not row-sized;
    pre-quantize or screen with ``profile.key_skew`` for one giant
    continuous group), pinned; both the edge arrays AND the reference
    bucket counts derive from that pinned frame arithmetically (a
    value's bucket is ``least(lo, b-1)`` — no edges join, no second
    pass). New side: one pass against the broadcast
    (groups × buckets)-sized edge arrays, pinned at bucket grain; the
    per-group total derives from those counts.
    """
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    by = list(by)
    v = F.col(value_col)
    ref = df_ref.filter(v.isNotNull()).select(*by, v.alias("__v"))
    new = df_new.filter(v.isNotNull()).select(*by, v.alias("__v"))

    # --- 1) reference edge values: discrete i/b quantiles, i=1..b-1 ---
    g = ref.groupBy(*by, "__v").agg(F.count(F.lit(1)).alias("__c"))
    w_run = (
        Window.partitionBy(*by)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*by)
    cum = F.sum("__c").over(w_run)
    n_ref = F.sum("__c").over(w_all)
    # Pinned: ranked feeds the edge explode AND the reference bucket
    # counts below (pure arithmetic — no second pass over the raw
    # reference), so without the pin the scan + count-aggregate +
    # window would plan once per consumer (r13: the ref side of the
    # psi_drift gate scanned events 2×, the new side 2× more).
    ranked = g.select(
        *by,
        "__v",
        "__c",
        (cum - F.col("__c")).alias("__prev"),
        cum.alias("__cum"),
        n_ref.alias("__n_ref"),
    ).select(
        *by,
        "__v",
        "__c",
        "__n_ref",
        # BIGINT `div`, never float division: an exact boundary like
        # cum*b == k*n must land on k in every engine
        F.expr(f"__prev * {int(buckets)} div __n_ref").alias("__lo"),
        F.expr(f"__cum * {int(buckets)} div __n_ref").alias("__hi"),
    ).localCheckpoint(eager=True)
    i_from = F.greatest(F.col("__lo") + 1, F.lit(1).cast("long"))
    i_to = F.least(F.col("__hi"), F.lit(int(buckets) - 1).cast("long"))
    edges = (
        # Spark's sequence(a, b) DESCENDS when a > b (DuckDB's
        # generate_series is empty) — gate the explode explicitly
        ranked.filter(i_from <= i_to)
        .withColumn("__i", F.explode(F.sequence(i_from, i_to)))
        .groupBy(*by)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__i", "__v"))),
                lambda s: s["__v"],
            ).alias("__edges"),
            F.first("__n_ref").alias("n_ref"),
        )
    )

    # --- 2) bucket both sides against the broadcast edges ---
    # with no group keys the "join on by" degenerates to attaching the
    # single global row — crossJoin (both broadcast sides are one row)
    def by_join(left, right, how="inner"):
        return left.join(right, on=by, how=how) if by else left.crossJoin(right)

    def bucketed(df, tag):
        j = by_join(df, F.broadcast(edges.select(*by, "__edges")))
        bucket = F.aggregate(
            F.col("__edges"),
            F.lit(0),
            lambda acc, e: acc
            + F.when(F.col("__v") > e, F.lit(1)).otherwise(F.lit(0)),
        )
        return (
            j.select(*by, bucket.alias("__b"))
            .groupBy(*by, "__b")
            .agg(F.count(F.lit(1)).alias(f"__c_{tag}"))
        )

    # Reference bucket counts need NO second pass and NO edges join:
    # the edges with index i ≤ __lo(v) are exactly the edges whose
    # value is strictly below v (the (lo, hi] index intervals tile
    # (0, b] in value order, and values in g are distinct), so
    # bucket(v) = count of edges < v = least(__lo, b-1) — the same
    # ties-to-lower strict comparison as the fold below, in pure
    # BIGINT arithmetic on the pinned ranked frame.
    rc = (
        ranked.select(
            *by,
            F.least(F.col("__lo"), F.lit(int(buckets) - 1))
            .cast("int")
            .alias("__b"),
            "__c",
        )
        .groupBy(*by, "__b")
        .agg(F.sum("__c").alias("__c_ref"))
    )
    # Pinned: bucket-sized (groups × buckets), and the total-count frame
    # n_new below derives from it — the new side is scanned exactly once.
    nc = bucketed(new, "new").localCheckpoint(eager=True)

    # --- 3) densify buckets 0..b-1, shares, eps floor, ordered fold ---
    grid = edges.select(*by, "n_ref").withColumn(
        "__b", F.explode(F.sequence(F.lit(0), F.lit(int(buckets) - 1)))
    )
    # total new rows per group = Σ bucket counts (nc counts exactly the
    # non-null rows) — derived from the PINNED nc, not a second scan of
    # the new side; absent/NULL groups land on 0 via the fillna below,
    # exactly as the old separate count did
    n_new = nc.groupBy(*by).agg(F.sum("__c_new").alias("n_new"))
    full = by_join(
        grid.join(rc, on=by + ["__b"], how="left")
        .join(nc, on=by + ["__b"], how="left"),
        F.broadcast(n_new),  # global agg: exactly one row even when
        how="left",          # the new side is empty, so crossJoin is safe
    ).fillna(0, subset=["__c_ref", "__c_new", "n_new"])
    p = F.greatest(
        F.col("__c_ref").cast("double") / F.col("n_ref").cast("double"),
        F.lit(float(eps)),
    )
    q = F.greatest(
        F.when(
            F.col("n_new") > 0,
            F.col("__c_new").cast("double") / F.col("n_new").cast("double"),
        ),
        F.lit(float(eps)),
    )
    term = F.when(
        F.col("n_new") > 0, (p - q) * F.log(p / q)
    )  # NULL when the new side is empty -> NULL psi
    psi = F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("__b"), term.alias("t")))),
            lambda s: s["t"],
        ),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    if round_to is not None:
        psi = F.round(psi, round_to)
    return full.groupBy(*by).agg(
        F.first("n_ref").alias("n_ref"),
        F.first("n_new").alias("n_new"),
        psi.alias("psi"),
    )


def ewma_level(
    df: DataFrame,
    value_col: str,
    time_col: str = "time",
    by: Sequence[str] = (),
    alpha: float = 0.2,
    tie_col: str | None = None,
    round_to: int | None = 6,
) -> DataFrame:
    """Exponentially weighted moving-average LEVEL per group — "where
    is this series now, smoothed": the classic recurrence
    ``y_i = α·x_i + (1−α)·y_{i−1}`` seeded with the first observation,
    folded over the time-ordered series, one row out per group
    ``(by…, n, ewma)``. The per-step form is used verbatim (not the
    closed-form ``α·Σ(1−α)^{i−j}x_j``, whose powers overflow for long
    series), so the result is replay-exact: a LEFT FOLD over the same
    ordered values is the same float sequence in any engine.

    Scale shape: one map-side-combined ``collect_list`` per group — the
    group's series is materialized in one task's memory, which is the
    honest cost of an order-dependent recurrence (the same contract as
    every bounded per-group kernel here). Right for per-entity series
    (sensor, SKU, user); for one giant group, window the input (e.g.
    EWMA of per-hour OHLC closes from ``ohlc_resample``) instead of
    feeding raw ticks.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    by = list(by)
    v = F.col(value_col).cast("double")
    order = [F.col(time_col)] + ([F.col(tie_col)] if tie_col else [])
    src = df.filter(v.isNotNull()).select(
        *by, F.struct(*order, v.alias("__x")).alias("__s")
    )
    xs = F.transform(F.array_sort(F.collect_list("__s")), lambda s: s["__x"])
    a, ia = F.lit(float(alpha)), F.lit(1.0 - float(alpha))
    agg = src.groupBy(*by).agg(xs.alias("__xs"))
    fold = F.aggregate(
        F.slice(F.col("__xs"), 2, F.greatest(F.size("__xs") - 1, F.lit(0))),
        F.element_at("__xs", 1),
        lambda acc, y: a * y + ia * acc,
    )
    if round_to is not None:
        fold = F.round(fold, round_to)
    return agg.select(
        *by, F.size("__xs").cast("long").alias("n"), fold.alias("ewma")
    )


def _pairwise_slopes(pts):
    """Sorted finite pairwise slopes of a (t, v)-struct array — the
    shared kernel of the exact and windowed Theil–Sen paths. Pairs
    sharing a timestamp are skipped (no slope exists)."""
    return F.array_sort(
        F.filter(
            F.flatten(
                F.transform(
                    pts,
                    lambda p, i: F.transform(
                        F.slice(
                            pts,
                            i + F.lit(2),
                            F.greatest(F.size(pts) - i - 1, F.lit(0)),
                        ),
                        lambda q: F.when(
                            q["t"] != p["t"],
                            (q["v"] - p["v"]) / (q["t"] - p["t"]),
                        ),
                    ),
                )
            ),
            lambda x: x.isNotNull(),
        )
    )


def _lower_median(sorted_arr):
    """Element ⌈m/2⌉ of a sorted array (NULL when empty) — an order
    statistic the data actually produced, identical in every engine."""
    m = F.size(sorted_arr)
    return F.when(m > 0, F.element_at(sorted_arr, ((m + 1) / 2).cast("int")))


def theil_sen(
    df: DataFrame,
    value_col: str,
    time_col: str = "time",
    by: Sequence[str] = (),
    round_to: int | None = 6,
    window: float | None = None,
    max_group_points: int = 8192,
) -> DataFrame:
    """Theil–Sen robust trend per group — the median of all pairwise
    slopes ``(v_j − v_i) / (t_j − t_i)``: the estimator to reach for
    when :func:`ols_trend`-style least squares gets dragged by
    outliers (TS has a 29% breakdown point; OLS has 0). Output:
    ``(by…, n, n_pairs, slope)`` — ``n`` points, ``n_pairs`` finite
    slopes (pairs sharing a timestamp are skipped: no slope exists),
    NULL slope when no pair has distinct times.

    Deterministic median: the LOWER median (element ``⌈m/2⌉`` of the
    sorted slope list) — an order statistic, not an interpolated
    average, so the result is a value the data actually produced and
    every engine picks the same one. All arithmetic is fixed IEEE
    expressions over identical values; no summation anywhere.

    Scale shape (exact path): one ``collect_list`` per group, pairwise
    slopes as a nested JVM array transform (``O(n²)`` values in one
    task's memory) — the honest cost of an all-pairs order statistic,
    same bounded per-group contract as :func:`ewma_level`. That
    contract is ENFORCED, not assumed (the ``pareto_frontier``
    candidate-gate discipline, ``operators/skyline.py``): a group
    bigger than ``max_group_points`` (default 8192 → ~3.4e7 slopes,
    a few hundred MB in one task) fails the job with an error naming
    the fix — pass ``window=`` for the bounded estimator below, or
    raise the bound deliberately. The guard is a per-group
    ``raise_error`` inside the plan, evaluated BEFORE the quadratic
    slope array is built for that group.

    ``window`` — the classic scalable compromise for LONG series:
    points are bucketed into fixed time windows of that width
    (``floor(t / window)``), Theil–Sen runs exactly per window, and
    the group's slope is the lower median of the per-window slopes.
    Cost drops from ``O(n²)`` per group to ``O(w·k²)`` for ``w``
    windows of ``k`` points — bounded by the window width the caller
    controls, so one giant series no longer concentrates all-pairs
    work in one task. Output gains ``n_windows`` (windows that
    produced a slope): ``(by…, n, n_windows, n_pairs, slope)``;
    ``n_pairs`` counts within-window pairs only. Not the same
    estimator as the exact path (cross-window pairs are never
    considered — that is the entire point), but the standard one:
    median-of-window-medians keeps the 29% breakdown inside every
    window and adds a second robustness layer across windows.
    """
    by = list(by)
    t = F.col(time_col).cast("double")
    v = F.col(value_col).cast("double")
    if window is not None:
        if not window > 0:
            raise ValueError("window must be positive")
        src = df.filter(t.isNotNull() & v.isNotNull()).select(
            *by,
            F.floor(t / F.lit(float(window))).cast("long").alias("__w"),
            F.struct(t.alias("t"), v.alias("v")).alias("__p"),
        )
        per_w = src.groupBy(*by, "__w").agg(
            F.array_sort(F.collect_list("__p")).alias("__pts")
        )
        # Materialize the O(k²) slope array ONCE per window: higher-order
        # functions are interpreted (no codegen CSE), so putting the same
        # `_pairwise_slopes` expression in three output columns evaluates
        # the quadratic kernel three times. A dedicated projection holds
        # it as an alias; CollapseProject keeps the two projections apart
        # because the alias is non-cheap and referenced 3× above it —
        # size, and twice inside the median's when/element_at. Values are
        # bit-identical (same expressions, evaluated once).
        per_w = per_w.select(
            *by,
            F.size("__pts").cast("long").alias("__n"),
            _pairwise_slopes(F.col("__pts")).alias("__sl"),
        )
        per_w = per_w.select(
            *by,
            "__n",
            F.size("__sl").cast("long").alias("__m"),
            _lower_median(F.col("__sl")).alias("__s"),
        )
        # second level: window-count-sized — collect the per-window
        # slopes (collect_list skips NULL-slope windows) and take the
        # lower median again
        agg = per_w.groupBy(*by).agg(
            F.sum("__n").cast("long").alias("n"),
            F.sort_array(F.collect_list("__s")).alias("__ws"),
            F.sum("__m").cast("long").alias("n_pairs"),
        )
        med = _lower_median(F.col("__ws"))
        if round_to is not None:
            med = F.round(med, round_to)
        return agg.select(
            *by,
            "n",
            F.size("__ws").cast("long").alias("n_windows"),
            "n_pairs",
            med.alias("slope"),
        )
    if max_group_points < 2:
        raise ValueError("max_group_points must be >= 2")
    src = df.filter(t.isNotNull() & v.isNotNull()).select(
        *by, F.struct(t.alias("t"), v.alias("v")).alias("__p")
    )
    pts = F.array_sort(F.collect_list("__p"))
    agg = src.groupBy(*by).agg(pts.alias("__pts"))
    # per-group gate on the O(n^2) exact path (see docstring): checked
    # BEFORE the pairwise transform consumes the array
    guard = F.when(
        F.size("__pts") > max_group_points,
        F.raise_error(
            F.concat(
                F.lit("theil_sen exact path: a group has "),
                F.size("__pts").cast("string"),
                F.lit(
                    f" points > max_group_points={max_group_points}; the "
                    "all-pairs slope list is O(n^2) in one task. Pass "
                    "window=<time width> for the bounded "
                    "median-of-window-medians estimator, or raise "
                    "max_group_points deliberately."
                ),
            )
        ).cast("array<struct<t:double,v:double>>"),
    ).otherwise(F.col("__pts"))
    agg = agg.select(*by, guard.alias("__pts"))
    # Single evaluation of the O(n²) slope array (see the window path
    # above for why): alias it in its own projection instead of
    # repeating the interpreted HOF subtree in n_pairs AND both median
    # references — this was 3-4 evaluations of the quadratic kernel per
    # group. Bit-identical output, ~the same kernel now runs once.
    slop = agg.select(
        *by,
        F.size("__pts").cast("long").alias("n"),
        _pairwise_slopes(F.col("__pts")).alias("__sl"),
    )
    med = _lower_median(F.col("__sl"))
    if round_to is not None:
        med = F.round(med, round_to)
    return slop.select(
        *by,
        "n",
        F.size("__sl").cast("long").alias("n_pairs"),
        med.alias("slope"),
    )


def compact_states(
    df: DataFrame,
    state_cols: Sequence[str],
    time_col: str = "time",
    by: Sequence[str] = (),
    tie_col: str | None = None,
) -> DataFrame:
    """Change-log compaction: per key, keep only the rows where the
    tracked state ACTUALLY CHANGED (the first row of every run of
    identical consecutive states) — the standard shrink for sensor
    feeds and CDC state streams that re-report unchanged values every
    poll. Keeps every column of the kept rows; a key's first row is
    always kept (it starts the first run).

    NULL-safe by construction: the change test is per-column
    ``NOT (value <=> previous)`` (IS DISTINCT FROM), so NULL→NULL is
    "unchanged" and NULL→value is a real change — the two cases a
    naive ``!=`` silently drops. Ordering uses (time, tie) — pass the
    event id; without it, equal-time runs compact in engine-arbitrary
    order.

    Scale shape: ONE keyed ordered window (lag per tracked column),
    one filter — output size is the true change count, which is the
    entire point.
    """
    state_cols = list(state_cols)
    if not state_cols:
        raise ValueError("state_cols must be non-empty")
    by = list(by)
    order = [F.col(time_col)] + ([F.col(tie_col)] if tie_col else [])
    w = Window.partitionBy(*by).orderBy(*order)
    changed = F.lit(False)
    out = df
    for i, c in enumerate(state_cols):
        out = out.withColumn(f"__prev_{i}", F.lag(c).over(w))
        changed = changed | ~F.col(c).eqNullSafe(F.col(f"__prev_{i}"))
    kept = (
        out.withColumn(
            "__keep", (F.row_number().over(w) == 1) | changed
        )
        .filter(F.col("__keep"))
    )
    return kept.drop(
        "__keep", *[f"__prev_{i}" for i in range(len(state_cols))]
    )


def seasonal_anomalies(
    df: DataFrame,
    time_col: str,
    value_col: str,
    by: Sequence[str] = (),
    period: float = 86_400_000.0,
    bucket: float = 3_600_000.0,
    z_thresh: float = 2.0,
    scale: int = 1000,
    round_to: int | None = 6,
) -> DataFrame:
    """Seasonal anomaly screen — "which hours behaved unlike that hour
    usually does": bucket each observation into (period index, phase)
    cells (day × hour-of-day by default), build a per-phase baseline
    from ALL periods, and flag cells whose mean deviates from their
    phase's baseline by ``|z| ≥ z_thresh`` population standard
    deviations. The seasonality-aware version of a plain global
    z-screen: a quiet 3 AM and a busy 1 PM each get judged against
    their own hour. Output: one row per anomalous cell ``(by…, phase,
    period_idx, n, cell_mean, base_mean, z)``.

    The baseline includes the flagged cell itself (the simple
    estimator; at many periods the dilution is negligible, and a
    leave-one-out variant is one subtraction downstream). A phase with
    zero variance reports no anomalies (z undefined → NULL → filtered).

    Engine-exact: values quantize to ``floor(value·scale)`` BIGINT
    units, so cell sums, baseline sums, and squared sums are all exact
    integers; z is one fixed float expression over six integers (the
    quantization scale cancels). Scale shape: ONE map-side-combined
    aggregate to cells, a cell-table re-aggregate for baselines
    (period-count × phase-count sized), one broadcast join back.
    """
    by = list(by)
    t, v = F.col(time_col), F.col(value_col)
    p_idx = F.floor(t / F.lit(period)).cast("long")
    phase = F.floor((t % F.lit(period)) / F.lit(bucket)).cast("long")
    milli = F.floor(v * F.lit(scale)).cast("long")
    cells = (
        df.filter(t.isNotNull() & v.isNotNull())
        .select(
            *by,
            p_idx.alias("period_idx"),
            phase.alias("phase"),
            milli.alias("__m"),
        )
        .groupBy(*by, "phase", "period_idx")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__m").alias("__s1"),
            F.sum(F.col("__m") * F.col("__m")).alias("__s2"),
        )
    )
    base = cells.groupBy(*by, "phase").agg(
        F.sum("n").alias("__bn"),
        F.sum("__s1").alias("__bs1"),
        F.sum("__s2").alias("__bs2"),
    )
    j = cells.join(F.broadcast(base), [*by, "phase"])
    mu = F.col("__bs1").cast("double") / F.col("__bn").cast("double")
    var = F.col("__bs2").cast("double") / F.col("__bn").cast("double") - mu * mu
    m_c = F.col("__s1").cast("double") / F.col("n").cast("double")
    z = F.when(var > 0, (m_c - mu) / F.sqrt(var))

    def rnd(c):
        return (F.round(c, round_to) + 0.0) if round_to is not None else c

    return (
        j.select(
            *by,
            "phase",
            "period_idx",
            "n",
            rnd(m_c / scale).alias("cell_mean"),
            rnd(mu / scale).alias("base_mean"),
            rnd(z).alias("z"),
        )
        .filter(F.abs(F.col("z")) >= F.lit(z_thresh))
    )


def grouped_ols2(
    df: DataFrame,
    y_col: str,
    x1_col: str,
    x2_col: str,
    by: Sequence[str] = (),
    scales: tuple[int, int, int] = (1000, 1000, 1000),
    ridge: float = 0.0,
    round_to: int | None = 6,
) -> DataFrame:
    """Per-group TWO-feature linear fit ``y ~ x1 + x2`` by the
    closed-form Cramer solve of the normal equations — the
    multi-feature step past :func:`grouped_linear_fit` (price ~
    quantity + discount per segment; latency ~ load + payload per
    service), still ONE map-side-combined aggregate for millions of
    groups (per-group ``ml.LinearRegression`` is a job per group; a
    3×3 system needs no iterative solver at all). Output: ``(by…, n,
    b0, b1, b2, r2)``; degenerate groups (n < 3 or a singular normal
    matrix — collinear or constant features) yield NULL coefficients.

    ``ridge`` adds a λ·n penalty to the two slope diagonals (intercept
    unpenalized) — the standard conditioning fix for near-collinear
    features; coefficients are then shrunk, and r2 is reported against
    the penalized fit's predictions. For more than two features, fall
    back to the driver-side normal-equation solve over a k×k moment
    matrix (the ``embeddings.pca`` pattern) — Cramer past 3×3 is
    numerically and syntactically the wrong tool.

    Engine-exact: values quantize to ``floor(v·scale)`` integers
    (per-column ``scales`` — size them so Σv² fits BIGINT), so all
    NINE moments are exact integer sums; every determinant is one
    fixed float polynomial over those integers (identical IEEE tree in
    any engine), and the de-quantization factors cancel exactly where
    units cancel. Rows with any NULL among (y, x1, x2) are excluded
    (complete-case, the multi-feature ``regr_*`` convention).
    """
    by = list(by)
    s1, s2, sy_sc = (int(s) for s in scales)
    cy, c1, c2 = F.col(y_col), F.col(x1_col), F.col(x2_col)
    complete = cy.isNotNull() & c1.isNotNull() & c2.isNotNull()
    ym = F.when(complete, F.floor(cy * sy_sc).cast("long"))
    x1m = F.when(complete, F.floor(c1 * s1).cast("long"))
    x2m = F.when(complete, F.floor(c2 * s2).cast("long"))
    agg = df.groupBy(*by).agg(
        F.count(ym).alias("n"),
        F.sum(x1m).alias("__s1"),
        F.sum(x2m).alias("__s2"),
        F.sum(ym).alias("__sy"),
        F.sum(x1m * x1m).alias("__s11"),
        F.sum(x1m * x2m).alias("__s12"),
        F.sum(x2m * x2m).alias("__s22"),
        F.sum(x1m * ym).alias("__s1y"),
        F.sum(x2m * ym).alias("__s2y"),
        F.sum(ym * ym).alias("__syy"),
    )
    nd = F.col("n").cast("double")
    d = {k: F.col(f"__{k}").cast("double")
         for k in ("s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y", "syy")}
    lam = F.lit(float(ridge)) * nd
    a11, a22 = d["s11"] + lam, d["s22"] + lam

    def det3(a, b, c, p, q, r, u, v, w):
        return a * (q * w - r * v) - b * (p * w - r * u) + c * (p * v - q * u)

    det = det3(nd, d["s1"], d["s2"], d["s1"], a11, d["s12"],
               d["s2"], d["s12"], a22)
    det0 = det3(d["sy"], d["s1"], d["s2"], d["s1y"], a11, d["s12"],
                d["s2y"], d["s12"], a22)
    det1 = det3(nd, d["sy"], d["s2"], d["s1"], d["s1y"], d["s12"],
                d["s2"], d["s2y"], a22)
    det2 = det3(nd, d["s1"], d["sy"], d["s1"], a11, d["s1y"],
                d["s2"], d["s12"], d["s2y"])
    ok = (F.col("n") >= 3) & (det != 0)
    b0m, b1m, b2m = det0 / det, det1 / det, det2 / det
    # unit conversion: slopes are milli-y per milli-x_i, so multiply by
    # scale_i/scale_y; the intercept is in milli-y
    b0 = b0m / F.lit(float(sy_sc))
    b1 = b1m * F.lit(float(s1) / float(sy_sc))
    b2 = b2m * F.lit(float(s2) / float(sy_sc))
    sse = d["syy"] - (b0m * d["sy"] + b1m * d["s1y"] + b2m * d["s2y"])
    sst = d["syy"] - d["sy"] * d["sy"] / nd
    r2 = F.when(ok & (sst > 0), F.lit(1.0) - sse / sst)

    def rnd(c):
        return (F.round(c, round_to) + 0.0) if round_to is not None else c

    return agg.select(
        *by,
        "n",
        rnd(F.when(ok, b0)).alias("b0"),
        rnd(F.when(ok, b1)).alias("b1"),
        rnd(F.when(ok, b2)).alias("b2"),
        rnd(r2).alias("r2"),
    )
