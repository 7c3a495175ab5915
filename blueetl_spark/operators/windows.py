"""Time-window materialization and event slicing.

The reference materializes a windows table from config — one row per
(simulation, window, trial) with ``offset = initial_offset + dynamic_offset
+ step_offset`` (``/root/reference/src/blueetl/extract/windows.py:165-269``)
— then slices each report's events to ``offset + t_start <= time <
offset + t_stop`` and re-bases ``time -= offset``
(``extract/spikes.py:22-29``, ``extract/report.py:44-58``). An event landing
in several overlapping trials is duplicated into each.

Spark-first design:

- Window definitions are config-sized (a handful of rows per simulation), so
  trial expansion happens driver-side into a plain list of rows →
  ``createDataFrame`` crossed with the (tiny) distinct simulation list.
- Slicing is an **interval join**: equality on ``simulation_id`` plus two
  range predicates. The windows side is always broadcast, so at 100 TB the
  plan is a broadcast hash join on the equi key with the range conditions
  as join filters — no shuffle of the event table, no cartesian blowup, and
  the time-range predicate is additionally usable for parquet row-group
  pruning when pushed ahead of the join via :func:`time_bounds_filter`.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blueetl_spark.session import local_df

from blueetl_spark import schemas

WindowsConfig = dict[str, dict[str, Any]]


def _expand_window(name: str, cfg: dict[str, Any]) -> list[dict[str, Any]]:
    """Expand one window config into per-trial rows (driver-side; tiny)."""
    t_start, t_stop = map(float, cfg["bounds"])
    initial_offset = float(cfg.get("initial_offset", 0.0))
    n_trials = int(cfg.get("n_trials", 1))
    steps_list = cfg.get("trial_steps_list")
    step_value = float(cfg.get("trial_steps_value", 0.0))
    if steps_list is not None:
        step_offsets = [float(s) for s in steps_list]
    else:
        step_offsets = [step_value * i for i in range(max(n_trials, 1))]
    rows = []
    for trial, step_offset in enumerate(step_offsets):
        rows.append(
            {
                "window": name,
                "trial": trial,
                "initial_offset": initial_offset,
                "step_offset": step_offset,
                "t_start": t_start,
                "t_stop": t_stop,
                "t_step": float(cfg.get("t_step", 0.0)),
                "duration": t_stop - t_start,
                "window_type": str(cfg.get("window_type", "")),
            }
        )
    return rows


def materialize_windows(
    spark: SparkSession,
    windows_config: WindowsConfig,
    simulations: DataFrame,
    dynamic_offsets: dict[int, float] | None = None,
    dynamic_windows: list[str] | None = None,
) -> DataFrame:
    """Build the windows table: one row per (simulation, window, trial).

    ``dynamic_offsets`` maps simulation_id → extra offset (the output of
    onset detection, reference ``extract/windows.py:78-111``); omitted
    simulations get 0. ``dynamic_windows`` names the windows the offset
    applies to — the reference sets ``dynamic_offset = 0`` for windows
    without a ``trial_steps`` config (``extract/windows.py:181-209``), so
    a fixed window next to an onset window must NOT shift. ``None``
    applies the offset to every window (single-window configs / the
    standalone onset query).
    """
    defs: list[dict[str, Any]] = []
    for name, cfg in windows_config.items():
        defs.extend(_expand_window(name, cfg))
    sims = simulations.select("simulation_id", "circuit_id").distinct()
    if dynamic_offsets:
        dyn = local_df(
            spark,
            [(int(k), float(v)) for k, v in dynamic_offsets.items()],
            "simulation_id smallint, dynamic_offset double",
        )
        sims = sims.join(F.broadcast(dyn), "simulation_id", "left").na.fill(
            {"dynamic_offset": 0.0}
        )
    else:
        sims = sims.withColumn("dynamic_offset", F.lit(0.0))
    defs_df = local_df(
        spark,
        [tuple(d[k] for k in (
            "window", "trial", "initial_offset", "step_offset", "t_start",
            "t_stop", "t_step", "duration", "window_type")) for d in defs],
        "window string, trial smallint, initial_offset double, "
        "step_offset double, t_start double, t_stop double, t_step double, "
        "duration double, window_type string",
    )
    applies = (
        F.lit(True)
        if dynamic_windows is None
        else F.col("window").isin(list(dynamic_windows))
    )
    out = (
        sims.crossJoin(F.broadcast(defs_df))
        .withColumn(
            "offset",
            F.col("initial_offset")
            + F.when(applies, F.col("dynamic_offset")).otherwise(0.0)
            + F.col("step_offset"),
        )
        .select(
            "simulation_id",
            "circuit_id",
            "window",
            "trial",
            "offset",
            "t_start",
            "t_stop",
            "t_step",
            "duration",
            "window_type",
        )
    )
    out = schemas.ensure_schema(out, schemas.WINDOWS_SCHEMA)
    # The global time envelope is fully determined by driver-side config, so
    # stash it on the DataFrame: time_bounds_filter can then build the scan
    # predicate without running a Spark job at plan-construction time.
    dyn = list((dynamic_offsets or {}).values()) or [0.0]
    static = [d["initial_offset"] + d["step_offset"] for d in defs]

    def _dyn_for(d: dict) -> list[float]:
        if dynamic_windows is not None and d["window"] not in dynamic_windows:
            return [0.0]
        return dyn

    out._blueetl_time_bounds = (
        min(
            s + min(_dyn_for(d) + [0.0]) + d["t_start"]
            for s, d in zip(static, defs)
        ),
        max(
            s + max(_dyn_for(d) + [0.0]) + d["t_stop"]
            for s, d in zip(static, defs)
        ),
    )
    return out


def validate_windows(windows: DataFrame) -> None:
    """Semantic checks on the windows table (A5/A6, reference
    ``extract/windows.py:130-144``):

    1. all trials of a (simulation, window) share t_start/t_stop/duration;
    2. trial ids are exactly 0..n−1 per (simulation, window).

    One aggregation job over the (config-sized) windows table; raises
    :class:`blueetl_spark.schemas.SchemaError` naming the offending
    windows. (Canonical implementation — ``schemas.validate_windows``
    delegates here.)
    """
    bad = (
        windows.groupBy("simulation_id", "window")
        .agg(
            F.countDistinct("t_start").alias("n_start"),
            F.countDistinct("t_stop").alias("n_stop"),
            F.countDistinct("duration").alias("n_dur"),
            F.count("trial").alias("n_trials"),
            F.countDistinct("trial").alias("n_distinct_trials"),
            F.min("trial").alias("min_trial"),
            F.max("trial").alias("max_trial"),
        )
        .filter(
            (F.col("n_start") > 1)
            | (F.col("n_stop") > 1)
            | (F.col("n_dur") > 1)
            | (F.col("min_trial") != 0)
            | (F.col("max_trial") != F.col("n_trials") - 1)
            | (F.col("n_distinct_trials") != F.col("n_trials"))
        )
        .collect()
    )
    if bad:
        details = ", ".join(
            f"(sim={r.simulation_id}, window={r.window})" for r in bad
        )
        raise schemas.SchemaError(f"inconsistent windows: {details}")


def time_bounds_filter(windows: DataFrame, time_col: str = "time"):
    """Global [min, max) time predicate across all windows — push this onto
    the event scan *before* the interval join so parquet row-group stats can
    prune.

    Windows built by :func:`materialize_windows` carry driver-computed
    bounds, so no Spark job runs here; arbitrary windows DataFrames fall
    back to collecting two scalars (one tiny job)."""
    bounds = getattr(windows, "_blueetl_time_bounds", None)
    if bounds is None:
        row = windows.agg(
            F.min(F.col("offset") + F.col("t_start")).alias("lo"),
            F.max(F.col("offset") + F.col("t_stop")).alias("hi"),
        ).first()
        if row is None or row.lo is None:
            return F.lit(False)
        bounds = (row.lo, row.hi)
    return (F.col(time_col) >= F.lit(bounds[0])) & (F.col(time_col) < F.lit(bounds[1]))


def slice_events(
    events: DataFrame,
    windows: DataFrame,
    time_col: str = "time",
    join_keys: list[str] | None = None,
    rebase: bool = True,
    keep_window_cols: list[str] | None = None,
) -> DataFrame:
    """Assign events to every (window, trial) whose interval contains them.

    Equi-join on ``join_keys`` (auto: the intersection of
    ``{simulation_id, circuit_id}`` with the event columns) plus the range
    predicate; the windows side is broadcast. Returns the event columns with
    ``window``, ``trial`` appended and ``time`` re-based to the window frame
    (original time minus offset) when ``rebase``.
    """
    if join_keys is None:
        join_keys = [c for c in ("simulation_id", "circuit_id") if c in events.columns]
    keep = ["window", "trial"] + (keep_window_cols or [])
    w = windows.select(
        *join_keys,
        *keep,
        F.col("offset").alias("__offset"),
        (F.col("offset") + F.col("t_start")).alias("__lo"),
        (F.col("offset") + F.col("t_stop")).alias("__hi"),
    )
    t = F.col(time_col)
    cond = (t >= F.col("__lo")) & (t < F.col("__hi"))
    for k in join_keys:
        cond = cond & (events[k] == w[k])
    joined = events.alias("e").join(F.broadcast(w).alias("w"), cond, "inner")
    event_cols = [F.col(f"e.{c}") for c in events.columns if c != time_col]
    time_expr = (t - F.col("__offset")) if rebase else t
    return joined.select(
        time_expr.alias(time_col),
        *event_cols,
        *[F.col(f"w.{c}") for c in keep],
    )
