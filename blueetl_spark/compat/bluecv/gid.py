"""Compat shim for ``blueetl.external.bluecv.gid`` (reference
``/root/reference/src/blueetl/external/bluecv/gid.py:16-62``): per-gid
scalar features selected by name through ``params`` —
``{"MFR": {}, "ISI": {}, "CV": {}, "LV": {}, "latency": {},
"spike_count": {}}``. The reference computes them with elephant;
the definitions here are the numpy/SQL equivalents (elephant is not a
runtime dependency):

- ``MFR``: spike count / (t_stop − t_start) (1/ms, times are ms)
- ``ISI``: the FIRST inter-spike interval (reference returns
  ``isi[0]``), NaN with fewer than two spikes
- ``CV``: std/mean of the ISIs (population std, elephant ``cv``)
- ``LV``: Shinomoto local variation ``mean(3 (Δi−Δi+1)²/(Δi+Δi+1)²)``,
  NaN with fewer than two ISIs (elephant ``lv(..., with_nan=True)``)
- ``latency``: first spike − t_start
- ``spike_count``: number of spikes

ISIs are taken over the group's spikes sorted by time across ALL trials
(the reference diffs the group's concatenated spiketrain, ibid. :18-19 —
unlike ``operators/features.py::isi_stats``, which nulls intervals at
trial boundaries; that operator remains the recommended native path).

Output name: ``by_gid`` (one row per gid with the requested columns).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd

ALL_FEATURES = ("MFR", "ISI", "CV", "LV", "latency", "spike_count")

_COL_TYPES = {
    "MFR": "double",
    "ISI": "double",
    "CV": "double",
    "LV": "double",
    "latency": "double",
    "spike_count": "long",
}


def _selected(params: dict[str, Any]) -> list[str]:
    sel = [f for f in params if f in ALL_FEATURES] or list(ALL_FEATURES)
    unknown = [f for f in params if f not in ALL_FEATURES]
    if unknown:
        raise ValueError(f"unknown bluecv gid features {unknown}; of {ALL_FEATURES}")
    return sel


def output_schemas(params: dict[str, Any]) -> dict[str, str]:
    cols = ", ".join(f"{f} {_COL_TYPES[f]}" for f in _selected(params))
    return {"by_gid": f"gid long, {cols}"}


def calculate_features_by_gid(repo, key, df: pd.DataFrame, params: dict[str, Any]):
    """Pandas twin (reference calling convention); one output table
    ``by_gid`` with a row per gid."""
    t_start, t_stop = repo.windows.get_bounds(key.window)
    sel = _selected(params)
    rows = []
    for gid, g in df.groupby("gid"):
        times = np.sort(g["time"].to_numpy(float))
        isis = np.diff(times)
        r: dict[str, Any] = {"gid": gid}
        for f in sel:
            if f == "MFR":
                r[f] = len(times) / (t_stop - t_start)
            elif f == "ISI":
                r[f] = float(isis[0]) if isis.size else float("nan")
            elif f == "CV":
                r[f] = (
                    float(isis.std() / isis.mean())
                    if isis.size and isis.mean() > 0
                    else float("nan")
                )
            elif f == "LV":
                if isis.size >= 2:
                    a, b = isis[:-1], isis[1:]
                    ok = (a + b) > 0
                    r[f] = float(
                        np.mean(3.0 * (a[ok] - b[ok]) ** 2 / (a[ok] + b[ok]) ** 2)
                    )
                else:
                    r[f] = float("nan")
            elif f == "latency":
                r[f] = float(times[0] - t_start)
            elif f == "spike_count":
                r[f] = int(times.size)
        rows.append(r)
    return {"by_gid": pd.DataFrame(rows, columns=["gid", *sel])}


def _spark_builder(report, windows, neuron_counts, params: dict[str, Any]):
    """Whole-table plan: one window pass over (group, gid) ordered by
    time for the ISI terms, then a single map-side-combined aggregation —
    the same single-exchange shape as ``features.isi_stats``."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from blueetl_spark.operators.features import GROUP_KEYS, _window_meta

    sel = _selected(params)
    w = W.partitionBy(*GROUP_KEYS, "gid").orderBy("time")
    isi = F.col("time") - F.lag("time").over(w)
    nxt = F.lead("time").over(w) - F.col("time")
    lv_term = F.when(
        isi.isNotNull() & nxt.isNotNull() & ((isi + nxt) > 0),
        3.0 * (isi - nxt) ** 2 / (isi + nxt) ** 2,
    )
    terms = report.select(
        *GROUP_KEYS, "gid", "time", isi.alias("isi"), lv_term.alias("lv_term")
    )
    agg = terms.groupBy(*GROUP_KEYS, "gid").agg(
        F.count("time").alias("__n"),
        F.min("time").alias("__first"),
        F.mean("isi").alias("__isi_mean"),
        F.stddev_pop("isi").alias("__isi_std"),
        # first ISI = the interval ending at the earliest time that has
        # one; agg MIN over a struct skips the null-isi first spike
        F.min(
            F.when(F.col("isi").isNotNull(), F.struct(F.col("time"), F.col("isi")))
        )["isi"].alias("__isi_first"),
        F.mean("lv_term").alias("__lv"),
        F.sum(F.when(F.col("isi").isNotNull(), 1).otherwise(0)).alias("__n_isi"),
    )
    meta = _window_meta(windows).select(
        "simulation_id", "window", "t_start", "t_stop"
    )
    out = agg.join(F.broadcast(meta), ["simulation_id", "window"])
    exprs = {
        "MFR": (F.col("__n") / (F.col("t_stop") - F.col("t_start"))).cast("double"),
        "ISI": F.col("__isi_first").cast("double"),
        "CV": F.when(
            F.col("__isi_mean") > 0, F.col("__isi_std") / F.col("__isi_mean")
        ).cast("double"),
        "LV": F.when(F.col("__n_isi") >= 2, F.col("__lv")).cast("double"),
        "latency": (F.col("__first") - F.col("t_start")).cast("double"),
        "spike_count": F.col("__n").cast("long"),
    }
    return {
        "by_gid": out.select(
            *GROUP_KEYS, "gid", *[exprs[f].alias(f) for f in sel]
        )
    }


calculate_features_by_gid.spark_builder = _spark_builder
calculate_features_by_gid.output_schemas = output_schemas
