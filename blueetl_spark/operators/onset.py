"""Onset detection → dynamic trial offsets (reference A22,
``/root/reference/src/blueetl/external/bnac/calculate_trial_step.py:19-61``
driven by ``extract/windows.py:78-111``).

Semantics: per simulation, histogram the events of a bounds window
(1-bin-per-ms equivalent), Gaussian-smooth, threshold at
``mean(pre) + k·std(pre)`` computed over the pre-onset half, and return the
first crossing as that simulation's dynamic offset.

The per-simulation histogram is tiny (duration/bin_size values), so the
aggregation runs in Spark (one groupBy over the event scan) and only the
histogram vectors come to the driver — a sequential dependency the
reference also keeps (SURVEY §7 hard-parts: windows depend on a spikes
scan).
"""

from __future__ import annotations

from typing import Any

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blueetl_spark.operators.features import gaussian_filter1d_np


def detect_onsets(
    events: DataFrame,
    simulations: DataFrame,
    spec: dict[str, Any],
    time_col: str = "time",
) -> dict[int, float]:
    """Compute per-simulation dynamic offsets.

    ``spec``: ``{bounds: [lo, hi], bin_size: float, sigma: float,
    std_multiple: float, pre_fraction: float}`` (defaults mirror the
    reference's trial-step params).

    Reference-named specs are accepted verbatim: a config carrying any of
    ``histo_bins_per_ms`` / ``smoothing_width`` /
    ``threshold_std_multiple`` (the trial-steps parameter names of
    ``calculate_trial_step.py:19-61``, surfaced here via
    ``blueetl_spark.compat.bnac.calculate_trial_step``) is translated:
    ``bin_size = 1/histo_bins_per_ms``, pre-window = the ``[lo, 0)``
    half (so ``lo <= 0``), the threshold crossing is searched in the
    POST half only, and the offset is the crossing time relative to 0
    plus ``ms_post_offset``.
    """
    spec = _translate_reference_spec(spec)
    lo, hi = map(float, spec.get("bounds", [0.0, 1000.0]))
    bin_size = float(spec.get("bin_size", 1.0))
    sigma = float(spec.get("sigma", 3.0))
    k = float(spec.get("std_multiple", 4.0))
    pre_fraction = float(spec.get("pre_fraction", 0.5))
    post_only = bool(spec.get("post_only", False))
    ms_post_offset = float(spec.get("ms_post_offset", 0.0))
    n_bins = int(np.ceil((hi - lo) / bin_size))

    if "simulation_id" not in events.columns:
        sims = simulations.select("simulation_id").collect()
        if len(sims) != 1:
            raise ValueError("events lack simulation_id for multi-run campaign")
        events = events.withColumn("simulation_id", F.lit(sims[0].simulation_id))

    hist_rows = (
        events.filter((F.col(time_col) >= lo) & (F.col(time_col) < hi))
        .withColumn(
            "bin", F.floor((F.col(time_col) - F.lit(lo)) / F.lit(bin_size)).cast("long")
        )
        .groupBy("simulation_id", "bin")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    by_sim: dict[int, np.ndarray] = {}
    for r in hist_rows:
        by_sim.setdefault(int(r.simulation_id), np.zeros(n_bins))[int(r.bin)] = r.n

    offsets: dict[int, float] = {}
    for r in simulations.select("simulation_id").distinct().collect():
        sim_id = int(r.simulation_id)
        hist = by_sim.get(sim_id)
        if hist is None:
            offsets[sim_id] = 0.0
            continue
        smoothed = gaussian_filter1d_np(hist, sigma)
        n_pre = max(int(n_bins * pre_fraction), 1)
        pre = smoothed[:n_pre]
        threshold = pre.mean() + k * pre.std()
        if post_only:
            # reference semantics: crossing searched after t=0 only,
            # reported relative to 0 (+ ms_post_offset)
            crossings = np.nonzero(smoothed[n_pre:] > threshold)[0]
            onset_bin = int(crossings[0]) if len(crossings) else 0
            offsets[sim_id] = onset_bin * bin_size + ms_post_offset
        else:
            crossings = np.nonzero(smoothed > threshold)[0]
            onset_bin = int(crossings[0]) if len(crossings) else 0
            offsets[sim_id] = lo + onset_bin * bin_size
    return offsets


def _translate_reference_spec(spec: dict[str, Any]) -> dict[str, Any]:
    """Map the reference's trial-steps parameter names onto this
    operator's spec; specs already in native form pass through."""
    ref_keys = {"histo_bins_per_ms", "smoothing_width", "threshold_std_multiple"}
    if not (ref_keys & set(spec)):
        return spec
    lo, hi = map(float, spec.get("bounds", [0.0, 1000.0]))
    if lo > 0 or hi < 0:
        raise ValueError(
            f"reference trial-steps bounds must straddle 0, got [{lo}, {hi}]"
        )
    bins_per_ms = float(spec.get("histo_bins_per_ms", 1.0))
    span = hi - lo
    return {
        "bounds": [lo, hi],
        "bin_size": 1.0 / bins_per_ms,
        "sigma": float(spec.get("smoothing_width", 3.0)),
        "std_multiple": float(spec.get("threshold_std_multiple", 4.0)),
        "pre_fraction": (-lo / span) if span else 0.5,
        "post_only": True,
        "ms_post_offset": float(spec.get("ms_post_offset", 0.0)),
    }
