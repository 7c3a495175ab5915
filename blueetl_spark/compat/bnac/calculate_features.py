"""Compat shim for ``blueetl.external.bnac.calculate_features``
(reference ``/root/reference/src/blueetl/external/bnac/
calculate_features.py:96-179``): the five-output multi-feature a real
v4 config names as ``...calculate_features.calculate_features_multi``
with ``type: multi, groupby: [simulation_id, circuit_id, neuron_class,
window]``.

Outputs (reference names and columns preserved):

- ``by_gid``: first_spike_time_means_cort_zeroed, mean_spike_counts,
  mean_firing_rates_per_second per gid (ref :28-63)
- ``by_gid_and_trial``: count, first, times per (trial, gid) (ref :21-27)
- ``by_neuron_class``: population scalars + histogram scalars (ref
  :128-153)
- ``by_neuron_class_and_trial``: mean_of_spike_counts_for_each_trial
  (ref :38-44,156)
- ``histograms``: per-bin normalized / max-normalized / smoothed
  max-normalized 1 ms histograms (ref :67-93,158-171)

Documented divergences from the reference (both implementations here
agree with each other; ``tests/test_compat.py`` pins them equal):

- The reference report carries NaN-time rows for every class member, so
  its per-gid tables include fully-silent neurons (all-NaN / 0 rows)
  when ``export_all_neurons`` is true. This engine's report is
  events-only: per-gid outputs cover neurons that spiked at least once;
  population (by_neuron_class) statistics still count silent members in
  the denominators via the class-size table, exactly like the reference.
  ``export_all_neurons`` is accepted and ignored beyond that.
- ``smoothed_3ms_...`` uses the numpy Gaussian filter
  (``operators/features.py::gaussian_filter1d_np``, reflect-mode, the
  engine's scipy-free equivalent) with the reference's sigma=4.0.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd

# per-output DDL schemas for the generic (pandas) execution path —
# group-key columns are prepended by apply_feature_multi
OUTPUT_SCHEMAS = {
    "by_gid": (
        "gid long, first_spike_time_means_cort_zeroed double, "
        "mean_spike_counts double, mean_firing_rates_per_second double"
    ),
    "by_gid_and_trial": (
        "trial smallint, gid long, count long, first double, "
        "times array<double>"
    ),
    "by_neuron_class": (
        "mean_of_mean_spike_counts double, "
        "mean_of_mean_firing_rates_per_second double, "
        "std_of_mean_firing_rates_per_second double, "
        "mean_of_spike_times_normalised_hist_1ms_bin double, "
        "min_of_spike_times_normalised_hist_1ms_bin double, "
        "max_of_spike_times_normalised_hist_1ms_bin double, "
        "argmax_spike_times_hist_1ms_bin long"
    ),
    "by_neuron_class_and_trial": (
        "trial smallint, mean_of_spike_counts_for_each_trial double"
    ),
    "histograms": (
        "bin long, spike_times_normalised_hist_1ms_bin double, "
        "spike_times_max_normalised_hist_1ms_bin double, "
        "smoothed_3ms_spike_times_max_normalised_hist_1ms_bin double"
    ),
}

SMOOTHING_SIGMA = 4.0  # reference :82


def calculate_features_multi(repo, key, df: pd.DataFrame, params: dict[str, Any]):
    """Pandas twin with the reference calling convention — runs per
    (simulation, circuit, neuron_class, window) group under
    ``apply_feature_multi``; ``repo`` is a
    :class:`blueetl_spark.compat.CompatRepo`."""
    from blueetl_spark.operators.features import gaussian_filter1d_np

    duration = repo.windows.get_duration(key.window)
    t_start, t_stop = repo.windows.get_bounds(key.window)
    n_trials = repo.windows.get_number_of_trials(key.window)
    n_neurons = repo.neuron_count(key.circuit_id, key.neuron_class)

    per_trial = (
        df.groupby(["trial", "gid"])["time"]
        .agg(count="count", first="min", times=lambda x: sorted(x))
        .reset_index()
    )
    g = per_trial.groupby("gid").agg(
        total=("count", "sum"), mean_first=("first", "mean")
    )
    by_gid = pd.DataFrame(
        {
            "gid": g.index.to_numpy(),
            "first_spike_time_means_cort_zeroed": g["mean_first"].to_numpy()
            - t_start,
            "mean_spike_counts": g["total"].to_numpy() / n_trials,
            "mean_firing_rates_per_second": g["total"].to_numpy()
            / n_trials
            * 1000.0
            / duration,
        }
    )

    by_gid_and_trial = per_trial[["trial", "gid", "count", "first", "times"]]

    # population stats over ALL class members: silent neurons contribute 0
    rates = by_gid["mean_firing_rates_per_second"].to_numpy()
    mean_rate = rates.sum() / n_neurons
    var_rate = max((rates**2).sum() / n_neurons - mean_rate**2, 0.0)

    hist, _ = np.histogram(
        df["time"].to_numpy(), range=[t_start, t_stop], bins=int(duration)
    )
    hist = hist / (n_neurons * n_trials)
    max_hist = hist.max() if len(hist) else 0.0
    smoothed = gaussian_filter1d_np(hist, SMOOTHING_SIGMA)
    max_smoothed = smoothed.max() if len(smoothed) else 0.0
    by_neuron_class = pd.DataFrame(
        {
            "mean_of_mean_spike_counts": [
                by_gid["mean_spike_counts"].sum() / n_neurons
            ],
            "mean_of_mean_firing_rates_per_second": [mean_rate],
            "std_of_mean_firing_rates_per_second": [float(np.sqrt(var_rate))],
            "mean_of_spike_times_normalised_hist_1ms_bin": [float(hist.mean())],
            "min_of_spike_times_normalised_hist_1ms_bin": [float(hist.min())],
            "max_of_spike_times_normalised_hist_1ms_bin": [float(hist.max())],
            "argmax_spike_times_hist_1ms_bin": [int(hist.argmax())],
        }
    )

    per_trial_counts = (
        df.groupby("trial").size().reindex(range(n_trials), fill_value=0)
    )
    by_neuron_class_and_trial = pd.DataFrame(
        {
            "trial": per_trial_counts.index.to_numpy(),
            "mean_of_spike_counts_for_each_trial": per_trial_counts.to_numpy()
            / n_neurons,
        }
    )

    histograms = pd.DataFrame(
        {
            "bin": np.arange(len(hist)),
            "spike_times_normalised_hist_1ms_bin": hist,
            "spike_times_max_normalised_hist_1ms_bin": hist / (max_hist or 1),
            "smoothed_3ms_spike_times_max_normalised_hist_1ms_bin": smoothed
            / (max_smoothed or 1),
        }
    )

    return {
        "by_gid": by_gid,
        "by_gid_and_trial": by_gid_and_trial,
        "by_neuron_class": by_neuron_class,
        "by_neuron_class_and_trial": by_neuron_class_and_trial,
        "histograms": histograms,
    }


def _spark_builder(report, windows, neuron_counts, params: dict[str, Any]):
    """Whole-table plans for the five outputs — the scale path the
    analysis engine prefers. Each output is one of the verified
    operators in ``operators/features.py`` (A3/A4/A11/A12/A14), plus
    thin projections to the reference column names."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from blueetl_spark.operators import features as feat

    keys = feat.GROUP_KEYS
    h = feat.histogram(report, windows, neuron_counts, bin_size=1.0)

    mx = F.max(
        F.struct(
            F.col("hist_normalized").alias("v"), (-F.col("bin")).alias("nb")
        )
    )
    hstats = h.groupBy(*keys).agg(
        F.mean("hist_normalized").alias(
            "mean_of_spike_times_normalised_hist_1ms_bin"
        ),
        F.min("hist_normalized").alias(
            "min_of_spike_times_normalised_hist_1ms_bin"
        ),
        F.max("hist_normalized").alias(
            "max_of_spike_times_normalised_hist_1ms_bin"
        ),
        mx.alias("__mx"),
    ).select(
        *keys,
        "mean_of_spike_times_normalised_hist_1ms_bin",
        "min_of_spike_times_normalised_hist_1ms_bin",
        "max_of_spike_times_normalised_hist_1ms_bin",
        (-F.col("__mx.nb")).cast("long").alias("argmax_spike_times_hist_1ms_bin"),
    )
    by_neuron_class = feat.by_neuron_class(report, windows, neuron_counts).join(
        hstats, keys
    )

    sm = feat.gaussian_smooth_histogram(
        h, sigma=SMOOTHING_SIGMA, value_col="hist_normalized"
    )
    w = W.partitionBy(*keys)
    mxh = F.max("hist_normalized").over(w)
    mxs = F.max("smoothed").over(w)
    histograms = sm.select(
        *keys,
        "bin",
        F.col("hist_normalized").alias("spike_times_normalised_hist_1ms_bin"),
        (
            F.col("hist_normalized")
            / F.when(mxh == 0, F.lit(1.0)).otherwise(mxh)
        ).alias("spike_times_max_normalised_hist_1ms_bin"),
        (F.col("smoothed") / F.when(mxs == 0, F.lit(1.0)).otherwise(mxs)).alias(
            "smoothed_3ms_spike_times_max_normalised_hist_1ms_bin"
        ),
    )

    return {
        "by_gid": feat.by_gid(report, windows),
        "by_gid_and_trial": feat.by_gid_and_trial(report),
        "by_neuron_class": by_neuron_class,
        "by_neuron_class_and_trial": feat.by_neuron_class_and_trial(
            report, neuron_counts, windows=windows
        ),
        "histograms": histograms,
    }


calculate_features_multi.spark_builder = _spark_builder
calculate_features_multi.output_schemas = OUTPUT_SCHEMAS
