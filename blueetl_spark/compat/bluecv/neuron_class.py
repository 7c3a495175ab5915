"""Compat shim for ``blueetl.external.bluecv.neuron_class`` (reference
``/root/reference/src/blueetl/external/bluecv/neuron_class.py:18-35``):
population features selected by name through ``params`` —
``{"PSTH": {"params": {"bin_size": 20}}, "CPDF": {...}, "PSD": {...},
"AC": {...}}``.

The reference packs each feature as a numpy-array CELL in a one-row
``by_neuron_class`` table (elephant objects → arrays). The Spark-native
equivalents here return each feature as its own LONG-FORMAT table —
one row per bin / frequency / complexity / gid pair — because that is
the shape the engine's verified operators produce and the shape that
joins, filters, and scales; a one-row array-cell table is a driver
convenience, not a distributed result. Output-name mapping:

- ``psth`` (ref ``get_PSTH`` :57-77): (bin, count, bin_start) per group
  — ``operators/features.py::histogram`` counts at ``bin_size``.
- ``complexity_pdf`` (ref ``get_CPDF`` :52-54): (complexity,
  probability) — ``operators/signal.py::complexity_pdf``.
- ``psd`` (ref ``get_PSD`` :38-45): (freq, psd) of the group's PSTH —
  ``operators/signal.py::psd_welch``. DOCUMENTED DIVERGENCE: the
  reference feeds ``welch_psd`` the raw concatenated spike-time VALUES
  (a sequence of timestamps, not a signal); this shim computes the PSD
  of the binned spike-count signal, which is the standard definition
  and what ``psd_welch``'s oracle verifies.
- ``ac`` (ref ``get_AC`` :47-50): (gid_a, gid_b, corr) pairwise Pearson
  correlation of binned trains — ``operators/signal.py::
  pairwise_correlation`` (the reference's upper-triangular matrix,
  long-form).

The pandas twin mirrors these Spark definitions (same outputs, same
columns) so ``tests/test_compat.py`` can pin the two equal.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd

ALL_FEATURES = ("PSTH", "CPDF", "PSD", "AC")
DEFAULT_BIN = {"PSTH": 20.0, "CPDF": 20.0, "AC": 5.0, "PSD": 1.0}


def _selected(params: dict[str, Any]) -> dict[str, dict[str, Any]]:
    sel = {f: (params[f] or {}).get("params", {}) for f in params if f in ALL_FEATURES}
    unknown = [f for f in params if f not in ALL_FEATURES]
    if unknown:
        raise ValueError(
            f"unknown bluecv neuron_class features {unknown}; of {ALL_FEATURES}"
        )
    return sel or {f: {} for f in ALL_FEATURES}


def output_schemas(params: dict[str, Any]) -> dict[str, str]:
    ddl = {
        "PSTH": ("psth", "bin long, count double, bin_start double"),
        "CPDF": ("complexity_pdf", "complexity long, probability double"),
        "PSD": ("psd", "freq double, psd double"),
        "AC": ("ac", "gid_a long, gid_b long, corr double"),
    }
    return {ddl[f][0]: ddl[f][1] for f in _selected(params)}


def calculate_features_by_neuron_class(
    repo, key, df: pd.DataFrame, params: dict[str, Any]
):
    """Pandas twin (reference calling convention); long-format outputs."""
    from blueetl_spark.operators.signal import _welch_psd

    t_start, t_stop = repo.windows.get_bounds(key.window)
    n_trials = repo.windows.get_number_of_trials(key.window)
    sel = _selected(params)
    out: dict[str, pd.DataFrame] = {}
    times = df["time"].to_numpy(float)

    def binned(bin_size: float) -> np.ndarray:
        n_bins = int(np.ceil((t_stop - t_start) / bin_size))
        b = np.minimum(
            np.floor((times - t_start) / bin_size).astype(int), n_bins - 1
        )
        x = np.zeros(n_bins)
        np.add.at(x, b, 1.0)
        return x

    if "PSTH" in sel:
        bs = float(sel["PSTH"].get("bin_size", DEFAULT_BIN["PSTH"]))
        x = binned(bs)
        out["psth"] = pd.DataFrame(
            {
                "bin": np.arange(len(x)),
                "count": x,
                "bin_start": t_start + np.arange(len(x)) * bs,
            }
        )
    if "CPDF" in sel:
        bs = float(sel["CPDF"].get("bin_size", DEFAULT_BIN["CPDF"]))
        n_bins = int(np.ceil((t_stop - t_start) / bs))
        total_bins = n_bins * n_trials
        # distinct gids per (trial, bin)
        tmp = df.copy()
        tmp["bin"] = np.minimum(
            np.floor((tmp["time"].to_numpy(float) - t_start) / bs).astype(int),
            n_bins - 1,
        )
        per_bin = tmp.groupby(["trial", "bin"])["gid"].nunique()
        occ = per_bin.value_counts().to_dict()
        nz = int(per_bin.shape[0])
        if total_bins - nz > 0:
            occ[0] = occ.get(0, 0) + (total_bins - nz)
        complexity = sorted(occ)
        out["complexity_pdf"] = pd.DataFrame(
            {
                "complexity": complexity,
                "probability": [occ[c] / total_bins for c in complexity],
            }
        )
    if "PSD" in sel:
        bs = float(sel["PSD"].get("bin_size", DEFAULT_BIN["PSD"]))
        nperseg = int(sel["PSD"].get("nperseg", 256))
        freqs, psd = _welch_psd(binned(bs), fs=1000.0 / bs, nperseg=nperseg)
        out["psd"] = pd.DataFrame({"freq": freqs, "psd": psd})
    if "AC" in sel:
        bs = float(sel["AC"].get("bin_size", DEFAULT_BIN["AC"]))
        n_bins = int(np.ceil((t_stop - t_start) / bs))
        rows = []
        vecs = {}
        for gid, g in df.groupby("gid"):
            tt = g["time"].to_numpy(float)
            b = np.minimum(
                np.floor((tt - t_start) / bs).astype(int), n_bins - 1
            )
            x = np.zeros(n_bins)
            np.add.at(x, b, 1.0)
            vecs[gid] = x
        gids = sorted(vecs)
        for i, ga in enumerate(gids):
            for gb in gids[i + 1 :]:
                a, b_ = vecs[ga], vecs[gb]
                # one row per pair, like the Spark plan: zero-variance
                # pairs keep a NaN corr instead of being dropped
                corr = (
                    float(np.corrcoef(a, b_)[0, 1])
                    if a.std() > 0 and b_.std() > 0
                    else float("nan")
                )
                rows.append({"gid_a": ga, "gid_b": gb, "corr": corr})
        out["ac"] = pd.DataFrame(rows, columns=["gid_a", "gid_b", "corr"])
    return out


def _spark_builder(report, windows, neuron_counts, params: dict[str, Any]):
    from pyspark.sql import functions as F

    from blueetl_spark.operators import signal
    from blueetl_spark.operators.features import GROUP_KEYS, _window_meta, histogram

    sel = _selected(params)
    out = {}
    if "PSTH" in sel:
        bs = float(sel["PSTH"].get("bin_size", DEFAULT_BIN["PSTH"]))
        h = histogram(report, windows, neuron_counts, bin_size=bs)
        meta = _window_meta(windows).select("simulation_id", "window", "t_start")
        out["psth"] = h.join(F.broadcast(meta), ["simulation_id", "window"]).select(
            *GROUP_KEYS,
            "bin",
            F.col("hist").alias("count"),
            (F.col("t_start") + F.col("bin") * F.lit(bs)).alias("bin_start"),
        )
    if "CPDF" in sel:
        bs = float(sel["CPDF"].get("bin_size", DEFAULT_BIN["CPDF"]))
        out["complexity_pdf"] = signal.complexity_pdf(report, windows, bs).select(
            *GROUP_KEYS, "complexity", "probability"
        )
    if "PSD" in sel:
        bs = float(sel["PSD"].get("bin_size", DEFAULT_BIN["PSD"]))
        nperseg = int(sel["PSD"].get("nperseg", 256))
        out["psd"] = signal.psd_welch(report, windows, bin_size=bs, nperseg=nperseg)
    if "AC" in sel:
        bs = float(sel["AC"].get("bin_size", DEFAULT_BIN["AC"]))
        out["ac"] = signal.pairwise_correlation(report, windows, bin_size=bs)
    return out


calculate_features_by_neuron_class.spark_builder = _spark_builder
calculate_features_by_neuron_class.output_schemas = output_schemas
