"""Compat shim for ``blueetl.external.bnac.calculate_trial_step``
(reference ``/root/reference/src/blueetl/external/bnac/
calculate_trial_step.py:19-61,94-112``): the dynamic trial-step onset a
v4 config names under ``windows.<name>.trial_steps.function``.

Two surfaces:

- Inside an analysis config, ``trial_steps`` specs carrying the
  reference parameter names (``histo_bins_per_ms``, ``smoothing_width``,
  ``threshold_std_multiple``, ``ms_post_offset``) are translated by
  ``operators/onset.py::detect_onsets`` — the distributed path: the
  histogram aggregates in Spark, only the (tiny) per-simulation vectors
  reach the driver. The ``function`` value itself is accepted and
  ignored there (any dotted spelling of this module works).
- :func:`onset_from_spikes` is the reference's direct call shape (list
  of per-trial spike arrays in, one onset float out), numpy-only, for
  callers holding already-collected spikes. Smoothing uses the engine's
  scipy-free Gaussian filter (reflect mode, like ``scipy.ndimage``'s
  default).
"""

from __future__ import annotations

from typing import Any

import numpy as np


def onset_from_spikes(spikes_list, params: dict[str, Any]) -> float:
    """Cortical onset from per-trial spike arrays (reference :94-112).

    ``params``: ``bounds`` [lo, hi] with lo ≤ 0 ≤ hi,
    ``histo_bins_per_ms``, ``smoothing_width``,
    ``threshold_std_multiple``, ``ms_post_offset``.
    """
    from blueetl_spark.operators.features import gaussian_filter1d_np

    lo, hi = map(float, params["bounds"])
    if lo > 0 or hi < 0:
        raise ValueError(f"bounds must straddle 0, got [{lo}, {hi}]")
    bins_per_ms = float(params["histo_bins_per_ms"])
    spikes = (
        np.concatenate([np.asarray(s, dtype=float) for s in spikes_list])
        if len(spikes_list)
        else np.empty(0)
    )
    hist, _ = np.histogram(
        spikes, range=(lo, hi), bins=int((hi - lo) * bins_per_ms)
    )
    smoothed = gaussian_filter1d_np(hist, float(params["smoothing_width"]))
    n_pre = int(-lo * bins_per_ms)
    pre, post = smoothed[:n_pre], smoothed[n_pre:]
    threshold = pre.mean() + float(params["threshold_std_multiple"]) * pre.std()
    above = np.nonzero(post > threshold)[0]
    onset_index = int(above[0]) if len(above) else 0
    return onset_index / bins_per_ms + float(params.get("ms_post_offset", 0.0))
