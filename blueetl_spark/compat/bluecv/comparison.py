"""Compat shim for ``blueetl.external.bluecv.comparison`` (reference
``/root/reference/src/blueetl/external/bluecv/comparison.py:12-21``):
scalar spike-train dissimilarities between two trains. The reference
wraps elephant; these are the engine's own closed-form kernels
(``operators/signal.py::_van_rossum`` / ``_victor_purpura``, the ones
the ``spike_distances_fixed`` oracle gate verifies).

For distributed all-pairs/train-pairs distances use
``operators/signal.py::spike_train_distances`` — these scalar forms
exist for the reference's call-shape (two arrays in, one float out).
"""

from __future__ import annotations

import numpy as np


def get_VR(spiketrain1, spiketrain2, tau: float = 10.0) -> float:
    """van Rossum distance, exponential kernel, time constant ``tau`` ms
    (reference default; elephant ``van_rossum_distance(..., tau*ms)``)."""
    from blueetl_spark.operators.signal import _van_rossum

    return float(
        _van_rossum(
            np.asarray(spiketrain1, dtype=float),
            np.asarray(spiketrain2, dtype=float),
            tau,
        )
    )


def get_VP(spiketrain1, spiketrain2, q: float = 0.1) -> float:
    """Victor-Purpura distance with shift cost ``q`` (1/ms, reference
    default; elephant ``victor_purpura_distance(..., q/ms)``)."""
    from blueetl_spark.operators.signal import _victor_purpura

    return float(
        _victor_purpura(
            np.asarray(spiketrain1, dtype=float),
            np.asarray(spiketrain2, dtype=float),
            q,
        )
    )
