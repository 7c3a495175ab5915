"""Pins for bench.py's load-band acceptance logic (pure functions —
no Spark): the stale-label rescue (ADVICE r12) and the band fallback."""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "bench",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py"),
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def test_accepted_min_rejects_spiked_samples():
    samples = [
        {"wall": 1.0, "calib": 2.0},  # fast but measured in a spike
        {"wall": 1.5, "calib": 0.4},
        {"wall": 1.4, "calib": 0.45},
    ]
    val, rejected = bench._accepted_min(samples, med_calib=0.4)
    assert val == 1.4 and rejected == 1


def test_accepted_min_fresh_probe_rescues_fast_sample():
    # the would-be-min sample carries a spiked stale label but a clean
    # immediate re-probe — acceptance uses the better of the two
    samples = [
        {"wall": 1.0, "calib": 2.0, "calib_fresh": 0.41},
        {"wall": 1.5, "calib": 0.4},
    ]
    val, rejected = bench._accepted_min(samples, med_calib=0.4)
    assert val == 1.0 and rejected == 0


def test_accepted_min_falls_back_when_all_spiked():
    samples = [
        {"wall": 2.0, "calib": 3.0},
        {"wall": 1.8, "calib": 2.5},
    ]
    val, rejected = bench._accepted_min(samples, med_calib=0.4)
    assert val == 1.8 and rejected == 2
