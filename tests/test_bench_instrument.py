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


def test_accepted_min_rejects_multicore_spike_single_core_clean():
    # VERDICT r13 #1: the single-core probe is blind to multi-core
    # contention — a sample with clean single-core calib but spiked
    # parallel calib must be rejected when the mc median is supplied.
    samples = [
        {"wall": 1.0, "calib": 0.4, "calib_mc": 1.2},  # mc spike
        {"wall": 1.5, "calib": 0.4, "calib_mc": 0.42},
    ]
    val, rejected = bench._accepted_min(
        samples, med_calib=0.4, med_calib_mc=0.4
    )
    assert val == 1.5 and rejected == 1
    # without the mc median (legacy callers) behavior is unchanged
    val, rejected = bench._accepted_min(samples, med_calib=0.4)
    assert val == 1.0 and rejected == 0


def test_accepted_min_mc_fresh_probe_rescues():
    samples = [
        {"wall": 1.0, "calib": 0.4, "calib_mc": 1.2, "calib_mc_fresh": 0.41},
        {"wall": 1.5, "calib": 0.4, "calib_mc": 0.42},
    ]
    val, rejected = bench._accepted_min(
        samples, med_calib=0.4, med_calib_mc=0.4
    )
    assert val == 1.0 and rejected == 0


def test_prev_printed_queries_reads_newest_driver_record(tmp_path):
    import json

    (tmp_path / "BENCH_r03.json").write_text(
        json.dumps({"parsed": {"sf": 0.1, "queries": {"a": 1.0, "b": 2.0}}})
    )
    (tmp_path / "BENCH_r04.json").write_text(
        json.dumps({"parsed": {"sf": 0.1, "queries": {"b": 2.0, "c": 3.0}}})
    )
    (tmp_path / "BENCH_r05.json").write_text(
        json.dumps({"parsed": None, "tail": "cut"})  # unparsed round ignored
    )
    names = bench._prev_printed_queries(str(tmp_path), 0.1)
    assert names == {"b", "c"}
