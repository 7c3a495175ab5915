"""The reference's 12 functional SONATA config themes
(``/root/reference/tests/functional/data/sonata/config/
analysis_config_{01..12}.yaml``), each re-expressed as an equivalent
parquet-first v4 config and run end-to-end through ``run_from_config``
twice over one cache directory — cold then warm — asserting frame
equality across the two runs (the reference's own cache-equivalence
discipline, ``tests/functional/test_analysis.py:160-170``).

Theme map (reference → here):

01 simple extraction + bnac multi features
02 simulations_filter + window with trial_steps_label (named onset spec)
03 per-class population + node_set
04 simulations_filter_in_memory (applied via apply_filter())
05 soma report + soma by-(simulation,circuit) features, t_step window
06 compartment report, no features
07 bluecv features with defaulted params
08 spikes + soma analyses; soma window referencing a spikes onset window
09 params_product (incl. nested dicts) + params_zip expansion
10 features filtered by windows + neuron_classes lists
11 list-of-dict (union) class queries; per-class node_set + limit
12 custom node_sets_file driving classes (incl. a query-less class)
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pytest

from blueetl_spark.analysis import run_from_config

CAMPAIGN = {
    "data": [
        {"simulation_path": "/sim0", "seed": 201209},
        {"simulation_path": "/sim1", "seed": 300},
    ]
}

BNAC = "blueetl_spark.compat.bnac.calculate_features.calculate_features_multi"
BLUECV_NC = "blueetl_spark.compat.bluecv.neuron_class.calculate_features_by_neuron_class"
SOMA = "blueetl_spark.compat.soma.calculate_features.calculate_features_by_simulation_circuit"

FOUR_CLASSES = {
    "Rt_EXC": {"query": {"layer": ["Rt"], "synapse_class": ["EXC"]}},
    "VPL_EXC": {"query": {"layer": ["VPL"], "synapse_class": ["EXC"]}},
    "Rt_INH": {"query": {"layer": ["Rt"], "synapse_class": ["INH"]}},
    "VPL_INH": {"query": {"layer": ["VPL"], "synapse_class": ["INH"]}},
}

BASE_WINDOWS = {
    "w1": {"bounds": [20, 90], "window_type": "spontaneous"},
    "w2": {"bounds": [10, 70], "initial_offset": 10, "n_trials": 3,
           "trial_steps_value": 10},
}

TRIAL_STEPS = {
    "ts1": {
        "function": "blueetl.external.bnac.calculate_trial_step.onset_from_spikes",
        "bounds": [-50, 25],
        "smoothing_width": 0.1,
        "histo_bins_per_ms": 5,
        "threshold_std_multiple": 4,
        "ms_post_offset": 1,
    }
}

BNAC_FEATURES = [
    {
        "type": "multi",
        "groupby": ["simulation_id", "circuit_id", "neuron_class", "window"],
        "function": BNAC,
        "params": {"export_all_neurons": True},
    }
]


def _spikes_extraction(**overrides):
    ex = {
        "report": {"type": "spikes"},
        "neuron_classes": {k: dict(v) for k, v in FOUR_CLASSES.items()},
        "limit": 1000,
        "population": "thalamus_neurons",
        "node_set": None,
        "windows": {k: dict(v) for k, v in BASE_WINDOWS.items()},
    }
    ex.update(overrides)
    return ex


def _theme_configs(node_sets_file: str) -> dict[str, dict]:
    themes: dict[str, dict] = {}

    themes["t01_simple"] = {
        "version": 4,
        "simulation_campaign": CAMPAIGN,
        "analysis": {"spikes": {"extraction": _spikes_extraction(),
                                "features": BNAC_FEATURES}},
    }

    themes["t02_filter_trial_steps"] = {
        "version": 4,
        "simulation_campaign": CAMPAIGN,
        "simulations_filter": {"seed": 201209},
        "analysis": {"spikes": {
            "extraction": _spikes_extraction(
                windows={**BASE_WINDOWS,
                         "w3": {"bounds": [0, 25], "initial_offset": 50,
                                "trial_steps_label": "ts1"}},
                trial_steps=TRIAL_STEPS,
            ),
            "features": BNAC_FEATURES,
        }},
    }

    themes["t03_population_node_set"] = {
        "version": 4,
        "simulation_campaign": CAMPAIGN,
        "analysis": {"spikes": {
            "extraction": _spikes_extraction(
                neuron_classes={
                    "Rt_EXC": {"query": {"layer": ["Rt"]},
                               "population": "thalamus_neurons",
                               "node_set": "Excitatory"},
                    "VPL_EXC": {"query": {"layer": ["VPL"]},
                                "population": "thalamus_neurons",
                                "node_set": "Excitatory"},
                    "Rt_INH": {"query": {"layer": ["Rt"]},
                               "population": "thalamus_neurons",
                               "node_set": "Inhibitory"},
                    "VPL_INH": {"query": {"layer": ["VPL"]},
                                "population": "thalamus_neurons",
                                "node_set": "Inhibitory"},
                },
                population=None,
                node_sets_file=node_sets_file,
            ),
            "features": BNAC_FEATURES,
        }},
    }

    themes["t04_filter_in_memory"] = {
        "version": 4,
        "simulation_campaign": CAMPAIGN,
        "simulations_filter_in_memory": {"seed": 201209},
        "analysis": {"spikes": {"extraction": _spikes_extraction(),
                                "features": BNAC_FEATURES}},
    }

    themes["t05_soma"] = {
        "version": 4,
        "simulation_campaign": CAMPAIGN,
        "analysis": {"soma": {
            "extraction": _spikes_extraction(
                report={"type": "soma", "name": "soma_report"},
                windows={"w1": {"bounds": [20, 90],
                                "window_type": "spontaneous"},
                         "w2": {"bounds": [10, 70], "initial_offset": 10,
                                "t_step": 0.5}},
            ),
            "features": [{"type": "multi",
                          "groupby": ["simulation_id", "circuit_id"],
                          "function": SOMA}],
        }},
    }

    themes["t06_compartment"] = {
        "version": 4,
        "simulation_campaign": CAMPAIGN,
        "analysis": {"compartment": {
            "extraction": _spikes_extraction(
                report={"type": "compartment", "name": "section_report"},
                windows={"w1": {"bounds": [10.0, 30.0],
                                "window_type": "spontaneous"},
                         "w2": {"bounds": [10.0, 30.0],
                                "initial_offset": 1, "t_step": 0.4}},
            ),
            "features": [],
        }},
    }

    themes["t07_bluecv"] = {
        "version": 4,
        "simulation_campaign": CAMPAIGN,
        "analysis": {"spikes": {
            "extraction": _spikes_extraction(),
            "features": [{
                "type": "multi",
                "groupby": ["simulation_id", "circuit_id", "neuron_class",
                            "window"],
                "function": BLUECV_NC,
                "params": {"PSD": {}, "CPDF": {"params": {"bin_size": 1}}},
            }],
        }},
    }

    themes["t08_multi_report_window_ref"] = {
        "version": 4,
        "simulation_campaign": CAMPAIGN,
        "analysis": {
            "spikes": {
                "extraction": _spikes_extraction(
                    windows={**BASE_WINDOWS,
                             "w3": {"bounds": [0, 25], "initial_offset": 50,
                                    "trial_steps_label": "ts1"}},
                    trial_steps=TRIAL_STEPS,
                ),
                "features": BNAC_FEATURES,
            },
            "soma": {
                "extraction": _spikes_extraction(
                    report={"type": "soma", "name": "soma_report"},
                    windows={"w1": {"bounds": [20, 90],
                                    "window_type": "spontaneous"},
                             "w2": {"bounds": [20, 60], "initial_offset": 10,
                                    "n_trials": 3, "trial_steps_value": 10},
                             "w9": "spikes.extraction.windows.w3"},
                ),
                "features": [{"type": "multi",
                              "groupby": ["simulation_id", "circuit_id"],
                              "function": SOMA}],
            },
        },
    }

    themes["t09_params_expansion"] = {
        "version": 4,
        "simulation_campaign": CAMPAIGN,
        "analysis": {"spikes": {
            "extraction": _spikes_extraction(),
            "features": [{
                "type": "multi",
                "groupby": ["simulation_id", "circuit_id", "neuron_class",
                            "window"],
                "function": BNAC,
                "params": {"export_all_neurons": True},
                "params_product": {
                    "ratio": [0.25, 0.50],
                    "nested_example": [{"params": {"bin_size": 1}},
                                       {"params": {"bin_size": 2}}],
                },
                "params_zip": {"param1": [10, 20], "param2": [11, 21]},
            }],
        }},
    }

    themes["t10_feature_filters"] = {
        "version": 4,
        "simulation_campaign": CAMPAIGN,
        "analysis": {"spikes": {
            "extraction": _spikes_extraction(),
            "features": [{
                "type": "multi",
                "groupby": ["simulation_id", "circuit_id", "neuron_class",
                            "window"],
                "function": BNAC,
                "params": {"export_all_neurons": True},
                "windows": ["w1"],
                "neuron_classes": ["Rt_EXC", "VPL_EXC"],
            }],
        }},
    }

    themes["t11_union_queries"] = {
        "version": 4,
        "simulation_campaign": CAMPAIGN,
        "analysis": {"spikes": {
            "extraction": _spikes_extraction(
                neuron_classes={
                    "Rt_EXC": {"query": {"layer": ["Rt"],
                                         "synapse_class": ["EXC"]}},
                    "VPL_INH": {"query": {"layer": ["VPL"],
                                          "synapse_class": ["INH"]}},
                    "Rt_EXC_VPL_INH": {"query": [
                        {"layer": ["Rt"], "synapse_class": ["EXC"]},
                        {"layer": ["VPL"], "synapse_class": ["INH"]},
                    ]},
                    "Rt_EXC_VPL_INH_": {
                        "query": [
                            {"layer": ["Rt"], "synapse_class": ["EXC"]},
                            {"layer": ["VPL"], "synapse_class": ["INH"]},
                        ],
                        "node_set": "All",
                        "limit": 100,
                    },
                },
                windows={"w1": {"bounds": [20, 90],
                                "window_type": "spontaneous"}},
                node_sets_file=node_sets_file,
            ),
            "features": BNAC_FEATURES,
        }},
    }

    themes["t12_custom_node_sets"] = {
        "version": 4,
        "simulation_campaign": CAMPAIGN,
        "analysis": {"spikes": {
            "extraction": _spikes_extraction(
                neuron_classes={
                    "Rt_INH": {"query": {"layer": ["Rt"]},
                               "node_set": "Inhibitory"},
                    "Rt_INH_2": {"node_set": "InhibitoryRt"},
                },
                node_sets_file=node_sets_file,
            ),
            "features": BNAC_FEATURES,
        }},
    }

    return themes


@pytest.fixture(scope="module")
def node_sets_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("node_sets") / "node_sets.json"
    path.write_text(json.dumps({
        "Excitatory": {"synapse_class": "EXC"},
        "Inhibitory": {"synapse_class": "INH"},
        "All": ["Excitatory", "Inhibitory"],
        "InhibitoryRt": {"synapse_class": "INH", "layer": "Rt"},
    }))
    return str(path)


@pytest.fixture(scope="module")
def theme_data(spark):
    """Nodes with layer/synapse_class/population; spikes, soma, and
    compartment event tables over two simulations."""
    rng = np.random.default_rng(11)
    n_nodes = 80
    nodes = spark.createDataFrame(pd.DataFrame({
        "circuit_id": np.zeros(n_nodes, dtype="int16"),
        "node_id": np.arange(n_nodes, dtype="int64"),
        "layer": rng.choice(["Rt", "VPL"], n_nodes),
        "synapse_class": rng.choice(["EXC", "INH"], n_nodes),
        "population": np.where(np.arange(n_nodes) < 70,
                               "thalamus_neurons", "other_pop"),
    }))
    n = 4000
    spikes = spark.createDataFrame(pd.DataFrame({
        "simulation_id": rng.integers(0, 2, n).astype("int16"),
        "gid": rng.integers(0, n_nodes, n).astype("int64"),
        "time": rng.uniform(0, 100, n),
    }))
    soma = spark.createDataFrame(pd.DataFrame({
        "simulation_id": rng.integers(0, 2, n).astype("int16"),
        "gid": rng.integers(0, n_nodes, n).astype("int64"),
        "time": rng.uniform(0, 100, n),
        "value": rng.normal(-65.0, 5.0, n),
    }))
    comp = spark.createDataFrame(pd.DataFrame({
        "simulation_id": rng.integers(0, 2, n).astype("int16"),
        "gid": rng.integers(0, n_nodes, n).astype("int64"),
        "time": rng.uniform(0, 40, n),
        "section": rng.integers(0, 4, n).astype("int32"),
        "value": rng.normal(-65.0, 5.0, n),
    }))
    events = {"spikes": spikes, "soma": soma, "compartment": comp}
    return nodes, events


def _collect_everything(ma) -> dict[str, pd.DataFrame]:
    """Every frame the run produces: per-analysis extraction + features,
    plus the in-memory-filtered view when the config declares one."""
    out: dict[str, pd.DataFrame] = {}
    for aname, a in ma.analyzers.items():
        for n, df in a.extract().items():
            out[f"{aname}/{n}"] = df.toPandas()
        for n, df in a.calculate_features().items():
            out[f"{aname}/feat_{n}"] = df.toPandas()
    view = ma.apply_filter()
    if view is not ma:
        for aname, a in view.analyzers.items():
            out[f"filtered/{aname}/report"] = a.report.toPandas()
            for n, df in a.calculate_features().items():
                out[f"filtered/{aname}/feat_{n}"] = df.toPandas()
    return out


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    # array cells break sort_values/compare — canonicalize to tuples
    df = df[cols].copy()
    for c in cols:
        if len(df) and isinstance(df[c].iloc[0], (list, np.ndarray)):
            df[c] = df[c].map(lambda v: tuple(np.asarray(v).tolist()))
    return df.sort_values(cols, ignore_index=True, key=lambda s: s.map(repr))


@pytest.mark.parametrize("theme", sorted(_theme_configs("x")))
def test_theme_cold_then_warm(spark, theme_data, node_sets_file, tmp_path,
                              theme):
    nodes, events = theme_data
    config = _theme_configs(node_sets_file)[theme]
    cache = tmp_path / "cache"

    ma_cold = run_from_config(spark, config, nodes, events, cache_path=cache)
    cold = _collect_everything(ma_cold)
    assert any(len(v) for v in cold.values()), "theme produced no rows at all"
    # every analysis extracted a non-empty report
    for aname in config["analysis"]:
        assert len(cold[f"{aname}/report"]) > 0, aname

    ma_warm = run_from_config(spark, config, nodes, events, cache_path=cache)
    warm = _collect_everything(ma_warm)

    assert set(cold) == set(warm)
    for name in sorted(cold):
        pd.testing.assert_frame_equal(
            _sorted(cold[name]), _sorted(warm[name]),
            check_dtype=False, rtol=1e-12, atol=1e-12,
        ), name


def test_theme_semantics_spot_checks(spark, theme_data, node_sets_file,
                                     tmp_path):
    """Beyond cold/warm equality: the themes' distinguishing semantics."""
    nodes, events = theme_data
    themes = _theme_configs(node_sets_file)

    # t02: simulations_filter keeps only the seed-201209 simulation
    ma = run_from_config(spark, themes["t02_filter_trial_steps"], nodes,
                         events, cache_path=tmp_path / "c02")
    sims = ma.spikes.simulations.toPandas()
    assert set(sims.seed) == {201209}
    w = ma.spikes.windows.toPandas()
    # w3 carries the onset offset: >= initial_offset + ms_post_offset
    assert (w[w.window == "w3"].offset >= 51.0).all()

    # t03: per-class population excludes other_pop gids entirely
    ma = run_from_config(spark, themes["t03_population_node_set"], nodes,
                         events, cache_path=tmp_path / "c03")
    neurons = ma.spikes.neurons.toPandas()
    assert neurons.gid.max() < 70
    # node_set Excitatory/Inhibitory partition respected
    npdf = nodes.toPandas().set_index("node_id")
    for cls, want in [("Rt_EXC", "EXC"), ("Rt_INH", "INH")]:
        got = neurons[neurons.neuron_class == cls].gid
        assert (npdf.loc[got, "synapse_class"] == want).all()

    # t04: apply_filter() view restricts to the in-memory filter
    ma = run_from_config(spark, themes["t04_filter_in_memory"], nodes,
                         events, cache_path=tmp_path / "c04")
    assert set(ma.spikes.report.toPandas().simulation_id) == {0, 1}
    view = ma.apply_filter()
    assert set(view.spikes.report.toPandas().simulation_id) == {0}

    # t08: soma w9 rows ARE spikes w3 rows (renamed) — materialized-row
    # copy, including the spikes-side dynamic onset offsets
    ma = run_from_config(spark, themes["t08_multi_report_window_ref"],
                         nodes, events, cache_path=tmp_path / "c08")
    w3 = ma.spikes.windows.toPandas().query("window == 'w3'")
    w9 = ma.soma.windows.toPandas().query("window == 'w9'")
    key = ["simulation_id", "trial", "offset", "t_start", "t_stop"]
    pd.testing.assert_frame_equal(
        w3[key].sort_values(key, ignore_index=True),
        w9[key].sort_values(key, ignore_index=True),
    )

    # t10: feature outputs only contain the listed windows and classes
    ma = run_from_config(spark, themes["t10_feature_filters"], nodes,
                         events, cache_path=tmp_path / "c10")
    feats = ma.spikes.calculate_features()
    bg = feats["by_gid"].toPandas()
    assert set(bg.window) == {"w1"}
    assert set(bg.neuron_class) <= {"Rt_EXC", "VPL_EXC"}

    # t11: union class = exact union of its two parts; node_set+limit caps
    ma = run_from_config(spark, themes["t11_union_queries"], nodes, events,
                         cache_path=tmp_path / "c11")
    neurons = ma.spikes.neurons.toPandas()
    parts = set(neurons[neurons.neuron_class == "Rt_EXC"].gid) | set(
        neurons[neurons.neuron_class == "VPL_INH"].gid)
    union = set(neurons[neurons.neuron_class == "Rt_EXC_VPL_INH"].gid)
    assert union == parts

    # t12: query-less node_set class selects exactly the set members
    ma = run_from_config(spark, themes["t12_custom_node_sets"], nodes,
                         events, cache_path=tmp_path / "c12")
    neurons = ma.spikes.neurons.toPandas()
    got = set(neurons[neurons.neuron_class == "Rt_INH_2"].gid)
    want = set(
        npdf[(npdf.synapse_class == "INH") & (npdf.layer == "Rt")
             & (npdf.population == "thalamus_neurons")].index
    )
    assert got == want
