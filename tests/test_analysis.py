"""End-to-end config-driven pipeline: cold run, warm (cached) run
equivalence, apply_filter — mirrors the reference's functional protocol
(SURVEY §5: run twice, compare; filtered views checked separately)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from blueetl_spark.analysis import (
    MultiAnalyzer,
    expand_features_configs,
    params_product,
    params_zip,
    run_from_config,
)

CONFIG = {
    "version": 4,
    "simulation_campaign": {
        "data": [
            {"simulation_path": "/sim0", "seed": 1},
            {"simulation_path": "/sim1", "seed": 2},
        ]
    },
    "analysis": {
        "spikes": {
            "extraction": {
                "report": {"type": "spikes"},
                "neuron_classes": {
                    "EXC": {"query": {"synapse_class": ["EXC"]}},
                    "INH": {"query": {"synapse_class": ["INH"]}},
                },
                "windows": {
                    "w1": {"bounds": [0.0, 50.0]},
                    "w2": {"bounds": [0.0, 40.0], "n_trials": 2,
                           "trial_steps_value": 50.0},
                },
            },
            "features": [
                {"function": "blueetl_spark.features.by_gid"},
                {"function": "blueetl_spark.features.by_neuron_class"},
            ],
        }
    },
}


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.default_rng(5)
    nodes = spark.createDataFrame(
        pd.DataFrame(
            {
                "circuit_id": np.zeros(60, dtype="int16"),
                "node_id": np.arange(60, dtype="int64"),
                "synapse_class": rng.choice(["EXC", "INH"], 60),
            }
        )
    )
    n = 3000
    events = spark.createDataFrame(
        pd.DataFrame(
            {
                "simulation_id": rng.integers(0, 2, n).astype("int16"),
                "gid": rng.integers(0, 60, n).astype("int64"),
                "time": rng.uniform(0, 100, n),
            }
        )
    )
    return nodes, events


def _collect_all(ma: MultiAnalyzer) -> dict[str, pd.DataFrame]:
    a = ma.spikes
    out = {n: df.toPandas() for n, df in a.extract().items()}
    out.update({f"feat_{n}": df.toPandas() for n, df in a.calculate_features().items()})
    return out


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(sorted(df.columns)), ignore_index=True)[
        sorted(df.columns)
    ]


def test_cold_then_warm_equivalence(spark, data, tmp_path):
    nodes, events = data
    ma_cold = run_from_config(spark, CONFIG, nodes, events, cache_path=tmp_path / "c")
    cold = _collect_all(ma_cold)
    assert len(cold["report"]) > 0
    assert set(cold) >= {"simulations", "neurons", "windows", "report",
                         "feat_by_gid", "feat_by_neuron_class"}
    # warm: new analyzer over the same cache must serve identical frames
    ma_warm = run_from_config(spark, CONFIG, nodes, events, cache_path=tmp_path / "c")
    warm = _collect_all(ma_warm)
    for name in cold:
        pd.testing.assert_frame_equal(
            _sorted(cold[name]), _sorted(warm[name]), check_dtype=False
        ), name


def test_config_change_invalidates_downstream(spark, data, tmp_path):
    import copy

    nodes, events = data
    run_from_config(spark, CONFIG, nodes, events, cache_path=tmp_path / "c")
    cfg2 = copy.deepcopy(CONFIG)
    cfg2["analysis"]["spikes"]["extraction"]["windows"]["w1"]["bounds"] = [0.0, 30.0]
    ma2 = run_from_config(spark, cfg2, nodes, events, cache_path=tmp_path / "c")
    w = ma2.spikes.windows.toPandas()
    assert w[w.window == "w1"].t_stop.iloc[0] == 30.0
    r = ma2.spikes.report.toPandas()
    assert r[r.window == "w1"].time.max() < 30.0


def test_apply_filter_in_memory(spark, data, tmp_path):
    nodes, events = data
    ma = run_from_config(spark, CONFIG, nodes, events, cache_path=tmp_path / "c")
    full_report = ma.spikes.report.toPandas()
    filtered = ma.spikes.apply_filter({"seed": 2})
    fr = filtered.report.toPandas()
    assert set(fr.simulation_id) == {1}
    # original untouched
    pd.testing.assert_frame_equal(
        _sorted(ma.spikes.report.toPandas()), _sorted(full_report), check_dtype=False
    )
    feats = filtered.calculate_features()
    assert set(feats["by_gid"].toPandas().simulation_id) == {1}


def test_no_cache_path_works(spark, data):
    nodes, events = data
    ma = MultiAnalyzer(spark, CONFIG, nodes, events)
    assert ma.spikes.report.count() > 0


def test_params_expansion():
    assert params_product({"a": [1, 2], "b": "x"}) == [
        {"a": 1, "b": "x"},
        {"a": 2, "b": "x"},
    ]
    assert params_zip({"a": [1, 2], "b": ["u", "v"]}) == [
        {"a": 1, "b": "u"},
        {"a": 2, "b": "v"},
    ]
    with pytest.raises(ValueError):
        params_zip({"a": [1, 2], "b": ["u"]})
    cfgs = expand_features_configs(
        [{"function": "f", "params": {"k": 0}, "params_product": {"s": [1, 2]}}]
    )
    assert [c["params"] for c in cfgs] == [{"k": 0, "s": 1}, {"k": 0, "s": 2}]
    assert [c["suffix"] for c in cfgs] == ["_0", "_1"]


def test_dynamic_onset_offsets(spark, data):
    import copy

    nodes, events = data
    # events cluster after t=60 for sim 0 → onset detected there
    from pyspark.sql import functions as F

    burst = events.withColumn(
        "time", F.when(F.col("time") > 60, F.col("time")).otherwise(F.col("time") + 200)
    )
    cfg = copy.deepcopy(CONFIG)
    cfg["analysis"]["spikes"]["extraction"]["windows"]["w3"] = {
        "bounds": [0.0, 20.0],
        "trial_steps": {"bounds": [0.0, 100.0], "bin_size": 1.0, "sigma": 2.0,
                        "std_multiple": 1.0, "pre_fraction": 0.3},
    }
    ma = MultiAnalyzer(spark, cfg, nodes, burst)
    w = ma.spikes.windows.toPandas()
    w3 = w[w.window == "w3"]
    assert (w3.offset > 0).all()  # onset found past the silent prefix


def test_cross_analysis_window_reference(spark, data):
    """W3: a string window ref resolves to the sibling analysis' definition."""
    from blueetl_spark.analysis import MultiAnalyzer

    nodes, events = data
    config = {
        "simulation_campaign": {"data": [{"simulation_path": "sim0"}]},
        "analysis": {
            "spikes": {
                "extraction": {
                    "neuron_classes": {"all": {"query": {}}},
                    "windows": {"w1": {"bounds": [0.0, 50.0], "n_trials": 2,
                                       "trial_steps_value": 50.0}},
                },
            },
            "soma": {
                "extraction": {
                    "neuron_classes": {"all": {"query": {}}},
                    "windows": {"w1": "spikes.extraction.windows.w1"},
                    "report": {"type": "soma"},
                },
            },
        },
    }
    ma = MultiAnalyzer(spark, config, nodes, events)
    got = ma.soma.windows.orderBy("trial").toPandas()
    assert got.trial.tolist() == [0, 1]
    assert got.t_stop.tolist() == [50.0, 50.0]
    assert got.offset.tolist() == [0.0, 50.0]


def test_circular_window_reference_raises(spark, data):
    from blueetl_spark.analysis import MultiAnalyzer
    import pytest as _pytest

    nodes, events = data
    config = {
        "simulation_campaign": {"data": [{"simulation_path": "sim0"}]},
        "analysis": {
            "a": {"extraction": {"neuron_classes": {"all": {"query": {}}},
                                  "windows": {"w": "b.extraction.windows.w"}}},
            "b": {"extraction": {"neuron_classes": {"all": {"query": {}}},
                                  "windows": {"w": "a.extraction.windows.w"}}},
        },
    }
    with _pytest.raises(ValueError, match="circular"):
        MultiAnalyzer(spark, config, nodes, events)


def test_apply_filter_pushes_circuit_ids(spark, data):
    """FilteredAnalyzer narrows circuit-grained tables to the circuits the
    surviving simulations use (reference repository.py:96-120)."""
    nodes, events = data
    # two circuits: sims 0 -> circuit A, 1 -> circuit B
    cfg = {
        "simulation_campaign": {"data": [
            {"simulation_path": "/sim0", "circuit_config": "/cA"},
            {"simulation_path": "/sim1", "circuit_config": "/cB"},
        ]},
        "analysis": {"spikes": {"extraction": {
            "neuron_classes": {"all": {"query": {}}},
            "windows": {"w1": {"bounds": [0.0, 50.0]}},
        }}},
    }
    import pyspark.sql.functions as F
    from blueetl_spark.analysis import MultiAnalyzer

    # nodes for both circuits
    nodes2 = nodes.union(
        nodes.withColumn("circuit_id", F.lit(1).cast("smallint"))
    )
    ma = MultiAnalyzer(spark, cfg, nodes2, events)
    a = ma.spikes
    assert a.neurons.select("circuit_id").distinct().count() == 2
    filtered = a.apply_filter({"simulation_id": [0]})
    assert filtered.simulations.count() == 1
    assert filtered.neurons.select("circuit_id").distinct().collect()[0][0] == 0
    assert filtered.neuron_classes.select("circuit_id").distinct().count() == 1
    assert filtered.report.select("simulation_id").distinct().count() == 1


def test_config_driven_timeseries_features(spark, data, tmp_path):
    """sessionize / quantiles reachable from the features config like any
    built-in feature (dispatch + params plumbing)."""
    import copy

    from blueetl_spark.analysis import run_from_config

    nodes, events = data
    cfg = copy.deepcopy(CONFIG)
    cfg["analysis"]["spikes"]["features"] = [
        {"function": "blueetl_spark.features.sessionize",
         "name": "sessions", "params": {"gap": 5.0}},
        {"function": "blueetl_spark.features.quantiles",
         "name": "spike_time_q", "params": {"probs": [0.5, 0.9]}},
    ]
    a = run_from_config(spark, cfg, nodes, events).spikes
    feats = a.calculate_features()
    sess = feats["sessions"].toPandas()
    assert {"gid", "session", "t_start", "t_end", "n_events",
            "duration"} <= set(sess.columns)
    assert (sess.n_events >= 1).all() and (sess.duration >= 0).all()
    q = feats["spike_time_q"].toPandas()
    assert {"neuron_class", "n", "q_0_5", "q_0_9"} <= set(q.columns)
    assert (q.q_0_5 <= q.q_0_9).all()


def test_config_names_feature_function_by_module_path(
    spark, data, tmp_path, monkeypatch
):
    """Reference parity (utils.py:146-156 import_by_string): a v4-style
    config naming a feature function by DOTTED MODULE PATH — not
    register_feature, not a blueetl_spark.features builtin — resolves via
    importlib and runs end-to-end through the analyzer."""
    import copy

    from blueetl_spark.analysis import run_from_config

    mod = tmp_path / "external_feats_cfgtest.py"
    mod.write_text(
        "import pandas as pd\n"
        "def spike_count_scaled(g, params):\n"
        "    return pd.DataFrame({'n_scaled': "
        "[len(g) * params.get('scale', 1)]})\n"
    )
    monkeypatch.syspath_prepend(str(tmp_path))

    nodes, events = data
    cfg = copy.deepcopy(CONFIG)
    cfg["analysis"]["spikes"]["features"] = [
        {
            "function": "external_feats_cfgtest.spike_count_scaled",
            "name": "scaled_counts",
            "params": {"scale": 10},
            "groupby": ["simulation_id", "circuit_id", "neuron_class", "window"],
            "schema": "simulation_id smallint, circuit_id smallint, "
            "neuron_class string, window string, n_scaled long",
        }
    ]
    a = run_from_config(spark, cfg, nodes, events).spikes
    feats = a.calculate_features()
    got = feats["scaled_counts"].toPandas()
    assert (got.n_scaled > 0).all() and (got.n_scaled % 10 == 0).all()
    # cross-check against the report itself
    total = got.n_scaled.sum() / 10
    assert total == a.report.count()
