"""Config migration (v1/v2/v3 -> v4) + jsonschema validation.

The v1 fixture and expected v4 output replicate the semantics checked by
the reference's own migrate test (``tests/unit/apps/test_migrate.py``):
flat v1 layout -> named analysis, bare neuron-class filter keys -> query,
``gid`` -> ``node_id``, ``target`` -> ``node_set``, ``output`` ->
``cache.path``.
"""

import copy
import json

import pytest

from blueetl_spark.migrate import migrate_config
from blueetl_spark.validation import ValidationError, validate_config

V1_CONFIG = {
    "simulation_campaign": "/path/to/config.json",
    "simulations_filter_in_memory": {"simulation_id": 2},
    "output": "output_dir",
    "extraction": {
        "neuron_classes": {
            "L1_EXC": {"layer": ["1"], "synapse_class": ["EXC"]},
            "L1_EXC_gids": {
                "layer": ["1"], "synapse_class": ["EXC"], "gid": [1, 2]
            },
        },
        "limit": None,
        "target": None,
        "windows": {"w1": {"bounds": [20, 90], "window_type": "spontaneous"}},
    },
    "analysis": {
        "features": [
            {
                "type": "multi",
                "groupby": ["simulation_id", "circuit_id", "neuron_class", "window"],
                "function": "module.user.function",
                "params": {"export_all_neurons": True},
            }
        ]
    },
}

V1_EXPECTED = {
    "version": 4,
    "simulation_campaign": "/path/to/config.json",
    "simulations_filter_in_memory": {"simulation_id": 2},
    "cache": {"path": "output_dir"},
    "analysis": {
        "spikes": {
            "extraction": {
                "report": {"type": "spikes"},
                "neuron_classes": {
                    "L1_EXC": {"query": {"layer": ["1"], "synapse_class": ["EXC"]}},
                    "L1_EXC_gids": {
                        "query": {"layer": ["1"], "synapse_class": ["EXC"]},
                        "node_id": [1, 2],
                    },
                },
                "limit": None,
                "node_set": None,
                "windows": {"w1": {"bounds": [20, 90], "window_type": "spontaneous"}},
            },
            "features": [
                {
                    "type": "multi",
                    "groupby": [
                        "simulation_id", "circuit_id", "neuron_class", "window"
                    ],
                    "function": "module.user.function",
                    "params": {"export_all_neurons": True},
                }
            ],
        }
    },
}


def test_migrate_v1_to_v4_matches_reference_semantics():
    assert migrate_config(copy.deepcopy(V1_CONFIG)) == V1_EXPECTED


def test_migrate_v4_passthrough():
    out = migrate_config(copy.deepcopy(V1_EXPECTED))
    assert out == V1_EXPECTED


def test_migrate_rejects_unknown_version():
    with pytest.raises(ValueError, match="unsupported config version"):
        migrate_config({"version": 99})


def test_migrate_v3_to_v4_moves_cache_keys():
    v3 = {
        "version": 3,
        "simulation_campaign": "/c.json",
        "output": "outdir",
        "clear_cache": True,
        "analysis": {
            "spikes": {
                "extraction": {
                    "neuron_classes": {"all": {"query": {}}},
                    "windows": {"w1": {"bounds": [0, 10]}},
                }
            }
        },
    }
    out = migrate_config(v3)
    assert out["cache"] == {"path": "outdir", "clear": True}
    assert "output" not in out and "clear_cache" not in out
    assert out["version"] == 4


def test_migrated_v3_config_runs(spark, tmp_path):
    """Round-trip: v3-style config -> migrate-config CLI -> run through
    MultiAnalyzer against synthetic nodes/events."""
    import numpy as np
    import pandas as pd

    from blueetl_spark.analysis import MultiAnalyzer

    v3 = {
        "version": 3,
        "simulation_campaign": {
            "data": [
                {"simulation_path": "/sim0", "seed": 1},
                {"simulation_path": "/sim1", "seed": 2},
            ]
        },
        "output": str(tmp_path / "cache"),
        "analysis": {
            "spikes": {
                "extraction": {
                    "report": {"type": "spikes"},
                    "neuron_classes": {
                        "EXC": {"query": {"synapse_class": ["EXC"]}}
                    },
                    "windows": {"w1": {"bounds": [0.0, 50.0]}},
                },
                "features": [{"function": "blueetl_spark.features.by_gid"}],
            }
        },
    }
    from blueetl_spark.__main__ import main

    src, dst = tmp_path / "v3.json", tmp_path / "v4.json"
    src.write_text(json.dumps(v3))
    assert main(["migrate-config", str(src), str(dst)]) == 0
    migrated = json.loads(dst.read_text())
    assert migrated["version"] == 4
    assert migrated["cache"]["path"] == str(tmp_path / "cache")

    rng = np.random.default_rng(7)
    nodes = spark.createDataFrame(
        pd.DataFrame(
            {
                "circuit_id": np.zeros(20, dtype="int16"),
                "node_id": np.arange(20, dtype="int64"),
                "synapse_class": rng.choice(["EXC", "INH"], 20),
            }
        )
    )
    events = spark.createDataFrame(
        pd.DataFrame(
            {
                "simulation_id": rng.integers(0, 2, 500).astype("int16"),
                "gid": rng.integers(0, 20, 500),
                "time": rng.uniform(0, 50, 500),
            }
        )
    )
    ma = MultiAnalyzer(spark, migrated, nodes, events)
    tables = ma.spikes.extract()
    assert tables["report"].count() > 0
    feats = ma.calculate_features()
    assert feats["spikes"]["by_gid"].count() > 0


INVALID_CONFIGS = [
    # (config mutation description, config, substring expected in error)
    (
        "missing analysis",
        {"version": 4, "simulation_campaign": "/c"},
        "analysis",
    ),
    (
        "unknown top-level key",
        {**V1_EXPECTED, "bogus_key": 1},
        "bogus_key",
    ),
    (
        "missing extraction",
        {
            "version": 4,
            "simulation_campaign": "/c",
            "analysis": {"a": {"features": []}},
        },
        "extraction",
    ),
    (
        "bad report type",
        {
            "version": 4,
            "simulation_campaign": "/c",
            "analysis": {
                "a": {
                    "extraction": {
                        "report": {"type": "voltages"},
                        "neuron_classes": {},
                        "windows": {},
                    }
                }
            },
        },
        "voltages",
    ),
    (
        "groupby key outside supported set",
        {
            "version": 4,
            "simulation_campaign": "/c",
            "analysis": {
                "a": {
                    "extraction": {"neuron_classes": {}, "windows": {}},
                    "features": [
                        {"function": "f", "groupby": ["simulation_id", "layer"]}
                    ],
                }
            },
        },
        "layer",
    ),
    (
        "window missing bounds",
        {
            "version": 4,
            "simulation_campaign": "/c",
            "analysis": {
                "a": {
                    "extraction": {
                        "neuron_classes": {},
                        "windows": {"w": {"n_trials": 2}},
                    }
                }
            },
        },
        "bounds",
    ),
    (
        "unknown neuron-class key (bare v1-style filter)",
        {
            "version": 4,
            "simulation_campaign": "/c",
            "analysis": {
                "a": {
                    "extraction": {
                        "neuron_classes": {"nc": {"layer": ["1"]}},
                        "windows": {},
                    }
                }
            },
        },
        "layer",
    ),
    (
        "bad cache store_type",
        {
            "version": 4,
            "simulation_campaign": "/c",
            "cache": {"store_type": "hdf"},
            "analysis": {
                "a": {"extraction": {"neuron_classes": {}, "windows": {}}}
            },
        },
        "hdf",
    ),
]


@pytest.mark.parametrize(
    "desc,config,fragment", INVALID_CONFIGS, ids=[c[0] for c in INVALID_CONFIGS]
)
def test_validation_rejects(desc, config, fragment):
    with pytest.raises(ValidationError) as exc:
        validate_config(config)
    assert fragment in str(exc.value)


def test_validation_accepts_reference_shaped_config():
    validate_config(V1_EXPECTED)


def test_validation_lists_all_errors_with_paths():
    bad = {
        "version": "four",  # wrong type
        "analysis": {},  # empty
    }  # also missing simulation_campaign
    with pytest.raises(ValidationError) as exc:
        validate_config(bad)
    msg = str(exc.value)
    assert "root.version" in msg
    assert "root.analysis" in msg
    assert "simulation_campaign" in msg
