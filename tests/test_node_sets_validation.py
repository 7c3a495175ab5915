"""Tests: node sets (S6), window validation (A5/A6), stateful streaming."""

import json

import pytest
from pyspark.sql import functions as F

from blueetl_spark.operators.windows import validate_windows
from blueetl_spark.sources.node_sets import NodeSets


# -- node sets ---------------------------------------------------------------


@pytest.fixture()
def ns(tmp_path):
    content = {
        "layer1": {"layer": 1},
        "excitatory": {"synapse_class": "EXC"},
        "l1_exc": {"layer": 1, "synapse_class": "EXC"},
        "by_id": {"node_id": [1, 3]},
        "either": ["layer1", "excitatory"],
        "nested": ["either", "by_id"],
    }
    p = tmp_path / "node_sets.json"
    p.write_text(json.dumps(content))
    return NodeSets.from_file(p)


@pytest.fixture()
def nodes(spark):
    return spark.createDataFrame(
        [
            (0, 1, "EXC"), (1, 1, "INH"), (2, 2, "EXC"), (3, 2, "INH"),
        ],
        "node_id long, layer int, synapse_class string",
    )


def test_basic_and_conjunction(ns, nodes):
    assert sorted(
        r.node_id for r in nodes.filter(ns.to_predicate("l1_exc")).collect()
    ) == [0]
    assert sorted(
        r.node_id for r in nodes.filter(ns.to_predicate("by_id")).collect()
    ) == [1, 3]


def test_compound_union_and_nesting(ns, nodes):
    assert sorted(
        r.node_id for r in nodes.filter(ns.to_predicate("either")).collect()
    ) == [0, 1, 2]
    assert sorted(
        r.node_id for r in nodes.filter(ns.to_predicate("nested")).collect()
    ) == [0, 1, 2, 3]


def test_overlay_update(ns):
    other = NodeSets({"layer1": {"layer": 9}, "new_set": {"layer": 2}})
    ns.update(other)
    assert ns.to_query("layer1") == {"layer": 9}
    assert "new_set" in ns

def test_missing_and_circular(ns):
    with pytest.raises(KeyError, match="not defined"):
        ns.to_query("nope")
    circ = NodeSets({"a": ["b"], "b": ["a"]})
    with pytest.raises(ValueError, match="circular"):
        circ.to_query("a")


def test_from_file_none_is_empty():
    assert NodeSets.from_file(None).content == {}


# -- window validation -------------------------------------------------------


def _windows(spark, rows):
    return spark.createDataFrame(
        rows,
        "simulation_id smallint, window string, trial smallint, "
        "t_start double, t_stop double, duration double",
    )


def test_validate_windows_ok(spark):
    validate_windows(
        _windows(spark, [(0, "w", 0, 0.0, 10.0, 10.0), (0, "w", 1, 0.0, 10.0, 10.0)])
    )


def test_validate_windows_inconsistent_bounds(spark):
    with pytest.raises(ValueError, match="window=w"):
        validate_windows(
            _windows(
                spark, [(0, "w", 0, 0.0, 10.0, 10.0), (0, "w", 1, 0.0, 20.0, 20.0)]
            )
        )


def test_validate_windows_trial_gap(spark):
    with pytest.raises(ValueError, match="inconsistent"):
        validate_windows(
            _windows(spark, [(0, "w", 0, 0.0, 10.0, 10.0), (0, "w", 2, 0.0, 10.0, 10.0)])
        )


# -- stateful streaming ------------------------------------------------------


def test_stateful_spike_counter(spark, tmp_path):
    from blueetl_spark.streaming import windows as sw

    ev = spark.range(40).select(
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
        (F.col("id") % 2).alias("gid"),
        F.lit("L5").alias("neuron_class"),
        F.lit(1.0).alias("value"),
    )
    path = tmp_path / "stream"
    ev.write.parquet(str(path / "b1"))
    stream = sw.read_event_stream(spark, str(path / "b1"))
    out = sw.run_to_memory(
        sw.stateful_spike_counter(stream, rate_threshold=0.1), "counter",
        output_mode="update",
    ).toPandas()
    # final state per gid: 20 events each over ~38s span -> rate ~0.52 > 0.1
    final = out.sort_values("total_count").groupby("gid").last()
    assert final.total_count.tolist() == [20, 20]
    assert final.is_burst.all()


def test_extract_neurons_with_node_set(spark, nodes, ns):
    from blueetl_spark.operators.extraction import extract_neurons

    nodes_c = nodes.withColumn("circuit_id", F.lit(0).cast("smallint"))
    out = extract_neurons(
        nodes_c,
        {"L1E": {"query": {"synapse_class": "EXC"}, "node_set": "layer1"}},
        node_sets=ns,
    ).toPandas()
    assert out.gid.tolist() == [0]  # EXC AND layer==1

    with pytest.raises(ValueError, match="no node_sets given"):
        extract_neurons(nodes_c, {"x": {"query": {}, "node_set": "layer1"}})
