"""Neurons / neuron_classes / report extraction tests on synthetic
blueetl-shaped fixtures (FIXTURES.md), pandas-cross-checked."""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pytest

from blueetl_spark.operators.extraction import (
    extract_neuron_classes,
    extract_neurons,
    extract_report,
)
from blueetl_spark.operators.windows import materialize_windows

CLASSES = {
    "EXC": {"query": {"synapse_class": ["EXC"]}},
    "INH": {"query": {"synapse_class": ["INH"]}},
    "Rt_EXC": {"query": {"layer": "Rt", "synapse_class": "EXC"}},
    "OR_class": {"query": [{"layer": "Rt"}, {"layer": "VPL"}]},
}


@pytest.fixture(scope="module")
def nodes_pdf():
    rng = np.random.default_rng(0)
    n = 400
    return pd.DataFrame(
        {
            "circuit_id": np.zeros(n, dtype="int16"),
            "node_id": np.arange(n, dtype="int64"),
            "layer": rng.choice(["Rt", "VPL", "Other"], n),
            "synapse_class": rng.choice(["EXC", "INH"], n),
        }
    )


@pytest.fixture(scope="module")
def nodes(spark, nodes_pdf):
    return spark.createDataFrame(nodes_pdf).cache()


@pytest.fixture(scope="module")
def neurons(nodes):
    return extract_neurons(nodes, CLASSES).cache()


def test_neurons_match_pandas(neurons, nodes_pdf):
    got = neurons.toPandas()
    for name, cfg in CLASSES.items():
        qq = cfg["query"]
        if isinstance(qq, list):
            mask = pd.Series(False, index=nodes_pdf.index)
            for d in qq:
                m = pd.Series(True, index=nodes_pdf.index)
                for k, v in d.items():
                    m &= nodes_pdf[k].isin(v if isinstance(v, list) else [v])
                mask |= m
        else:
            mask = pd.Series(True, index=nodes_pdf.index)
            for k, v in qq.items():
                mask &= nodes_pdf[k].isin(v if isinstance(v, list) else [v])
        exp_gids = sorted(nodes_pdf.node_id[mask])
        cls = got[got.neuron_class == name].sort_values("gid")
        assert list(cls.gid) == exp_gids, name
        # dense 0..n-1 index in gid order
        assert list(cls.neuron_class_index) == list(range(len(exp_gids))), name


def test_two_phase_dense_index_equals_window(spark, nodes, neurons, sf_dir):
    """The range-partitioned two-phase numbering must be row-identical to
    the window variant — via extract_neurons AND on a real multi-group
    table (customer), including with a skewed partition count."""
    from pyspark.sql import functions as F

    from blueetl_spark.operators.extraction import dense_index
    from blueetl_spark.sources import tables

    two = extract_neurons(nodes, CLASSES, two_phase_index=True).toPandas()
    one = neurons.toPandas()
    cols = ["circuit_id", "neuron_class", "gid", "neuron_class_index"]
    pd.testing.assert_frame_equal(
        one[cols].sort_values(cols[:3], ignore_index=True),
        two[cols].sort_values(cols[:3], ignore_index=True),
        check_dtype=False,
    )

    customer = tables.load(spark, sf_dir, "customer")
    for n_parts in (4, 32):
        a = (
            dense_index(customer, ["c_nationkey"], "c_custkey", "idx")
            .select("c_nationkey", "c_custkey", "idx")
            .toPandas()
        )
        b = (
            dense_index(
                customer, ["c_nationkey"], "c_custkey", "idx",
                two_phase=True, num_partitions=n_parts,
            )
            .select("c_nationkey", "c_custkey", "idx")
            .toPandas()
        )
        keys = ["c_nationkey", "c_custkey"]
        pd.testing.assert_frame_equal(
            a.sort_values(keys, ignore_index=True),
            b.sort_values(keys, ignore_index=True),
            check_dtype=False,
        )
    # sanity: the index is dense per group
    mx = (
        dense_index(customer, ["c_nationkey"], "c_custkey", "idx", two_phase=True)
        .groupBy("c_nationkey")
        .agg(F.max("idx").alias("mx"), F.count("*").alias("n"))
        .collect()
    )
    assert all(r["mx"] == r["n"] - 1 for r in mx)


def test_two_phase_dense_index_null_group_keys(spark):
    """Null group keys (ADVICE r5, medium): pandas groupby defaults to
    dropna=True, which used to skip NaN-key rows while ranks were assigned
    positionally — misaligning every later group in the chunk. Also covers
    the Arrow int-with-nulls → float64 key-canonicalization hazard: an
    integral group column containing ANY null arrives in the kernel as
    float64, so key (1,) must still find the offsets entry collected
    Spark-side as (1,)."""
    from pyspark.sql import functions as F

    from blueetl_spark.operators.extraction import dense_index

    df = spark.range(3000).select(
        # string group col with nulls: null, 'a', 'b' interleaved
        F.when(F.col("id") % 3 == 0, F.lit(None).cast("string"))
        .when(F.col("id") % 3 == 1, F.lit("a"))
        .otherwise(F.lit("b"))
        .alias("cls"),
        # integral group col with nulls → float64 in the Arrow batch
        F.when(F.col("id") % 5 == 0, F.lit(None).cast("int"))
        .otherwise((F.col("id") % 2).cast("int"))
        .alias("bucket"),
        F.col("id").alias("gid"),
    )
    for groups in (["cls"], ["cls", "bucket"], ["bucket"]):
        keys = groups + ["gid"]
        a = (
            dense_index(df, groups, "gid", "idx")
            .select(*keys, "idx")
            .toPandas()
            .sort_values(keys, ignore_index=True)
        )
        b = (
            dense_index(df, groups, "gid", "idx", two_phase=True, num_partitions=7)
            .select(*keys, "idx")
            .toPandas()
            .sort_values(keys, ignore_index=True)
        )
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_neurons_limit_sampling(nodes):
    classes = {"EXC": {"query": {"synapse_class": "EXC"}, "limit": 10}}
    n1 = extract_neurons(nodes, classes, seed=1).toPandas()
    n2 = extract_neurons(nodes, classes, seed=1).toPandas()
    n3 = extract_neurons(nodes, classes, seed=2).toPandas()
    assert len(n1) == 10
    assert list(n1.gid) == list(n2.gid)  # same seed → same sample
    assert list(n1.gid) != list(n3.gid)  # different seed → different sample
    assert list(n1.neuron_class_index) == list(range(10))
    assert list(n1.gid) == sorted(n1.gid)


def test_neuron_classes_summary(neurons):
    nc = extract_neuron_classes(neurons, CLASSES, collect_gids=True).toPandas()
    counts = neurons.toPandas().groupby("neuron_class").size()
    for row in nc.itertuples():
        assert row.count == counts[row.neuron_class]
        assert len(row.gids) == row.count
        assert json.loads(row.query) == (
            CLASSES[row.neuron_class]["query"]
            if not isinstance(CLASSES[row.neuron_class]["query"], list)
            else CLASSES[row.neuron_class]["query"]
        )


def test_report_end_to_end(spark, nodes, neurons):
    sims = spark.createDataFrame(
        [(0, 0, "/sim0"), (1, 0, "/sim1")],
        "simulation_id smallint, circuit_id smallint, simulation_path string",
    )
    windows = materialize_windows(
        spark,
        {"w1": {"bounds": [0.0, 100.0]}, "w2": {"bounds": [50.0, 150.0]}},
        sims,
    )
    rng = np.random.default_rng(3)
    n = 5000
    spikes_pdf = pd.DataFrame(
        {
            "simulation_id": rng.integers(0, 2, n).astype("int16"),
            "gid": rng.integers(0, 500, n).astype("int64"),  # some gids unclassified
            "time": rng.uniform(0, 200, n),
        }
    )
    spikes = spark.createDataFrame(spikes_pdf)
    report = extract_report(spikes, neurons, windows, simulations=sims)
    got = report.toPandas()
    assert set(got.columns) == {
        "time", "gid", "window", "trial", "simulation_id", "circuit_id",
        "neuron_class",
    }
    # every row's original time within window bounds, rebased
    assert ((got.time >= 0) & (got.time < 150)).all()
    # gids limited to classified ones (node_id < 400)
    assert got.gid.max() < 400
    # row count cross-check for one (class, window)
    neurons_pdf = pd.concat(
        [spikes_pdf.merge(c, left_on="gid", right_on="gid") for c in []]
        or [pd.DataFrame()]
    )
    exc_gids = set(
        r.gid for r in extract_neurons(nodes, {"EXC": CLASSES["EXC"]}).collect()
    )
    exp = spikes_pdf[
        spikes_pdf.gid.isin(exc_gids)
        & (spikes_pdf.time >= 0)
        & (spikes_pdf.time < 100)
        & (spikes_pdf.simulation_id == 0)
    ]
    got_sub = got[
        (got.neuron_class == "EXC") & (got.window == "w1") & (got.simulation_id == 0)
    ]
    assert len(got_sub) == len(exp)


def test_two_phase_sampling_exact_and_deterministic(spark):
    """The bounded-sort sample path: exact size per class, deterministic
    under a fixed seed, uniform-ish across the gid range."""
    import pyspark.sql.functions as F
    from blueetl_spark.operators.extraction import extract_neurons

    nodes = spark.range(20000).select(
        F.col("id").alias("node_id"),
        F.lit(0).cast("smallint").alias("circuit_id"),
        F.when(F.col("id") % 2 == 0, "EXC").otherwise("INH").alias("synapse_class"),
    )
    classes = {
        "EXC": {"query": {"synapse_class": "EXC"}, "limit": 100},
        "INH": {"query": {"synapse_class": "INH"}},  # no limit
    }
    out1 = extract_neurons(nodes, classes, seed=7).toPandas()
    out2 = extract_neurons(nodes, classes, seed=7).toPandas()
    exc1 = out1[out1.neuron_class == "EXC"]
    assert len(exc1) == 100                      # exact size
    assert (exc1.gid % 2 == 0).all()             # right class
    assert len(out1[out1.neuron_class == "INH"]) == 10000  # untouched
    assert sorted(exc1.gid) == sorted(out2[out2.neuron_class == "EXC"].gid)
    # dense re-index after sampling
    assert sorted(exc1.neuron_class_index) == list(range(100))
    # spread: samples shouldn't all come from one end of the range
    assert exc1.gid.min() < 5000 and exc1.gid.max() > 15000


def test_campaign_skips_empty_paths_and_dedupes_circuits(spark):
    """Reference semantics: runs with empty simulation_path are excluded
    and ids stay dense; distinct circuit configs get distinct circuit_ids
    (extract/simulations.py:22-27,61-112)."""
    from blueetl_spark.sources.campaign import SimulationCampaign

    c = SimulationCampaign.from_dict({"data": [
        {"simulation_path": "/sim0", "seed": 1, "circuit_config": "/circA"},
        {"simulation_path": "", "seed": 2, "circuit_config": "/circA"},
        {"simulation_path": "/sim2", "seed": 3, "circuit_config": "/circB"},
    ]})
    got = c.to_simulations_df(spark).toPandas().sort_values("simulation_id")
    # reference parity: ids assigned BEFORE dropping empty paths -> gapped
    assert got.simulation_id.tolist() == [0, 2]
    assert got.simulation_path.tolist() == ["/sim0", "/sim2"]
    assert got.circuit_id.tolist() == [0, 1]          # per distinct circuit
    assert got.seed.tolist() == [1, 3]


def test_multi_table_lsh_superset_of_single_table(spark):
    """OR-amplification: candidates with L tables contain the single-table
    candidates, and the output has no duplicate pairs."""
    import numpy as np
    from blueetl_spark.operators import dedup

    rng = np.random.default_rng(3)
    base = rng.standard_normal((40, 16))
    rows = []
    for i, b in enumerate(base):
        rows.append((2 * i, b.astype(float).tolist()))
        rows.append((2 * i + 1, (b + rng.standard_normal(16) * 0.05).tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    one = dedup.embedding_near_dup(
        emb, threshold=0.9, method="lsh", n_planes=6, n_tables=1
    ).toPandas()
    many = dedup.embedding_near_dup(
        emb, threshold=0.9, method="lsh", n_planes=6, n_tables=6
    ).toPandas()
    p1 = set(zip(one.id_a, one.id_b))
    pn = set(zip(many.id_a, many.id_b))
    assert p1 <= pn
    assert len(pn) > len(p1)  # amplification finds more true pairs here
    assert not many.duplicated(["id_a", "id_b"]).any()
    exact = dedup.embedding_near_dup(emb, threshold=0.9).toPandas()
    assert pn <= set(zip(exact.id_a, exact.id_b))  # no false positives


@pytest.fixture(scope="module")
def ts_encoding_dirs(tmp_path_factory):
    """The same 8 logical events written under both physical ts encodings
    the generator has shipped: TIMESTAMP(NANOS) (read as bigint via the
    nanosAsLong session flag) and timestamp[us]."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0_us = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z
    ms_offsets = [0, 1, 999, 43_200_000, 86_399_999, 86_400_000,
                  100_000_000, 600_000_000]
    base = {
        "event_id": pa.array(range(len(ms_offsets)), pa.int64()),
        "user_id": pa.array([i % 3 for i in range(len(ms_offsets))], pa.int64()),
        "event_type": pa.array(["click"] * len(ms_offsets)),
        "value": pa.array([float(i) for i in range(len(ms_offsets))]),
    }
    dirs = {}
    for unit in ("ns", "us"):
        scale = 1_000_000 if unit == "ns" else 1_000
        ts = pa.array([t0_us // 1_000 * scale + m * scale for m in ms_offsets],
                      pa.timestamp(unit))
        d = tmp_path_factory.mktemp(f"enc_{unit}")
        pq.write_table(pa.table({**base, "ts": ts}), str(d / "events.parquet"),
                       store_schema=False)
        dirs[unit] = str(d)
    return dirs, ms_offsets


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_events_norm_cross_encoding(spark, ts_encoding_dirs, unit):
    """_events_norm yields identical integer-ms times for both physical
    encodings, with and without a time_range envelope; with an envelope
    the predicate reaches the parquet scan (PushedFilters on raw ts)."""
    from blueetl_spark import queries as Q
    from tests.test_plans import _formatted_plan

    dirs, ms_offsets = ts_encoding_dirs
    expect_type = "bigint" if unit == "ns" else None
    ev = Q._events_norm(spark, dirs[unit])
    if expect_type:  # confirm the fixture actually exercises that branch
        from blueetl_spark.sources import tables
        assert dict(tables.load(spark, dirs[unit], "events").dtypes)["ts"] == expect_type
    got = sorted(r.time for r in ev.collect())
    assert got == sorted(float(m) for m in ms_offsets)

    bounded = Q._events_norm(spark, dirs[unit], time_range=(1.0, 86_400_000.0))
    got = sorted(r.time for r in bounded.collect())
    assert got == [1.0, 999.0, 43_200_000.0, 86_399_999.0]
    plan = _formatted_plan(bounded)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any(
        "GreaterThanOrEqual(ts" in l and "LessThan(ts" in l for l in pushed
    ), plan


def test_dense_index_auto_selection(spark, sf_dir):
    """VERDICT r5 #6: two_phase='auto' picks the window path under the
    threshold and the range-partitioned path above it — identical output
    either way, and the plan actually switches."""
    from pyspark.sql import functions as F

    from blueetl_spark.operators.extraction import dense_index
    from blueetl_spark.sources import tables

    customer = tables.load(spark, sf_dir, "customer").select(
        "c_nationkey", "c_custkey"
    )

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    # under the threshold -> window path (one Window node, no Python)
    small = dense_index(customer, ["c_nationkey"], "c_custkey", "idx",
                        two_phase="auto")
    assert "Window" in plan(small) and "MapInPandas" not in plan(small)

    # above the (forced) threshold -> two-phase path: checkpointed range
    # partitioning + broadcast offset join, no Window, no Python
    big = dense_index(customer, ["c_nationkey"], "c_custkey", "idx",
                      two_phase="auto", auto_threshold=0)
    p = plan(big)
    assert "ExistingRDD" in p and "BroadcastHashJoin" in p
    assert "Window" not in p and "MapInPandas" not in p

    keys = ["c_nationkey", "c_custkey"]
    pd.testing.assert_frame_equal(
        small.toPandas().sort_values(keys, ignore_index=True),
        big.toPandas().sort_values(keys, ignore_index=True),
        check_dtype=False,
    )

    # the gate query itself stays green through both auto outcomes
    from blueetl_spark.queries import q_customer_class_index
    import blueetl_spark.operators.extraction as ext

    gate = q_customer_class_index(spark, sf_dir).toPandas()
    orig = ext.dense_index
    try:
        ext.dense_index = lambda df, g, o, c, **kw: orig(
            df, g, o, c, **{**kw, "auto_threshold": 0}
        )
        gate_two_phase = q_customer_class_index(spark, sf_dir).toPandas()
    finally:
        ext.dense_index = orig
    keys = ["c_nationkey", "c_custkey"]
    pd.testing.assert_frame_equal(
        gate.sort_values(keys, ignore_index=True),
        gate_two_phase.sort_values(keys, ignore_index=True),
    )


def test_dense_index_high_cardinality_bounds(spark, sf_dir):
    """VERDICT r6 #3: the two-phase side table is n_partitions x n_groups
    rows collected to the driver. A high-cardinality group column must
    (a) not be auto-selected onto the two-phase path and (b) fail fast
    and actionably on the explicit path once past max_stat_rows."""
    import pytest

    from blueetl_spark.operators.extraction import dense_index
    from blueetl_spark.sources import tables

    # c_custkey is unique -> n_groups == n_rows (the per-customer
    # numbering scenario from the verdict, scaled down)
    customer = tables.load(spark, sf_dir, "customer").select(
        "c_nationkey", "c_custkey"
    )

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    # auto: rows exceed the (forced) threshold but cardinality x n_parts
    # exceeds the cap -> window path, no driver collect
    auto = dense_index(
        customer, ["c_custkey"], "c_nationkey", "idx",
        two_phase="auto", auto_threshold=0, max_stat_rows=100,
    )
    assert "Window" in plan(auto)

    # explicit two_phase=True: bounded collect raises with the pointer
    with pytest.raises(ValueError, match="max_stat_rows"):
        dense_index(
            customer, ["c_custkey"], "c_nationkey", "idx",
            two_phase=True, max_stat_rows=100,
        )

    # a bounded cardinality still runs two-phase under the same cap
    ok = dense_index(
        customer, ["c_nationkey"], "c_custkey", "idx",
        two_phase=True, max_stat_rows=100_000,
    )
    assert ok.count() == customer.count()
