"""Tests: etl helpers (J2/A7/U1/U5/O4), stores (S7/S8), xarray round-trip
(S2), spikes converter (S10), CLI validate-config."""

import json

import pytest
from pyspark.sql import functions as F

from blueetl_spark.functions import etl
from blueetl_spark.plans import stores
from blueetl_spark.sources.campaign import SimulationCampaign


# -- etl helpers -------------------------------------------------------------


def test_distinct_groups_across_frames(spark):
    neurons = spark.createDataFrame(
        [(0, "EXC", 1), (0, "EXC", 2), (0, "INH", 3)],
        "circuit_id int, neuron_class string, gid long",
    )
    windows = spark.createDataFrame(
        [(0, 0, "w1"), (0, 0, "w2"), (1, 0, "w1")],
        "simulation_id int, circuit_id int, window string",
    )
    got = etl.distinct_groups(
        [windows, neurons], ["simulation_id", "circuit_id", "neuron_class", "window"]
    ).toPandas()
    # windows has (0,w1),(0,w2),(1,w1); each crossed with the circuit's
    # 2 classes via the left-join chain on circuit_id
    assert len(got) == 6
    assert set(zip(got.simulation_id, got.neuron_class, got.window)) == {
        (0, "EXC", "w1"), (0, "EXC", "w2"), (0, "INH", "w1"),
        (0, "INH", "w2"), (1, "EXC", "w1"), (1, "INH", "w1"),
    }
    assert got.duplicated().sum() == 0
    assert list(got.columns) == [
        "simulation_id", "circuit_id", "neuron_class", "window",
    ]


def test_distinct_groups_missing_column_raises(spark):
    df = spark.createDataFrame([(1,)], "a int")
    with pytest.raises(ValueError, match="not found"):
        etl.distinct_groups([df], ["a", "zz"])


def test_first_and_one(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "b")], "id int, s string")
    assert etl.first(df, s="b").id in (2, 3)
    assert etl.one(df, id=2).s == "b"
    with pytest.raises(ValueError, match="found 2"):
        etl.one(df, s="b")
    with pytest.raises(ValueError, match="found 0"):
        etl.one(df, s="zzz")


def test_smart_concat_and_concat_features(spark):
    a = spark.createDataFrame([(1, 10.0)], "gid int, rate double")
    b = spark.createDataFrame([(2, 0.5)], "gid int, cv double")
    u = etl.smart_concat([a, b]).toPandas().sort_values("gid")
    assert set(u.columns) == {"gid", "rate", "cv"}
    assert u.cv.isna().tolist() == [True, False]

    cf = etl.concat_features(
        [a, a], [{"params.latency.onset": 1.0}, {"params.latency.onset": 2.0}]
    ).toPandas()
    assert sorted(cf.params_id) == [0, 1]
    assert sorted(cf.onset) == [1.0, 2.0]


def test_condition_codes(spark):
    df = spark.createDataFrame(
        [(1.0, "x"), (2.0, "y"), (1.0, "y")], "ca double, seed string"
    )
    got = etl.condition_codes(df, ["ca", "seed"]).toPandas()
    assert set(zip(got.ca, got.ca_code)) == {(1.0, 0), (2.0, 1)}
    assert set(zip(got.seed, got.seed_code)) == {("x", 0), ("y", 1)}


def test_groupby_except(spark):
    df = spark.createDataFrame([(0, "w", 1), (0, "w", 2)], "sim int, w string, gid int")
    out = etl.groupby_except(df, ["sim", "w", "gid"], ["gid"]).count().toPandas()
    assert len(out) == 1 and out["count"][0] == 2


# -- stores ------------------------------------------------------------------


@pytest.mark.parametrize("kind", ["parquet", "feather", "orc", "jsonl"])
def test_store_round_trip(spark, tmp_path, kind):
    df = spark.createDataFrame(
        [(1, "a", [1.0, 2.0]), (2, "b", [])],
        "gid long, s string, times array<double>",
    )
    store = stores.get_store(kind, tmp_path / kind)
    assert not store.exists("t")
    assert store.checksum("t") is None
    store.dump(df, "t")
    assert store.exists("t")
    c1 = store.checksum("t")
    assert c1
    back = store.load(spark, "t").orderBy("gid").toPandas()
    assert back.gid.tolist() == [1, 2]
    assert back.s.tolist() == ["a", "b"]
    assert [list(x) for x in back.times] == [[1.0, 2.0], []]
    store.delete("t")
    assert not store.exists("t")


def test_hdf_store_roundtrip_or_clear_error(spark, tmp_path):
    """With pytables: dump/load round-trips. Without: both ends raise the
    actionable error naming the alternative stores."""
    from blueetl_spark.plans.stores import _have_pytables

    store = stores.get_store("hdf", tmp_path)
    df = spark.range(3).selectExpr("id", "cast(id * 1.5 as double) AS v")
    if _have_pytables():
        store.dump(df, "t")
        back = store.load(spark, "t").orderBy("id").toPandas()
        assert back.v.tolist() == [0.0, 1.5, 3.0]
        assert store.checksum("t")
    else:
        with pytest.raises(NotImplementedError, match="parquet"):
            store.dump(df, "t")
        with pytest.raises(NotImplementedError, match="feather"):
            store.load(spark, "t")
    with pytest.raises(ValueError, match="unknown store"):
        stores.get_store("nope", tmp_path)


# -- xarray campaign round-trip ---------------------------------------------


def test_xarray_dict_product_layout():
    d = {
        "name": "c",
        "attrs": {"k": "v"},
        "dims": ["ca", "seed"],
        "coords": {
            "ca": {"dims": ["ca"], "data": [1.0, 2.0]},
            "seed": {"dims": ["seed"], "data": [3, 4]},
        },
        "data": [["p/0", "p/1"], ["p/2", None]],
    }
    c = SimulationCampaign.from_dict(d)
    assert [r["simulation_path"] for r in c.data] == ["p/0", "p/1", "p/2", ""]
    assert c.data[2] == {"ca": 2.0, "seed": 3, "simulation_path": "p/2"}
    back = c.to_xarray_dict()
    assert back["dims"] == ["ca", "seed"]
    assert back["data"] == [["p/0", "p/1"], ["p/2", ""]]
    assert SimulationCampaign.from_dict(back).data == c.data


def test_xarray_dict_coupled_layout():
    d = {
        "name": "c",
        "attrs": {"__coupled__": "coupled"},
        "dims": ["coupled"],
        "coords": {
            "ca": {"dims": ["coupled"], "data": [1.0, 2.0]},
            "seed": {"dims": ["coupled"], "data": [7, 8]},
        },
        "data": ["p/0", "p/1"],
    }
    c = SimulationCampaign.from_dict(d)
    assert c.data == [
        {"ca": 1.0, "seed": 7, "simulation_path": "p/0"},
        {"ca": 2.0, "seed": 8, "simulation_path": "p/1"},
    ]
    back = c.to_xarray_dict()
    assert back["dims"] == ["coupled"]
    assert SimulationCampaign.from_dict(back).data == c.data


# -- convert-spikes ----------------------------------------------------------


def test_convert_spikes_bundle(spark, tmp_path):
    from blueetl_spark.sources.convert_spikes import convert_spikes

    csv = tmp_path / "spikes.csv"
    csv.write_text(
        "timestamps,node_ids\n10.5,0\n11.0,2\n12.25,1\n13.0,2\n"
    )
    out = tmp_path / "bundle"
    stats = convert_spikes(spark, csv, out)
    assert stats["rows"] == 4
    assert stats["unique_ids"] == 3
    assert stats["max_id"] == 2
    assert stats["max_timestamp"] == 13.0
    spikes = spark.read.parquet(str(out / "simulation" / "spikes.parquet"))
    assert spikes.count() == 4
    nodes = spark.read.parquet(str(out / "circuit" / "nodes.parquet"))
    assert nodes.count() == 3  # gids 0..max_id
    campaign = json.loads((out / "simulation_campaign_config.json").read_text())
    c = SimulationCampaign.from_dict(campaign)
    assert len(c.data) == 1
    analysis = json.loads((out / "analysis_config.json").read_text())
    assert analysis["analysis"]["spikes"]["extraction"]["windows"]["full"][
        "bounds"
    ] == [0.0, 13.0]


# -- CLI ---------------------------------------------------------------------


def test_cli_validate_config(tmp_path, capsys):
    from blueetl_spark.__main__ import main

    good = tmp_path / "good.json"
    good.write_text(json.dumps({
        "version": 4,
        "simulation_campaign": {"data": [{"simulation_path": "/s", "seed": 1}]},
        "analysis": {"spikes": {"extraction": {
            "windows": {"w": {"bounds": [0, 10]}},
            "neuron_classes": {"all": {"query": {}}},
        }, "features": [{"function": "blueetl_spark.features.by_gid",
                         "groupby": ["simulation_id"]}]}}
    }))
    assert main(["validate-config", str(good)]) == 0
    assert "valid" in capsys.readouterr().out

    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({
        "version": 4,
        "simulation_campaign": "/c.json",
        "analysis": {"spikes": {"extraction": {
            "windows": {"w": {"bounds": [10]}},
        }}}
    }))
    assert main(["validate-config", str(bad)]) == 1
    err = capsys.readouterr().err
    assert "bounds" in err and "neuron_classes" in err


def test_cli_run_end_to_end(spark, tmp_path):
    """`python -m blueetl_spark run` writes every repo + feature table."""
    import pyspark.sql.functions as F
    from blueetl_spark.__main__ import main

    ev = spark.range(500).select(
        (F.col("id") % 2).cast("smallint").alias("simulation_id"),
        # decorrelate gid parity from simulation parity
        (F.expr("id div 2") % 20).alias("gid"),
        (F.rand(3) * 100).alias("time"),
    )
    nodes = spark.range(20).select(
        F.col("id").alias("node_id"),
        F.lit(0).cast("smallint").alias("circuit_id"),
        F.when(F.col("id") % 2 == 0, "EXC").otherwise("INH").alias("synapse_class"),
    )
    ev.write.parquet(str(tmp_path / "events"))
    nodes.write.parquet(str(tmp_path / "nodes"))
    cfg = tmp_path / "config.json"
    cfg.write_text(json.dumps({
        "simulation_campaign": {"data": [
            {"simulation_path": "/sim0"}, {"simulation_path": "/sim1"},
        ]},
        "analysis": {"spikes": {
            "extraction": {
                "neuron_classes": {"EXC": {"query": {"synapse_class": "EXC"}},
                                   "INH": {"query": {"synapse_class": "INH"}}},
                "windows": {"w1": {"bounds": [0.0, 100.0]}},
            },
            "features": [{"function": "blueetl_spark.features.by_neuron_class"}],
        }},
    }))
    rc = main([
        "run", str(cfg),
        "--nodes", str(tmp_path / "nodes"),
        "--events", str(tmp_path / "events"),
        "--output", str(tmp_path / "out"),
    ])
    assert rc == 0
    out = tmp_path / "out" / "spikes"
    for t in ["simulations", "neurons", "neuron_classes", "windows", "report"]:
        df = spark.read.parquet(str(out / "repo" / f"{t}.parquet"))
        assert df.count() > 0, t
    feats = spark.read.parquet(str(out / "features" / "by_neuron_class.parquet"))
    # 2 sims x 2 classes x 1 window
    assert feats.count() == 4


def test_cli_run_stage_and_cache_flags(spark, tmp_path, capsys):
    """Reference-parity run flags: --no-calculate skips features,
    --clear-cache wipes a stale cache, --readonly-cache forbids writes."""
    import pyspark.sql.functions as F
    from blueetl_spark.__main__ import main

    ev = spark.range(200).select(
        F.lit(0).cast("smallint").alias("simulation_id"),
        (F.col("id") % 10).alias("gid"),
        (F.rand(5) * 50).alias("time"),
    )
    nodes = spark.range(10).select(
        F.col("id").alias("node_id"),
        F.lit(0).cast("smallint").alias("circuit_id"),
        F.lit("EXC").alias("synapse_class"),
    )
    ev.write.parquet(str(tmp_path / "events"))
    nodes.write.parquet(str(tmp_path / "nodes"))
    cfg = tmp_path / "config.json"
    cfg.write_text(json.dumps({
        "simulation_campaign": {"data": [{"simulation_path": "/sim0"}]},
        "analysis": {"spikes": {
            "extraction": {
                "neuron_classes": {"EXC": {"query": {"synapse_class": "EXC"}}},
                "windows": {"w1": {"bounds": [0.0, 50.0]}},
            },
            "features": [{"function": "blueetl_spark.features.by_gid"}],
        }},
    }))
    base = ["run", str(cfg), "--nodes", str(tmp_path / "nodes"),
            "--events", str(tmp_path / "events")]
    cache = tmp_path / "cache"
    # warm the repo cache only, skipping features
    rc = main(base + ["--output", str(tmp_path / "o1"),
                      "--cache", str(cache), "--no-calculate"])
    assert rc == 0
    assert not (tmp_path / "o1" / "spikes" / "features").exists()
    assert (cache / "spikes" / "report.meta.json").exists()
    # readonly + uncached features = refuse to write (reference semantics:
    # use the existing cache if possible, or raise)
    with pytest.raises(PermissionError, match="readonly"):
        main(base + ["--output", str(tmp_path / "o2"),
                     "--cache", str(cache), "--readonly-cache"])
    # warm features too, then readonly succeeds entirely from cache
    rc = main(base + ["--output", str(tmp_path / "o2"), "--cache", str(cache)])
    assert rc == 0
    rc = main(base + ["--output", str(tmp_path / "o3"),
                      "--cache", str(cache), "--readonly-cache"])
    assert rc == 0
    # clear-cache wipes and rebuilds
    rc = main(base + ["--output", str(tmp_path / "o4"),
                      "--cache", str(cache), "--clear-cache"])
    assert rc == 0
    assert (cache / "spikes" / "report.meta.json").exists()


def test_campaign_real_xarray_interop():
    """from_xarray accepts any DataArray-shaped object (duck-typed via
    to_dict); to_xarray builds one through an injectable xarray module —
    the real package, when installed, plugs into the same seam."""

    class _FakeDataArray:
        last_from_dict = None

        def __init__(self, d):
            self._d = d

        def to_dict(self):
            return self._d

        @classmethod
        def from_dict(cls, d):
            cls.last_from_dict = d
            return cls(d)

    class _FakeXr:
        DataArray = _FakeDataArray

    d = {
        "name": "c",
        "attrs": {"k": "v"},
        "dims": ["ca", "seed"],
        "coords": {
            "ca": {"dims": ["ca"], "data": [1.0, 2.0]},
            "seed": {"dims": ["seed"], "data": [3, 4]},
        },
        "data": [["p/0", "p/1"], ["p/2", None]],
    }
    c = SimulationCampaign.from_xarray(_FakeDataArray(d))
    assert [r["simulation_path"] for r in c.data] == ["p/0", "p/1", "p/2", ""]
    arr = c.to_xarray(xr=_FakeXr)
    assert isinstance(arr, _FakeDataArray)
    assert _FakeDataArray.last_from_dict["dims"] == ["ca", "seed"]
    # full round trip through the object layer
    assert SimulationCampaign.from_xarray(arr).data == c.data


@pytest.mark.parametrize("kind", ["feather", "hdf"])
def test_driver_store_size_gate_refuses_big_tables(spark, tmp_path, kind):
    """Feather/HDF materialize through the driver; above max_driver_rows
    they refuse with an error naming the parquet alternative instead of
    OOMing (mirror of dedup.py's max_broadcast_rows gate)."""
    if kind == "hdf" and not stores._have_pytables():
        pytest.skip("pytables not installed; gate unreachable behind probe")
    store = stores.STORES[kind](tmp_path / kind, max_driver_rows=10)
    with pytest.raises(ValueError, match="parquet"):
        store.dump(spark.range(11), "big")
    # at exactly the cap it goes through
    store.dump(spark.range(10), "ok")
    assert store.load(spark, "ok").count() == 10


def test_cli_profile(spark, tmp_path, capsys):
    import json

    from blueetl_spark.__main__ import main as cli_main

    path = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [(1, "a", 2.0), (2, "b", None), (3, "a", 4.0)],
        "k long, s string, v double",
    ).write.parquet(path)

    assert cli_main(["profile", path]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["exact"] is True
    cols = {c["column"]: c for c in out["columns"]}
    assert cols["k"]["n_distinct"] == 3
    assert cols["v"]["n_null"] == 1 and cols["v"]["avg_value"] == 3.0

    assert cli_main(["profile", path, "--sketch", "--columns", "s"]) == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["exact"] is False
    assert [c["column"] for c in out2["columns"]] == ["s"]
    assert out2["columns"][0]["n_distinct"] == 2


def test_cli_index_purge_and_compact(spark, tmp_path, capsys):
    """Takedown workflow through the CLI: purge tombstones ids out of a
    MinHash index, compact folds them in; both print one JSON line."""
    import json

    from blueetl_spark.__main__ import main as cli_main
    from blueetl_spark.operators.dedup import incremental_minhash

    idx = str(tmp_path / "mh_idx")
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six seven")],
        "doc_id long, text string",
    )
    assert incremental_minhash(docs, idx).count() == 0
    ids_path = str(tmp_path / "purge_ids.parquet")
    spark.createDataFrame([(1,)], "doc_id long").write.parquet(ids_path)

    assert cli_main(["index-purge", idx, ids_path]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"index": idx, "purged_ids": 1}
    probe = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    assert incremental_minhash(probe, idx, update=False).count() == 0

    assert cli_main(["index-compact", idx]) == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["rows"] == {"signatures": 1, "buckets": 1 * 16}


def test_jsonl_store_schema_sidecar_preserves_types(spark, tmp_path):
    """JSON would widen/stringify types on re-inference; the sidecar
    schema pins them (and skips the inference scan)."""
    from pyspark.sql import types as T

    df = spark.createDataFrame(
        [(1, 2.5, True, [1, 2])],
        "i long, d double, b boolean, arr array<int>",
    )
    store = stores.get_store("jsonl", tmp_path)
    store.dump(df, "t")
    back = store.load(spark, "t")
    assert back.schema == df.schema
    assert isinstance(back.schema["arr"].dataType.elementType, T.IntegerType)


def test_upsert_parquet_merge_semantics(spark, tmp_path):
    """Insert + update + carry-over; replaying the same batch is a
    no-op on content; duplicate keys in one batch raise; an interrupted
    publish recovers to old-or-new, never a mix."""
    from blueetl_spark.plans import atomic
    from blueetl_spark.plans.stores import upsert_parquet

    path = str(tmp_path / "dim.parquet")
    t0 = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "k long, name string, v double"
    )
    stats = upsert_parquet(spark, path, t0, "k")
    assert stats == {"inserted": 2, "carried": 0}

    up = spark.createDataFrame(
        [(2, "B", 20.0), (3, "c", 3.0)], "k long, name string, v double"
    )
    stats = upsert_parquet(spark, path, up, "k")
    assert stats == {"inserted": 2, "carried": 1}
    got = {
        r.k: (r.name, r.v)
        for r in spark.read.parquet(path).collect()
    }
    assert got == {1: ("a", 1.0), 2: ("B", 20.0), 3: ("c", 3.0)}

    # replay: same content after the rewrite
    upsert_parquet(spark, path, up, "k")
    got2 = {r.k: (r.name, r.v) for r in spark.read.parquet(path).collect()}
    assert got2 == got

    # duplicate keys in one batch are ambiguous -> raise
    dup = spark.createDataFrame(
        [(5, "x", 1.0), (5, "y", 2.0)], "k long, name string, v double"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        upsert_parquet(spark, path, dup, "k")

    # delete_missing: snapshot-replace keeps only the batch's keys
    snap = spark.createDataFrame([(9, "z", 9.0)], "k long, name string, v double")
    upsert_parquet(spark, path, snap, "k", delete_missing=True)
    assert spark.read.parquet(path).count() == 1

    # simulate a crash between the two renames: cur gone, cur.old intact
    import shutil

    shutil.move(path, path + ".old")
    before = spark.read.parquet(path + ".old").collect()
    upsert_parquet(
        spark, path,
        spark.createDataFrame([(10, "w", 1.0)], "k long, name string, v double"),
        "k",
    )
    rows = spark.read.parquet(path).collect()
    assert {r.k for r in rows} == {9, 10}  # recovered old state + new batch
    assert not atomic.fs_exists(spark, path + ".old")
    assert len(before) == 1


def test_scd2_history_snapshots_and_replay(spark, tmp_path):
    """Three update batches build queryable history; snapshots at each
    time see the right versions; a replayed batch folds out; a stale
    (older-effective) update never rewrites newer history."""
    from blueetl_spark.plans.stores import scd2_snapshot, upsert_scd2

    path = str(tmp_path / "scd2.parquet")
    ddl = "k long, name string, effective_ts double"
    b1 = spark.createDataFrame([(1, "v1", 10.0), (2, "w1", 10.0)], ddl)
    s = upsert_scd2(spark, path, b1, "k")
    assert s == {"applied": 2, "dropped_stale": 0, "closed": 0}

    b2 = spark.createDataFrame([(1, "v2", 20.0)], ddl)
    s = upsert_scd2(spark, path, b2, "k")
    assert s == {"applied": 1, "dropped_stale": 0, "closed": 1}

    # replay of b2: dropped, content unchanged
    s = upsert_scd2(spark, path, b2, "k")
    assert s["applied"] == 0 and s["dropped_stale"] == 1
    # stale update (older than current version): also dropped
    stale = spark.createDataFrame([(1, "old", 15.0)], ddl)
    assert upsert_scd2(spark, path, stale, "k")["applied"] == 0

    at_15 = {r.k: r.name for r in scd2_snapshot(spark, path, 15.0).collect()}
    assert at_15 == {1: "v1", 2: "w1"}
    at_25 = {r.k: r.name for r in scd2_snapshot(spark, path, 25.0).collect()}
    assert at_25 == {1: "v2", 2: "w1"}
    current = {r.k: r.name for r in scd2_snapshot(spark, path).collect()}
    assert current == at_25
    # before any history: empty
    assert scd2_snapshot(spark, path, 5.0).count() == 0
    # full table holds 3 versions
    assert spark.read.parquet(path).count() == 3


def test_scd2_never_broadcasts_table_slice(spark, tmp_path):
    """Broadcast-direction guard: the SCD2 merge must broadcast only
    batch-derived frames — the table's current slice (which grows with
    the table, not the batch) is first narrowed by a broadcast SEMI join
    on the batch keys, never broadcast whole."""
    from pyspark.sql import functions as F

    from blueetl_spark.plans.stores import _scd2_merge_frames, upsert_scd2

    path = str(tmp_path / "scd2_dir.parquet")
    ddl = "k long, name string, effective_ts double"
    seed = spark.range(500).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("name"),
        F.lit(10.0).alias("effective_ts"),
    )
    upsert_scd2(spark, path, seed, "k")

    cur = spark.read.parquet(path)
    batch = spark.createDataFrame([(1, "new", 20.0), (999, "ins", 20.0)], ddl)
    eff = F.col("effective_ts").cast("double")
    new_rows = batch.select(
        "*", eff.alias("__valid_from"),
        F.lit(None).cast("double").alias("__valid_to"),
    ).drop("effective_ts")
    merged, live_upd = _scd2_merge_frames(cur, new_rows, batch, ["k"], eff)
    plan = merged._jdf.queryExecution().executedPlan().toString()
    # the semi narrowing must exist, and the stale-check broadcast must
    # sit ABOVE it: no broadcast subtree may contain a raw table scan
    # without the LeftSemi reduction
    assert "LeftSemi" in plan
    # semantics unchanged with a table current-slice >> batch
    assert live_upd.count() == 2
    got = {(r.k, r.name, r["__valid_to"]) for r in merged.collect()
           if r.k in (1, 999)}
    assert (1, "new", None) in got and (999, "ins", None) in got
    assert (1, "v1", 20.0) in got


def test_apply_cdc_last_writer_wins_and_contract(spark):
    """CDC apply: deletes remove, the later sequence wins a
    double-update, insert-then-delete in one batch ends deleted,
    untouched rows pass through unchanged, new keys append — and a tied
    per-key sequence raises instead of picking a winner silently."""
    import pytest as _pytest
    from pyspark.sql import functions as F  # noqa: F401

    from blueetl_spark.plans.stores import apply_cdc

    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        "k long, s string, v long",
    )
    changes = spark.createDataFrame(
        [
            (1, "a", 10, "D", 1),          # delete
            (2, "b", 21, "U", 1),          # stale update...
            (2, "b", 22, "U", 2),          # ...later one wins
            (5, "e", 50, "I", 1),          # new key
            (6, "f", 60, "I", 1),          # insert...
            (6, "f", 60, "D", 2),          # ...then delete: ends absent
        ],
        "k long, s string, v long, op string, seq int",
    )
    snap = {
        r["k"]: (r["s"], r["v"])
        for r in apply_cdc(base, changes, "k", "seq").collect()
    }
    assert snap == {2: ("b", 22), 3: ("c", 30), 4: ("d", 40), 5: ("e", 50)}

    tied = spark.createDataFrame(
        [(7, "g", 1, "U", 1), (7, "g", 2, "U", 1)],
        "k long, s string, v long, op string, seq int",
    )
    with _pytest.raises(ValueError, match="tied seq"):
        apply_cdc(base, tied, "k", "seq")

    with _pytest.raises(ValueError, match="missing columns"):
        apply_cdc(base, changes.drop("op"), "k", "seq")


def test_upsert_scd2_stats_false_skips_counters(spark, tmp_path):
    """stats=False skips the applied/dropped_stale/closed counter jobs
    (bulk-load fast path) while producing the identical table state;
    the duplicate-key guard still fires."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from blueetl_spark.plans.stores import scd2_snapshot, upsert_scd2

    path = str(tmp_path / "scd2_nostats")
    b1 = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 1.0)], "k int, v string, effective_ts double"
    )
    s = upsert_scd2(spark, path, b1, "k", stats=False)
    assert s == {"applied": None, "dropped_stale": None, "closed": None}
    b2 = spark.createDataFrame(
        [(1, "a2", 2.0), (3, "c", 2.0)], "k int, v string, effective_ts double"
    )
    s = upsert_scd2(spark, path, b2, "k", stats=False)
    assert s == {"applied": None, "dropped_stale": None, "closed": None}
    cur = {(r.k, r.v) for r in scd2_snapshot(spark, path).collect()}
    assert cur == {(1, "a2"), (2, "b"), (3, "c")}
    # full history intact: the closed k=1 version is queryable as-of 1.5
    asof = {(r.k, r.v) for r in scd2_snapshot(spark, path, at=1.5).collect()}
    assert asof == {(1, "a"), (2, "b")}
    # replayed batch still folds out without the stat jobs
    s = upsert_scd2(spark, path, b2, "k", stats=False)
    assert {(r.k, r.v) for r in scd2_snapshot(spark, path).collect()} == cur
    # duplicate keys still raise
    dup = spark.createDataFrame(
        [(5, "x", 3.0), (5, "y", 3.0)], "k int, v string, effective_ts double"
    )
    with _pytest.raises(ValueError, match="duplicate keys"):
        upsert_scd2(spark, path, dup, "k", stats=False)
