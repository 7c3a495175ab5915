"""Adapter layer: parquet (scale path) + SONATA h5 (ingest path).

The SONATA parsing is exercised with a dict-backed fake h5 module so the
layout logic is genuinely tested in images without h5py; the real h5py
plugs into the same seam.
"""

import numpy as np
import pytest

from blueetl_spark.adapters import (
    AdapterError,
    ParquetAdapter,
    SonataAdapter,
)


# -- fake h5: the minimal surface the adapter touches ------------------------
class _FakeDataset:
    def __init__(self, values):
        self._v = np.asarray(values)

    def __array__(self, dtype=None):
        return self._v if dtype is None else self._v.astype(dtype)

    def __len__(self):
        return len(self._v)


class _FakeGroup(dict):
    def keys(self):
        return list(super().keys())


class _FakeFile:
    def __init__(self, tree):
        self._tree = tree

    def __enter__(self):
        return self._tree

    def __exit__(self, *exc):
        return False


class _FakeH5:
    def __init__(self, tree):
        self._tree = tree

    def File(self, path, mode):
        return _FakeFile(self._tree)


def _wrap(obj):
    if isinstance(obj, dict):
        return _FakeGroup({k: _wrap(v) for k, v in obj.items()})
    return _FakeDataset(obj)


NODES_TREE = _wrap(
    {
        "nodes": {
            "popA": {
                "node_type_id": [100, 100, 101, 101],
                "0": {
                    "synapse_class": [b"EXC", b"INH", b"EXC", b"INH"],
                    "layer": [1, 1, 2, 2],
                    "@library": {"ignored": [1]},
                },
            }
        }
    }
)

SPIKES_POP_TREE = _wrap(
    {
        "spikes": {
            "popA": {
                "timestamps": [5.0, 1.5, 9.25],
                "node_ids": [2, 0, 3],
            }
        }
    }
)

SPIKES_LEGACY_TREE = _wrap(
    {"spikes": {"timestamps": [2.0, 4.0], "gids": [1, 1]}}
)


def _sonata(spark, tmp_path, tree_nodes=None, tree_spikes=None):
    # touch real files so exists() and the path checks pass
    np_, sp_ = tmp_path / "nodes.h5", tmp_path / "spikes.h5"
    np_.write_bytes(b"")
    sp_.write_bytes(b"")
    fake = _FakeH5(tree_nodes if tree_nodes is not None else tree_spikes)
    return SonataAdapter(spark, np_, sp_, h5=fake)


def test_sonata_nodes_single_group_layout(spark, tmp_path):
    a = _sonata(spark, tmp_path, tree_nodes=NODES_TREE)
    pdf = a.nodes().orderBy("node_id").toPandas()
    assert pdf.node_id.tolist() == [0, 1, 2, 3]
    assert pdf.synapse_class.tolist() == ["EXC", "INH", "EXC", "INH"]
    assert pdf.layer.tolist() == [1, 1, 2, 2]
    assert "@library" not in pdf.columns
    assert pdf.circuit_id.unique().tolist() == [0]


def test_sonata_spikes_population_layout(spark, tmp_path):
    a = _sonata(spark, tmp_path, tree_spikes=SPIKES_POP_TREE)
    pdf = a.events().orderBy("time").toPandas()
    assert pdf.gid.tolist() == [0, 2, 3]
    assert pdf.time.tolist() == [1.5, 5.0, 9.25]
    assert pdf.simulation_id.unique().tolist() == [0]


def test_sonata_spikes_legacy_layout(spark, tmp_path):
    a = _sonata(spark, tmp_path, tree_spikes=SPIKES_LEGACY_TREE)
    pdf = a.events().toPandas()
    assert pdf.gid.tolist() == [1, 1]


def test_sonata_population_selection_errors(spark, tmp_path):
    two_pops = _wrap(
        {
            "nodes": {
                "a": {"node_type_id": [1], "0": {"x": [0.0]}},
                "b": {"node_type_id": [2], "0": {"x": [1.0]}},
            }
        }
    )
    a = _sonata(spark, tmp_path, tree_nodes=two_pops)
    with pytest.raises(AdapterError, match="multiple populations"):
        a.nodes()
    a.population = "nope"
    with pytest.raises(AdapterError, match="not found"):
        a.nodes()
    a.population = "b"
    assert a.nodes().count() == 1


def test_sonata_missing_h5py_is_actionable(spark, tmp_path):
    (tmp_path / "n.h5").write_bytes(b"")
    (tmp_path / "s.h5").write_bytes(b"")
    a = SonataAdapter(spark, tmp_path / "n.h5", tmp_path / "s.h5")
    try:
        import h5py  # noqa: F401

        pytest.skip("h5py present; error branch not reachable")
    except ImportError:
        pass
    with pytest.raises(AdapterError, match="ParquetAdapter"):
        a.nodes()


def test_sonata_to_parquet_feeds_parquet_adapter(spark, tmp_path):
    a = _sonata(spark, tmp_path, tree_nodes=NODES_TREE)
    a2 = _sonata(spark, tmp_path, tree_spikes=SPIKES_POP_TREE)
    a.spikes_path = a2.spikes_path
    # combine: nodes from NODES_TREE, spikes from SPIKES_POP_TREE
    combined_tree = _wrap({})
    combined_tree.update(NODES_TREE)
    combined_tree.update(SPIKES_POP_TREE)
    a._h5 = _FakeH5(combined_tree)
    out = tmp_path / "converted"
    counts = a.to_parquet(out)
    assert counts == {"nodes": 4, "events": 3}
    p = ParquetAdapter(spark, out)
    assert p.exists()
    assert p.nodes().count() == 4
    assert sorted(p.events().columns) >= ["gid", "simulation_id", "time"]


def test_parquet_adapter_on_testdata(spark):
    """The driver testdata dir satisfies the adapter contract after renames
    (user_id -> gid)."""
    p = ParquetAdapter(spark, "/root/testdata/sf0.001")
    assert not p.exists()  # no nodes.parquet there
    ev = p.events()
    assert "gid" in ev.columns and "simulation_id" in ev.columns
    with pytest.raises(AdapterError, match="missing"):
        p.nodes()


# -- distributed ingest: executor-side range reads via the npz stub ----------
def _write_spikes_npz(path, n=10_000, seed=7, layout="pop"):
    rng = np.random.default_rng(seed)
    times = np.sort(rng.uniform(0, 1000, n))
    gids = rng.integers(0, 500, n)
    if layout == "pop":
        np.savez(path, **{"spikes/popA/timestamps": times,
                          "spikes/popA/node_ids": gids})
    else:
        np.savez(path, **{"spikes/timestamps": times, "spikes/gids": gids})
    return times, gids


def test_h5stub_surface(tmp_path):
    from blueetl_spark.adapters import h5stub

    p = tmp_path / "s.npz"
    times, gids = _write_spikes_npz(p, n=100)
    with h5stub.File(str(p)) as f:
        g = f["spikes"]
        assert g.keys() == ["popA"]
        ds = f["spikes/popA/timestamps"]
        assert len(ds) == 100
        assert (ds[10:20] == times[10:20]).all()
        assert f["spikes"]["popA"]["node_ids"][:5].tolist() == gids[:5].tolist()


@pytest.mark.parametrize("layout", ["pop", "legacy"])
def test_sonata_events_distributed_parity(spark, tmp_path, layout):
    """Executor-side chunked reads return exactly the rows of the
    driver-side path, across both SONATA spike layouts, with multiple
    chunks exercised (n >> chunk_rows)."""
    from blueetl_spark.adapters import h5stub
    from blueetl_spark.adapters.sonata import SonataAdapter

    p = tmp_path / "spikes.npz"
    times, gids = _write_spikes_npz(p, n=10_000, layout=layout)
    a = SonataAdapter(spark, None, p)
    out = a.events_distributed(chunk_rows=1500, h5_open=h5stub.File)
    pdf = out.orderBy("time", "gid").toPandas()
    assert len(pdf) == 10_000
    order = np.lexsort((gids, times))
    assert (pdf.gid.to_numpy() == gids[order]).all()
    assert (pdf.time.to_numpy() == times[order]).all()
    assert pdf.simulation_id.unique().tolist() == [0]
    # chunk table: ceil(10000/1500) = 7 partitions feed the read
    assert out.rdd.getNumPartitions() == 7


def _write_nodes_npz(path, n=5_000, seed=11):
    rng = np.random.default_rng(seed)
    layer = rng.integers(1, 7, n)
    x = rng.uniform(0, 100.0, n)
    syn = np.array([b"EXC", b"INH"])[rng.integers(0, 2, n)]
    np.savez(path, **{
        "nodes/popA/node_type_id": np.full(n, 100),
        "nodes/popA/0/layer": layer,
        "nodes/popA/0/x": x,
        "nodes/popA/0/synapse_class": syn,
    })
    return layer, x, syn


def test_sonata_nodes_distributed_parity(spark, tmp_path):
    """Executor-side chunked node reads: multi-chunk table, mixed dtypes
    (int / float / bytes-string), node_id regenerated per chunk — values
    match the raw arrays exactly."""
    from blueetl_spark.adapters import h5stub
    from blueetl_spark.adapters.sonata import SonataAdapter

    p = tmp_path / "nodes.npz"
    layer, x, syn = _write_nodes_npz(p, n=5_000)
    a = SonataAdapter(spark, p, None)
    out = a.nodes_distributed(chunk_rows=800, h5_open=h5stub.File)
    assert out.rdd.getNumPartitions() == 7  # ceil(5000/800)
    pdf = out.orderBy("node_id").toPandas()
    assert len(pdf) == 5_000
    assert pdf.node_id.tolist() == list(range(5_000))
    assert (pdf.layer.to_numpy() == layer).all()
    assert (pdf.x.to_numpy() == x).all()
    assert pdf.synapse_class.tolist() == [s.decode() for s in syn]
    assert pdf.circuit_id.unique().tolist() == [0]


def test_sonata_to_parquet_distributed(spark, tmp_path):
    """to_parquet(distributed=True): both tables through the executor-side
    readers, counts from the write-attached Observation, output readable
    by ParquetAdapter."""
    from blueetl_spark.adapters import h5stub
    from blueetl_spark.adapters.parquet import ParquetAdapter
    from blueetl_spark.adapters.sonata import SonataAdapter

    nodes_p, spikes_p = tmp_path / "nodes.npz", tmp_path / "spikes.npz"
    _write_nodes_npz(nodes_p, n=3_000)
    _write_spikes_npz(spikes_p, n=4_000)
    a = SonataAdapter(spark, nodes_p, spikes_p)
    out_dir = tmp_path / "out"
    counts = a.to_parquet(
        out_dir, distributed=True, chunk_rows=1_000, h5_open=h5stub.File
    )
    assert counts == {"nodes": 3_000, "events": 4_000}
    p = ParquetAdapter(spark, out_dir)
    assert p.nodes().count() == 3_000
    assert p.events().count() == 4_000


def test_sonata_nodes_distributed_uint64_exact(spark, tmp_path):
    """uint64 attributes above 2^63 must survive exactly (decimal(20,0)),
    not wrap negative through a signed-long astype."""
    from blueetl_spark.adapters import h5stub
    from blueetl_spark.adapters.sonata import SonataAdapter

    big = np.array([2**63 + 7, 5, 2**64 - 1], dtype=np.uint64)
    p = tmp_path / "nodes.npz"
    np.savez(p, **{
        "nodes/popA/node_type_id": np.full(3, 100),
        "nodes/popA/0/hash_id": big,
    })
    a = SonataAdapter(spark, p, None)
    out = a.nodes_distributed(chunk_rows=2, h5_open=h5stub.File)
    assert dict(out.dtypes)["hash_id"] == "decimal(20,0)"
    got = [int(r.hash_id) for r in out.orderBy("node_id").collect()]
    assert got == [2**63 + 7, 5, 2**64 - 1]
