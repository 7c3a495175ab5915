"""Cache manager: checksum hits, dependency invalidation, subfilter reuse."""

from __future__ import annotations

import pytest

from blueetl_spark.plans.cache import CacheManager, CachedPipeline, checksum


@pytest.fixture()
def cache(spark, tmp_path):
    return CacheManager(spark, tmp_path / "cache")


def _df(spark, ids):
    return spark.createDataFrame([(i, i * 10.0) for i in ids], "simulation_id int, v double")


def test_dump_load_roundtrip(spark, cache):
    cs = checksum({"a": 1})
    cache.dump("simulations", _df(spark, [1, 2, 3]), cs)
    assert cache.is_cached("simulations", cs)
    assert not cache.is_cached("simulations", checksum({"a": 2}))
    got = cache.load("simulations").toPandas().sort_values("simulation_id")
    assert list(got.simulation_id) == [1, 2, 3]


def test_fetch_subfilter_refilters(spark, cache):
    cs = checksum({"a": 1})
    cache.dump("report", _df(spark, [1, 2, 3, 4]), cs, simulations_filter={})
    # narrower filter → cached parquet refiltered, not recomputed
    got = cache.fetch("report", cs, {"simulation_id": [1, 2]})
    assert got is not None
    assert sorted(r.simulation_id for r in got.collect()) == [1, 2]
    # same filter → direct load
    cache.dump("report2", _df(spark, [1, 2]), cs, {"simulation_id": [1, 2]})
    got2 = cache.fetch("report2", cs, {"simulation_id": [1, 2]})
    assert got2 is not None and got2.count() == 2
    # broader filter → must recompute
    assert cache.fetch("report2", cs, {}) is None
    # wrong checksum → miss
    assert cache.fetch("report", checksum({"a": 2}), {}) is None


def test_fetch_coordinate_filter_resolves_via_simulations(spark, cache):
    """A filter over campaign coordinates (columns only on the simulations
    table) must refilter downstream frames by surviving simulation_ids —
    never silently drop the missing key (reference repository.py:140-204)."""
    cs = checksum({"a": 1})
    sims = spark.createDataFrame(
        [(1, 0.1), (2, 0.1), (3, 0.2)], "simulation_id int, seed double"
    )
    cache.dump("simulations", sims, cs, simulations_filter={})
    cache.dump("report", _df(spark, [1, 2, 3]), cs, simulations_filter={})
    # report has no `seed` column; filter must resolve through simulations
    got = cache.fetch("report", cs, {"seed": 0.1})
    assert got is not None
    assert sorted(r.simulation_id for r in got.collect()) == [1, 2]
    # mixed coordinate + id filter also resolves (AND semantics)
    got2 = cache.fetch("report", cs, {"seed": 0.1, "simulation_id": [2, 3]})
    assert got2 is not None
    assert sorted(r.simulation_id for r in got2.collect()) == [2]


def test_fetch_coordinate_filter_without_simulations_recomputes(spark, cache):
    """If the coordinate filter can't be resolved (no cached simulations),
    fetch must return None — an under-filtered frame would be silent data
    corruption."""
    cs = checksum({"a": 1})
    cache.dump("report", _df(spark, [1, 2, 3]), cs, simulations_filter={})
    assert cache.fetch("report", cs, {"seed": 0.1}) is None


def test_invalidate_from_chain(spark, cache):
    cs = checksum({})
    for name in ["simulations", "neurons", "windows", "report"]:
        cache.dump(name, _df(spark, [1]), cs)
    cache.dump("features_x", _df(spark, [1]), cs)
    cache.invalidate_from("windows")
    assert cache.is_cached("simulations", cs)
    assert cache.is_cached("neurons", cs)
    assert not cache.is_cached("windows", cs)
    assert not cache.is_cached("report", cs)
    assert not cache.is_cached("features_x", cs)


def test_readonly(spark, tmp_path):
    rw = CacheManager(spark, tmp_path / "c")
    rw.dump("simulations", _df(spark, [1]), checksum({}))
    ro = CacheManager(spark, tmp_path / "c", readonly=True)
    assert ro.load("simulations").count() == 1
    with pytest.raises(PermissionError):
        ro.dump("simulations", _df(spark, [2]), checksum({}))
    with pytest.raises(PermissionError):
        ro.delete("simulations")


def test_pipeline_get_or_compute_counts(spark, tmp_path):
    cache = CacheManager(spark, tmp_path / "c")
    calls = []
    pipe = CachedPipeline(cache, {"simulations": {"v": 1}})

    def compute():
        calls.append(1)
        return _df(spark, [1, 2])

    assert pipe.get_or_compute("simulations", compute).count() == 2
    assert pipe.get_or_compute("simulations", compute).count() == 2
    assert len(calls) == 1  # second call served from cache

    # changed config → plan_invalidation clears it
    pipe2 = CachedPipeline(cache, {"simulations": {"v": 2}})
    victims = pipe2.plan_invalidation()
    assert "simulations" in victims
    assert pipe2.get_or_compute("simulations", compute).count() == 2
    assert len(calls) == 2
