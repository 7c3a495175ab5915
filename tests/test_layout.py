"""Z-order layout tests: the written files must have tight bounding
boxes in EVERY clustered dimension (that is the entire point), which a
linear sort cannot provide for the second column."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from blueetl_spark.plans import layout


@pytest.fixture(scope="module")
def grid(spark):
    # 256x256 uniform grid -> 65,536 rows, two independent dimensions
    return spark.range(256 * 256).select(
        (F.col("id") % 256).alias("x"),
        (F.col("id") / 256).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )


def _hit_fraction(bounds, col, lo, hi):
    rows = bounds.collect()
    hit = [
        r for r in rows if r[f"{col}_max"] >= lo and r[f"{col}_min"] <= hi
    ]
    return len(hit) / len(rows)


def test_zorder_prunes_on_both_columns(grid, spark, tmp_path):
    zpath = str(tmp_path / "z")
    layout.zorder_write(grid, zpath, ["x", "y"], n_files=64)
    bounds = layout.file_bounds(spark.read, zpath, ["x", "y"])
    # a 1/16-wide point-range on either dimension touches few files
    assert _hit_fraction(bounds, "x", 0, 15) <= 0.35
    assert _hit_fraction(bounds, "y", 0, 15) <= 0.35
    # and nothing was lost or duplicated
    assert spark.read.parquet(zpath).count() == 256 * 256


def test_linear_sort_fails_second_column(grid, spark, tmp_path):
    lpath = str(tmp_path / "linear")
    (
        grid.repartitionByRange(64, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    bounds = layout.file_bounds(spark.read, lpath, ["x", "y"])
    # linear sort: great on x, useless on y — every file spans all of y
    assert _hit_fraction(bounds, "x", 0, 15) <= 0.35
    assert _hit_fraction(bounds, "y", 0, 15) >= 0.9


def test_zorder_key_is_order_preserving_per_dimension(grid):
    """Fixing one dimension, the key must be monotonic in the other —
    the linear-scaling rank must not reorder values."""
    sub = grid.filter(F.col("y") == 0).select(
        "x", layout.zorder_key(grid, ["x", "y"], bits=8).alias("z")
    )
    rows = sub.orderBy("x").collect()
    zs = [r.z for r in rows]
    assert zs == sorted(zs)


def test_zorder_key_validations(grid, spark):
    with pytest.raises(ValueError, match="2-6"):
        layout.zorder_key(grid, ["x"])
    with pytest.raises(ValueError, match="budget"):
        layout.zorder_key(grid, ["x", "y"], bits=40)
    # explicit bits must not bypass the quantile driver-side cap
    with pytest.raises(ValueError, match="quantile mode caps"):
        layout.zorder_key(grid, ["x", "y"], bits=20, mode="quantile")
    # non-numeric columns fail loudly instead of silently rank-0
    strs = spark.createDataFrame([("a", 1), ("b", 2)], "s string, v long")
    with pytest.raises(ValueError, match="numeric"):
        layout.zorder_key(strs, ["s", "v"])


def test_single_stats_pass(grid):
    """All columns' bounds come from one driver action (one multi-agg /
    one multi-column approxQuantile), not one scan per column."""
    calls = []
    orig = type(grid).agg

    def counting_agg(self, *a, **kw):
        calls.append(1)
        return orig(self, *a, **kw)

    import unittest.mock as mock

    with mock.patch.object(type(grid), "agg", counting_agg):
        layout.zorder_key(grid, ["x", "y"], bits=8)
    assert sum(calls) == 1


def test_quantile_mode_handles_skew(spark, tmp_path):
    """Heavy-tailed column: linear ranks collapse 99% of rows into one
    rank value (the curve degenerates); equi-depth quantile ranks keep
    pruning alive on the skewed dimension."""
    # 10k rows: v is ~uniform, s is heavy-tailed (99% in [0,100), 1% huge)
    df = spark.range(10_000).select(
        F.col("id").alias("v"),
        F.when(F.col("id") % 100 == 0, F.col("id") * 1000)
        .otherwise(F.col("id") % 100)
        .alias("s"),
    )
    qpath = str(tmp_path / "zq")
    layout.zorder_write(df, qpath, ["s", "v"], n_files=16, mode="quantile")
    bounds = layout.file_bounds(spark.read, qpath, ["s", "v"])
    # a predicate inside the dense region of s must still prune
    assert _hit_fraction(bounds, "s", 10, 20) <= 0.6
    assert _hit_fraction(bounds, "v", 0, 999) <= 0.6
    assert spark.read.parquet(qpath).count() == 10_000


def test_constant_column_degrades_gracefully(spark, tmp_path):
    df = spark.range(100).select(
        F.lit(7).alias("c"), F.col("id").alias("v")
    )
    path = str(tmp_path / "const")
    layout.zorder_write(df, path, ["c", "v"], n_files=4)
    assert spark.read.parquet(path).count() == 100


def test_compact_small_files(spark, tmp_path):
    src = str(tmp_path / "shards")
    out = str(tmp_path / "compacted")
    # 64 tiny files
    spark.range(10_000).select(
        F.col("id").alias("x"), (F.col("id") % 7).alias("y")
    ).repartition(64).write.parquet(src)
    info = layout.compact(spark, src, out, target_file_bytes=1 << 30)
    assert info["in_files"] == 64
    assert info["out_files"] == 1  # everything fits one target-size file
    assert spark.read.parquet(out).count() == 10_000


def test_compact_rejects_in_place(spark, tmp_path):
    src = str(tmp_path / "inplace")
    spark.range(10).write.parquet(src)
    with pytest.raises(ValueError, match="in place"):
        layout.compact(spark, src, src)


def test_compact_with_zorder(spark, tmp_path, grid):
    src = str(tmp_path / "zsrc")
    out = str(tmp_path / "zout")
    grid.repartition(32).write.parquet(src)
    layout.compact(spark, src, out, target_file_bytes=50_000, zorder_cols=["x", "y"])
    bounds = layout.file_bounds(spark.read, out, ["x", "y"])
    n = bounds.count()
    assert n >= 4  # multiple target-size files
    assert _hit_fraction(bounds, "x", 0, 15) <= 0.6
    assert _hit_fraction(bounds, "y", 0, 15) <= 0.6


def test_compact_in_place_guard_normalizes_paths(spark, tmp_path):
    """'dir/' and 'file:dir' spell the same directory — the guard must
    catch them, or the overwrite deletes the input mid-scan."""
    src = str(tmp_path / "inplace2")
    spark.range(10).write.parquet(src)
    for alias in (src + "/", "file:" + src):
        with pytest.raises(ValueError, match="in place"):
            layout.compact(spark, src, alias)


def test_zorder_temporal_columns(spark, tmp_path):
    df = spark.range(1000).select(
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 300).cast("int")).alias("d"),
        F.timestamp_micros(F.col("id") * 1_000_000).alias("ts"),
        F.col("id").alias("v"),
    )
    # linear mode on date + timestamp both rank without crashing
    path = str(tmp_path / "ztemporal")
    layout.zorder_write(df, path, ["d", "ts"], n_files=4)
    assert spark.read.parquet(path).count() == 1000
    # quantile mode too (approxQuantile rejects raw temporal columns)
    path2 = str(tmp_path / "ztemporal_q")
    layout.zorder_write(df.select("d", "v"), path2, ["d", "v"], mode="quantile", n_files=4)
    assert spark.read.parquet(path2).count() == 1000
    # intervals and strings still rejected
    iv = df.select(F.expr("INTERVAL 1 DAY").alias("i"), "v")
    with pytest.raises(ValueError, match="numeric or temporal"):
        layout.zorder_key(iv, ["i", "v"])
