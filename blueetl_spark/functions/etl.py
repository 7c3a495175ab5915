"""Core ETL helpers mirroring the blueetl-core accessor surface.

The reference exposes these on every pandas DataFrame via ``df.etl.*``;
here they are plain functions over Spark DataFrames. Covered: the
group-list computation (J2), ``first``/``one`` row access (O4),
union-concat (U1/U5), condition codes (A7), and complement groupby (A9).
"""

from __future__ import annotations

from functools import reduce
from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from blueetl_spark.functions.qdsl import q


def distinct_groups(dfs: list[DataFrame], groupby: list[str]) -> DataFrame:
    """The distinct groupby-key combinations of the (virtual) merged frame,
    without materializing the merge (J2, reference ``parallel.py:35-60``).

    Each DataFrame is projected to its overlap with ``groupby`` and
    deduplicated — tiny relative to the data — then the projections are
    chained with left joins on their shared columns, stopping early once
    every requested column is covered. Sorted for deterministic group
    ordering.
    """
    out: DataFrame | None = None
    covered: set[str] = set()
    for df in dfs:
        cols = [c for c in groupby if c in df.columns]
        if not cols:
            continue
        proj = df.select(*cols).distinct()
        if out is None:
            out, covered = proj, set(cols)
        else:
            shared = [c for c in cols if c in covered]
            if set(cols) <= covered:
                continue
            out = out.join(proj, shared, "left") if shared else out.crossJoin(proj)
            covered |= set(cols)
        if covered >= set(groupby):
            break
    if out is None:
        raise ValueError(f"no input provides any of the groupby columns {groupby}")
    missing = [c for c in groupby if c not in covered]
    if missing:
        raise ValueError(f"groupby columns {missing} not found in any input")
    return out.select(*groupby).distinct().orderBy(*groupby)


def first(df: DataFrame, query: dict | None = None, **kwargs: Any):
    """First row matching the q-DSL filter, or None (O4 ``etl.first``)."""
    return q(df, {**(query or {}), **kwargs}).first()


def one(df: DataFrame, query: dict | None = None, **kwargs: Any):
    """The single row matching the filter; raises unless exactly one
    (O4 ``etl.one``)."""
    rows = q(df, {**(query or {}), **kwargs}).limit(2).collect()
    if len(rows) != 1:
        raise ValueError(f"expected exactly 1 matching row, found {len(rows)}")
    return rows[0]


def smart_concat(dfs: list[DataFrame]) -> DataFrame:
    """Union-all by column name, tolerating missing columns (U1)."""
    if not dfs:
        raise ValueError("nothing to concat")
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs
    )


def concat_features(
    dfs: list[DataFrame], params_list: list[dict[str, Any]]
) -> DataFrame:
    """ConcatenatedFeatures (U5): union sibling feature tables, stamping
    each with its parameter values and a dense ``params_id``.

    Mirrors reference ``features.py:36-116``: parameter columns are
    literal per-source, so Catalyst constant-folds them; dotted parameter
    names become their last path segment (``features.py:85``).
    """
    if len(dfs) != len(params_list):
        raise ValueError("one params dict per DataFrame required")
    stamped = []
    for i, (df, params) in enumerate(zip(dfs, params_list)):
        df = df.withColumn("params_id", F.lit(i))
        for key, value in params.items():
            df = df.withColumn(key.rsplit(".", 1)[-1], F.lit(value))
        stamped.append(df)
    return smart_concat(stamped)


def condition_codes(df: DataFrame, cols: list[str]) -> DataFrame:
    """Dense integer codes per condition column (A7: ``cat.codes`` /
    ``nunique`` on campaign conditions) — the value's rank in the sorted
    distinct-value order, appended as ``<col>_code``.

    Scale shape: the only total order is over the **distinct values** of
    each column (a code table is semantically small — its size IS the
    cardinality), numbered with ``row_number`` in one bounded task, then
    broadcast-joined back null-safely. The full table never funnels
    through a single-partition window, unlike the naive
    ``dense_rank().over(Window.orderBy(col))`` form.
    """
    for c in cols:
        codes = (
            df.select(F.col(c).alias("__cc_val"))
            .distinct()
            .withColumn(
                f"{c}_code",
                F.row_number().over(Window.orderBy(F.col("__cc_val"))) - 1,
            )
        )
        df = df.join(
            F.broadcast(codes), F.col(c).eqNullSafe(F.col("__cc_val")), "left"
        ).drop("__cc_val")
    return df


def groupby_except(df: DataFrame, all_keys: list[str], exclude: list[str]):
    """Group by the complement of ``exclude`` within ``all_keys`` (A9)."""
    return df.groupBy(*[k for k in all_keys if k not in exclude])


def iter_rows(df: DataFrame):
    """Row iterator without materializing the whole table on the driver
    (O5 ``etl.iter``): streams one partition at a time."""
    return df.toLocalIterator()


def groupby_iter(df: DataFrame, keys: list[str]):
    """Yield ``(key_tuple, pandas.DataFrame)`` per group, driver-side (O5
    ``etl.groupby_iter``). Each group is fetched with a filter on the key —
    intended for *small* group counts (plots, exports); distributed
    per-group computation belongs in ``applyInPandas``."""
    for row in distinct_groups([df], keys).toLocalIterator():
        key = tuple(row[k] for k in keys)
        yield key, q(df, dict(zip(keys, key))).toPandas()
