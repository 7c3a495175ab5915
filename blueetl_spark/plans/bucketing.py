"""Bucketed tables: co-located joins and aggregations without a shuffle.

At 100 TB the dominant cost of a fact-fact join (events ⋈ assignments,
report ⋈ features) is shuffling both sides on the join key. Bucketing
pre-partitions the data *at write time*: both tables hashed into the same
number of buckets on the same key scan as already-co-located inputs, so
the join plans as a SortMergeJoin with **no Exchange** on either side
(and with ``sortBy`` the per-bucket sort is free too). The price is paid
once at ingest, then every downstream join/groupBy on that key rides it.

Spark's bucketing lives in the catalog (``saveAsTable``) — a plain
``.parquet(path)`` write cannot record bucket metadata. These helpers
wrap the catalog dance; the bucket spec must match (same key, same
count) on both sides for the shuffle elimination to kick in, which
:func:`assert_cobucketed` checks up front.

Sizing: pick ``n_buckets`` so one bucket of the *larger* table is a few
hundred MB (e.g. 100 TB / 512 MB ≈ 200k buckets); bucket counts should
match across tables that join — mismatched counts fall back to a shuffle
(Spark does not yet coalesce bucket counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str] | str,
    n_buckets: int = 32,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed (and per-bucket sorted) catalog table."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    writer = df.write.mode("overwrite").format("parquet")
    if path is not None:
        writer = writer.option("path", path)
    writer = writer.bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def bucket_spec(spark: SparkSession, table: str) -> tuple[list[str], int] | None:
    """(bucket columns, bucket count) of a catalog table, or None."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    cols: list[str] | None = None
    count: int | None = None
    for r in rows:
        if r.col_name == "Num Buckets":
            count = int(r.data_type)
        elif r.col_name == "Bucket Columns":
            cols = [c.strip(" `") for c in r.data_type.strip("[]").split(",")]
    if cols is None or count is None:
        return None
    return cols, count


def assert_cobucketed(spark: SparkSession, table_a: str, table_b: str) -> None:
    """Raise unless both tables share bucket key and count (the condition
    for a shuffle-free join)."""
    a, b = bucket_spec(spark, table_a), bucket_spec(spark, table_b)
    if a is None or b is None:
        missing = [t for t, s in ((table_a, a), (table_b, b)) if s is None]
        raise ValueError(f"not bucketed: {missing}")
    if a != b:
        raise ValueError(
            f"bucket specs differ: {table_a}={a} vs {table_b}={b}; "
            "co-located joins need the same key and bucket count"
        )


def cobucketed_join(
    spark: SparkSession, table_a: str, table_b: str, how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables on their shared bucket key — validated,
    so a spec mismatch fails loudly instead of silently shuffling."""
    assert_cobucketed(spark, table_a, table_b)
    keys, _ = bucket_spec(spark, table_a)
    return spark.table(table_a).join(spark.table(table_b), keys, how)
