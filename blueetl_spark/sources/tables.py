"""Readers for the driver-provided star-schema tables (TESTDATA.md).

``load(spark, sf_dir, name)`` reads one table; ``events`` gets its ``ts``
normalized to an epoch **seconds** double column ``ts_sec`` so time
arithmetic matches DuckDB's ``epoch(ts)``. The generator has shipped two
physical encodings of ``ts`` — parquet TIMESTAMP(NANOS) (read as nanos
longs via the ``nanosAsLong`` session flag) and TIMESTAMP(MICROS) (read
as timestamp/timestamp_ntz) — both are handled; the session timezone is
UTC so NTZ wall time equals the epoch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and "ts" in df.columns:
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":  # nanosAsLong path
            df = df.withColumn("ts_sec", (F.col("ts") / F.lit(1e9)).cast("double"))
        else:  # timestamp / timestamp_ntz (TIMESTAMP_NTZ can't cast to double)
            df = df.withColumn(
                "ts_sec",
                (F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1e6)).cast(
                    "double"
                ),
            )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}
