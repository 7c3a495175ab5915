"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship blueetl-style pipeline; ``queries()`` /
``oracle_sql()`` expose every implemented operator with its DuckDB oracle
(see ``blueetl_spark/queries.py``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _configure(spark: SparkSession) -> SparkSession:
    """The driver may hand us a vanilla session; the events table needs the
    nanos-as-long parquet reader flag, which must be set before the scan."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from blueetl_spark.queries import flagship

    return flagship(_configure(spark))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from blueetl_spark.queries import QUERIES

    return {
        name: (lambda spark, sf_dir, _fn=fn: _fn(_configure(spark), sf_dir))
        for name, fn in QUERIES.items()
    }


def oracle_sql() -> dict[str, str]:
    from blueetl_spark.queries import ORACLES

    return dict(ORACLES)
