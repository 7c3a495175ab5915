"""Bucketed co-located joins: the write-once / join-shuffle-free contract.

The value claim is a *plan* property: a join of two tables bucketed on the
same key with the same count must contain no Exchange on either side.
"""

import pytest
from pyspark.sql import functions as F

from blueetl_spark.plans.bucketing import (
    assert_cobucketed,
    bucket_spec,
    cobucketed_join,
    write_bucketed,
)


@pytest.fixture()
def bucketed(spark, tmp_path):
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bktest LOCATION '{tmp_path / 'wh'}'"
    )
    yield "bktest"
    for t in [r.tableName for r in spark.sql("SHOW TABLES IN bktest").collect()]:
        spark.sql(f"DROP TABLE IF EXISTS bktest.{t}")
    spark.sql("DROP DATABASE IF EXISTS bktest")


def test_cobucketed_join_has_no_exchange(spark, bucketed):
    big = spark.range(10_000).select(
        F.col("id").alias("gid"), (F.col("id") % 97).alias("v")
    )
    dim = spark.range(10_000).select(
        F.col("id").alias("gid"), (F.col("id") % 7).alias("w")
    )
    write_bucketed(big, "bktest.big", "gid", n_buckets=8)
    write_bucketed(dim, "bktest.dim", "gid", n_buckets=8)
    assert bucket_spec(spark, "bktest.big") == (["gid"], 8)

    # force the sort-merge path so a shuffle would be visible if present
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = cobucketed_join(spark, "bktest.big", "bktest.dim")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert out.count() == 10_000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_mismatched_bucket_specs_fail_loudly(spark, bucketed):
    a = spark.range(100).select(F.col("id").alias("gid"))
    write_bucketed(a, "bktest.a8", "gid", n_buckets=8)
    write_bucketed(a, "bktest.a16", "gid", n_buckets=16)
    with pytest.raises(ValueError, match="bucket specs differ"):
        assert_cobucketed(spark, "bktest.a8", "bktest.a16")
    plain = spark.range(10).write.mode("overwrite").saveAsTable("bktest.plain")  # noqa: F841
    with pytest.raises(ValueError, match="not bucketed"):
        assert_cobucketed(spark, "bktest.a8", "bktest.plain")


def test_bucketed_groupby_avoids_shuffle(spark, bucketed):
    """Aggregation on the bucket key also rides the bucketing."""
    big = spark.range(10_000).select(
        F.col("id").alias("gid"), (F.col("id") % 13).alias("v")
    )
    write_bucketed(big, "bktest.agg", "gid", n_buckets=8)
    out = spark.table("bktest.agg").groupBy("gid").agg(F.sum("v").alias("s"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert out.count() == 10_000
