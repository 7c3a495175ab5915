"""Salted-join correctness: results must equal the plain join, with the
hot key spread across salt buckets."""

import pytest
from pyspark.sql import functions as F

from blueetl_spark.functions.skew import salted_join, skew_ratio, top_keys


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share key 0
    big = spark.range(1000).select(
        F.when(F.col("id") < 900, 0).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(50)], "k long, label string"
    )
    return big, small


def test_salted_join_matches_plain_join(skewed):
    big, small = skewed
    plain = big.join(small, "k").select("k", "payload", "label").toPandas()
    salted = salted_join(big, small, "k").select("k", "payload", "label").toPandas()
    key = ["k", "payload", "label"]
    assert sorted(map(tuple, salted[key].values.tolist())) == sorted(
        map(tuple, plain[key].values.tolist())
    )


def test_salted_join_left_outer(skewed):
    big, small = skewed
    small_half = small.filter(F.col("k") < 25)
    plain = big.join(small_half, "k", "left").toPandas()
    salted = salted_join(big, small_half, "k", how="left").toPandas()
    assert len(salted) == len(plain)
    assert salted.label.isna().sum() == plain.label.isna().sum()


def test_skew_diagnostics(skewed):
    big, _ = skewed
    assert skew_ratio(big, "k") > 10  # 900 rows on one key vs ~2-20 elsewhere
    hot = top_keys(big, "k", n=1).first()
    # 900 rows from the when-branch plus ids 900 and 950 (900 % 50 == 0)
    assert hot.k == 0 and hot["count"] == 902


def test_diagnose_and_salt_routes_on_measured_ratio(skewed):
    """At or above the threshold the helper salts (plan shows the salt
    explode + two-column join key); below it, a plain single-key join —
    and both routes return the same rows."""
    from blueetl_spark.functions.skew import diagnose_and_salt

    big, small = skewed
    hot, ratio, salted = diagnose_and_salt(big, small, "k", threshold=5.0)
    assert salted and ratio > 10
    plan = hot._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan and "explode" in plan.lower()

    flat = big.select((F.col("payload") % 50).alias("k"), "payload")
    cold, flat_ratio, flat_salted = diagnose_and_salt(
        flat, small, "k", threshold=5.0
    )
    assert not flat_salted and flat_ratio < 2.0
    assert "__salt" not in cold._jdf.queryExecution().executedPlan().toString()

    key = ["k", "payload", "label"]
    plain = big.join(small, "k").select(*key).toPandas()
    got = hot.select(*key).toPandas()
    assert sorted(map(tuple, got[key].values.tolist())) == sorted(
        map(tuple, plain[key].values.tolist())
    )


def test_salted_join_rejects_outer_joins(skewed):
    big, small = skewed
    with pytest.raises(ValueError, match="salt value"):
        salted_join(big, small, "k", how="full")
    with pytest.raises(ValueError, match="salt value"):
        salted_join(big, small, "k", how="right")


def test_bloom_prejoin_exact_and_pruning(spark):
    """bloom_prejoin's result is IDENTICAL to the plain join (false
    positives fall out in the real join); the bitmap actually prunes
    non-member rows at a low false-positive rate; NULL big-side keys
    never pass; left/outer joins are rejected."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from blueetl_spark.functions.skew import (
        bloom_prefilter,
        bloom_prejoin,
        bloom_words,
    )

    big = spark.range(20_000).select(
        F.pmod(F.xxhash64("id"), F.lit(5_000)).alias("k"),
        F.col("id").alias("v"),
    ).unionByName(
        spark.createDataFrame([(None, -1)], "k long, v long")
    )
    small = spark.range(200).select(
        (F.col("id") * 25).alias("k"), F.lit("dim").alias("d")
    )

    plain = big.join(small, "k", "inner")
    bloomed = bloom_prejoin(big, small, "k", m_bits=1 << 14, k=5)
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, bloomed.collect())
    )
    # semi variant too
    ps = big.join(small, "k", "left_semi")
    bs = bloom_prejoin(big, small, "k", m_bits=1 << 14, how="left_semi")
    assert sorted(map(tuple, ps.collect())) == sorted(map(tuple, bs.collect()))

    # pruning power: survivors of the word-table prefilter alone are
    # close to the true member count (2^14 bits / 200 keys -> low fpp)
    words = bloom_words(small, "k", m_bits=1 << 14, k=5)
    survivors = bloom_prefilter(big, words, "k", m_bits=1 << 14, k=5).count()
    true_members = plain.count()
    assert true_members <= survivors <= true_members + 50
    assert survivors < big.count() / 10  # it genuinely prunes

    with _pytest.raises(ValueError, match="inner"):
        bloom_prejoin(big, small, "k", how="left")
    with _pytest.raises(ValueError, match="m_bits"):
        bloom_words(small, "k", m_bits=33)


def test_bloom_prejoin_mixed_key_types_and_null_prune(spark):
    """ADVICE r11: (1) int build side + bigint probe side must behave
    like the plain type-coercing join (keys are canonicalized to long
    before hashing); (2) cross-category keys (long vs double) raise
    instead of silently pruning; (3) a standalone bloom_prefilter drops
    NULL big-side keys, as its docstring promises."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from blueetl_spark.functions.skew import (
        bloom_prefilter,
        bloom_prejoin,
        bloom_words,
    )

    big = spark.range(2_000).select(
        F.pmod(F.xxhash64("id"), F.lit(500)).cast("long").alias("k"),
        F.col("id").alias("v"),
    )
    small_int = spark.range(50).select(
        (F.col("id") * 7).cast("int").alias("k"), F.lit("d").alias("d")
    )
    plain = big.join(small_int, "k", "inner")
    bloomed = bloom_prejoin(big, small_int, "k", m_bits=1 << 14, k=5)
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, bloomed.collect())
    )

    small_dbl = small_int.select(F.col("k").cast("double").alias("k"), "d")
    with _pytest.raises(ValueError, match="dtype mismatch"):
        bloom_prejoin(big, small_dbl, "k")

    big_null = big.unionByName(
        spark.createDataFrame([(None, -1)], "k long, v long")
    )
    words = bloom_words(small_int, "k", m_bits=1 << 14, k=5)
    pre = bloom_prefilter(big_null, words, "k", m_bits=1 << 14, k=5)
    assert pre.filter(F.col("k").isNull()).count() == 0
