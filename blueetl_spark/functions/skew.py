"""Skew-mitigation helpers for joins whose hot keys defeat hash
partitioning.

AQE's skew-join splitting (enabled in the session factory) handles most
cases at runtime; these explicit tools cover the two situations AQE
cannot: (a) a *broadcast-ineligible* dimension with a handful of hot keys,
(b) deliberate pre-salting when the skew is known ahead of time (e.g. a
"null user" or "default document" key holding 10% of a 100 TB fact table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join where the big side's key distribution is skewed.

    The big side gets a uniform random salt in ``[0, salt)``; the small
    side is exploded ``salt``× (one copy per salt value) so every
    (key, salt) bucket finds its match. A key holding N rows now spreads
    over ``salt`` tasks instead of one. Cost: the small side is
    replicated ``salt``× — use only when ``small`` is too big to
    broadcast outright but ``salt × |small|`` still shuffles cheaply.

    The salt columns are internal and dropped from the result. Only join
    types that never *emit* unmatched small-side rows are allowed: with
    ``right``/``full`` each unmatched small-side row would surface once
    per exploded salt value — ``salt`` duplicates of a row that should
    appear once.
    """
    safe = {"inner", "left", "left_outer", "leftouter", "left_semi",
            "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in safe:
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched small-side "
            f"rows would be duplicated once per salt value; use one of {sorted(safe)}"
        )
    salted_big = big.withColumn(
        "__salt", (F.rand(seed=0) * salt).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_big.join(salted_small, [on, "__salt"], how)
    return out.drop("__salt")


def diagnose_and_salt(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    threshold: float = 4.0,
    salt: int = 16,
) -> tuple[DataFrame, float, bool]:
    """The measure-then-decide join planner: run :func:`skew_ratio` on
    the big side's key and route through :func:`salted_join` when the
    ratio is at or above ``threshold``, else a plain equi-join. This is
    the helper that turns ``operators/profile.key_skew``'s diagnostic
    into an action — measure first, salt only when the data says so
    (blind salting replicates the small side ``salt``× for nothing on
    a flat key).

    Returns ``(joined, ratio, salted)`` so the caller can log the
    decision. Cost of the diagnosis: ONE extra aggregation job over the
    big side's key column (key-count-sized after the map-side combine)
    — at 100 TB, run it on a sample or reuse a cached ``key_skew`` row
    instead and call :func:`salted_join` directly.
    """
    ratio = skew_ratio(big, on)
    if ratio >= threshold:
        return salted_join(big, small, on, how, salt), ratio, True
    return big.join(small, on, how), ratio, False


def top_keys(df: DataFrame, key: str, n: int = 20) -> DataFrame:
    """The n heaviest keys with their row counts — the diagnosis step
    before choosing broadcast / salting / AQE."""
    return df.groupBy(key).count().orderBy(F.col("count").desc()).limit(n)


def skew_ratio(df: DataFrame, key: str) -> float:
    """max(key count) / mean(key count) — a quick skew score (1.0 = flat).
    Runs one aggregation job."""
    row = (
        df.groupBy(key)
        .count()
        .agg(F.max("count").alias("mx"), F.avg("count").alias("avg"))
        .first()
    )
    if row is None or not row.avg:
        return 1.0
    return float(row.mx / row.avg)
