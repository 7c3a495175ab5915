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


def _bloom_bit(p):
    """2^(p & 31) as an exact long column. shiftleft() takes only a
    Python-int shift, so the per-row bit mask goes through pow(2, b):
    powers of two are exact doubles, and b ≤ 31 keeps the long cast
    trivially safe — hence 32-bit words."""
    return F.pow(F.lit(2.0), p.bitwiseAND(F.lit(31)).cast("double")).cast(
        "long"
    )


def bloom_bitmap(small: DataFrame, on: str, m_bits: int = 1 << 20, k: int = 5) -> DataFrame:
    """ONE-row bitmap frame (``array<long>`` of ``m_bits/32`` 32-bit
    words) — a Bloom filter of ``small``'s join keys built entirely
    with DataFrame ops (explode k positions → bit_or per word →
    densify), so it works on any Spark without relying on the engine's
    internal runtime-filter machinery. 1M bits = 32k words = 256 KB —
    broadcast change."""
    if m_bits % 32 != 0 or m_bits <= 0:
        raise ValueError("m_bits must be a positive multiple of 32")
    if k < 1:
        raise ValueError("k must be >= 1")
    key = F.col(on)
    pos = small.filter(key.isNotNull()).select(
        F.explode(
            F.array(*[
                F.pmod(F.xxhash64(F.lit(i), key), F.lit(m_bits))
                for i in range(k)
            ])
        ).alias("__p")
    )
    words = (
        pos.select(
            F.shiftrightunsigned("__p", 5).alias("__w"),
            _bloom_bit(F.col("__p")).alias("__bit"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__bit").alias("__bits"))
    )
    m = F.col("__m")
    return words.agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("__w", "__bits")))
        ).alias("__m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(m_bits // 32 - 1)),
            lambda i: F.coalesce(
                F.element_at(m, i.cast("long")), F.lit(0).cast("long")
            ),
        ).alias("__bloom")
    )


def bloom_might_contain(on: str, m_bits: int = 1 << 20, k: int = 5):
    """The membership predicate matching :func:`bloom_bitmap` — AND of
    the k bit probes against the broadcast ``__bloom`` array column."""
    key = F.col(on)
    cond = None
    for i in range(k):
        p = F.pmod(F.xxhash64(F.lit(i), key), F.lit(m_bits))
        word = F.element_at(
            F.col("__bloom"), (F.shiftrightunsigned(p, 5) + 1).cast("int")
        )
        c = word.bitwiseAND(_bloom_bit(p)) != 0
        cond = c if cond is None else (cond & c)
    return cond


def bloom_prejoin(
    big: DataFrame,
    small: DataFrame,
    on: str,
    m_bits: int = 1 << 20,
    k: int = 5,
    how: str = "inner",
) -> DataFrame:
    """Bloom-runtime-filtered join for the case BETWEEN broadcast and
    raw shuffle: the dimension side is too big to broadcast, but its
    key BLOOM (128 KB at the default 1M bits) is not — so the fact
    side is pre-filtered map-side against the broadcast bitmap and
    only surviving rows pay the shuffle. EXACT by construction: a
    Bloom false positive just rides into the real join and falls out
    there, so the result is identical to ``big.join(small, on, how)``
    — the filter only removes rows that provably cannot match.

    Restricted to ``inner``/``left_semi`` (the joins where dropping
    non-matching big-side rows early is sound; a left/outer join must
    keep them). False-positive rate ≈ (1 − e^{−k·n/m})^k — at the
    defaults, ~0.1% for n = 50k keys; size ``m_bits`` ≈ 10–15 bits per
    expected key (the bitmap is ``m_bits/32`` longs: 256 KB at 1M
    bits). NULL big-side keys are pruned (they cannot match an inner
    join anyway).

    Scale shape: one aggregate over the dim side's KEY column builds
    the bitmap (word-count-sized shuffle, ≤ 16k rows); the probe is a
    broadcast nested-loop of ONE row + a JVM-side bit test per fact
    row; the real join then runs on the pruned side. At 100 TB this is
    the shuffle-mass killer when the dim has 10⁵–10⁸ keys and the fact
    matches only a slice of them.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(
            "bloom_prejoin supports how='inner' or 'left_semi' only: a "
            "left/outer join must keep non-matching big-side rows, which "
            "the pre-filter removes"
        )
    bitmap = bloom_bitmap(small, on, m_bits=m_bits, k=k)
    pruned = (
        big.crossJoin(F.broadcast(bitmap))
        .filter(bloom_might_contain(on, m_bits=m_bits, k=k))
        .drop("__bloom")
    )
    return pruned.join(small, on, how)
