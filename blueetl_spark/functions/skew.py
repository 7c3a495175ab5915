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
    powers of two are exact doubles, and b <= 31 keeps the long cast
    trivially safe — hence 32-bit words."""
    return F.pow(F.lit(2.0), p.bitwiseAND(F.lit(31)).cast("double")).cast(
        "long"
    )


_INTEGRAL = ("byte", "short", "int", "integer", "bigint", "long", "smallint", "tinyint")


def _bloom_key(df: DataFrame, on: str):
    """Canonical hash input for the join key: integral types collapse to
    long, everything else to string. xxhash64 is TYPE-SENSITIVE in Spark
    (int 5 and bigint 5 hash differently), so without this an int build
    side + bigint probe side would silently prune genuinely matching
    rows — a plain join would have type-coerced them. Canonicalizing on
    BOTH sides makes any integral/integral or same-category pairing
    safe; cross-category pairs (e.g. int vs double) are rejected up
    front by :func:`bloom_prejoin`."""
    t = dict(df.dtypes)[on]
    base = t.split("(")[0]
    if base in _INTEGRAL:
        return F.col(on).cast("long"), "integral"
    return F.col(on).cast("string"), t


def bloom_words(small: DataFrame, on: str, m_bits: int = 1 << 20, k: int = 5) -> DataFrame:
    """SPARSE Bloom bitmap of ``small``'s join keys as a word table
    ``(__w, __bits)`` — one row per 32-bit word with at least one bit
    set (<= min(m_bits/32, k*n_keys) rows), built entirely with
    DataFrame ops (explode k positions -> bit_or per word). Sparse is
    the point: an absent word means "no member hashes here", which an
    inner probe-join rejects for free — no dense spine, no arrays.
    """
    if m_bits % 32 != 0 or m_bits <= 0:
        raise ValueError("m_bits must be a positive multiple of 32")
    if k < 1:
        raise ValueError("k must be >= 1")
    key, _ = _bloom_key(small, on)
    pos = small.filter(key.isNotNull()).select(
        F.explode(
            F.array(*[
                F.pmod(F.xxhash64(F.lit(i), key), F.lit(m_bits))
                for i in range(k)
            ])
        ).alias("__p")
    )
    return (
        pos.select(
            F.shiftrightunsigned("__p", 5).alias("__w"),
            _bloom_bit(F.col("__p")).alias("__bit"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__bit").alias("__bits"))
    )


def bloom_prefilter(
    big: DataFrame,
    words: DataFrame,
    on: str,
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """Prune ``big`` to rows whose key MIGHT be in the Bloom word table
    (same columns out). Each of the k probes is one broadcast HASH join
    on the word index + a JVM bit test — whole-stage-codegen hash
    lookups, no arrays anywhere. Two earlier forms measured 10-40x
    slower on 600k rows: a cross-joined dense array column copies the
    256 KB bitmap into every fact row before the filter can drop it,
    and a 32k-element array literal lowers to CreateArray with 32k
    child expressions evaluated PER ROW. The probe-join form is the
    one that scales. ``m_bits``/``k`` MUST match the build, and the key
    is hashed through the same canonicalization as :func:`bloom_words`
    (integral -> long, else string), so an int build side + bigint
    probe side stays correct. NULL big-side keys are dropped here
    (xxhash64 skips NULL args, so an unfiltered NULL would probe fixed
    positions and could pass all k bit tests).
    """
    key, _ = _bloom_key(big, on)
    pruned = big.filter(key.isNotNull())
    for i in range(k):
        p = F.pmod(F.xxhash64(F.lit(i), key), F.lit(m_bits))
        # The k probe joins broadcast the IDENTICAL words subtree (the
        # probe's word/bit columns are dropped before the next probe,
        # so no aliasing is needed) — identical subtrees let Spark plan
        # ONE BroadcastExchange + k-1 ReusedExchange. The previous
        # per-probe __w{i}/__bits{i} aliases made each broadcast a
        # distinct plan, so the word-table build (a scan + aggregate of
        # the whole dim side) executed k times (r13).
        wt = F.broadcast(words.select("__w", "__bits"))
        pruned = (
            pruned.join(
                wt,
                (F.shiftrightunsigned(p, 5) == wt["__w"])
                & (wt["__bits"].bitwiseAND(_bloom_bit(p)) != 0),
                "inner",
            )
            .drop("__w", "__bits")
        )
    return pruned


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
    key BLOOM is not — the sparse word table (<= m_bits/32 rows of two
    longs) broadcasts, the fact side is pre-filtered map-side with k
    probe-joins (:func:`bloom_prefilter`), and only surviving rows pay
    the shuffle. EXACT by construction: a Bloom false positive just
    rides into the real join and falls out there, so the result is
    identical to ``big.join(small, on, how)`` — the filter only
    removes rows that provably cannot match.

    Restricted to ``inner``/``left_semi`` (the joins where dropping
    non-matching big-side rows early is sound; a left/outer join must
    keep them). False-positive rate ~ (1 - e^{-k*n/m})^k — at the
    defaults, ~0.1% for n = 50k keys; size ``m_bits`` at 10-15 bits
    per expected key. NULL big-side keys are pruned (they cannot match
    an inner join anyway).

    Scale shape: one aggregate over the dim side's KEY column builds
    the word table (word-count-sized); k broadcast hash probes per
    fact row (codegen'd); the real join then runs on the pruned side.
    At 100 TB this is the shuffle-mass killer when the dim has
    10^5-10^8 keys and the fact matches only a slice of them.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(
            "bloom_prejoin supports how='inner' or 'left_semi' only: a "
            "left/outer join must keep non-matching big-side rows, which "
            "the pre-filter removes"
        )
    _, big_cat = _bloom_key(big, on)
    _, small_cat = _bloom_key(small, on)
    if big_cat != small_cat:
        raise ValueError(
            f"bloom_prejoin key dtype mismatch on {on!r}: big side is "
            f"{big_cat}, small side is {small_cat}. The Bloom probe hashes "
            "canonicalized values (integral -> long, else string), so "
            "cross-category keys (e.g. int vs double) would silently prune "
            "matches a plain type-coercing join keeps — cast one side first"
        )
    # Pin the word table: bloom_prefilter broadcasts it k times, and
    # without the pin each broadcast re-plans (and re-executes) the
    # whole dim-side scan + bit_or aggregate — neither plan-time
    # exchange reuse nor AQE stage reuse collapses the copies
    # (verified on the executed plan, r13). The pinned frame is
    # word-count-sized (≤ m_bits/32 rows of two longs).
    words = bloom_words(small, on, m_bits=m_bits, k=k).localCheckpoint(
        eager=True
    )
    return bloom_prefilter(big, words, on, m_bits=m_bits, k=k).join(
        small, on, how
    )
