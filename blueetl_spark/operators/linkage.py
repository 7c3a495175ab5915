"""Record-linkage operators: edit-distance similarity self-join with
exact-recall q-gram blocking.

The naive formulation is a cross join with a Levenshtein verify —
quadratic in ROWS.  This module's plan is the classic scalable shape
(count filtering over q-grams, Gravano et al., VLDB 2001):

1. dedupe to DISTINCT string values (corpus rows collapse to the value
   space, usually orders of magnitude smaller);
2. generate padded character q-grams per value and equi-join on the
   gram, counting bag-intersection sizes per value pair;
3. keep only pairs meeting the count-filter bound — if
   ``ed(s, t) <= d`` then the padded q-gram bags share at least
   ``max(|s|, |t|) + q - 1 - d*q`` grams (each edit destroys at most
   ``q`` grams), so the filter has EXACT recall;
4. verify survivors with Spark's banded ``levenshtein(l, r, d)``
   (O(d*min_len) instead of full DP);
5. map surviving value pairs back to row ids with two equi-joins, and
   emit same-value id pairs (distance 0) from a separate value
   equi-join that never touches the gram machinery.

Strings short enough that the bound is vacuous (``len <= (d-1)*q + 1``
— they can be within distance ``d`` while sharing zero grams) are
routed through a small cross join over their DISTINCT values, size-
gated: the distinct count of such tiny strings is alphabet-bounded in
practice, and the gate raises actionably rather than letting the cross
join grow.

All expressions are built-in JVM functions (``transform``/``substring``
for gram generation, ``levenshtein`` for the verify) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Padding sentinel for q-gram generation: outside every realistic
# alphabet, so padded grams of different strings never collide with
# interior grams accidentally.
_PAD = ""


def _padded_grams(s: Column, q: int) -> Column:
    """Array of padded character ``q``-grams (with multiplicity):
    ``q - 1`` sentinel chars on each side, so a string of length L
    yields exactly ``L + q - 1`` grams."""
    p = F.concat(F.lit(_PAD * (q - 1)), s, F.lit(_PAD * (q - 1)))
    return F.transform(
        F.sequence(F.lit(1), F.length(p) - F.lit(q - 1)),
        lambda i: F.substring(p, i, F.lit(q)),
    )


def edit_distance_pairs(
    df: DataFrame,
    string_col: str = "name",
    id_col: str = "id",
    max_dist: int = 2,
    q: int = 2,
    max_short_distinct: int = 20_000,
) -> DataFrame:
    """All row pairs whose ``string_col`` values are within Levenshtein
    distance ``max_dist``: ``(id_a, id_b, dist)`` with ``id_a < id_b``.

    Exact semantics (the q-gram blocking has exact recall; the verify
    removes every blocking false positive), so the DuckDB oracle is the
    plain quadratic ``levenshtein(a, b) <= d`` join.  Null strings are
    dropped (distance to NULL is undefined).

    Skew note: single-gram buckets (step 2's join key) follow character
    frequency — heavy grams are handled by AQE skew-join splitting, and
    the count-filter aggregate is map-side combinable on (value pair).
    """
    d = max_dist
    short_cap = (d - 1) * q + 1  # bound vacuous at or below this length

    rows = df.select(
        F.col(id_col).alias("__id"), F.col(string_col).alias("__v")
    ).filter(F.col("__v").isNotNull())
    vals = (
        rows.select("__v")
        .distinct()
        .withColumn("__len", F.length("__v"))
        # compact value id for the heavy gram path (guide §2.3: shuffle
        # keys, not payloads) — nondeterministic per se, but the eager
        # pin materializes it exactly once for every consumer
        .withColumn("__vid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)  # feeds grams, short path, id maps
    )

    # -- main path: count-filtered gram join over non-vacuous pairs ----
    # The gram-grain frame feeds BOTH sides of the count-filter
    # self-join, so the explode + (value, gram) aggregate plans twice.
    # An eager pin was measured r13 (matched-calib floors 2.64 -> 2.82 s
    # at sf0.1): the materialization job costs more than the duplicated
    # map-heavy subtree, which runs fully parallel inside the one lazy
    # job — so the duplicate is kept deliberately.
    # The heavy path carries LONGS only (r13, guide §2.3): the value id
    # instead of the value string (strings re-attach candidate-sized,
    # below) and xxhash64 of the gram instead of the gram. Hash-merged
    # gram classes keep the count bound EXACT-recall:
    # min(Σ c1, Σ c2) ≥ Σ min(c1, c2), so a true pair's common count
    # only grows; false extras die in the levenshtein verify.
    grams = (
        vals.select(
            "__vid", "__len",
            F.explode(_padded_grams(F.col("__v"), q)).alias("__g"),
        )
        .select("__vid", "__len", F.xxhash64("__g").alias("__gh"))
        .groupBy("__vid", "__len", "__gh")
        .agg(F.count("*").alias("__c"))
    )
    g1 = grams.select(
        F.col("__vid").alias("__i1"), F.col("__len").alias("__l1"),
        F.col("__gh"), F.col("__c").alias("__c1"),
    )
    g2 = grams.select(
        F.col("__vid").alias("__i2"), F.col("__len").alias("__l2"),
        F.col("__gh"), F.col("__c").alias("__c2"),
    )
    bound = F.greatest("__l1", "__l2") + F.lit(q - 1) - F.lit(d * q)
    main_ids = (
        g1.join(g2, "__gh")
        .filter(
            (F.col("__i1") < F.col("__i2"))
            & (F.abs(F.col("__l1") - F.col("__l2")) <= d)  # ed >= |len diff|
            # both-short pairs belong to the short path (bound vacuous)
            & ((F.col("__l1") > short_cap) | (F.col("__l2") > short_cap))
        )
        .groupBy("__i1", "__i2", "__l1", "__l2")
        .agg(F.sum(F.least("__c1", "__c2")).alias("__common"))
        .filter(F.col("__common") >= bound)
        .select("__i1", "__i2")
    )
    # re-attach strings (candidate-sized joins against the pinned vals);
    # vid order is not string order, so canonicalize for the union+distinct
    main = (
        main_ids.join(
            vals.select(F.col("__vid").alias("__i1"), F.col("__v").alias("__va")),
            "__i1",
        )
        .join(
            vals.select(F.col("__vid").alias("__i2"), F.col("__v").alias("__vb")),
            "__i2",
        )
        .select(
            F.least("__va", "__vb").alias("__v1"),
            F.greatest("__va", "__vb").alias("__v2"),
        )
    )

    # -- short path: tiny strings can match while sharing zero grams --
    short = vals.filter(F.col("__len") <= short_cap)
    n_short = short.limit(max_short_distinct + 1).count()
    if n_short > max_short_distinct:
        raise ValueError(
            f"{n_short}+ distinct strings of length <= {short_cap} exceed "
            f"max_short_distinct={max_short_distinct}; their pairing is a "
            "cross join (the q-gram bound is vacuous there). Raise the cap "
            "or pre-bucket tiny strings upstream."
        )
    # Only BOTH-short pairs need the cross join: a short-x-longer pair
    # has max(len) >= short_cap + 1, which makes the bound >= 1 — the
    # theorem then guarantees >= 1 shared gram, so the main path finds it.
    s1 = short.select(F.col("__v").alias("__v1"), F.col("__len").alias("__l1"))
    s2 = short.select(F.col("__v").alias("__v2"), F.col("__len").alias("__l2"))
    shorts = (
        F.broadcast(s1)
        .join(s2, (F.col("__v1") < F.col("__v2")) & (F.abs(F.col("__l1") - F.col("__l2")) <= d))
        .select("__v1", "__v2")
    )

    # -- verify (banded DP: -1 when the distance exceeds d) ------------
    verified = (
        main.unionByName(shorts)
        .distinct()
        .withColumn("__dist", F.levenshtein("__v1", "__v2", d))
        .filter(F.col("__dist") >= 0)
    )

    # -- map value pairs back to row ids -------------------------------
    ids1 = rows.select(F.col("__id").alias("__ia"), F.col("__v").alias("__v1"))
    ids2 = rows.select(F.col("__id").alias("__ib"), F.col("__v").alias("__v2"))
    cross_ids = (
        verified.join(ids1, "__v1")
        .join(ids2, "__v2")
        .select(
            F.least("__ia", "__ib").alias("id_a"),
            F.greatest("__ia", "__ib").alias("id_b"),
            F.col("__dist").cast("long").alias("dist"),
        )
    )
    same = rows.select(F.col("__id").alias("__ia"), "__v")
    same_ids = (
        same.join(rows.select(F.col("__id").alias("__ib"), "__v"), "__v")
        .filter(F.col("__ia") < F.col("__ib"))
        .select(
            F.col("__ia").alias("id_a"),
            F.col("__ib").alias("id_b"),
            F.lit(0).cast("long").alias("dist"),
        )
    )
    return cross_ids.unionByName(same_ids)
