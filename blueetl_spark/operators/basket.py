"""Market-basket association rules (pairwise support / confidence / lift).

"Which items co-occur in the same basket more than chance" — the
recommendation / co-retrieval primitive (Agrawal & Srikant's Apriori at
its 2-itemset core, which is where the distributed cost lives; longer
itemsets filter recursively from these pairs).

Scale design: baskets dedupe to distinct (basket, item) pairs first, so
the ONLY data-sized stages are one distinct, one self equi-join on the
basket key, and map-side-combined counts. The self join explodes each
basket of k items into k(k−1)/2 ordered pairs — cost tracks the square
of BASKET size (bounded, a cart has tens of items), never corpus size;
a degenerate mega-basket valve (``max_basket_size``) drops outliers
with an explicit count rather than letting one hot basket quadratically
dominate the join. The basket total rides in as a broadcast scalar, so
metrics stay one declarative plan end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    max_basket_size: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Pairwise association metrics over (basket, item) rows:
    ``(item_a, item_b, n_pairs, support, confidence_a_b, lift)`` for
    unordered item pairs (``item_a < item_b``) co-occurring in at least
    ``min_pair_count`` baskets.

    - ``support``     = pair baskets / all baskets
    - ``confidence_a_b`` = pair baskets / baskets containing item_a
    - ``lift``        = support / (supp(a) · supp(b)) — > 1 means the
      pair co-occurs more than independence predicts.

    Duplicate (basket, item) rows collapse first (a quantity-2 line is
    still one co-occurrence). ``max_basket_size`` (optional valve)
    excludes baskets with more items — the skew guard for degenerate
    carts; exclusion is a per-basket aggregate, never a sort.
    """
    if min_pair_count < 1:
        raise ValueError("min_pair_count must be >= 1")
    b, i = F.col(basket_col), F.col(item_col)
    items = (
        df.filter(b.isNotNull() & i.isNotNull())
        .select(b.alias("__b"), i.alias("__i"))
        .distinct()
    )
    if max_basket_size is not None:
        sizes = items.groupBy("__b").agg(F.count("*").alias("__sz"))
        items = items.join(
            sizes.filter(F.col("__sz") <= max_basket_size).select("__b"),
            "__b",
            "left_semi",
        )
    # pin: consumed by the basket total, item counts, and both join sides
    items = items.localCheckpoint(eager=True)
    totals = items.agg(
        F.countDistinct("__b").cast("double").alias("__n_baskets")
    )
    item_counts = items.groupBy("__i").agg(F.count("*").alias("__ni"))
    a = items.select(F.col("__b"), F.col("__i").alias("item_a"))
    c = items.select(F.col("__b"), F.col("__i").alias("item_b"))
    pairs = (
        a.join(c, "__b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_pairs"))
        .filter(F.col("n_pairs") >= min_pair_count)
    )
    na = item_counts.select(
        F.col("__i").alias("item_a"), F.col("__ni").alias("__na")
    )
    nb = item_counts.select(
        F.col("__i").alias("item_b"), F.col("__ni").alias("__nb")
    )
    out = (
        pairs.join(na, "item_a")
        .join(nb, "item_b")
        .crossJoin(F.broadcast(totals))
    )
    p = F.col("n_pairs").cast("double")
    n = F.col("__n_baskets")
    return out.select(
        "item_a",
        "item_b",
        "n_pairs",
        F.round(p / n, round_to).alias("support"),
        F.round(p / F.col("__na"), round_to).alias("confidence_a_b"),
        F.round(
            (p / n) / ((F.col("__na") / n) * (F.col("__nb") / n)),
            round_to,
        ).alias("lift"),
    )
