"""Corpus snapshot diffing: added / removed / changed rows between two
dataset versions, by id + content digest.

Beyond-reference addition for dataset versioning: before shipping a new
corpus build, the release question is "what changed vs the last one" —
answered here without comparing payloads row-by-row across the cluster:
each side reduces to (id, digest) first (md5 of the compared columns,
map-only), so the join that actually lines the versions up moves 16-byte
digests, not documents. One shuffle per side on the id, then a single
full-outer join; Catalyst prunes every non-compared column at the scan.

Changed-row semantics are digest-based: any difference in the compared
columns counts, and what changed (not just that it changed) is left to
the caller to look up by id — the diff output is deliberately narrow so
it stays cheap to materialize and join at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """(id, status) with status ∈ {added, removed, changed}: rows only
    for differences — identical rows produce no output, so the result
    size tracks the delta, not the corpus. ``compare_cols`` defaults to
    every shared non-id column (sorted for a stable digest layout)."""
    if compare_cols is None:
        compare_cols = sorted(
            (set(old.columns) & set(new.columns)) - {id_col}
        )
    if not compare_cols:
        raise ValueError("corpus_diff: no columns to compare")

    def digest(df: DataFrame) -> DataFrame:
        # each column contributes a self-delimiting part:
        #   NULL        -> "n0:"
        #   value       -> "v<len>:<value>"
        # The null/value flag keeps NULL distinct from every literal
        # string, and the length prefix makes the serialization
        # injection-proof: no value can shift content across column
        # boundaries (without it, ('a\x1fvb','') and ('a','b\x1fv')
        # serialized identically and a real change hashed as unchanged).
        parts = []
        for c in compare_cols:
            s = F.col(c).cast("string")
            parts.append(
                F.when(F.col(c).isNull(), F.lit("n0:")).otherwise(
                    F.concat(
                        F.lit("v"), F.length(s).cast("string"), F.lit(":"), s
                    )
                )
            )
        return df.select(
            F.col(id_col),
            F.md5(F.concat(*parts)).alias("__digest"),
        )

    o = digest(old).withColumnRenamed("__digest", "__old")
    n = digest(new).withColumnRenamed("__digest", "__new")
    joined = o.join(n, id_col, "full_outer")
    return joined.select(
        id_col,
        F.when(F.col("__old").isNull(), F.lit("added"))
        .when(F.col("__new").isNull(), F.lit("removed"))
        .when(F.col("__old") != F.col("__new"), F.lit("changed"))
        .alias("status"),
    ).filter(F.col("status").isNotNull())
