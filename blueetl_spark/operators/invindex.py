"""Persisted positional inverted index + phrase search.

The scan path (``text.phrase_count``) re-reads the corpus per query —
right for one-off greps, wrong for a query workload against a static
100 TB corpus.  This module builds the classic IR structure once:

- ``build_inverted_index``: posting rows ``(token, doc_id, pos)``
  written as parquet **sorted by token within each output file**, so a
  phrase probe's ``token IN (...)`` filter rides parquet min/max row-
  group pruning and dictionary pushdown — the query reads only the
  row groups containing its tokens, never the whole index.  A
  ``_df.parquet`` side table stores per-token document frequencies for
  planning.
- ``phrase_search``: consecutive-token match via posting-list joins.
  The **rarest phrase token anchors the plan** (df table consulted
  first): its postings — the smallest set — are joined against each
  other token's postings on ``(doc_id, pos ± offset)``, so intermediate
  cardinality starts minimal and only shrinks.  Equi-joins throughout;
  with a broadcast-sized anchor the whole probe is map-only against
  the pruned index scan.

Counts match ``text.phrase_count`` exactly (overlapping starts
included) — pinned by tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blueetl_spark.operators.text import tokens


def build_inverted_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_files: int = 32,
) -> None:
    """Write the positional posting table and its document-frequency
    side table under ``path``.

    Postings are repartitioned on ``token`` (co-locates each token's
    postings for one-file reads) and sorted by ``(token, doc_id, pos)``
    within partitions — the sort is what makes min/max row-group
    pruning selective for token probes.
    """
    posting = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(text_col)).alias("pos", "token"),
    ).filter(F.col("token") != "")
    (
        posting.repartition(n_files, "token")
        .sortWithinPartitions("token", "doc_id", "pos")
        .write.mode("overwrite")
        .parquet(f"{path}/postings.parquet")
    )
    spark = df.sparkSession
    dfreq = (
        spark.read.parquet(f"{path}/postings.parquet")
        .groupBy("token")
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.count("*").alias("tf"),
        )
    )
    dfreq.repartition(1).write.mode("overwrite").parquet(f"{path}/_df.parquet")


def phrase_search(
    spark: SparkSession,
    path: str,
    phrase: str,
) -> DataFrame:
    """Documents containing the token phrase, with occurrence counts:
    ``(doc_id, n_occ)`` — exactly ``text.phrase_count``'s result, read
    from the persisted index instead of the corpus.

    The probe reads postings with ``token IN (phrase tokens)`` (pushed
    to the parquet scan), anchors on the rarest token, and verifies
    adjacency with one equi-join per remaining distinct token on
    ``(doc_id, anchor_pos)`` — a phrase occurrence at anchor position
    ``p`` requires token ``j`` at ``p + (j - anchor_offset)``.
    """
    p_toks = phrase.split()
    if not p_toks:
        raise ValueError("empty phrase")
    post = spark.read.parquet(f"{path}/postings.parquet")
    dfreq = spark.read.parquet(f"{path}/_df.parquet")
    freqs = {
        r["token"]: r["tf"]
        for r in dfreq.filter(F.col("token").isin(p_toks)).collect()
    }
    if len(freqs) < len(set(p_toks)):
        # some phrase token never occurs -> empty result, correct schema
        return spark.createDataFrame([], "doc_id long, n_occ long")

    # anchor = offset of the token with the fewest postings
    anchor = min(range(len(p_toks)), key=lambda j: freqs[p_toks[j]])
    probe = post.filter(F.col("token").isin(list(set(p_toks))))
    cur = (
        probe.filter(F.col("token") == p_toks[anchor])
        .select("doc_id", (F.col("pos") - anchor).alias("__start"))
    )
    # one equi-join per remaining phrase offset; posting rows are unique
    # on (doc_id, pos), so each inner join can only shrink cardinality
    for j, tok in enumerate(p_toks):
        if j == anchor:
            continue
        side = probe.filter(F.col("token") == tok).select(
            F.col("doc_id"), (F.col("pos") - j).alias("__start")
        )
        cur = cur.join(side, ["doc_id", "__start"])
    return (
        cur.groupBy("doc_id")
        .agg(F.count("*").alias("n_occ"))
        .select("doc_id", F.col("n_occ").cast("long").alias("n_occ"))
    )
