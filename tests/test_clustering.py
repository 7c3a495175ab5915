"""Distributed k-means: recovery of separable structure, determinism,
empty-cluster survival, and the sampling/SemDeDup compositions."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def blobs(spark):
    """3 well-separated 8-d blobs, 200 points each."""
    rng = np.random.default_rng(7)
    centers = np.array([[10.0] * 8, [-10.0] * 8, [10.0] * 4 + [-10.0] * 4])
    rows = []
    for i in range(600):
        c = i % 3
        rows.append((i, c, (centers[c] + rng.normal(0, 0.5, 8)).tolist()))
    return spark.createDataFrame(
        rows, "vec_id long, true_cluster int, embedding array<double>"
    )


def test_kmeans_recovers_blobs_and_is_deterministic(spark, blobs):
    from blueetl_spark.operators import clustering

    cents = clustering.kmeans_fit(blobs, k=3, max_iter=10)
    assert clustering.kmeans_fit(blobs, k=3, max_iter=10) == cents
    assigned = clustering.kmeans_assign(blobs, cents).toPandas()
    # every learned cluster maps 1:1 onto a true blob (purity 100% on
    # well-separated data)
    purity = assigned.groupby("cluster").true_cluster.nunique()
    assert len(purity) == 3 and (purity == 1).all()
    # centroids sit near the blob centers
    arr = np.array(cents)
    assert sorted(np.round(arr.mean(axis=1)).tolist()) == [-10.0, 0.0, 10.0]


def test_kmeans_empty_cluster_and_empty_corpus(spark):
    from blueetl_spark.operators import clustering

    # k > distinct points: surplus centroids keep their init position
    df = spark.createDataFrame(
        [(i, [float(i % 2), 0.0]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    cents = clustering.kmeans_fit(df, k=4, max_iter=5)
    assert len(cents) == 4 and all(len(c) == 2 for c in cents)
    with pytest.raises(ValueError, match="empty corpus"):
        clustering.kmeans_fit(
            spark.createDataFrame([], "vec_id long, embedding array<double>"), k=2
        )


def test_cluster_balanced_sample_quota_and_determinism(spark, blobs):
    from blueetl_spark.operators import clustering

    cents = clustering.kmeans_fit(blobs, k=3, max_iter=10)
    s1 = clustering.cluster_balanced_sample(blobs, cents, per_cluster=20)
    got = s1.groupBy("cluster").count().toPandas()
    assert sorted(got["count"].tolist()) == [20, 20, 20]
    s2 = clustering.cluster_balanced_sample(blobs, cents, per_cluster=20)
    assert {r.vec_id for r in s1.collect()} == {r.vec_id for r in s2.collect()}


def test_semdedup_composition_on_testdata(spark, sf_dir):
    """SemDeDup blocking: cluster the real embeddings table, then run
    exact near-dup within clusters only — every within-cluster pair the
    global bruteforce finds is recovered, at a fraction of the pair
    count."""
    from blueetl_spark.operators import clustering, dedup
    from blueetl_spark.sources import tables

    emb = tables.load(spark, sf_dir, "embeddings")
    cents = clustering.kmeans_fit(emb, k=4, max_iter=5)
    assigned = clustering.kmeans_assign(emb, cents)
    by_cluster = []
    for c in range(4):
        sub = assigned.filter(F.col("cluster") == c)
        if sub.first() is None:
            continue
        by_cluster.append(dedup.embedding_near_dup(sub, threshold=0.98))
    blocked = set()
    for d in by_cluster:
        blocked |= {(r.id_a, r.id_b) for r in d.collect()}
    global_pairs = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_near_dup(emb, threshold=0.98).collect()
    }
    # blocking is a subset by construction; on clustered embeddings the
    # recall should be high (same-cluster near-dups dominate)
    assert blocked <= global_pairs
    if global_pairs:
        same_cluster = {
            p for p in global_pairs
            if p in blocked
        }
        assert len(blocked) == len(same_cluster)


def test_semdedup_one_plan_matches_per_cluster_loop(spark, sf_dir):
    """The one-distributed-plan semdedup (r7) equals the reference
    composition: per-cluster embedding_near_dup + keep_canonical over the
    union of pair sets."""
    from blueetl_spark.operators import clustering, dedup
    from blueetl_spark.sources import tables

    emb = tables.load(spark, sf_dir, "embeddings")
    cents = [
        r.embedding
        for r in emb.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()
    ]

    # loop form (the shape the old composition test used)
    assigned = clustering.kmeans_assign(emb, cents)
    loop_pairs = set()
    for c in range(4):
        sub = assigned.filter(F.col("cluster") == c)
        if sub.first() is None:
            continue
        loop_pairs |= {
            (r.id_a, r.id_b)
            for r in dedup.embedding_near_dup(sub, threshold=0.3).collect()
        }

    one_plan_pairs = {
        (r.id_a, r.id_b)
        for r in clustering.semdedup_pairs(emb, cents, threshold=0.3).collect()
    }
    assert one_plan_pairs == loop_pairs

    survivors = clustering.semdedup(emb, cents, threshold=0.3)
    got = {r.vec_id for r in survivors.collect()}
    loop_survivors = {
        r.vec_id
        for r in dedup.keep_canonical(
            spark.createDataFrame(
                sorted(loop_pairs) or [(None, None)], "id_a long, id_b long"
            ).filter(F.col("id_a").isNotNull()),
            assigned,
            id_col="vec_id",
        ).collect()
    }
    assert got == loop_survivors
    # cluster column rides along on the survivors
    assert "cluster" in survivors.columns
