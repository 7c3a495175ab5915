"""Recall report for the approximate operators: each LSH/IVF method vs its
exact counterpart on the driver-provided tables.

Usage: python tools/recall_report.py [sf_dir]
Prints one JSON line per method: candidate/result counts, recall, and the
work-reduction factor (pairs scored vs exact).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import pyspark.sql.functions as F

    from blueetl_spark.operators import dedup, similarity
    from blueetl_spark.queries import (
        EMB_DUP_THRESHOLD,
        JACCARD_NGRAM,
        JACCARD_THRESHOLD,
        KNN_K,
        KNN_QUERY_MAX_ID,
    )
    from blueetl_spark.session import get_spark
    from blueetl_spark.sources import tables

    spark = get_spark(app_name="recall")
    docs = tables.load(spark, sf_dir, "documents")
    emb = tables.load(spark, sf_dir, "embeddings")

    def pairs(df, a="id_a", b="id_b"):
        return {(r[a], r[b]) for r in df.select(a, b).collect()}

    # MinHash-LSH vs exact Jaccard
    true_j = pairs(dedup.jaccard_pairs(docs, n=JACCARD_NGRAM, threshold=JACCARD_THRESHOLD))
    cand = pairs(dedup.minhash_lsh_candidates(docs, n=JACCARD_NGRAM))
    n_docs = docs.count()
    print(json.dumps({
        "method": "minhash_lsh", "true_pairs": len(true_j),
        "candidates": len(cand),
        "recall": round(len(true_j & cand) / max(len(true_j), 1), 4),
        "pair_reduction": round(n_docs * (n_docs - 1) / 2 / max(len(cand), 1), 1),
    }))

    # Embedding LSH vs exact cosine near-dup
    true_e = pairs(dedup.embedding_near_dup(emb, threshold=EMB_DUP_THRESHOLD))
    got_e = pairs(dedup.embedding_near_dup(
        emb, threshold=EMB_DUP_THRESHOLD, method="lsh", n_planes=4))
    print(json.dumps({
        "method": "embedding_lsh_4planes", "true_pairs": len(true_e),
        "found": len(got_e),
        "recall": round(len(true_e & got_e) / max(len(true_e), 1), 4),
    }))

    # ANN: LSH and IVF top-k vs bruteforce
    queries_df = emb.filter(F.col("vec_id") < KNN_QUERY_MAX_ID)
    bf = pairs(similarity.knn_bruteforce(queries_df, emb, k=KNN_K),
               "query_id", "neighbor_id")
    from blueetl_spark.operators import pq

    pq_cbs = pq.train_pq_codebooks(emb, n_subspaces=8, n_codes=256)
    pq_codes = pq.pq_encode(emb, pq_cbs, drop_vec=True)
    for name, df in [
        ("knn_lsh", similarity.knn_lsh(queries_df, emb, k=KNN_K)),
        ("knn_ivf_sampled", similarity.knn_ivf(queries_df, emb, k=KNN_K)),
        ("knn_ivf_kmeans", similarity.knn_ivf(
            queries_df, emb, k=KNN_K,
            centroids=similarity.train_centroids_kmeans(emb, n_centroids=16))),
        ("knn_pq_8x256", pq.adc_search(queries_df, pq_codes, pq_cbs, k=KNN_K)),
    ]:
        got = pairs(df, "query_id", "neighbor_id")
        print(json.dumps({
            "method": name, "true_topk": len(bf), "found": len(got),
            "recall": round(len(bf & got) / max(len(bf), 1), 4),
        }))

    # PQ self-ADC (quantization distortion floor): ADC of every vector
    # against ITS OWN codes. This is the calibration number for the
    # ADC-thresholded streaming semantic dedup (index_kind='ivf_pq'):
    # an exact duplicate of an indexed vector scores ~this distortion,
    # so the ADC bound 2*(1-threshold) must sit ABOVE the chosen
    # quantile or exact dups survive.
    import tempfile

    import numpy as np

    idx = tempfile.mkdtemp(prefix="recall_ivfpq_") + "/ivfpq"
    pq.build_ivf_pq_index(emb, idx, n_centroids=16, n_subspaces=8, n_codes=256)
    cents, cbs_np = pq._load_ivf_pq_codebooks(spark, idx)
    cent_np = __import__("numpy").asarray(cents)

    assigned = (
        similarity.assign_cells(
            emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
            cents, "embedding", n=1,
        )
        .withColumn("cell", F.col("__cells")[0])
        .drop("__cells")
    )

    def self_adc(batches):
        import pandas as pd  # noqa: PLC0415 - executor-side import

        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            res = v - cent_np[pdf["cell"].to_numpy()]
            codes = pq._encode_np(res, cbs_np)
            rec = np.concatenate(
                [cbs_np[m][codes[:, m]] for m in range(len(cbs_np))], axis=1
            )
            yield pd.DataFrame({"err": ((res - rec) ** 2).sum(axis=1)})

    errs = assigned.mapInPandas(self_adc, "err double")
    p50, p90, p99 = errs.stat.approxQuantile("err", [0.5, 0.9, 0.99], 0.01)
    print(json.dumps({
        "method": "ivf_pq_self_adc_distortion",
        "p50": round(p50, 4), "p90": round(p90, 4), "p99": round(p99, 4),
        "note": "semantic dedup ADC bound 2*(1-threshold) must exceed "
                "this floor to catch exact duplicates",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
