"""PQ / IVF-PQ stress: encode + ADC-search throughput at ANN-realistic sizes.

Evidence for PLANS.md that the PQ path holds beyond gate scale: a 500k x
dim-64 corpus encoded at 8x256 (the canonical config, 32x compression of
float32 payloads), brute-force ADC over the full encoded corpus, and the
persisted IVF-PQ index lifecycle (build with residual encoding, probe-
pruned search).

Run: python tools/stress_pq.py [n_vectors] [n_centroids]
"""

import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from blueetl_spark.operators import pq  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
NCELLS = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
DIM = 64

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .appName("stress_pq")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

corpus = (
    spark.range(N)
    .select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda i: ((F.xxhash64(F.col("id"), i) % 100_000) / 50_000.0).cast(
                "float"
            ),
        ).alias("embedding"),
    )
    .repartition(32)
    .cache()
)
corpus.count()
print(f"corpus={N} vectors dim={DIM}")

t0 = time.time()
cbs = pq.train_pq_codebooks(corpus, n_subspaces=8, n_codes=256, sample_size=65536)
print(f"train 8x256 codebooks (64k sample): {time.time() - t0:.1f}s")

t0 = time.time()
codes = pq.pq_encode(corpus, cbs, drop_vec=True).cache()
codes.count()
print(f"pq_encode {N} vectors: {time.time() - t0:.1f}s")

queries = corpus.filter(F.col("vec_id") % max(1, N // 100) == 0).cache()
nq = queries.count()
t0 = time.time()
rows = pq.adc_search(queries, codes, cbs, k=5).count()
print(f"adc_search bruteforce ({nq} queries x {N} codes): "
      f"{time.time() - t0:.1f}s, {rows} rows")

path = tempfile.mkdtemp(prefix="stress_ivfpq_")
t0 = time.time()
info = pq.build_ivf_pq_index(
    corpus, path, n_centroids=NCELLS, n_subspaces=8, n_codes=256
)
print(f"build_ivf_pq_index ({NCELLS} cells, residual 8x256): "
      f"{time.time() - t0:.1f}s, {info}")

t0 = time.time()
rows = pq.search_ivf_pq_index(spark, queries, path, k=5, n_probe=16).count()
print(f"search_ivf_pq_index ({nq} queries, probe 16/{NCELLS}): "
      f"{time.time() - t0:.1f}s, {rows} rows")
spark.stop()
