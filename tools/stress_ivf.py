"""IVF ANN stress: 4096-centroid codebook over a synthesized 500k-vector corpus.

Evidence for PLANS.md that the numpy-kernel assignment path
(`similarity.assign_cells`) holds at real-IVF codebook sizes: the previous
per-centroid literal expression tree built O(n_centroids x dim) Catalyst
nodes and could not plan past ~1k centroids; the matrix kernel is one
`V @ C.T` matmul per Arrow batch regardless of codebook size.

Run: python tools/stress_ivf.py [n_vectors] [n_centroids]
"""

import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from blueetl_spark.operators import similarity as sim  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
M = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
DIM = 64

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .appName("stress_ivf")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# Deterministic pseudo-random corpus: dim 64 floats in [-1, 1) derived from
# xxhash64(id, component) — all JVM-side, no data files needed.
corpus = (
    spark.range(N)
    .select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda i: (
                (F.xxhash64(F.col("id"), i) % 100_000) / 50_000.0
            ).cast("float"),
        ).alias("embedding"),
    )
    .repartition(32)
    .cache()
)
corpus.count()

cents = [
    list(map(float, r["embedding"]))
    for r in corpus.select("embedding")
    .orderBy(F.xxhash64(F.col("vec_id"), F.lit(7)))
    .limit(M)
    .collect()
]
print(f"corpus={N} vectors dim={DIM}, codebook={len(cents)} centroids")

t0 = time.time()
assigned = sim.assign_cells(corpus, cents, "embedding", n=1)
n_cells = (
    assigned.select(F.col("__cells")[0].alias("cell"))
    .agg(F.countDistinct("cell"))
    .first()[0]
)
t_assign = time.time() - t0
print(f"assign_cells(n=1): {t_assign:.1f}s, {n_cells} distinct cells occupied")

queries = corpus.filter(F.col("vec_id") % (N // 100) == 0).cache()
nq = queries.count()
t0 = time.time()
out = sim.knn_ivf(
    queries, corpus, k=5, n_probe=8, centroids=cents
)
rows = out.count()
t_knn = time.time() - t0
print(f"knn_ivf end-to-end ({nq} queries, n_probe=8): {t_knn:.1f}s, {rows} result rows")
spark.stop()
