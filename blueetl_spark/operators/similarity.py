"""Approximate-nearest-neighbor search over embedding columns.

- :func:`knn_bruteforce` — exact top-k cosine via a join + higher-order
  functions (``zip_with``/``aggregate``), all JVM-side. The baseline, and
  exact for verification. Cost O(|Q|·|C|) — fine when the query side is
  small or as the within-bucket step below.
- :func:`knn_lsh` — random-hyperplane LSH: sign-bit sketches bucket the
  corpus; queries probe their own bucket (+ optional multi-probe), then
  brute-force within the bucket. The 100 TB path: the corpus is hashed
  once (one scan), the join is an equi-join on the bucket key, and AQE
  handles bucket skew.
- :func:`knn_ivf` — IVF-style: k-means-ish centroids sampled from the data
  (deterministic seed), vectors assigned to nearest centroid (broadcast),
  queries probe ``n_probe`` nearest centroids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("__norm", _norm(F.col(vec_col)))


def knn_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    Output: (query_id, neighbor_id, cosine, rank), rank 1..k by
    (cosine desc, neighbor_id) — the id tie-break makes ranks
    deterministic. Self-matches (same id) are excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    ).withColumn("__qn", _norm(F.col("__qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    ).withColumn("__cn", _norm(F.col("__cv")))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine", _dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (driver-side, tiny)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def sketch(df: DataFrame, planes: list[list[float]], vec_col: str = "embedding"):
    """Sign-bit sketch of each vector against the given hyperplanes → long."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        plane_arr = F.array(*[F.lit(float(x)) for x in plane])
        dot = _dot(F.col(vec_col), plane_arr)
        bucket = bucket.bitwiseOR(
            F.when(dot >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return df.withColumn("__bucket", bucket)


def sketch_tables(
    df: DataFrame,
    dim: int,
    n_planes: int,
    n_tables: int,
    seed: int,
    vec_col: str,
) -> DataFrame:
    """(table, bucket) membership rows for multi-table hyperplane LSH.

    OR-amplification: ``n_tables`` independent sketches; two vectors are
    candidates when ANY table buckets them together. For per-plane match
    probability p (= 1 − θ/π), candidate recall is ``1 − (1 − pᵏ)ᴸ`` —
    the knob that turns one low-recall table into a tunable structure.

    Implemented as one Arrow-batched ``mapInPandas`` pass: all
    ``n_tables × n_planes`` dot products per vector are a single numpy
    ``V @ P.T`` (the plane matrix rides inside the closure — it is
    config-sized). The expression-tree alternative (a literal per plane
    coefficient) costs thousands of Catalyst nodes and interpreted
    per-element lambda evaluation; the matrix kernel is both faster and
    cheaper to plan. Output: input columns + (__table, __bucket) rows.
    """
    import numpy as np
    import pandas as pd

    planes = np.stack(
        [
            np.asarray(_hyperplanes(dim, n_planes, seed + 7919 * t))
            for t in range(n_tables)
        ]
    )  # (n_tables, n_planes, dim)
    weights = (1 << np.arange(n_planes, dtype=np.int64))  # bucket bit weights
    in_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    out_schema = f"{in_fields}, __table int, __bucket long"

    def op(batches):
        for pdf in batches:
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            out = []
            for t in range(planes.shape[0]):
                signs = (v @ planes[t].T) >= 0  # (rows, n_planes)
                buckets = (signs * weights).sum(axis=1)
                part = pdf.copy()
                part["__table"] = t
                part["__bucket"] = buckets
                out.append(part)
            yield pd.concat(out, ignore_index=True)

    return df.mapInPandas(op, out_schema)


def knn_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k cosine via multi-table random-hyperplane bucketing.

    Same output schema as :func:`knn_bruteforce`. Candidates are the union
    over ``n_tables`` independent bucketings (OR-amplification), deduped
    before scoring so each (query, neighbor) pair is scored once. The
    corpus-side sketches are one scan; the candidate join is an equi-join
    on (table, bucket) instead of a cross join.
    """
    q = sketch_tables(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")),
        dim, n_planes, n_tables, seed, "__qv",
    )
    c = sketch_tables(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")),
        dim, n_planes, n_tables, seed, "__cv",
    )
    cand = (
        q.select("query_id", "__table", "__bucket")
        .join(c.select("neighbor_id", "__table", "__bucket"), ["__table", "__bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    ).withColumn("__qn", _norm(F.col("__qv")))
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    ).withColumn("__cn", _norm(F.col("__cv")))
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn(
            "cosine",
            _dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def train_centroids_kmeans(
    corpus: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
) -> list[list[float]]:
    """Train IVF centroids with Spark ML KMeans (distributed Lloyd's) —
    the offline index-build step of a production IVF. Returns plain
    Python centroid vectors (driver-side, tiny)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter).fit(train)
    return [c.tolist() for c in model.clusterCenters()]


def knn_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-flat ANN: corpus partitioned by nearest centroid cell; each
    query probes its ``n_probe`` nearest centroids' cells.

    ``centroids`` accepts a trained codebook (see
    :func:`train_centroids_kmeans`); the default is a deterministic seeded
    sample of the corpus — cheaper and fully reproducible, at some recall
    cost vs trained centroids.
    """
    if centroids is not None:
        cents = list(enumerate(centroids))
    else:
        cents = [
            (i, row[vec_col])
            for i, row in enumerate(
                corpus.select(vec_col)
                .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
                .limit(n_centroids)
                .collect()
            )
        ]

    def nearest_centroids(vec, n: int):
        sims = F.array(
            *[
                F.struct(
                    _dot(vec, F.array(*[F.lit(float(x)) for x in cvec])).alias("d"),
                    F.lit(ci).alias("c"),
                )
                for ci, cvec in cents
            ]
        )
        top = F.slice(F.reverse(F.array_sort(sims)), 1, n)
        return F.transform(top, lambda s: s["c"])

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    ).withColumn("__cell", nearest_centroids(F.col("__cv"), 1)[0]).withColumn(
        "__cn", _norm(F.col("__cv"))
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    ).withColumn(
        "__cell", F.explode(nearest_centroids(F.col("__qv"), n_probe))
    ).withColumn("__qn", _norm(F.col("__qv")))
    scored = (
        q.join(c, "__cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            _dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .dropDuplicates(["query_id", "neighbor_id"])
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
