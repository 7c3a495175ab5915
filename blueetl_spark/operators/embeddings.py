"""Embedding-matrix operators: moments/covariance, PCA, random projection.

The embedding half of a curation pipeline (SemDeDup-style clustering,
ANN indexing, JL-compressed dedup) routinely needs the corpus'
second-order statistics and cheap dimensionality reduction. Spark ML's
RowMatrix covers some of this over RDDs; these stay in the DataFrame
world and in this repo's determinism contract.

Scale design:

- **Moments** (mean + covariance): one ``mapInPandas`` pass emits per-
  partition partial moments — ``(n, Σx (d), Σxxᵀ (d²))``, a ~32 KB row
  for d=64 — and the bounded driver reduce folds #partitions such rows
  (the PQ-training / language-profile collect pattern: config-sized by
  construction, never data-sized). One data pass, no shuffle at all.
- **PCA**: eigendecomposition of the d×d covariance on the driver
  (numpy, d is config-sized), with a deterministic sign convention
  (each component's largest-|entry| coordinate is made positive), then
  a map-only Arrow matmul projection. The classic "covariance method"
  PCA — right for d up to a few thousand; beyond that use randomized
  SVD, out of scope here.
- **Random projection** (Achlioptas/JL): a DETERMINISTIC ±1/√k sign
  matrix derived from md5(seed, i, j) — generated in plain Python,
  inlined as literal coefficient chains, so the projection is a pure
  per-row left-to-right fold that any engine replays bit-for-bit
  (the oracle embeds the same literals). Map-only, whole-stage
  codegen, no Python at run time.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def embedding_moments(
    df: DataFrame, vec_col: str = "embedding"
) -> tuple[int, np.ndarray, np.ndarray]:
    """Exact corpus moments of the embedding column: ``(n, mean (d,),
    cov (d, d))`` with population covariance ``E[xxᵀ] − μμᵀ``.
    One Arrow pass + a #partitions-bounded driver reduce."""
    schema = "n long, s binary, ss binary"

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n, s, ss = 0, None, None
        for b in batches:
            if not len(b):
                continue
            x = np.stack(b.iloc[:, 0].to_numpy()).astype(np.float64)
            n += len(x)
            s = x.sum(0) if s is None else s + x.sum(0)
            g = x.T @ x
            ss = g if ss is None else ss + g
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tobytes()], "ss": [ss.tobytes()]}
            )

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n, s, ss = 0, None, None
        for b in batches:
            for r in b.itertuples(index=False):
                n += r.n
                rs, rss = np.frombuffer(r.s), np.frombuffer(r.ss)
                s = rs.copy() if s is None else s + rs
                ss = rss.copy() if ss is None else ss + rss
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tobytes()], "ss": [ss.tobytes()]}
            )

    partials = (
        df.select(F.col(vec_col).cast("array<double>"))
        .filter(F.col(vec_col).isNotNull())
        .mapInPandas(partial, schema)
    )
    # two-level reduce: one partial row per input partition would put
    # #partitions × ~8d² bytes on the driver at 100 TB — fold to ≤ 64
    # rows Spark-side first, then collect the fixed-size remainder
    parts = (
        partials.repartition(64).mapInPandas(fold, schema).collect()
    )
    if not parts:
        raise ValueError("no non-null embeddings")
    n = sum(r.n for r in parts)
    s = np.sum([np.frombuffer(r.s) for r in parts], axis=0)
    d = s.shape[0]
    ss = np.sum(
        [np.frombuffer(r.ss).reshape(d, d) for r in parts], axis=0
    )
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    return n, mean, cov


def pca_fit(
    df: DataFrame, k: int, vec_col: str = "embedding"
) -> dict:
    """Fit a k-component PCA: returns ``{"mean", "components" (k, d),
    "explained_variance" (k,), "n"}``. Deterministic: eigenvectors are
    sign-fixed so each component's largest-|entry| coordinate is
    positive (eigensolvers return arbitrary signs)."""
    n, mean, cov = embedding_moments(df, vec_col)
    d = mean.shape[0]
    if not 1 <= k <= d:
        raise ValueError(f"k must be in [1, {d}]")
    w, v = np.linalg.eigh(cov)  # ascending eigenvalues
    idx = np.argsort(w)[::-1][:k]
    comps = v[:, idx].T  # (k, d)
    flip = np.sign(comps[np.arange(k), np.abs(comps).argmax(axis=1)])
    flip[flip == 0] = 1.0
    comps = comps * flip[:, None]
    return {
        "mean": mean,
        "components": comps,
        "explained_variance": w[idx],
        "n": n,
    }


def pca_transform(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project onto the fitted components: map-only Arrow matmul
    (components broadcast in the closure, config-sized)."""
    mean = np.asarray(model["mean"], dtype=np.float64)
    comps = np.asarray(model["components"], dtype=np.float64)
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    cols = df.columns
    # never .add() onto df.schema — it mutates the frame's cached schema
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(out_col, ArrayType(DoubleType()))]
    )

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            x = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            p = (x - mean) @ comps.T
            b = b[cols].copy()
            b[out_col] = list(p)
            yield b

    return df.mapInPandas(project, out_schema)


def projection_signs(d: int, k: int, seed: str) -> list[list[int]]:
    """The deterministic ±1 JL sign matrix (k, d):
    ``+1`` iff the first hex digit of ``md5(f"{seed}:{i}:{j}")`` is
    even. Plain Python so the oracle can embed the same literals."""
    return [
        [
            1 if int(hashlib.md5(
                f"{seed}:{i}:{j}".encode()).hexdigest()[0], 16) % 2 == 0
            else -1
            for i in range(d)
        ]
        for j in range(k)
    ]


def random_projection(
    df: DataFrame,
    out_dim: int,
    seed: str = "jl",
    vec_col: str = "embedding",
    d: int | None = None,
    round_to: int | None = 6,
) -> DataFrame:
    """Johnson–Lindenstrauss projection to ``out_dim`` dims with the
    deterministic ±1/√k matrix of :func:`projection_signs`, emitted as
    literal coefficient chains — a pure left-to-right per-row fold,
    whole-stage codegen, bit-replayable by the SQL oracle. Output adds
    ``p0 … p{out_dim-1}`` double columns."""
    if d is None:
        # skip NULL embeddings: a leading NULL row would yield a
        # null/-1 dimension and a confusing downstream failure
        probe = (
            df.filter(F.col(vec_col).isNotNull())
            .select(F.size(vec_col))
            .first()
        )
        if probe is None:
            raise ValueError(
                "no non-null embeddings; pass d= explicitly"
            )
        d = probe[0]
    signs = projection_signs(d, out_dim, seed)
    scale = 1.0 / float(out_dim) ** 0.5
    v = F.col(vec_col).cast("array<double>")
    # one HOF fold per output dim over a literal sign row, NOT a
    # d-term expression chain: Catalyst planning over k×d chain nodes
    # cost ~3.5 s for (64, 8) PER EXECUTION; the fold is a handful of
    # nodes. Numerically identical: aggregate's left-to-right
    # (((0+t0)+t1)+…) equals the chain's ((t0+t1)+t2)… in IEEE
    # (0.0 + x == x), so the SQL chain twin still matches bit-for-bit.
    outs: list[Column] = []
    for j in range(out_dim):
        row = F.array(*[F.lit(float(s)) for s in signs[j]])
        acc = F.aggregate(
            F.zip_with(v, row, lambda x, w: x * w),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        expr = acc * F.lit(scale)
        if round_to is not None:
            expr = F.round(expr, round_to)
        outs.append(expr.alias(f"p{j}"))
    return df.select(*df.columns, *outs)


def centroid_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    vec_col: str = "embedding",
    by: Sequence[str] = (),
    round_to: int | None = 6,
) -> DataFrame:
    """Embedding-space drift between two corpus/feed versions per
    group: the cosine similarity of the two sides' centroid vectors —
    the vector twin of ``timeseries.ks_drift`` (scalars drift in
    distribution; embeddings drift in direction). 1.0 = same mean
    direction, → 0/negative = the corpus moved. Output:
    ``(by…, n_a, n_b, cosine)``; a side with zero rows or a zero-norm
    sum yields NULL cosine (no direction to compare) rather than
    vanishing.

    Cosine is scale-invariant, so the centroids are never divided by
    n: the per-dim SUM vectors feed the cosine directly (one less
    float op for the oracle to mismatch). Scale shape: tag + union,
    ONE map-side-combined shuffle to per-(group, dim) sums (rows out:
    groups × d, data crosses one exchange), then a groups-sized
    reduction to (dot, |a|², |b|²) and a broadcast join of the per-side
    row counts. All JVM; no UDFs, no collect.
    """
    by = list(by)
    v = F.col(vec_col)
    a = df_a.filter(v.isNotNull()).select(
        *by, v.alias("__v"), F.lit(1).alias("__a"), F.lit(0).alias("__b")
    )
    b = df_b.filter(v.isNotNull()).select(
        *by, v.alias("__v"), F.lit(0).alias("__a"), F.lit(1).alias("__b")
    )
    u = a.unionByName(b)
    n = u.groupBy(*by).agg(
        F.sum("__a").alias("n_a"), F.sum("__b").alias("n_b")
    )
    e = u.select(
        *by, "__a", "__b", F.posexplode("__v").alias("__d", "__x")
    )
    x = F.col("__x").cast("double")
    g = e.groupBy(*by, "__d").agg(
        F.sum(F.when(F.col("__a") == 1, x).otherwise(0.0)).alias("__sa"),
        F.sum(F.when(F.col("__b") == 1, x).otherwise(0.0)).alias("__sb"),
    )
    sa, sb = F.col("__sa"), F.col("__sb")
    c = g.groupBy(*by).agg(
        F.sum(sa * sb).alias("__dot"),
        F.sum(sa * sa).alias("__qa"),
        F.sum(sb * sb).alias("__qb"),
    )
    cos = F.when(
        (F.col("__qa") > 0) & (F.col("__qb") > 0),
        F.col("__dot") / F.sqrt(F.col("__qa") * F.col("__qb")),
    )
    if round_to is not None:
        cos = F.round(cos, round_to)
    return c.join(F.broadcast(n), on=by).select(
        *by, "n_a", "n_b", cos.alias("cosine")
    )
