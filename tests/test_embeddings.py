"""Embedding-matrix operators (``operators/embeddings.py``).

The sf0.01 gates (`embedding_covariance`, `embedding_projection`)
hash-verify against DuckDB; these pin the moment reduce against numpy
across partitionings, PCA's sign convention and reconstruction
behavior, and the JL projection against a manual matmul."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from blueetl_spark.operators import embeddings as E


@pytest.fixture(scope="module")
def mat():
    rng = np.random.default_rng(5)
    base = rng.normal(size=(200, 3)) @ rng.normal(size=(3, 12))
    return base + 0.01 * rng.normal(size=(200, 12)) + rng.normal(size=12)


@pytest.fixture(scope="module")
def df(spark, mat):
    pdf = pd.DataFrame(
        {"vec_id": range(len(mat)), "embedding": list(map(list, mat))}
    )
    return spark.createDataFrame(pdf)


@pytest.mark.parametrize("parts", [1, 5])
def test_moments_match_numpy(spark, df, mat, parts):
    n, mean, cov = E.embedding_moments(df.repartition(parts))
    assert n == len(mat)
    assert np.allclose(mean, mat.mean(0), atol=1e-12)
    assert np.allclose(cov, np.cov(mat.T, bias=True), atol=1e-10)


def test_moments_skip_nulls_and_raise_on_empty(spark, df):
    import pyspark.sql.functions as F

    with_null = df.withColumn(
        "embedding",
        F.when(F.col("vec_id") == 0, F.lit(None)).otherwise(
            F.col("embedding")
        ),
    )
    n, _, _ = E.embedding_moments(with_null)
    assert n == df.count() - 1
    with pytest.raises(ValueError, match="non-null"):
        E.embedding_moments(df.filter("vec_id < 0"))


def test_pca_fit_transform(spark, df, mat):
    m = E.pca_fit(df, 3)
    # data is rank-3 + noise: 3 components capture ~everything
    total_var = np.trace(np.cov(mat.T, bias=True))
    assert m["explained_variance"].sum() / total_var > 0.99
    # deterministic sign convention: refit is identical
    m2 = E.pca_fit(df, 3)
    assert np.array_equal(m["components"], m2["components"])
    assert all(
        m["components"][i, np.abs(m["components"][i]).argmax()] > 0
        for i in range(3)
    )
    # projection matches numpy, reconstruction error is small
    out = E.pca_transform(df, m).orderBy("vec_id").toPandas()
    p = np.stack(out.pca.to_numpy())
    assert np.allclose(
        p, (mat - m["mean"]) @ m["components"].T, atol=1e-9
    )
    recon = p @ m["components"] + m["mean"]
    assert np.abs(recon - mat).max() < 0.2
    with pytest.raises(ValueError, match="k must be"):
        E.pca_fit(df, 13)


def test_random_projection_matches_manual_and_is_codegen(spark, df, mat):
    out = E.random_projection(df, 4, seed="t", d=12).orderBy("vec_id")
    got = out.toPandas()[["p0", "p1", "p2", "p3"]].to_numpy()
    signs = np.array(E.projection_signs(12, 4, "t"), dtype=np.float64)
    exp = np.round(mat @ signs.T / 2.0, 6)
    assert np.allclose(got, exp, atol=1e-9)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InPandas" not in plan and "BatchEvalPython" not in plan
    # d probe path (no d passed)
    assert E.random_projection(df.limit(3), 2, seed="t").count() == 3
    with pytest.raises(ValueError, match="pass d= explicitly"):
        E.random_projection(df.filter("vec_id < 0"), 2, seed="t")


def test_random_projection_probe_skips_null_embeddings(spark, df):
    """A leading NULL embedding must not poison the dimension probe;
    an all-NULL frame raises the actionable error."""
    import pyspark.sql.functions as F

    nulled = df.select(
        "vec_id",
        F.when(F.col("vec_id") >= 2, F.col("embedding")).alias("embedding"),
    )
    # rows 0-1 have NULL embeddings; probe must still find d=12
    out = E.random_projection(nulled, 2, seed="t")
    assert out.filter("vec_id >= 2").filter("p0 IS NULL").count() == 0
    all_null = df.select("vec_id", F.lit(None).cast("array<double>").alias("embedding"))
    with pytest.raises(ValueError, match="pass d= explicitly"):
        E.random_projection(all_null, 2, seed="t")


def test_projection_signs_deterministic():
    a = E.projection_signs(8, 3, "s")
    assert a == E.projection_signs(8, 3, "s")
    assert a != E.projection_signs(8, 3, "other")
    assert {v for row in a for v in row} <= {-1, 1}


def test_centroid_drift_known_geometries(spark):
    """Identical halves give cosine 1; mirrored halves give -1;
    orthogonal centroids give 0; a one-sided or zero-norm group gives
    NULL (no direction to compare) instead of vanishing."""
    from blueetl_spark.operators.embeddings import centroid_drift

    def frame(rows):
        return spark.createDataFrame(rows, "g string, embedding array<float>")

    a = frame([
        ("same", [1.0, 2.0]), ("same", [3.0, 0.0]),
        ("flip", [1.0, 0.0]), ("flip", [0.0, 2.0]),
        ("orth", [2.0, 0.0]),
        ("only_a", [1.0, 1.0]),
        ("zero", [0.0, 0.0]),
    ])
    b = frame([
        ("same", [1.0, 2.0]), ("same", [3.0, 0.0]),
        ("flip", [-0.5, 0.0]), ("flip", [-0.5, -2.0]),
        ("orth", [0.0, 5.0]),
        ("zero", [1.0, 1.0]),
    ])
    got = {
        r["g"]: (r["n_a"], r["n_b"], r["cosine"])
        for r in centroid_drift(a, b, "embedding", by=["g"]).collect()
    }
    assert got["same"] == (2, 2, 1.0)
    assert got["flip"] == (2, 2, -1.0)
    assert got["orth"] == (1, 1, 0.0)
    assert got["only_a"] == (1, 0, None)
    assert got["zero"] == (1, 1, None)  # side a sums to the zero vector
