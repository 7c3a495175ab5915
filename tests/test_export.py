"""Corpus export: deterministic shard membership, one file per shard,
manifest checksums that actually catch corruption."""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from blueetl_spark.plans import export


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
        (F.col("id") % 37 + 1).alias("n_tokens"),
    )


def test_export_roundtrip_and_manifest(corpus, spark, tmp_path):
    path = str(tmp_path / "corpus")
    manifest = export.export_corpus(
        corpus, path, n_shards=8, token_count_col="n_tokens"
    )
    assert manifest["total"]["rows"] == 500
    assert manifest["total"]["tokens"] == sum((i % 37 + 1) for i in range(500))
    assert len(manifest["shards"]) == 8
    # one data file per shard
    for i in range(8):
        files = [
            p for p in (Path(path) / f"shard={i}").glob("*.parquet")
        ]
        assert len(files) == 1, files
    # stored manifest matches the returned one
    stored = json.loads((Path(path) / "_manifest.json").read_text())
    assert stored == manifest
    # verify passes on the intact export
    assert export.verify_export(spark, path) == {"ok": True, "mismatches": []}


def test_export_shard_membership_is_stable(corpus, spark, tmp_path):
    """The same document lands in the same shard across re-runs and
    across unrelated corpus growth."""
    p1 = str(tmp_path / "e1")
    p2 = str(tmp_path / "e2")
    export.export_corpus(corpus, p1, n_shards=8)
    bigger = corpus.unionByName(
        corpus.select(
            (F.col("doc_id") + 1000).alias("doc_id"), "text", "n_tokens"
        )
    )
    export.export_corpus(bigger, p2, n_shards=8)
    m1 = {
        r.doc_id: r.shard
        for r in spark.read.parquet(p1).select("doc_id", "shard").collect()
    }
    m2 = {
        r.doc_id: r.shard
        for r in spark.read.parquet(p2).select("doc_id", "shard").collect()
    }
    assert all(m2[d] == s for d, s in m1.items())


def test_verify_detects_tampering(corpus, spark, tmp_path):
    path = str(tmp_path / "tampered")
    export.export_corpus(corpus, path, n_shards=4)
    # rewrite one shard with a row dropped (materialize to the driver
    # first — writing over a directory while lazily reading it is the
    # exact self-overwrite hazard compact() guards against)
    shard0 = spark.read.parquet(str(Path(path) / "shard=0"))
    rows = shard0.collect()
    kept = spark.createDataFrame(rows[1:], shard0.schema)
    kept.coalesce(1).write.mode("overwrite").parquet(str(Path(path) / "shard=0"))
    result = export.verify_export(spark, path)
    assert result["ok"] is False
    assert result["mismatches"] == [0]


def test_export_rejects_existing_shard_column(corpus, spark, tmp_path):
    with_shard = corpus.withColumnRenamed("n_tokens", "shard")
    with pytest.raises(ValueError, match="shard"):
        export.export_corpus(with_shard, str(tmp_path / "x"), n_shards=4)


def test_manifest_empty_shards_not_ragged(spark, tmp_path):
    """With a token column, empty shards still carry tokens: 0 so
    consumers can sum without KeyError."""
    one = spark.createDataFrame([(1, "a", 3)], "doc_id long, text string, n_tokens long")
    m = export.export_corpus(
        one, str(tmp_path / "sparse"), n_shards=8, token_count_col="n_tokens"
    )
    assert all("tokens" in s for s in m["shards"])
    assert m["total"]["tokens"] == 3


def test_checksum_distinguishes_null_from_sentinel(spark, tmp_path):
    a = spark.createDataFrame([(1, None)], "doc_id long, text string")
    b = spark.createDataFrame([(1, "")], "doc_id long, text string")
    ma = export.export_corpus(a, str(tmp_path / "null"), n_shards=1)
    mb = export.export_corpus(b, str(tmp_path / "empty"), n_shards=1)
    assert ma["total"]["checksum"] != mb["total"]["checksum"]
