"""BPE tokenizer and winnowing fingerprints."""
import pytest


# -- BPE-ish tokens and winnowing (appended) ---------------------------------


def test_bpe_tokens_units(spark):
    from blueetl_spark.operators import text as T
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(1, "I can't stop, won 42 times!")], "doc_id long, text string"
    )
    toks = df.select(T.bpe_tokens("text").alias("t")).first().t
    assert "'t" in toks            # contraction split off
    assert " stop" in toks         # leading-space letter run
    assert " 42" in toks           # digit run
    assert "," in toks and "!" in toks  # punctuation units
    assert "".join(toks) == "I can't stop, won 42 times!"


def test_winnowing_shared_run_guarantee(spark):
    from blueetl_spark.operators import text as T
    import pyspark.sql.functions as F

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [(1, "xx yy " + shared + " zz"), (2, "aa " + shared + " bb cc")],
        "doc_id long, text string",
    )
    out = df.select(
        "doc_id", T.winnowing_fingerprints("text", n=3, w=4).alias("fp")
    ).toPandas()
    fp1, fp2 = set(out.fp[0]), set(out.fp[1])
    # shared run of 10 tokens >= w + n - 1 = 6 -> at least one common print
    assert fp1 & fp2
    # winnowing selects a strict subset of all shingle hashes
    n_shingles = df.select(
        F.size(F.array_distinct(T.shingles("text", 3))).alias("n")
    ).toPandas().n
    assert len(fp1) < n_shingles[0]


def test_winnowing_short_doc(spark):
    from blueetl_spark.operators import text as T

    df = spark.createDataFrame([(1, "one two")], "doc_id long, text string")
    out = df.select(T.winnowing_fingerprints("text", n=3, w=4).alias("fp")).first()
    assert len(out.fp) == 1  # single shingle -> single fingerprint


def test_tf_idf_values(spark):
    from blueetl_spark.operators import text as T
    import math

    df = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "cherry cherry date")],
        "doc_id long, text string",
    )
    out = T.tf_idf(df).toPandas()
    row = out[(out.doc_id == 1) & (out.token == "apple")].iloc[0]
    assert row.tf == 2 and row.df == 1
    assert row.tfidf == pytest.approx(2 * math.log(3 / 1))
    banana = out[(out.doc_id == 1) & (out.token == "banana")].iloc[0]
    assert banana.df == 2
    assert banana.tfidf == pytest.approx(math.log(3 / 2))
    top1 = T.tf_idf(df, top_k=1).toPandas()
    assert len(top1) == 3  # one row per doc
    assert top1[top1.doc_id == 1].token.iloc[0] == "apple"
