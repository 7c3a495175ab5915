"""BPE tokenizer and winnowing fingerprints."""


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
