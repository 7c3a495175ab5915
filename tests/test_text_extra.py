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


def test_chunk_documents_windows_and_overlap(spark):
    from blueetl_spark.operators.text import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame(
        [(1, words), (2, "a b c"), (3, "solo")],
        "doc_id long, text string",
    )
    # chunk=4, overlap=0 -> doc1: [0:4][4:8][8:10]
    out = chunk_documents(df, chunk_tokens=4).orderBy("doc_id", "chunk_id")
    got = [(r.doc_id, r.chunk_id, r.n_tokens, r.chunk_text) for r in out.collect()]
    assert got == [
        (1, 0, 4, "w0 w1 w2 w3"),
        (1, 1, 4, "w4 w5 w6 w7"),
        (1, 2, 2, "w8 w9"),
        (2, 0, 3, "a b c"),
        (3, 0, 1, "solo"),
    ]
    # chunk=4, overlap=2 -> stride 2: starts 0,2,4,6 (6+4 covers token 10)
    ov = chunk_documents(df.filter("doc_id=1"), chunk_tokens=4, overlap=2)
    texts = [r.chunk_text for r in ov.orderBy("chunk_id").collect()]
    assert texts == [
        "w0 w1 w2 w3", "w2 w3 w4 w5", "w4 w5 w6 w7", "w6 w7 w8 w9",
    ]
    # every token appears in some chunk; no chunk fully inside another
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_chunk_documents_reconstructs_corpus(spark):
    """overlap=0 chunking partitions every document exactly."""
    from pyspark.sql import functions as F

    from blueetl_spark.operators.text import chunk_documents
    from blueetl_spark.sources import tables

    docs = tables.load(spark, "/root/testdata/sf0.001", "documents")
    chunks = chunk_documents(docs, chunk_tokens=32)
    rebuilt = chunks.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_id", "chunk_text"))),
                lambda s: s.chunk_text,
            ),
            " ",
        ).alias("rebuilt")
    )
    joined = rebuilt.join(
        docs.select(
            "doc_id",
            F.array_join(F.split(F.trim("text"), r"\s+"), " ").alias("norm"),
        ),
        "doc_id",
    )
    bad = joined.filter(F.col("rebuilt") != F.col("norm")).count()
    assert bad == 0


def test_pack_chunks_greedy_budget(spark):
    from pyspark.sql import functions as F

    from blueetl_spark.operators.text import chunk_documents, pack_chunks

    docs = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(5 + (i * 7) % 23)))
         for i in range(40)],
        "doc_id long, text string",
    ).coalesce(2)
    chunks = chunk_documents(docs, chunk_tokens=8)
    packed = pack_chunks(chunks, budget=20)
    pdf = packed.toPandas()
    # every chunk present exactly once
    assert len(pdf) == chunks.count()
    # per-pack totals never exceed the budget (all chunks are <= 8 <= 20)
    sums = pdf.groupby("pack_id").n_tokens.sum()
    assert (sums <= 20).all()
    # greedy: adding the NEXT pack's first chunk would overflow — check via
    # running totals: the last row of each pack has pack_tokens == sum
    last = pdf.groupby("pack_id").tail(1).set_index("pack_id")
    assert (last.pack_tokens == sums).all()
    # packs are reasonably full (greedy over 5-8 token chunks at budget 20)
    assert sums.mean() >= 12
    # oversize chunk -> its own pack
    big = spark.createDataFrame(
        [(0, 0, 30, "x " * 30), (0, 1, 5, "y")],
        "doc_id long, chunk_id long, n_tokens long, chunk_text string",
    ).coalesce(1)
    got = pack_chunks(big, budget=10).toPandas().sort_values("chunk_id")
    assert got.pack_id.nunique() == 2


def test_chunk_documents_null_text_not_dropped(spark):
    from blueetl_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(1, None), (2, "a b")], "doc_id long, text string"
    )
    got = chunk_documents(df, chunk_tokens=4).orderBy("doc_id").collect()
    assert [r.doc_id for r in got] == [1, 2]  # null-text doc still present
    assert got[0].chunk_text == ""


def test_quality_features_empty_text_survives_ansi(spark):
    from blueetl_spark.operators.text import quality_features

    df = spark.createDataFrame([(1, ""), (2, "hi there")],
                               "doc_id long, text string")
    out = quality_features(df).orderBy("doc_id").toPandas()
    assert len(out) == 2                      # no DIVIDE_BY_ZERO abort
    assert out.punct_ratio.isna()[0]          # empty doc -> NULL ratios
    assert out.punct_ratio.notna()[1]


def test_pack_chunks_does_not_mutate_caller_schema(spark):
    from blueetl_spark.operators.text import chunk_documents, pack_chunks

    docs = spark.createDataFrame([(1, "a b c d e f")],
                                 "doc_id long, text string")
    chunks = chunk_documents(docs, chunk_tokens=2)
    before = [f.name for f in chunks.schema.fields]
    pack_chunks(chunks, budget=4).count()
    assert [f.name for f in chunks.schema.fields] == before
    # a second call with a different budget must work
    assert pack_chunks(chunks, budget=2).count() == 3


# -- BPE train + encode ------------------------------------------------------


def test_bpe_train_classic_merges(spark):
    """The textbook corpus: 'low' x5, 'lower' x2, 'newest' x6, 'widest' x3
    learns ('e','s') then ('es','t') then ('est','</w>') first — the
    Sennrich walkthrough — and training is deterministic."""
    from blueetl_spark.operators.text import bpe_train

    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    merges = bpe_train(docs, n_merges=3)
    assert merges == [("e", "s"), ("es", "t"), ("est", "</w>")]
    assert bpe_train(docs, n_merges=3) == merges


def test_bpe_encode_applies_ranked_merges(spark):
    from blueetl_spark.operators.text import bpe_encode, bpe_train

    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    merges = bpe_train(docs, n_merges=10)
    out = {r.text: r.bpe_tokens for r in bpe_encode(docs.distinct(), merges).collect()}
    # 'newest' fully merges into one unit after enough merges
    assert out["newest"] == ["newest</w>"]
    # unseen word falls back to partial merges / characters, never crashes
    unseen = spark.createDataFrame([(99, "lowest zzq")], "doc_id long, text string")
    got = bpe_encode(unseen, merges).collect()[0].bpe_tokens
    assert "".join(got).replace("</w>", "") == "lowestzzq"
    # learned subword 'est</w>' is reused by the unseen word
    assert "est</w>" in got


def test_bpe_encode_counts_on_documents(spark, sf_dir):
    """End-to-end on the documents table: every token of every doc is
    covered by the BPE segmentation (no characters lost)."""
    import pyspark.sql.functions as F

    from blueetl_spark.operators.text import bpe_encode, bpe_train
    from blueetl_spark.sources import tables

    docs = tables.load(spark, sf_dir, "documents").limit(50)
    merges = bpe_train(docs, n_merges=50, max_words=1000)
    assert 0 < len(merges) <= 50
    enc = bpe_encode(docs, merges)
    row = enc.select(
        F.length(F.regexp_replace("text", r"\s+", "")).alias("n_chars"),
        F.aggregate(
            F.transform(
                "bpe_tokens",
                lambda t: F.length(F.regexp_replace(t, r"</w>$", "")),
            ),
            F.lit(0),
            lambda a, x: a + x,
        ).alias("n_bpe_chars"),
    ).toPandas()
    assert (row.n_chars == row.n_bpe_chars).all()


def test_language_ngram_profiles_and_classify(spark):
    """Trigram-profile language ID: near-perfect on a corpus with real
    per-language signal (the sf documents table has none — its gate
    verifies computation, this verifies discrimination)."""
    from blueetl_spark.operators.text import (
        char_ngrams,
        classify_language_ngram,
        train_language_profiles,
    )

    vocab = {
        "en": "the quick brown fox jumps over lazy dog while rain stays away tonight".split(),
        "de": "der schnelle braune fuchs springt ueber faulen hund waehrend regen bleibt heute".split(),
        "fr": "le rapide renard brun saute dessus chien paresseux pendant pluie reste ce soir".split(),
    }
    rows = []
    i = 0
    for lang, words in vocab.items():
        for d in range(30):
            text = " ".join(words[(d + j) % len(words)] for j in range(9))
            rows.append((i, text, lang))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    profiles = train_language_profiles(docs, top_k=150)
    prof = profiles.toPandas()
    assert set(prof.lang) == set(vocab)
    assert prof.groupby("lang").size().max() <= 150
    assert (prof.weight < 0).all()  # log-shares of proper fractions

    pred = classify_language_ngram(docs, profiles).toPandas()
    assert len(pred) == len(rows)
    truth = {r[0]: r[2] for r in rows}
    acc = sum(truth[r.doc_id] == r.lang_pred for r in pred.itertuples()) / len(pred)
    assert acc >= 0.95

    # deterministic: a second full run is bit-identical
    pred2 = classify_language_ngram(
        docs, train_language_profiles(docs, top_k=150)
    ).toPandas()
    a = pred.sort_values("doc_id", ignore_index=True)
    b = pred2.sort_values("doc_id", ignore_index=True)
    assert (a == b).all().all()

    # short-text edge: sub-n docs produce their whole text as one gram
    import pyspark.sql.functions as F

    short = spark.createDataFrame([(0, "ab")], "doc_id long, text string")
    grams = short.select(F.explode(char_ngrams("text")).alias("g")).collect()
    assert [r.g for r in grams] == ["ab"]


def test_drop_repeated_spans_order_and_firsts(spark):
    """Intra-document span dedup: first occurrence wins, original order
    preserved, counts exact; distinct-span docs pass through unchanged."""
    from blueetl_spark.operators.text import drop_repeated_spans

    docs = spark.createDataFrame(
        [
            (1, "b. a. b. c. a. d"),
            (2, "x. y"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.text, r.n_spans, r.n_unique)
        for r in drop_repeated_spans(docs, sep=". ").collect()
    }
    assert got[1] == ("b. a. c. d", 6, 4)
    assert got[2] == ("x. y", 2, 2)
    assert got[3] == ("", 1, 1)


def test_classify_language_empty_profile_returns_empty(spark):
    """A not-yet-trained (empty) profile table overlaps nothing, so the
    documented 'no overlap -> no row' semantics apply: an empty,
    correctly-typed frame, not a raise (ADVICE r6)."""
    from blueetl_spark.operators.text import classify_language_ngram

    docs = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    profiles = spark.createDataFrame([], "lang string, gram string, weight double")
    out = classify_language_ngram(docs, profiles)
    assert out.columns == ["doc_id", "lang_pred", "score"]
    assert dict(out.dtypes)["doc_id"] == "bigint"
    assert out.count() == 0


# -- BM25 / bigram-LM scoring / DSIR weights (round 7) -----------------------


def test_bm25_idf_and_length_normalization(spark):
    """Rarer terms outrank corpus-wide terms at equal tf, and equal-tf
    matches in shorter documents score higher (the two properties that
    distinguish BM25 from raw tf)."""
    from blueetl_spark.operators.text import bm25

    docs = spark.createDataFrame(
        [
            (1, "common rare common filler pad"),
            (2, "common common stuff filler pad"),
            (3, "common other words here pad"),
            (4, "common rare"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r.doc_id, r.token): r
        for r in bm25(docs).collect()
    }
    # doc 1: 'rare' (df=2) beats 'common' (df=4) at tf=1 each
    assert out[(1, "rare")].bm25 > out[(1, "common")].bm25
    # same (tf=1, token 'rare') in the 2-token doc 4 beats the 5-token doc 1
    assert out[(4, "rare")].bm25 > out[(1, "rare")].bm25
    # tf saturation: tf=2 scores more than tf=1 but less than 2x (same doc len)
    assert out[(2, "common")].tf == 2
    one = out[(3, "common")].bm25
    assert one < out[(2, "common")].bm25 < 2 * one


def test_bm25_top_k_deterministic_tie_break(spark):
    from blueetl_spark.operators.text import bm25

    docs = spark.createDataFrame(
        [(1, "aa bb cc dd ee"), (2, "aa bb xx yy zz")],
        "doc_id long, text string",
    )
    out = bm25(docs, top_k=2)
    pdf = out.toPandas()
    assert (pdf.groupby("doc_id").size() == 2).all()
    # doc-unique tokens all tie on score -> alphabetical token order wins
    assert sorted(pdf[pdf.doc_id == 1].token) == ["cc", "dd"]


def test_bm25_search_ranks_and_top_k(spark):
    from blueetl_spark.operators.text import bm25_search

    docs = spark.createDataFrame(
        [
            (1, "rare rare filler pad here"),   # strongest match: tf=2
            (2, "rare other words sit here"),   # weaker: tf=1
            (3, "nothing relevant at all here"),
        ],
        "doc_id long, text string",
    )
    got = bm25_search(docs, "rare", k=2).collect()
    assert [r["doc_id"] for r in got] == [1, 2]
    assert got[0]["score"] > got[1]["score"]
    # k caps the result; non-matching docs never appear
    assert len(bm25_search(docs, "rare", k=5).collect()) == 2
    with pytest.raises(ValueError, match="empty"):
        bm25_search(docs, "  ")


def test_bm25_search_top_k_never_global_sorts(spark):
    from blueetl_spark.operators.text import bm25_search

    docs = spark.createDataFrame(
        [(i, f"w{i} common filler") for i in range(30)],
        "doc_id long, text string",
    )
    plan = (
        bm25_search(docs, "common w3", k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    # scoring joins may sort locally (SortMergeJoin children, global
    # flag false); the top-k itself must never require a GLOBAL sort
    assert "], true, " not in plan


def test_lm_bigram_score_semantics(spark):
    """In-corpus bigrams score likelier (lower NLL) than a doc of
    bigrams the LM never saw; sub-2-token docs get n_bigrams=0/null."""
    from blueetl_spark.operators.text import lm_bigram_score

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat sat on the mat"),
            (3, "mat the on sat cat the"),
            (4, "solo"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in lm_bigram_score(docs).collect()}
    assert got[1].n_bigrams == 5 and got[1].nll == got[2].nll
    # reversed word order: every bigram has count 1 instead of 2
    assert got[3].nll > got[1].nll
    assert got[4].n_bigrams == 0 and got[4].nll is None
    assert got[5].n_bigrams == 0 and got[5].nll is None
    assert len(got) == 5


def test_dsir_target_equals_raw_is_identically_zero(spark):
    """When the target IS the raw corpus the smoothed distributions are
    identical, so every log-ratio is exactly ln(x) - ln(x) = 0.0 — a
    bit-exactness check on the shared estimation path."""
    from blueetl_spark.operators.text import dsir_logweights

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta beta delta")],
        "doc_id long, text string",
    )
    out = dsir_logweights(docs, docs, n_buckets=16).collect()
    assert {r.doc_id: r.n_tokens for r in out} == {1: 3, 2: 3}
    assert all(r.log_weight == 0.0 for r in out)


def test_dsir_weights_point_toward_target(spark):
    """Documents sharing the target's vocabulary get higher importance
    weights than off-distribution documents."""
    from pyspark.sql import functions as F

    from blueetl_spark.operators.text import dsir_logweights

    docs = spark.createDataFrame(
        [
            (1, "ml data model train", "tgt"),
            (2, "ml model data eval", "tgt"),
            (3, "recipe flour sugar bake", "other"),
            (4, "data model ml loss", "other"),
        ],
        "doc_id long, text string, kind string",
    )
    target = docs.filter(F.col("kind") == "tgt")
    got = {r.doc_id: r.log_weight for r in dsir_logweights(docs, target).collect()}
    # doc 4 looks like the target; doc 3 does not
    assert got[4] > got[3]


def test_gopher_rules_each_rule_fires(spark):
    """One handcrafted violator per published rule; a clean doc keeps."""
    from blueetl_spark.operators.text import gopher_rules

    clean = (
        "the data and the model have to be good with that "
        "training corpus quality pipeline words here more tokens fine"
    )
    docs = spark.createDataFrame(
        [
            (1, clean),                                      # passes all
            (2, "too short"),                                # word count
            (3, " ".join(["a"] * 20)),                       # mean word len < 3
            (4, "the be to of and that have with " + "### # ## " * 10),  # symbols
            (5, "\n".join(["- bullet item the be to of"] * 10)),         # bullets
            (6, "\n".join(["the be to of and trailing..."] * 10)),       # ellipses
            (7, "the be to of " + " ".join(["123"] * 30)),   # alpha frac
            (8, " ".join(["zz"] * 30)),                      # no stopwords
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r
        for r in gopher_rules(docs, min_words=10).collect()
    }
    assert got[1].keep
    assert not got[2].pass_word_count
    assert not got[3].pass_mean_word_len
    assert not got[4].pass_symbol_ratio
    assert not got[5].pass_bullet
    assert not got[6].pass_ellipsis
    assert not got[7].pass_alpha
    assert not got[8].pass_stopwords
    for d in range(2, 9):
        assert not got[d].keep, d


def test_pack_sequences_manifest_invariants(spark):
    """Concat-then-split packing: segments tile each group's token
    stream with no gaps and no padding — per-group segment lengths sum
    to the group's total tokens, every bin except the last is exactly
    full, a long doc spans several bins, zero-length docs are dropped,
    and offsets are replayed by a sequential reference."""
    from pyspark.sql import functions as F

    from blueetl_spark.operators.text import pack_sequences

    rows = [("en", 1, 5), ("en", 2, 9), ("en", 3, 4),
            ("fr", 4, 3), ("fr", 5, 0)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, n long")
    out = pack_sequences(df, "n", 6, by=["lang"], order=["doc_id"])
    got = sorted(
        (r["lang"], r["doc_id"], r["bin"], r["seg_start"], r["seg_end"])
        for r in out.collect()
    )
    assert got == [
        ("en", 1, 0, 0, 5),
        ("en", 2, 0, 5, 6),   # doc 2 (9 tokens) spans bins 0-2
        ("en", 2, 1, 0, 6),
        ("en", 2, 2, 0, 2),
        ("en", 3, 2, 2, 6),
        ("fr", 4, 0, 0, 3),   # doc 5 (0 tokens) dropped
    ]
    # tiling: per-group segment lengths sum to total tokens
    sums = {
        r["lang"]: r["tok"]
        for r in out.groupBy("lang")
        .agg(F.sum(F.col("seg_end") - F.col("seg_start")).alias("tok"))
        .collect()
    }
    assert sums == {"en": 18, "fr": 3}
    # every non-final bin is exactly full (6 tokens)
    per_bin = {
        (r["lang"], r["bin"]): r["tok"]
        for r in out.groupBy("lang", "bin")
        .agg(F.sum(F.col("seg_end") - F.col("seg_start")).alias("tok"))
        .collect()
    }
    assert per_bin[("en", 0)] == per_bin[("en", 1)] == 6
    assert per_bin[("en", 2)] == 6  # 18 tokens tile 3 full bins
    assert per_bin[("fr", 0)] == 3  # final partial bin

    import pytest as _pytest

    with _pytest.raises(ValueError, match="seq_len"):
        pack_sequences(df, "n", 0)
