"""Text-analysis operators for large-scale document pipelines.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
codegen'd): tokenization via ``split``, shingling via ``transform`` over a
``sequence`` of offsets, ratios via ``regexp_count`` — no Python UDFs.
Designed for the ``documents`` table (``doc_id, text, lang, source,
n_chars``) but parameterized on column names.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small English stopword list for the n-gram/stopword language heuristic.
EN_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "at", "by", "be", "this",
)


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of trimmed text (empty string → [''])."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


# BPE-style pre-tokenization pattern (GPT-2-like, POSIX-compatible subset):
# contraction suffixes, letter runs (with optional leading space), digit
# runs, punctuation runs, whitespace. This is the *pre*-tokenizer — the
# merge table of a real BPE is model-specific; counting these units tracks
# real token counts within a few percent for English text.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def bpe_tokens(col: Column | str) -> Column:
    """BPE-ish regex tokenization → array of token strings (JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_PATTERN), 0)


def bpe_token_count(col: Column | str) -> Column:
    return F.size(bpe_tokens(col))


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as an array of strings (JVM-side).

    Formulated as ``arrays_zip`` of the ``n`` shifted token arrays, then a
    ``transform`` that concatenates each zipped struct. ``arrays_zip``
    evaluates its children once per row, so the underlying ``split`` runs
    ``n`` times per document — NOT once per shingle position, which is what
    the naive ``transform(sequence(i), slice(toks, i, n))`` costs (lambda
    bodies in higher-order functions are re-evaluated per element,
    including any expression they close over: O(tokens²) per document).

    Documents shorter than ``n`` tokens yield a single shingle of all
    tokens (so no document silently disappears from dedup).
    """
    toks = tokens(col)
    count = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    shifted = [F.slice(toks, j + 1, count) for j in range(n)]
    zipped = F.arrays_zip(*shifted)
    fields = [f"{j}" for j in range(n)]
    return F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s.getField(f) for f in fields])
    )


def quality_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document quality signals (length, punctuation/digit/stopword
    ratios, mean word length) — the building blocks of quality filtering.

    ``passthrough`` names extra input columns to carry into the output
    unchanged (same single projection — no join needed to keep them).
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(text_col)
    stop_arr = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_stop = F.size(
        F.filter(tokens(text_col), lambda x: F.array_contains(stop_arr, F.lower(x)))
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        # try_divide: empty text (n_chars = 0) yields NULL ratios instead of
        # killing the whole corpus job under ANSI's DIVIDE_BY_ZERO
        F.try_divide(F.regexp_count(t, F.lit(r"[.,!?;:]")), n_chars).alias(
            "punct_ratio"
        ),
        F.try_divide(F.regexp_count(t, F.lit(r"[0-9]")), n_chars).alias(
            "digit_ratio"
        ),
        (n_stop / n_tokens).alias("stopword_ratio"),
        ((n_chars - n_tokens + 1) / n_tokens).alias("mean_word_len"),
        *[F.col(c) for c in passthrough],
    )


def language_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    threshold: float = 0.1,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Stopword-ratio language-ID heuristic: score = fraction of tokens that
    are English stopwords; ``is_en`` when above threshold.

    A production pipeline would use fastText/CLD3 via a Pandas UDF — this
    n-gram-free heuristic is the fully-JVM baseline. ``passthrough``
    carries extra input columns through unchanged (single projection —
    lets callers chain per-doc operators without a self-join).
    """
    stop_arr = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    toks = tokens(text_col)
    score = F.size(
        F.filter(toks, lambda x: F.array_contains(stop_arr, F.lower(x)))
    ) / F.size(toks)
    return df.select(
        F.col(id_col),
        score.alias("en_score"),
        (score > threshold).alias("is_en"),
        *[F.col(c) for c in passthrough],
    )


def char_ngrams(col: Column | str, n: int = 3) -> Column:
    """Character n-grams of case/whitespace-normalized text (JVM-side;
    a doc shorter than ``n`` chars yields its whole text as one gram).
    Value-identical to ``substring(norm, i, n)`` over positions
    ``1..greatest(len−n+1, 1)``, which is how the SQL oracle replays it.

    Formulated like :func:`shingles`: split into the char array, then
    ``arrays_zip`` of the ``n`` shifted slices and a ``concat_ws`` per
    zipped struct (null-padded tail fields — short docs — drop out of
    ``concat_ws``, matching ``substring``'s truncation). The naive
    ``transform(sequence(i), norm.substr(i, n))`` closes over ``norm``
    in the lambda, and HOF lambda bodies re-evaluate captured
    expressions PER ELEMENT — the whole trim/lower/regexp pipeline ran
    once per character position: the sf0.1 language_id query measured
    15.5 s with the naive form and 2.7 s after this rewrite (plus the
    small-scan fan-out and the profile persist in the callers)."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    chars = F.split(norm, "")
    count = F.greatest(F.size(chars) - F.lit(n - 1), F.lit(1))
    shifted = [F.slice(chars, j + 1, count) for j in range(n)]
    zipped = F.arrays_zip(*shifted)
    fields = [f"{j}" for j in range(n)]
    return F.transform(
        zipped, lambda s: F.concat_ws("", *[s.getField(f) for f in fields])
    )


def train_language_profiles(
    df: DataFrame | None = None,
    lang_col: str = "lang",
    text_col: str = "text",
    n: int = 3,
    top_k: int = 200,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Per-language character-n-gram profiles from a labeled corpus:
    the ``top_k`` most frequent n-grams per language with log-share
    weights ``ln(count / language_total)``.

    The classic n-gram language-ID scheme (Cavnar-Trenkle-style
    frequency profiles, naive-Bayes-style scoring) built as ONE
    DataFrame plan: explode → (lang, gram) counts (map-side combined) →
    per-language totals + rank window over the (tiny: languages ×
    grams) aggregate. Output ``(lang, gram, weight)`` is
    languages × top_k rows — broadcastable by construction, so
    classification over a 100 TB corpus never shuffles on the profile
    side.

    ``counts`` accepts a precomputed (lang, gram, n) frame so a
    train-and-classify pipeline can derive it from ONE shared gram
    subtree instead of exploding the corpus twice
    (:func:`language_id_pipeline`).
    """
    from pyspark.sql import Window

    from blueetl_spark.operators.dedup import _fan_out_small_scan

    if counts is None:
        if df is None:
            raise ValueError(
                "train_language_profiles needs a labeled corpus df or a "
                "precomputed counts frame"
            )
        grams = _fan_out_small_scan(df).select(
            F.col(lang_col).alias("lang"),
            F.explode(char_ngrams(text_col, n)).alias("gram"),
        )
        counts = grams.groupBy("lang", "gram").agg(F.count("*").alias("n"))
    totals = counts.groupBy("lang").agg(F.sum("n").alias("total"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("gram"))
    return (
        counts.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= top_k)
        .join(totals, "lang")
        .select("lang", "gram", F.log(F.col("n") / F.col("total")).alias("weight"))
    )


def classify_language_ngram(
    df: DataFrame,
    profiles: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    round_score: int = 6,
    doc_grams: DataFrame | None = None,
) -> DataFrame:
    """Predict each document's language from n-gram profiles:
    ``score(doc, lang) = Σ_gram count_doc(gram) · (weight(lang, gram) −
    penalty)`` over the grams present in the language's profile, where
    ``penalty = min(all profile weights) − 1`` stands in for the
    log-probability of an unseen gram; prediction is the argmax with a
    deterministic language-ascending tie-break.

    The penalty shift is what makes the naive-Bayes-style sum correct
    under a matched-grams-only join: raw log-share weights are all
    negative, so summing only matches would *reward* the language a
    document shares the fewest grams with. Subtracting a constant below
    every profile weight is algebraically the full NB score minus a
    language-independent term (each unmatched gram priced at
    ``penalty``), so every match contributes positively, scaled by how
    characteristic the gram is.

    Scale shape: per-doc gram counts (one map-side-combined shuffle on
    (doc, gram)), a **broadcast** join against the config-sized profile
    table — collected once to the driver, so the penalty is a plain
    literal and the expensive profile plan never runs twice — then one
    more combinable aggregation per (doc, lang) and a struct-min
    argmax — no window over the corpus, no profile-side shuffle.
    Documents sharing no gram with any profile produce no row (they
    carry no evidence); upstream quality gates drop such docs anyway.
    Complements :func:`language_score` (the stopword-ratio heuristic):
    this one distinguishes *between* languages. ``doc_grams`` accepts a
    precomputed (id, gram, cnt) frame — see
    :func:`language_id_pipeline` for the shared-subtree composition.
    """
    from blueetl_spark.operators.dedup import _fan_out_small_scan

    if doc_grams is None:
        doc_grams = (
            _fan_out_small_scan(df)
            .select(
                F.col(id_col), F.explode(char_ngrams(text_col, n)).alias("gram")
            )
            .groupBy(id_col, "gram")
            .agg(F.count("*").alias("cnt"))
        )
    # The profile table is config-sized (languages × top_k) but its PLAN is
    # expensive (corpus-wide gram counts + rank window) and it has two
    # consumers (broadcast join + penalty scalar). Collect it ONCE into a
    # local frame instead of persisting: the expensive plan runs exactly
    # once, the penalty becomes a plain literal, and nothing is left cached
    # across calls (ADVICE r5 — the old persist was never unpersisted).
    prof_rows = profiles.select("lang", "gram", "weight").collect()
    spark = df.sparkSession
    if not prof_rows:
        # documented semantics: no profile overlap -> no row, and an
        # empty (e.g. not-yet-trained) profile table overlaps nothing —
        # return an empty, correctly-typed frame rather than raising
        id_type = dict(df.dtypes)[id_col]
        return spark.createDataFrame(
            [], f"{id_col} {id_type}, lang_pred string, score double"
        )
    # Arrow-backed local frame (session.local_df), NOT the pickled-Python
    # local RDD: every job whose plan embeds a pickled LocalRelation pays
    # a Python-worker round trip at execution (guide §4 — measured ~0.3 s
    # per job on this box); the Arrow path is a pure-JVM literal table.
    from blueetl_spark.session import local_df

    local_profiles = local_df(
        spark,
        [(r["lang"], r["gram"], float(r["weight"])) for r in prof_rows],
        "lang string, gram string, weight double",
    )
    penalty = min(r["weight"] for r in prof_rows) - 1.0
    scored = (
        doc_grams.join(F.broadcast(local_profiles), "gram")
        .groupBy(id_col, "lang")
        .agg(
            F.sum(F.col("cnt") * (F.col("weight") - F.lit(penalty))).alias("score")
        )
    )
    best = scored.groupBy(id_col).agg(
        F.min(F.struct((-F.col("score")).alias("ns"), F.col("lang"))).alias("__b")
    )
    return best.select(
        F.col(id_col),
        F.col("__b.lang").alias("lang_pred"),
        F.round(-F.col("__b.ns"), round_score).alias("score"),
    )


def language_id_pipeline(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    top_k: int = 200,
    round_score: int = 6,
) -> DataFrame:
    """Train profiles AND classify the same corpus in one pass over the
    grams (VERDICT r6 #2): the normalize/explode subtree — the dominant
    cost of both halves — aggregates ONCE into per-(doc, lang, gram)
    counts, pinned with an eager ``localCheckpoint``, and both consumers
    derive from it: profile training regroups to (lang, gram) sums
    (map-side combined, shuffles only distinct (doc, gram) rows) and
    classification reads it as the (id, gram, cnt) frame directly.
    Separate train/apply corpora keep the two-call form
    (:func:`train_language_profiles` + :func:`classify_language_ngram`).
    """
    from blueetl_spark.operators.dedup import _fan_out_small_scan

    base = (
        _fan_out_small_scan(df)
        .select(
            F.col(id_col),
            F.col(lang_col).alias("lang"),
            F.explode(char_ngrams(text_col, n)).alias("gram"),
        )
        .groupBy(id_col, "lang", "gram")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    profiles = train_language_profiles(
        counts=base.groupBy("lang", "gram").agg(F.sum("cnt").alias("n")),
        top_k=top_k,
        n=n,
    )
    return classify_language_ngram(
        df,
        profiles,
        text_col=text_col,
        id_col=id_col,
        n=n,
        round_score=round_score,
        doc_grams=base.select(id_col, "gram", "cnt"),
    )


def normalized_text(text_col: str) -> Column:
    """Case/whitespace-normalized text — the exact-dedup canonical form,
    shared by the batch fingerprint and the streaming dedup key."""
    return F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")


def fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic document fingerprint: md5 of case/whitespace-normalized
    text. The exact-dedup key (normalization catches trivial near-dups)."""
    return df.select(
        F.col(id_col), F.md5(normalized_text(text_col)).alias("fingerprint")
    )


def tf_idf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int | None = None,
) -> DataFrame:
    """Corpus TF-IDF per (doc, token): tf = in-doc count, df = documents
    containing the token, ``tfidf = tf · ln(N / df)``.

    Shape: one explode + a per-(doc, token) count (map-side combined),
    a token-level document-frequency aggregate joined back on the token,
    and the corpus size as a scalar subquery — two data shuffles total.
    ``top_k`` keeps each document's k highest-scoring tokens (window
    ranked, deterministic token tie-break).
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("token")
    ).filter(F.col("token") != "")
    tf = toks.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    docfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = df.select(F.countDistinct(id_col).alias("n")).select("n")
    out = (
        tf.join(docfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "token",
            "tf",
            "df",
            (F.col("tf") * F.log(F.col("n") / F.col("df"))).alias("tfidf"),
        )
    )
    if top_k is not None:
        from pyspark.sql import Window

        w = Window.partitionBy(id_col).orderBy(
            F.col("tfidf").desc(), F.col("token")
        )
        out = (
            out.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .drop("rank")
        )
    return out


def bm25(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int | None = None,
) -> DataFrame:
    """Okapi BM25 per (doc, token), Lucene-style non-negative idf:
    ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))`` and
    ``score = idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``.

    The retrieval-side twin of :func:`tf_idf` (same two-shuffle shape:
    per-(doc, token) counts, a token-level document-frequency aggregate
    joined back on the token, and the corpus stats — N, avgdl — as one
    broadcast scalar row). ``dl`` is the document's non-empty token
    count, derived from the tf frame so a re-tokenization pass is never
    paid. ``top_k`` keeps each document's k highest-scoring tokens
    (deterministic token tie-break), the index-pruning shape a sparse
    retrieval pipeline materializes.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("token")
    ).filter(F.col("token") != "")
    tf = toks.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    docfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    stats = dl.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    )
    idf = F.log(
        F.lit(1.0) + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    out = (
        tf.join(dl, id_col)
        .join(docfreq, "token")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            "token",
            "tf",
            "df",
            "dl",
            (idf * F.col("tf") * (k1 + 1.0) / norm).alias("bm25"),
        )
    )
    if top_k is not None:
        from pyspark.sql import Window

        w = Window.partitionBy(id_col).orderBy(
            F.col("bm25").desc(), F.col("token")
        )
        out = (
            out.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .drop("rank")
        )
    return out


def bm25_search(
    df: DataFrame,
    query: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    scored: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query by summed BM25:
    ``(id, score)``, best first (deterministic ``id`` tie-break).

    ``scored`` accepts a precomputed :func:`bm25` frame — the
    production shape: materialize the scored posting table once (it IS
    the sparse index), then each query is a token-pruned probe + one
    map-side-combined sum + a ``TakeOrderedAndProject`` (top-k never
    global-sorts).  Without it the scoring plan is built inline and
    Catalyst pushes the query-token filter into the posting branch.
    """
    q_toks = list(dict.fromkeys(query.split()))
    if not q_toks:
        raise ValueError("empty query")
    if scored is None:
        scored = bm25(df, text_col, id_col, k1=k1, b=b)
    hits = (
        scored.filter(F.col("token").isin(q_toks))
        .groupBy(id_col)
        .agg(F.sum("bm25").alias("score"))
    )
    # rank on the score rounded to audit precision: duplicate documents
    # produce sums differing in the last ulp per engine/summation order,
    # so an unrounded ORDER BY never lets the id tie-break engage and
    # the k-boundary selection can flake across engines
    return hits.orderBy(
        F.round(F.col("score"), 9).desc(), F.col(id_col)
    ).limit(k)


def lm_bigram_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 0.1,
) -> DataFrame:
    """CCNet-style n-gram language-model quality score: train an add-k
    smoothed bigram LM on the corpus and score every document by its
    mean negative log-likelihood (``ppl = exp(nll)``).

    Published method: CCNet (Wenzek et al. 2019) buckets Common-Crawl
    documents by LM perplexity; this is the same filter with the LM
    trained in-corpus as one Spark plan instead of a pretrained KenLM.

    Scale shape: per-(doc, bigram) counts are aggregated ONCE and pinned
    (eager ``localCheckpoint`` — the :func:`language_id_pipeline`
    discipline), then reused three ways: corpus bigram counts B(w1,w2)
    and context counts U(w1) are map-side-combined regroups of that
    frame, and the scoring join consumes it directly. Per-token work
    never re-runs; the only wide joins key on the bigram / context
    string, the standard LM-training shape at any corpus size.

    ``P(w2|w1) = (B + k) / (U(w1) + k·V)`` with V = distinct corpus
    bigram types' continuation vocabulary (distinct w2). Documents with
    fewer than two tokens get ``n_bigrams = 0`` and a null score.
    """
    # a true bigram contains exactly one space (tokens are
    # whitespace-split); sub-2-token docs yield shingles(…) degenerate
    # singletons with none — drop them instead of training on fakes
    bg = F.filter(shingles(text_col, 2), lambda s: s.contains(" "))
    doc_bg = (
        df.select(F.col(id_col), F.explode(bg).alias("bigram"))
        .groupBy(id_col, "bigram")
        .agg(F.count("*").alias("c"))
        .localCheckpoint()
    )
    corpus_b = doc_bg.groupBy("bigram").agg(F.sum("c").alias("B"))
    corpus_u = (
        doc_bg.withColumn("w1", F.substring_index("bigram", " ", 1))
        .groupBy("w1")
        .agg(F.sum("c").alias("U"))
    )
    vocab = corpus_b.select(
        F.countDistinct(F.substring_index("bigram", " ", -1)).alias("V")
    )
    p = (F.col("B") + add_k) / (F.col("U") + add_k * F.col("V"))
    scored = (
        doc_bg.join(corpus_b, "bigram")
        .withColumn("w1", F.substring_index("bigram", " ", 1))
        .join(corpus_u, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_bigrams"),
            (F.sum(F.col("c") * -F.log(p)) / F.sum("c")).alias("nll"),
        )
    )
    return df.select(id_col).distinct().join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        "nll",
    )


def dsir_logweights(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    add_k: float = 0.5,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): hash every token into
    ``n_buckets`` buckets, estimate the target and raw bucket
    distributions with add-k smoothing, and score each raw document by
    its hashed-n-gram log importance ratio
    ``log w(doc) = Σ_tokens ln( p_target(bucket) / p_raw(bucket) )``.

    Downstream, sampling ∝ exp(log_weight) (e.g. via
    :func:`blueetl_spark.operators.sampling.weighted_sample`-style
    hash-rank tricks) resamples the raw corpus toward the target
    distribution — the published cheap alternative to a trained quality
    classifier.

    Scale shape: both distribution estimates are ``n_buckets``-row
    aggregates (map-side combined; broadcast back), and per-document
    scoring is one explode + bucket lookup + per-doc sum — a single
    data shuffle on ``id_col``. ``hash_fn="md5"`` gives a
    DuckDB-reproducible bucket hash for oracle parity; the default
    ``xxhash64`` is the cheap JVM path.
    """
    def bucket(tok: Column) -> Column:
        if hash_fn == "xxhash64":
            h = F.xxhash64(tok)
        elif hash_fn == "md5":
            h = F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")
        else:
            raise ValueError(f"unknown hash_fn {hash_fn!r}")
        return F.pmod(h, F.lit(n_buckets))

    def bucket_counts(frame: DataFrame, total_name: str, cnt_name: str):
        toks = frame.select(
            F.explode(tokens(text_col)).alias("token")
        ).filter(F.col("token") != "")
        return toks.select(bucket(F.col("token")).alias("bucket")).groupBy(
            "bucket"
        ).agg(F.count("*").alias(cnt_name))

    from pyspark.sql import Window

    t_counts = bucket_counts(target, "t_total", "t_c")
    r_counts = bucket_counts(df, "r_total", "r_c")
    # dense bucket table: every bucket gets the smoothed estimate even
    # when one side never hashed into it
    buckets = df.sparkSession.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket")
    )
    # side totals as WINDOW sums over the dense n_buckets-row frame
    # (NULLs from the left joins drop out, so the window sum equals the
    # side's token total) — a separate aggregate branch per side would
    # consume each bucket-count frame twice, re-planning the full
    # corpus token explode under it (r13); the window spans ≤ n_buckets
    # rows inside an already-broadcast subtree
    w_all = Window.partitionBy(F.lit(1))
    ratios = (
        buckets.join(F.broadcast(t_counts), "bucket", "left")
        .join(F.broadcast(r_counts), "bucket", "left")
        .withColumn("t_total", F.sum("t_c").over(w_all))
        .withColumn("r_total", F.sum("r_c").over(w_all))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce("t_c", F.lit(0)) + add_k)
                    / (F.col("t_total") + add_k * n_buckets)
                )
                - F.log(
                    (F.coalesce("r_c", F.lit(0)) + add_k)
                    / (F.col("r_total") + add_k * n_buckets)
                )
            ).alias("log_ratio"),
        )
    )
    doc_toks = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("token")
    ).filter(F.col("token") != "")
    return (
        doc_toks.select(id_col, bucket(F.col("token")).alias("bucket"))
        .join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("log_ratio").alias("log_weight"),
        )
    )


# the Gopher stop-word rule's fixed list (Rae et al. 2021, A1.1)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """The Gopher quality heuristics (Rae et al. 2021, appendix A1.1)
    as one zero-shuffle projection: per-document pass/fail flag for each
    published rule plus the conjunction, so a curation pipeline can
    either filter on ``keep`` or analyze which rule fires.

    Rules (defaults are the paper's): word count in
    [``min_words``, ``max_words``]; mean word length in [3, 10];
    symbol-to-word ratio (``#`` and ellipses) ≤ 0.1; < 90 % of lines
    bullet-started; < 30 % of lines ellipsis-ended; ≥ 80 % of words
    containing an alphabetic character; ≥ 2 distinct stop-words from the
    paper's 8-word list.

    Everything is JVM higher-order/regexp expressions over the tokens
    and line arrays — no shuffle, no Python, filter stays in the scan
    stage (the same deployment shape as :func:`quality_features`, which
    provides the *continuous* signals these rules threshold).
    """
    t = F.col(text_col)
    toks = F.filter(tokens(text_col), lambda x: x != "")
    n_words = F.size(toks)
    char_sum = F.aggregate(
        toks, F.lit(0), lambda acc, x: acc + F.length(x)
    )
    mean_wl = F.try_divide(char_sum, n_words)
    n_symbols = F.regexp_count(t, F.lit("#")) + F.regexp_count(
        t, F.lit(r"\.\.\.|…")
    )
    symbol_ratio = F.try_divide(n_symbols, n_words)
    lines = F.filter(
        F.split(t, "\n"), lambda ln: F.trim(ln) != ""
    )
    n_lines = F.size(lines)
    bullet_frac = F.try_divide(
        F.size(
            F.filter(
                lines,
                lambda ln: F.trim(ln).rlike(r"^[•\-\*]"),
            )
        ),
        n_lines,
    )
    ellipsis_frac = F.try_divide(
        F.size(
            F.filter(
                lines,
                lambda ln: F.trim(ln).rlike(r"(\.\.\.|…)$"),
            )
        ),
        n_lines,
    )
    alpha_frac = F.try_divide(
        F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]"))), n_words
    )
    stop_hits = F.size(
        F.array_intersect(
            F.transform(toks, F.lower),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    )
    flags = {
        "pass_word_count": (n_words >= min_words) & (n_words <= max_words),
        "pass_mean_word_len": (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len),
        "pass_symbol_ratio": symbol_ratio <= max_symbol_ratio,
        "pass_bullet": F.coalesce(
            bullet_frac <= max_bullet_frac, F.lit(True)
        ),
        "pass_ellipsis": F.coalesce(
            ellipsis_frac <= max_ellipsis_frac, F.lit(True)
        ),
        "pass_alpha": alpha_frac >= min_alpha_frac,
        "pass_stopwords": stop_hits >= min_stopword_hits,
    }
    keep = None
    for expr in flags.values():
        keep = expr if keep is None else (keep & expr)
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        *[F.coalesce(e, F.lit(False)).alias(name) for name, e in flags.items()],
        F.coalesce(keep, F.lit(False)).alias("keep"),
    )


def winnowing_fingerprints(
    col: Column | str, n: int = 5, w: int = 4, hash_fn: str = "xxhash64"
) -> Column:
    """Winnowing document fingerprints (rolling-hash selection): hash every
    word ``n``-gram, then keep the minimum hash of each sliding window of
    ``w`` consecutive hashes (distinct, sorted).

    Guarantees of the scheme: any shared run of ≥ ``w + n − 1`` tokens
    between two documents yields at least one shared fingerprint, so
    fingerprint overlap is a plagiarism/near-dup candidate signal at a
    fraction of the full shingle set's size.

    JVM-side and linear: the window minimum is an elementwise ``least``
    over the ``w`` shifted copies of the hash array (``arrays_zip``
    evaluates each shift once — the same pattern as :func:`shingles`, and
    the same O(tokens²) trap if written as a lambda over ``slice``).
    """
    sh = shingles(col, n)
    if hash_fn == "xxhash64":
        hashes = F.transform(sh, lambda s: F.xxhash64(s))
    elif hash_fn == "md5":
        # DuckDB-reproducible 60-bit hash -> the selection is oracle-checkable
        hashes = F.transform(
            sh,
            lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
        )
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    count = F.greatest(F.size(hashes) - F.lit(w - 1), F.lit(1))
    shifted = [F.slice(hashes, j + 1, count) for j in range(w)]
    zipped = F.arrays_zip(*shifted)
    fields = [f"{j}" for j in range(w)]
    mins = F.transform(
        zipped,
        lambda s: F.least(*[s.getField(f) for f in fields])
        if w > 1
        else s.getField("0"),
    )
    return F.array_sort(F.array_distinct(mins))


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 512,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-token-window chunks with optional
    overlap — the context-window packing step of a training-data
    pipeline: (id, chunk_id, n_tokens, chunk_text), chunk_id from 0 in
    document order.

    Stride = ``chunk_tokens - overlap``; the final chunk is the only one
    allowed shorter than ``chunk_tokens``, and a chunk fully contained
    in its predecessor is never emitted (no trailing duplicate when the
    stride overshoots). Whole pipeline is built-ins — tokenize once into
    a materialized array column (NOT inside the per-chunk lambda: that's
    the O(tokens²) trap PLANS.md documents for shingles), then one
    ``sequence`` explode. Embarrassingly parallel: no shuffle, output
    partitioning inherits the scan.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = "__chunk_toks"
    out = (
        # NULL text tokenizes like empty text (one empty chunk) — a plain
        # explode over a NULL sequence would silently DROP the document,
        # breaking downstream corpus accounting (same invariant as
        # shingles: no document disappears).
        df.withColumn(toks, tokens(F.coalesce(F.col(text_col), F.lit(""))))
        .withColumn(
            "chunk_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        F.ceil(
                            (F.size(toks) - F.lit(chunk_tokens))
                            / F.lit(stride)
                        ),
                        F.lit(0),
                    ).cast("int"),
                )
            ),
        )
        .withColumn("__start", F.col("chunk_id") * F.lit(stride))
        .select(
            F.col(id_col),
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.least(
                F.size(toks) - F.col("__start"), F.lit(chunk_tokens)
            ).cast("long").alias("n_tokens"),
            F.array_join(
                F.slice(F.col(toks), F.col("__start") + 1, F.lit(chunk_tokens)),
                " ",
            ).alias("chunk_text"),
        )
    )
    return out


def pack_chunks(
    chunks: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    sort_cols: tuple[str, ...] = ("doc_id", "chunk_id"),
) -> DataFrame:
    """Greedy sequential packing of token chunks into fixed-budget packs
    (the batch-construction step after :func:`chunk_documents`): input
    columns + ``pack_id`` (globally unique), ``pack_tokens`` (the pack's
    running total).

    Scale contract: packs are formed **within a partition** — first-fit
    over the partition's rows in ``sort_cols`` order, implemented as one
    Arrow-batched ``mapInPandas`` pass holding O(1) state (running pack
    total), with ``pack_id = partition_id << 40 | local``. No shuffle
    beyond the deterministic ``sortWithinPartitions``; cross-partition
    packing would serialize the corpus through one task for a ~half-pack
    saving per partition. A chunk alone larger than ``budget`` gets its
    own pack (callers chunk with ``chunk_tokens <= budget`` to avoid
    this).
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark import TaskContext

    if budget <= 0:
        raise ValueError("budget must be positive")
    # copy before .add(): DataFrame.schema is a cached property and
    # StructType.add mutates in place — extending it directly corrupts the
    # caller's DataFrame schema and breaks a second pack_chunks call
    from pyspark.sql import types as T

    out_schema = (
        T.StructType(list(chunks.schema.fields))
        .add("pack_id", "long")
        .add("pack_tokens", "long")
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        local = 0
        running = 0
        started = False
        for pdf in batches:
            ids, totals = [], []
            for n in pdf[token_col].astype("int64"):
                if started and running + n > budget:
                    local += 1
                    running = 0
                started = True
                running += int(n)
                ids.append((pid << 40) | local)
                totals.append(running)
            pdf = pdf.copy()
            pdf["pack_id"] = pd.array(ids, dtype="int64")
            pdf["pack_tokens"] = pd.array(totals, dtype="int64")
            yield pdf

    return chunks.sortWithinPartitions(*sort_cols).mapInPandas(
        op, schema=out_schema
    )


def _max_multiplicity(arr: Column) -> Column:
    """Highest multiplicity of any element in ``arr`` (0 for empty arrays).

    Sort, then fold a (prev, run, best) struct over the array — a linear
    JVM-side pass per row. The lambda closes over nothing (the O(n²)
    re-evaluation trap documented on :func:`shingles` does not apply: the
    fold's per-element work is the comparison itself). ``prev`` starts as
    NULL so a legitimate empty-string first element never extends the
    sentinel's run.
    """
    s = F.array_sort(arr)
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + F.lit(1)).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(s, init, step, lambda acc: acc["best"])


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ns: tuple[int, ...] = (2, 3, 5),
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    §A1.1 "repetition removal"), per document and per n-gram order ``n``:

    - ``dup_frac_{n}`` — fraction of n-gram *occurrences* that are repeats
      of an earlier occurrence: ``(total - distinct) / total``.
    - ``top_frac_{n}`` — fraction of the document's tokens covered by the
      most frequent n-gram: ``max_multiplicity · n / n_tokens``.

    Both are NULL when the document is shorter than ``n`` tokens.

    Scale shape: **no shuffle at all** — every signal is a per-row
    expression over the token array (``array_distinct`` for the distinct
    count, a sorted-fold for the max multiplicity), so the operator is
    embarrassingly parallel and inherits the scan's partitioning. This is
    the 100 TB-friendly alternative to explode + groupBy(doc, ngram),
    which would shuffle one row per n-gram occurrence.
    """
    toks = tokens(text_col)
    n_tok = F.size(toks)
    cols = [F.col(id_col), n_tok.cast("long").alias("n_tokens")]
    for n in ns:
        g = n_tok - F.lit(n - 1)  # n-gram occurrences when n_tok >= n
        sh = shingles(text_col, n)
        dup = F.when(
            g > 0, F.round((g - F.size(F.array_distinct(sh))) / g, 9)
        )
        top = F.when(
            g > 0, F.round(_max_multiplicity(sh) * F.lit(n) / n_tok, 9)
        )
        cols.append(dup.alias(f"dup_frac_{n}"))
        cols.append(top.alias(f"top_frac_{n}"))
    return df.select(*cols)


def drop_repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = ". ",
) -> DataFrame:
    """Intra-document span dedup — the *removal* half of Gopher-style
    repetition handling (``repetition_stats`` is the signal half): split
    each document into spans (sentences/paragraphs/lines by ``sep``),
    keep only the FIRST occurrence of each span, and rejoin in original
    order. Boilerplate sentences repeated inside a page vanish;
    cross-document duplication stays the LSH family's job.

    Output: (id, text — deduped, n_spans, n_unique), both counts long.

    Scale shape: **no shuffle** — a per-row order-preserving distinct via
    a higher-order filter (keep span i iff it is absent from the prefix
    ``slice(spans, 1, i)``), O(spans²) comparisons per row on the
    config-sized span count. The span array is materialized as a real
    column FIRST: referencing the ``split`` expression inside the lambda
    would re-split the document once per span (the capture-in-HOF-lambda
    trap ``tests/test_plans.py`` guards elsewhere).
    """
    import re as _re

    spans = F.split(F.col(text_col), _re.escape(sep))
    with_spans = df.withColumn("__spans", spans)
    kept = F.filter(
        F.col("__spans"),
        lambda x, i: F.array_position(F.slice(F.col("__spans"), 1, i), x) == 0,
    )
    return with_spans.select(
        F.col(id_col),
        F.array_join(kept, sep).alias(text_col),
        F.size("__spans").cast("long").alias("n_spans"),
        F.size(F.array_distinct("__spans")).cast("long").alias("n_unique"),
    )


def ngram_overlap(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    broadcast_eval: bool = True,
    hashed: bool = False,
) -> DataFrame:
    """Train/eval decontamination: per train document, the number of
    distinct word ``n``-grams it shares with the eval corpus, plus a
    ``contaminated`` flag (≥1 shared n-gram) — the benchmark-leakage
    check every training-data pipeline runs before export.

    Scale shape: the eval corpus's distinct n-gram set is the small side
    (benchmarks are MBs, the corpus is TBs) — ``broadcast_eval=True``
    broadcasts it so the per-train-doc probe is a map-side semi join with
    no shuffle of the big side; the per-doc count then aggregates on
    ``id_col`` (map-side combined). With ``broadcast_eval=False`` the join
    shuffles on the n-gram key. ``hashed=True`` joins on ``xxhash64`` of
    the n-gram instead of the string — an 8-byte shuffle/broadcast key for
    when even the eval set's raw shingles are large (collisions only ever
    *add* a false shared count at ~2⁻⁶⁴ per candidate).

    Every train document appears in the output (zero-share docs included):
    dropping clean documents would corrupt downstream corpus accounting.
    The probe is a LEFT join so zero-share docs never leave the stream —
    counting misses as 0 in the per-doc aggregate costs one shuffle
    (``id_col``), where an inner-join-then-rejoin base would cost two.
    Every doc survives the explode because :func:`shingles` pads short
    documents instead of emitting an empty array.
    """
    ng = F.explode(F.array_distinct(shingles(text_col, n))).alias("__ng")
    ev = eval_df.select(ng).distinct()
    tr = train.select(F.col(id_col), ng)
    if hashed:
        ev = ev.select(F.xxhash64("__ng").alias("__ng"))
        tr = tr.select(id_col, F.xxhash64("__ng").alias("__ng"))
    ev = ev.withColumn("__hit", F.lit(1))
    hits = tr.join(F.broadcast(ev) if broadcast_eval else ev, "__ng", "left")
    return (
        hits.groupBy(id_col)
        .agg(F.sum(F.coalesce("__hit", F.lit(0))).alias("n_shared"))
        .select(
            F.col(id_col),
            F.col("n_shared").cast("long").alias("n_shared"),
            (F.col("n_shared") > 0).alias("contaminated"),
        )
    )


def _bloom_positions(h1: Column, h2: Column, m_bits: int, k: int) -> Column:
    """``k`` Bloom bit positions via Kirsch-Mitzenmacher double hashing:
    ``g_i = (h1 mod m) + i*(h2 mod m) (mod m)``.  Both hashes are reduced
    into ``[0, m)`` *before* combining so ``i*h2m`` stays below
    ``k * 2^27 << 2^63`` — ANSI mode (Spark 4 default) raises on long
    overflow rather than wrapping.  ``h1``/``h2`` must be *materialized
    columns* on the input frame (higher-order-function lambdas re-evaluate
    whatever they close over once per element — an attribute read is free,
    an inlined xxhash64 would run ``k`` times)."""
    m = F.lit(m_bits).cast("long")
    h1m, h2m = F.pmod(h1, m), F.pmod(h2, m)
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.pmod(h1m + i.cast("long") * h2m, m),
    )


def _build_bloom_array(hashed_grams: DataFrame, m_bits: int, k: int) -> list[int]:
    """Fold a ``(__h1, __h2)`` hashed-gram frame into a Bloom bit array
    of ``m_bits / 64`` longs: distributed ``bit_or`` per 64-bit word,
    collected (config-sized by construction) and zero-filled."""
    words = (
        hashed_grams.select(
            F.explode(_bloom_positions(F.col("__h1"), F.col("__h2"), m_bits, k)).alias(
                "__pos"
            )
        )
        .groupBy((F.col("__pos") / 64).cast("int").alias("__word"))
        .agg(
            F.bit_or(
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), (F.col("__pos") % 64).cast("int")
                )
            ).alias("__bits")
        )
        .collect()
    )
    arr = [0] * (m_bits // 64)
    for row in words:
        arr[row["__word"]] = row["__bits"]
    return arr


def bloom_hit(h1: Column, h2: Column, bloom_col: Column, m_bits: int, k: int) -> Column:
    """Boolean: all ``k`` double-hashed positions of the gram hashed as
    ``(h1, h2)`` are set in ``bloom_col`` (an ``array<long>`` column,
    typically from a broadcast one-row frame)."""
    return F.forall(
        _bloom_positions(h1, h2, m_bits, k),
        lambda p: (
            F.element_at(bloom_col, (p / 64).cast("int") + F.lit(1))
            .bitwiseAND(
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
                )
            )
            != 0
        ),
    )


def ngram_overlap_bloom(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """:func:`ngram_overlap` with a **Bloom-filter prefilter**: same output
    (per train doc, distinct shared n-grams + ``contaminated`` flag), built
    for the regime where even the eval corpus's distinct n-gram set is too
    large to broadcast as literals.

    Scale shape — the problem with the plain operator at 100 TB is its
    broadcast (or full-corpus shuffle) of eval n-grams.  Here:

    1. The eval set folds into a **fixed-size** bit array (``m_bits`` bits
       = ``m_bits/64`` longs; default 1 MiB ≈ 16k longs) via a distributed
       ``bit_or`` aggregate on the bit-word index — collected to the driver
       (config-sized by construction, capped at 2^27 bits = 16 MiB) and
       re-broadcast as a ONE-ROW frame.
    2. The corpus probes the array **map-only** (cross-join with the
       broadcast row, ``forall`` over the k double-hashed positions) — no
       shuffle touches non-matching grams.
    3. Only Bloom *survivors* (true hits + ~``0.5^k`` false positives) run
       the exact verify join against the eval set, shuffling on the 8-byte
       ``xxhash64`` gram key.  The verify join removes every false
       positive, so the result is EXACTLY :func:`ngram_overlap`'s
       (``hashed=True`` semantics: gram identity is the 64-bit hash;
       collisions add a shared count at ~2^-64 per candidate).

    Shuffle inventory: eval-side gram distinct + bit_or (eval-sized, once),
    survivor verify join, per-doc count on ``id_col``.  The 100-TB train
    side is never shuffled in full.
    """
    if m_bits < 64 or m_bits > (1 << 27):
        raise ValueError(
            f"m_bits={m_bits} outside [64, 2^27]: the bit array is collected "
            "to the driver (m_bits/64 longs); 2^27 bits = 16 MiB is the "
            "broadcast-sanity cap"
        )
    spark = train.sparkSession
    ng = F.explode(F.array_distinct(shingles(text_col, n))).alias("__ng")
    hashed = lambda df: df.withColumn(  # noqa: E731
        "__h1", F.xxhash64("__ng")
    ).withColumn("__h2", F.xxhash64("__ng", F.lit(1)))

    ev = hashed(eval_df.select(ng)).select("__h1", "__h2").distinct()
    arr = _build_bloom_array(ev, m_bits, k)
    # Arrow local frame: a pickled one-row array<long> LocalRelation costs
    # a Python round trip per executing job — worst for exactly this shape
    # (large array cells; see session.local_df)
    from blueetl_spark.session import local_df

    bloom_row = local_df(spark, [(arr,)], "__bloom array<long>")

    tr = hashed(train.select(F.col(id_col), ng))
    probe = tr.crossJoin(F.broadcast(bloom_row))  # one-row: map-only
    might = probe.filter(
        bloom_hit(F.col("__h1"), F.col("__h2"), F.col("__bloom"), m_bits, k)
    ).select(id_col, "__h1")
    # Exact verify: survivors only — the join the Bloom pass exists to shrink.
    hits = might.join(ev.select("__h1").distinct(), "__h1", "inner")
    counts = hits.groupBy(id_col).agg(F.count("*").alias("n_shared"))
    ids = train.select(id_col).distinct()
    return ids.join(counts, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
        (F.coalesce("n_shared", F.lit(0)) > 0).alias("contaminated"),
    )


def phrase_count(
    df: DataFrame,
    phrase: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_zero: bool = False,
) -> DataFrame:
    """Per-document occurrence count of a token phrase (consecutive
    token match, overlapping starts counted): ``(id, n_occ)``.

    Zero-shuffle scan path: the document's ``len(phrase)``-gram shingle
    array is filtered for equality with the phrase — a map-only
    whole-stage-codegen expression, no explode, no join.  This is the
    "grep the corpus" formulation; for repeated queries against a static
    corpus, build the inverted index (``operators/invindex.py``) once
    and probe it token-pruned instead of rescanning 100 TB per phrase.

    The phrase is normalized with the same tokenizer as the corpus
    (whitespace split), so a phrase with irregular spacing still
    matches.  ``keep_zero=False`` (default) drops non-matching docs —
    the result is query-shaped, not corpus-shaped.
    """
    p_toks = phrase.split()
    if not p_toks:
        raise ValueError("empty phrase")
    k = len(p_toks)
    norm = " ".join(p_toks)
    n_occ = F.size(F.filter(shingles(text_col, k), lambda s: s == F.lit(norm)))
    out = df.select(F.col(id_col), n_occ.cast("long").alias("n_occ"))
    # shingles() pads short docs with one all-tokens shingle; a doc with
    # fewer than k tokens can still equal the phrase only if it IS the
    # phrase, which the equality above already handles.
    return out if keep_zero else out.filter(F.col("n_occ") > 0)


def token_frequencies(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus vocabulary statistics per token: ``tf`` (total occurrences)
    and ``df`` (documents containing it) — the heavy-hitters / vocabulary
    profile of a corpus.

    Shape: one explode, then two *cascaded* groupBys — (doc, token) counts
    first, token-level sums second. Both are map-side combinable, so the
    token-key shuffle carries one row per (doc, distinct-token) rather
    than one per occurrence, and no expensive ``countDistinct`` is needed
    for the document frequency (it falls out as ``count(*)`` of the first
    aggregate). Token keys are fine-grained → no skew concern beyond
    stopwords, which AQE's skew handling covers.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("token")
    ).filter(F.col("token") != "")
    per_doc = toks.groupBy(id_col, "token").agg(F.count("*").alias("c"))
    return per_doc.groupBy("token").agg(
        F.sum("c").alias("tf"), F.count("*").alias("df")
    )


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

# Engine-portable PII patterns: RE2-safe (no lookarounds/backreferences), so
# the SAME pattern strings run in Spark (java.util.regex), DuckDB, and Trino
# (both RE2) — scrubbing becomes auditable with plain SQL. Order matters at
# replacement time: IP before PHONE (dotted quads contain phone-shaped digit
# runs), EMAIL before PHONE (digits inside local parts).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"(?:\+?\d{1,2}[-. ]?)?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b"),
)


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    patterns: tuple[tuple[str, str], ...] = PII_PATTERNS,
    out_col: str | None = None,
    count: bool = True,
) -> DataFrame:
    """Redact PII spans and (optionally) count them per document.

    Each ``(kind, regex)`` becomes a sequential ``regexp_replace`` with the
    marker ``<KIND>``; ``n_<kind>`` columns count matches on the ORIGINAL
    text (counts are independent per kind — a span scrubbed by an earlier
    pattern still counts for a later one, so the numbers answer "how much
    of each kind was present", not "what did the cascade see").

    Scale shape: pure per-row expression chain — no UDF, no shuffle; at
    100 TB this is a map-only pass that pipelines into whatever scan or
    write surrounds it. Pattern quality is the usual PII trade-off
    (regexes catch formats, not semantics); the defaults are the
    conservative formats every curation stack scrubs first.
    """
    c = F.col(text_col)
    out = df
    if count:
        for kind, pat in patterns:
            out = out.withColumn(
                f"n_{kind}", F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))
            )
    scrubbed = c
    for kind, pat in patterns:
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{kind.upper()}>")
    return out.withColumn(out_col or text_col, scrubbed)


# ---------------------------------------------------------------------------
# BPE: bounded driver-side merge training + distributed encoding
# ---------------------------------------------------------------------------


def bpe_train(
    df: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_words: int = 100_000,
    end_of_word: str = "</w>",
) -> list[tuple[str, str]]:
    """Learn byte-pair-encoding merges from the corpus word distribution.

    Classic Sennrich BPE: start from characters (+ an end-of-word
    marker), repeatedly merge the most frequent adjacent symbol pair.
    The training input is the **word-count table, not the corpus** —
    ``token_frequencies`` aggregates it distributed and map-side-combined,
    and only the ``max_words`` most frequent words (bounded collect, the
    same shape as PQ codebook training: sequential algorithms train on a
    bounded sample, the full corpus is touched only by the distributed
    encode pass) come to the driver. Deterministic: ties in pair
    frequency break lexicographically; words are processed in
    (count desc, word) order.

    Returns the ordered merge list for :func:`bpe_encode`.
    """
    freqs = (
        token_frequencies(df, text_col, id_col)
        .orderBy(F.col("tf").desc(), F.col("token"))
        .limit(max_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {}
    for r in freqs:
        word = tuple(r["token"]) + (end_of_word,)
        vocab[word] = vocab.get(word, 0) + r["tf"]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for word, c in vocab.items():
            for a, b in zip(word, word[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
        if not pair_counts:
            break
        # max count, lexicographically-smallest pair on ties
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break  # nothing left worth merging
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for word, c in vocab.items():
            out = []
            i = 0
            while i < len(word):
                if i + 1 < len(word) and word[i] == best[0] and word[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    end_of_word: str = "</w>",
) -> DataFrame:
    """Tokenize every document with learned BPE merges — the distributed
    half of the pair: one Arrow-batched ``mapInPandas`` pass, merge
    ranks broadcast in the closure (config-sized), per-word results
    memoized per batch (Zipf makes the cache hit rate high). Appends
    ``out_col array<string>``.
    """
    ranks = {pair: i for i, pair in enumerate(merges)}
    in_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    out_schema = f"{in_fields}, {out_col} array<string>"

    def encode_word(word: str, cache: dict) -> list[str]:
        hit = cache.get(word)
        if hit is not None:
            return hit
        syms = list(word) + [end_of_word]
        while len(syms) > 1:
            best_rank, best_i = None, -1
            for i, pair in enumerate(zip(syms, syms[1:])):
                r = ranks.get(pair)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        cache[word] = syms
        return syms

    def op(batches):
        for pdf in batches:
            cache: dict = {}
            pdf[out_col] = [
                [
                    tok
                    for w in (t or "").split()
                    for tok in encode_word(w, cache)
                ]
                for t in pdf[text_col]
            ]
            yield pdf

    return df.mapInPandas(op, out_schema)


def contamination_ratio(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    broadcast_eval: bool = True,
    hashed: bool = False,
    round_to: int | None = 6,
) -> DataFrame:
    """Per-document n-gram contamination SCORE — the lm-eval-harness
    style refinement of :func:`ngram_overlap`'s boolean flag: the
    fraction of a train document's distinct word n-grams that appear
    anywhere in the eval corpus, so a pipeline can rank and threshold
    ("drop > 80% overlap, audit 20–80%") instead of dropping on one
    shared shingle.

    Output: ``(id_col, n_grams, n_shared, ratio, contaminated)`` with
    ``contaminated = ratio >= threshold``. Every train document appears
    (zero-share docs score 0.0).

    Scale shape is :func:`ngram_overlap`'s: the eval n-gram set
    broadcasts (or shuffle-joins with ``broadcast_eval=False``), the
    probe is a LEFT join on the exploded distinct shingles, and ONE
    map-side-combined aggregate per train doc counts both the total
    and the shared grams — the ratio costs nothing extra over the
    flag. ``hashed=True`` probes on ``xxhash64(ngram)`` (8-byte keys;
    collisions only ever add ~2⁻⁶⁴ false shared counts).
    """
    if not 0.0 <= threshold <= 1.0:
        raise ValueError("threshold must be in [0, 1]")
    ng = F.explode(F.array_distinct(shingles(text_col, n))).alias("__ng")
    ev = eval_df.select(ng).distinct()
    tr = train.select(F.col(id_col), ng)
    if hashed:
        ev = ev.select(F.xxhash64("__ng").alias("__ng"))
        tr = tr.select(id_col, F.xxhash64("__ng").alias("__ng"))
    ev = ev.withColumn("__hit", F.lit(1))
    hits = tr.join(F.broadcast(ev) if broadcast_eval else ev, "__ng", "left")
    ratio = F.col("n_shared") / F.col("n_grams")
    if round_to is not None:
        ratio = F.round(ratio, round_to)
    return (
        hits.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce("__hit", F.lit(0))).cast("long").alias("n_shared"),
        )
        .select(
            F.col(id_col),
            "n_grams",
            "n_shared",
            ratio.alias("ratio"),
            (ratio >= F.lit(threshold)).alias("contaminated"),
        )
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    broadcast_unigrams: bool = True,
    round_to: int | None = 6,
) -> DataFrame:
    """Pointwise mutual information of ADJACENT token pairs — the
    classic collocation extractor ("new york", "machine learning") for
    vocabulary building and phrase-aware tokenization:

        PMI(x, y) = ln( p(xy) / (p(x) · p(y)) )
                  = ln( (c_xy · N · N) / (Nb · c_x · c_y) )

    with ``c_xy`` the adjacent-pair count over all documents, ``c_x``
    unigram counts, ``N`` total tokens, ``Nb`` total adjacent pairs.
    Output: ``(w1, w2, n_pair, pmi)`` for pairs seen ≥ ``min_count``
    times (rare pairs have unstable PMI — the standard cutoff).

    Scale shape: ONE shuffle each for the pair and unigram counts (both
    map-side-combined over the exploded token stream; the token explode
    never re-runs — pairs and unigrams branch off one projection).
    Unigram counts are vocab-sized and broadcast onto the (already
    ``min_count``-thinned) pair table twice — pass
    ``broadcast_unigrams=False`` for vocabularies too big to broadcast
    (two shuffle joins on the word key instead). Totals ride a
    broadcast scalar row. The PMI arithmetic is integer counts inside
    ONE ``ln`` so the SQL oracle replays it bit-for-bit before the
    rounding.
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    tk = df.select(tokens(text_col).alias("__tk"))
    pairs = tk.select(
        F.explode(
            F.transform(
                F.slice(F.col("__tk"), 1, F.size("__tk") - 1),
                lambda w, i: F.struct(
                    w.alias("w1"),
                    F.col("__tk")[i + 1].alias("w2"),
                ),
            )
        ).alias("__p")
    ).select("__p.w1", "__p.w2")
    unis = tk.select(F.explode("__tk").alias("w"))
    pair_counts = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )
    uni_counts = unis.groupBy("w").agg(F.count(F.lit(1)).alias("__c"))
    totals = unis.groupBy().agg(F.count(F.lit(1)).alias("__n")).crossJoin(
        pairs.groupBy().agg(F.count(F.lit(1)).alias("__nb"))
    )
    u1 = uni_counts.select(F.col("w").alias("w1"), F.col("__c").alias("__c1"))
    u2 = uni_counts.select(F.col("w").alias("w2"), F.col("__c").alias("__c2"))
    if broadcast_unigrams:
        u1, u2 = F.broadcast(u1), F.broadcast(u2)
    n, nb = F.col("__n").cast("double"), F.col("__nb").cast("double")
    pmi = F.log(
        (F.col("n_pair").cast("double") * n * n)
        / (nb * F.col("__c1") * F.col("__c2"))
    )
    joined = (
        pair_counts.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(totals))
    )
    if round_to is not None:
        pmi = F.round(pmi, round_to)
    return joined.select("w1", "w2", "n_pair", pmi.alias("pmi"))


def pack_sequences(
    df: DataFrame,
    len_col: str,
    seq_len: int,
    by: Sequence[str] = (),
    order: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """Concat-then-split sequence packing — how pretraining pipelines
    turn a document corpus into fixed-length training sequences: within
    each group, documents concatenate in a deterministic order and the
    token stream splits into back-to-back bins of ``seq_len`` tokens.
    Output is the PACKING MANIFEST: one row per (document × bin it
    overlaps) with in-bin offsets —
    ``(by…, order…, bin, seg_start, seg_end)`` — everything a loader
    needs to materialize sequence ``bin`` without re-deriving global
    offsets (``seg_end`` is exclusive; a document longer than
    ``seq_len`` simply spans several bins).

    Chosen over greedy first-fit no-split packing deliberately: greedy
    packing is an inherently sequential recurrence (bin state feeds the
    next decision) that cannot be expressed as a window function, while
    concat-then-split is pure prefix-sum arithmetic — ONE ordered
    window per group computes every document's global token interval
    ``[cum − len, cum)``, and the bin overlap explodes from integer
    division. All integer math end to end: bit-exact on any engine,
    zero padding waste (greedy leaves tail gaps; splitting leaves none).

    Scale caveat (same as every per-group ordered window here): each
    group's prefix sum is one partition. Group by a shard/epoch key of
    bounded size at 100 TB — packing is embarrassingly parallel across
    shards because bins are per-group; run ``profile.key_skew`` on the
    group key when unsure.
    """
    from pyspark.sql import Window

    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    by, order = list(by), list(order)
    w = Window.partitionBy(*by).orderBy(*[F.col(c).asc() for c in order])
    n = F.col(len_col).cast("long")
    src = df.filter(n > 0).select(*by, *order, n.alias("__n"))
    cum = F.sum("__n").over(w)
    s = src.select(
        *by,
        *order,
        (cum - F.col("__n")).alias("__st"),
        cum.alias("__en"),
    )
    lit_l = F.lit(int(seq_len)).cast("long")
    binned = s.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.floor(F.col("__st") / lit_l),
                F.floor((F.col("__en") - 1) / lit_l),
            )
        ),
    )
    b = F.col("bin")
    return binned.select(
        *by,
        *order,
        "bin",
        (F.greatest(F.col("__st"), b * lit_l) - b * lit_l).alias("seg_start"),
        (F.least(F.col("__en"), (b + 1) * lit_l) - b * lit_l).alias("seg_end"),
    )
