"""Unit tests for corpus-curation operators: repetition signals,
train/eval decontamination, vocabulary profile, deterministic sampling."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from blueetl_spark.operators import sampling, text


@pytest.fixture()
def docs(spark):
    rows = [
        (0, "a b a b c"),
        (1, "x"),
        (2, ""),
        (3, "a b a b a b"),
        (4, "p q r s t u"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats_hand_checked(spark, docs):
    out = {
        r["doc_id"]: r
        for r in text.repetition_stats(docs, ns=(2, 3, 5)).collect()
    }
    # "a b a b c": 2-grams [ab, ba, ab, bc] -> 4 total, 3 distinct,
    # max multiplicity 2
    r = out[0]
    assert r["n_tokens"] == 5
    assert r["dup_frac_2"] == pytest.approx(0.25)
    assert r["top_frac_2"] == pytest.approx(2 * 2 / 5)
    assert r["dup_frac_3"] == 0.0
    assert r["top_frac_3"] == pytest.approx(3 / 5)
    assert r["dup_frac_5"] == 0.0
    assert r["top_frac_5"] == 1.0
    # single-token and empty docs: all n >= 2 signals NULL
    for d in (1, 2):
        for n in (2, 3, 5):
            assert out[d][f"dup_frac_{n}"] is None
            assert out[d][f"top_frac_{n}"] is None
    # "a b a b a b": 5 bigram occurrences, 2 distinct -> dup 0.6;
    # "a b" x3 -> top 3*2/6 = 1.0
    assert out[3]["dup_frac_2"] == pytest.approx(0.6)
    assert out[3]["top_frac_2"] == pytest.approx(1.0)
    # all-distinct doc
    assert out[4]["dup_frac_2"] == 0.0
    assert out[4]["top_frac_2"] == pytest.approx(2 / 6)


def test_repetition_stats_is_shuffle_free(spark, docs):
    plan = text.repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_max_multiplicity_empty_string_element(spark):
    # an empty-string token must not extend the NULL sentinel's run
    df = spark.createDataFrame([(0, ["", "a"])], "id long, arr array<string>")
    got = df.select(
        text._max_multiplicity(F.col("arr")).alias("m")
    ).head()["m"]
    assert got == 1


@pytest.mark.parametrize("hashed", [False, True])
@pytest.mark.parametrize("broadcast_eval", [False, True])
def test_ngram_overlap(spark, hashed, broadcast_eval):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),   # shares "quick brown fox"
            (2, "totally different words here"),
            (3, "quick brown fox quick brown fox"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "a quick brown fox ran")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in text.ngram_overlap(
            train, ev, n=3, hashed=hashed, broadcast_eval=broadcast_eval
        ).collect()
    }
    assert len(out) == 3  # zero-share docs are kept
    assert out[1]["n_shared"] == 1 and out[1]["contaminated"]
    assert out[2]["n_shared"] == 0 and not out[2]["contaminated"]
    # distinct n-grams: the repeated shared trigram counts once
    assert out[3]["n_shared"] == 1


def test_token_frequencies(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id long, text string"
    )
    got = {
        r["token"]: (r["tf"], r["df"])
        for r in text.token_frequencies(df).collect()
    }
    assert got == {"a": (3, 2), "b": (1, 1), "c": (1, 1)}


@pytest.mark.parametrize("method", ["xxhash64", "md5"])
def test_hash_sample_deterministic_and_seed_disjoint(spark, method):
    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    a1 = {r["doc_id"] for r in sampling.hash_sample(df, 0.5, method=method).collect()}
    a2 = {r["doc_id"] for r in sampling.hash_sample(df, 0.5, method=method).collect()}
    assert a1 == a2  # pure function of the key
    assert 0.4 < len(a1) / 2000 < 0.6
    b = {
        r["doc_id"]
        for r in sampling.hash_sample(df, 0.5, seed="other", method=method).collect()
    }
    assert b != a1  # different seed, different (independent) sample
    # a rate-r sample is a subset of a rate-r' sample for r < r' (same
    # bucket per key, monotone threshold)
    small = {r["doc_id"] for r in sampling.hash_sample(df, 0.2, method=method).collect()}
    assert small <= a1


def test_mixture_sample_rates_and_validation(spark):
    df = spark.createDataFrame(
        [(i, "keep" if i % 2 else "drop") for i in range(1000)],
        "doc_id long, source string",
    )
    out = sampling.mixture_sample(
        df, {"keep": 1.0, "drop": 0.0}, group_col="source"
    ).collect()
    assert len(out) == 500
    assert all(r["source"] == "keep" for r in out)
    # unknown groups fall to default_rate
    out2 = sampling.mixture_sample(
        df, {"keep": 1.0}, group_col="source", default_rate=1.0
    )
    assert out2.count() == 1000
    with pytest.raises(ValueError):
        sampling.mixture_sample(df, {"keep": 1.5}, group_col="source")
    with pytest.raises(ValueError):
        sampling.hash_sample(df, -0.1)


def test_sampling_is_shuffle_free(spark):
    df = spark.range(100).withColumnRenamed("id", "doc_id")
    plan = (
        sampling.hash_sample(df, 0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_ngram_overlap_broadcast_single_shuffle(spark):
    train = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(20)],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(99, "w5 w6 w7")], "doc_id long, text string")
    out = text.ngram_overlap(train, ev, n=3, broadcast_eval=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the corpus side must see exactly one hash shuffle (the per-doc
    # aggregate); the only other exchange is the eval-corpus-sized
    # distinct feeding the broadcast, and the probe itself is a
    # broadcast join, never a sort-merge
    assert plan.count("Exchange hashpartitioning(doc_id") == 1
    assert plan.count("Exchange hashpartitioning") == 2
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


@pytest.mark.parametrize("m_bits,k", [(1 << 16, 5), (256, 2)])
def test_ngram_overlap_bloom_matches_exact(spark, m_bits, k):
    # m_bits=256/k=2 forces heavy false positives through the Bloom
    # prefilter; the verify join must remove every one of them.
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "totally different words here"),
            (3, "quick brown fox quick brown fox"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "a quick brown fox ran")], "doc_id long, text string"
    )
    exact = sorted(
        map(tuple, text.ngram_overlap(train, ev, n=3).collect())
    )
    bloom = sorted(
        map(
            tuple,
            text.ngram_overlap_bloom(train, ev, n=3, m_bits=m_bits, k=k).collect(),
        )
    )
    assert bloom == exact


def test_ngram_overlap_bloom_empty_eval_and_bounds(spark):
    train = spark.createDataFrame(
        [(1, "a b c d"), (2, "e f g h")], "doc_id long, text string"
    )
    ev = train.filter(F.lit(False))
    rows = text.ngram_overlap_bloom(train, ev, n=3).collect()
    assert len(rows) == 2 and all(not r["contaminated"] for r in rows)
    with pytest.raises(ValueError, match="m_bits"):
        text.ngram_overlap_bloom(train, ev, m_bits=32)
    with pytest.raises(ValueError, match="m_bits"):
        text.ngram_overlap_bloom(train, ev, m_bits=1 << 28)


def test_ngram_overlap_bloom_probe_is_map_only(spark):
    # The corpus side must reach the Bloom probe without any shuffle:
    # the only exchanges are the survivor verify join (8-byte key) and
    # the per-doc count; the bloom row arrives via broadcast.
    train = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(20)],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(99, "w5 w6 w7")], "doc_id long, text string")
    out = text.ngram_overlap_bloom(train, ev, n=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    # survivor-verify join key is the 64-bit hash, never the gram string
    # (shuffle joins — on __h1 for the verify, on doc_id for the
    # zero-fill rejoin — are the designed shape: at scale neither side
    # of either join is broadcastable)
    assert plan.count("Exchange hashpartitioning(__h1") <= 2
    assert "Exchange hashpartitioning(__ng" not in plan


# -- PII scrubbing -----------------------------------------------------------


def test_pii_scrub_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "server 192.168.1.250 and 10.0.0.1 up"),
            (3, "ssn 123-45-6789 phone (555) 867-5309"),
            (4, "call +1 555 867 5309 today"),
            (5, "clean text with no identifiers at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in text.pii_scrub(df).collect()}
    assert out[1]["text"] == "mail <EMAIL> now"
    assert out[1]["n_email"] == 1 and out[1]["n_ip"] == 0
    assert out[2]["text"] == "server <IP> and <IP> up"
    assert out[2]["n_ip"] == 2
    assert out[3]["text"] == "ssn <SSN> phone <PHONE>"
    assert out[3]["n_ssn"] == 1 and out[3]["n_phone"] == 1
    assert out[4]["text"] == "call <PHONE> today"
    assert out[5]["text"] == "clean text with no identifiers at all"
    assert all(out[5][f"n_{k}"] == 0 for k in ("email", "ip", "ssn", "phone"))


def test_pii_scrub_no_counts_out_col_and_shuffle_free(spark):
    df = spark.createDataFrame([(1, "x a@b.io y")], "doc_id long, text string")
    out = text.pii_scrub(df, count=False, out_col="clean")
    assert out.columns == ["doc_id", "text", "clean"]
    row = out.collect()[0]
    assert row["text"] == "x a@b.io y" and row["clean"] == "x <EMAIL> y"
    plan = text.pii_scrub(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only pass


# -- temperature mixture -----------------------------------------------------


def test_temperature_mixture_flattens_groups(spark):
    # 1600 'big' vs 100 'small': alpha=0.5 keeps small at 100% and big at
    # sqrt(100/1600) = 25%
    df = spark.createDataFrame(
        [(i, "big" if i < 1600 else "small") for i in range(1700)],
        "doc_id long, source string",
    )
    out = sampling.temperature_mixture(df, alpha=0.5).toPandas()
    got = out.source.value_counts()
    assert got["small"] == 100  # smallest group fully kept
    assert 320 < got["big"] < 480  # ~400 expected, Bernoulli spread
    # alpha=1 is a no-op; alpha=0 equalizes in expectation
    assert sampling.temperature_mixture(df, alpha=1.0).count() == 1700
    eq = sampling.temperature_mixture(df, alpha=0.0).toPandas().source.value_counts()
    assert eq["small"] == 100 and 60 < eq["big"] < 140
    with pytest.raises(ValueError):
        sampling.temperature_mixture(df, alpha=1.5)


def test_temperature_mixture_deterministic_across_runs(spark):
    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(900)], "doc_id long, source string"
    )
    a = {r["doc_id"] for r in sampling.temperature_mixture(df, method="md5").collect()}
    b = {r["doc_id"] for r in sampling.temperature_mixture(df, method="md5").collect()}
    assert a == b


def test_temperature_mixture_null_group(spark):
    """A null group is a real group: it gets its own rate instead of
    crashing the sort or silently dropping through a ==NULL predicate."""
    rows = [(i, "big" if i < 800 else None) for i in range(900)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sampling.temperature_mixture(df, alpha=0.0).toPandas()
    counts = out.source.fillna("<null>").value_counts()
    assert counts.get("<null>", 0) == 100  # smallest group fully kept
    assert 60 < counts["big"] < 140  # equalized in expectation


# -- curate pipeline + CLI ---------------------------------------------------


def test_curate_corpus_composes_steps(spark, tmp_path):
    from blueetl_spark.plans.curate import curate_corpus

    rows = [
        (1, "the quick brown fox jumps over the lazy dog and runs on", "en"),
        (2, "the quick brown fox jumps over the lazy dog and runs on", "en"),  # exact dup
        (3, "too short", "en"),
        (4, "mail me at bob@example.com for all of the details on this and that", "en"),
        (5, "benchmark sentence that must not leak into the training set ok", "en"),
        (6, "a completely ordinary document with enough words to pass the gates", "de"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    ev = spark.createDataFrame(
        [(0, "must not leak into the training")], "doc_id long, text string"
    )
    cfg = {"steps": [
        {"op": "exact_dedup"},
        {"op": "quality", "min_tokens": 5},
        {"op": "decontaminate", "ngram": 3},
        {"op": "pii_scrub"},
    ]}
    kept, stats = curate_corpus(docs, cfg, eval_df=ev, collect_stats=True)
    out = {r.doc_id: r for r in kept.collect()}
    assert set(out) == {1, 4, 6}  # 2 dup, 3 short, 5 contaminated
    assert "<EMAIL>" in out[4].text and "bob@" not in out[4].text
    assert out[6].lang == "de"  # metadata columns pass through
    assert [s["op"] for s in stats] == [
        "input", "exact_dedup", "quality", "decontaminate", "pii_scrub"
    ]
    assert [s["rows"] for s in stats] == [6, 5, 4, 3, 3]
    # default is the production path: zero per-step actions, empty stats
    kept_def, stats_def = curate_corpus(docs, cfg, eval_df=ev)
    assert stats_def == []
    assert {r.doc_id for r in kept_def.collect()} == {1, 4, 6}
    with pytest.raises(ValueError, match="unknown curation op"):
        curate_corpus(docs, {"steps": [{"op": "nope"}]})
    with pytest.raises(ValueError, match="requires eval_df"):
        curate_corpus(docs, {"steps": [{"op": "decontaminate"}]})


def test_curate_cli_end_to_end(spark, tmp_path):
    """CLI: parquet in -> curated shards + manifest + stats JSON out."""
    import json

    from blueetl_spark.__main__ import main as cli_main
    from blueetl_spark.plans.export import verify_export

    docs = spark.createDataFrame(
        [(i, f"document number {i} with plenty of ordinary words inside it",
          "en") for i in range(40)] + [(99, "document number 0 with plenty of ordinary words inside it", "en")],
        "doc_id long, text string, lang string",
    )
    inp = str(tmp_path / "in.parquet")
    docs.write.parquet(inp)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({"steps": [{"op": "exact_dedup"}]}))
    out_dir = str(tmp_path / "shards")
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli_main(["curate", inp, out_dir, "--config", str(cfg_path),
                       "--shards", "4"])
    assert rc == 0
    res = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert res["steps"][-1]["rows"] == 40  # doc 99 deduped against doc 0
    assert verify_export(spark, out_dir)["ok"]


# ---------------------------------------------------------------------------
# Token-budget epoch planning + up-sampled materialization
# ---------------------------------------------------------------------------


def test_plan_epochs_arithmetic():
    from blueetl_spark.operators.sampling import plan_epochs

    plan = plan_epochs(
        token_counts={"wiki": 1_000, "cc": 100_000},
        weights={"wiki": 1.0, "cc": 1.0},
        budget_tokens=40_000,
    )
    assert plan == {"wiki": 20.0, "cc": 0.2}  # small source up-samples

    with pytest.raises(ValueError, match="without token counts"):
        plan_epochs({"wiki": 10}, {"nope": 1.0}, 100)
    with pytest.raises(ValueError, match="budget_tokens"):
        plan_epochs({"wiki": 10}, {"wiki": 1.0}, 0)
    with pytest.raises(ValueError, match="no tokens"):
        plan_epochs({"wiki": 0}, {"wiki": 1.0}, 100)


def test_epoch_mixture_upsamples_and_downsamples(spark):
    from blueetl_spark.operators.sampling import epoch_mixture

    rows = [(i, "big" if i < 400 else "small") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = epoch_mixture(df, {"big": 0.5, "small": 2.5}, seed="s1").cache()
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # expectation: 400*0.5 = 200, 100*2.5 = 250; hash noise is a few %
    assert abs(counts["big"] - 200) < 40
    assert abs(counts["small"] - 250) < 40
    # every small row appears at least twice (full epochs are unconditional)
    per_row = out.filter(F.col("source") == "small").groupBy("doc_id").count()
    assert per_row.agg(F.min("count")).collect()[0][0] >= 2
    assert per_row.agg(F.max("count")).collect()[0][0] == 3
    # epoch index is 1-based and dense per row
    eps = sorted(
        r["epoch"] for r in out.filter(
            (F.col("doc_id") == 450)).collect()
    )
    assert eps == list(range(1, len(eps) + 1))
    out.unpersist()


def test_epoch_mixture_deterministic_and_drops_unplanned(spark):
    from blueetl_spark.operators.sampling import epoch_mixture

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    plan = {"a": 1.25, "b": 0.0}
    one = sorted(map(tuple, epoch_mixture(df, plan, seed="x").collect()))
    two = sorted(map(tuple, epoch_mixture(df.repartition(7), plan, seed="x").collect()))
    assert one == two  # partitioning-independent
    assert all(r[1] == "a" for r in one)  # b sampled at 0, c unplanned

    with pytest.raises(ValueError, match=">= 0"):
        epoch_mixture(df, {"a": -1.0})


def test_epoch_mixture_is_shuffle_free(spark):
    from blueetl_spark.operators.sampling import epoch_mixture

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    plan = epoch_mixture(df, {"a": 2.5})._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_curate_classifier_and_epoch_steps(spark, tmp_path):
    from blueetl_spark.operators.classifier import train_quality_classifier
    from blueetl_spark.plans.curate import curate_corpus

    good = "careful rigorous analysis with detailed evidence and review"
    bad = "click here free prize winner buy cheap offer now"
    rows = [(i, good if i % 2 == 0 else bad,
             "wiki" if i < 30 else "cc") for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    labeled = docs.withColumn("label", (F.col("doc_id") % 2 == 0).cast("double"))
    model = train_quality_classifier(labeled, n_features=1 << 12, max_iter=30)
    path = str(tmp_path / "qmodel")
    model.write().overwrite().save(path)

    # classifier via model_path (the config-file form) + epoch up-sampling
    cfg = {"steps": [
        {"op": "classifier", "model_path": path, "threshold": 0.5},
        {"op": "epoch_mixture", "epochs": {"wiki": 2.0, "cc": 1.0},
         "group_col": "source", "seed": "e"},
    ]}
    kept, stats = curate_corpus(docs, cfg, collect_stats=True)
    out = kept.collect()
    assert all(r.doc_id % 2 == 0 for r in out)  # bad docs filtered
    n_wiki = sum(1 for r in out if r.source == "wiki")
    n_cc = sum(1 for r in out if r.source == "cc")
    assert n_wiki == 30 and n_cc == 15  # 15 wiki keepers x2 epochs
    assert "epoch" in kept.columns
    assert [s["op"] for s in stats] == ["input", "classifier", "epoch_mixture"]

    # in-memory model object form (no disk round trip)
    cfg2 = {"steps": [{"op": "classifier", "model": model, "threshold": 0.5}]}
    kept2, _ = curate_corpus(docs, cfg2)
    assert kept2.count() == 30

    with pytest.raises(ValueError, match="model_path or model"):
        curate_corpus(docs, {"steps": [{"op": "classifier"}]})


def test_curate_semantic_decontaminate_step(spark):
    """Embedding-space decontamination inside the config pipeline: docs
    whose vector sits within threshold of an eval vector are dropped,
    paraphrase-style (no shared n-grams needed)."""
    import numpy as np

    from blueetl_spark.plans.curate import curate_corpus

    rng = np.random.default_rng(9)
    base = rng.normal(size=8)
    base /= np.linalg.norm(base)
    near = base + rng.normal(scale=0.01, size=8)  # paraphrase: cosine ~1
    far = rng.normal(size=8)
    far -= (far @ base) * base  # orthogonalized: cosine ~0
    rows = [
        (1, "totally different words here", [float(x) for x in near]),
        (2, "an ordinary unrelated document", [float(x) for x in far]),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, embedding array<double>"
    )
    ev = spark.createDataFrame(
        [(0, "benchmark question text", [float(x) for x in base])],
        "doc_id long, text string, embedding array<double>",
    )
    cfg = {"steps": [{"op": "semantic_decontaminate", "threshold": 0.9}]}
    kept, _ = curate_corpus(docs, cfg, eval_df=ev)
    assert [r.doc_id for r in kept.collect()] == [2]
    # hof method agrees through the config seam
    cfg2 = {"steps": [{"op": "semantic_decontaminate", "threshold": 0.9,
                       "method": "hof"}]}
    kept2, _ = curate_corpus(docs, cfg2, eval_df=ev)
    assert [r.doc_id for r in kept2.collect()] == [2]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="requires eval_df"):
        curate_corpus(docs, cfg)


def test_stratified_sample_k_exact_and_prefilter_invariant(spark):
    """Exact k per group; determinism under repartition; the pre-filter
    scale path selects the IDENTICAL rows (k smallest hashes survive any
    prefix filter); under-k groups keep everything; short-group fallback
    fires when the pre-filter is too aggressive."""
    rows = [(i, "big" if i < 900 else ("mid" if i < 990 else "tiny"))
            for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sampling.stratified_sample_k(df, 25, group_col="source")
    got = out.groupBy("source").count().collect()
    assert {r["source"]: r["count"] for r in got} == {
        "big": 25, "mid": 25, "tiny": 10  # tiny has only 10 rows
    }
    ids = {r.doc_id for r in out.collect()}
    # determinism under physical reshuffling of the input
    ids2 = {r.doc_id for r in
            sampling.stratified_sample_k(df.repartition(7), 25,
                                         group_col="source").collect()}
    assert ids == ids2
    # pre-filter path: same selection
    ids3 = {r.doc_id for r in
            sampling.stratified_sample_k(df, 25, group_col="source",
                                         prefilter_rate=0.2).collect()}
    assert ids == ids3
    # pathologically tight pre-filter -> per-group fallback keeps it exact
    ids4 = {r.doc_id for r in
            sampling.stratified_sample_k(df, 25, group_col="source",
                                         prefilter_rate=0.001).collect()}
    assert ids == ids4
    # different seed, different sample
    ids5 = {r.doc_id for r in
            sampling.stratified_sample_k(df, 25, group_col="source",
                                         seed="other").collect()}
    assert ids != ids5
    with pytest.raises(ValueError):
        sampling.stratified_sample_k(df, 0)


def test_weighted_sample_k_deterministic_and_proportional(spark):
    """Exact k, invariant to partitioning/order, non-positive weights
    excluded, and a dominant weight always wins a slot."""
    from pyspark.sql import functions as F

    from blueetl_spark.operators.sampling import weighted_sample_k

    rows = [(i, 1.0) for i in range(200)] + [(999, 1e9), (998, 0.0), (997, -2.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    out1 = sorted(
        r.doc_id
        for r in weighted_sample_k(df, 20, "w", seed="s1").collect()
    )
    out2 = sorted(
        r.doc_id
        for r in weighted_sample_k(
            df.repartition(13).orderBy(F.rand(7)), 20, "w", seed="s1"
        ).collect()
    )
    assert out1 == out2 and len(out1) == 20
    assert 999 in out1            # ~1e9:1 favourite: P(miss) ~ 0
    assert 998 not in out1 and 997 not in out1
    # a different seed draws a different committee (same contract as
    # hash_sample's disjoint-seed independence)
    out3 = sorted(
        r.doc_id
        for r in weighted_sample_k(df, 20, "w", seed="s2").collect()
    )
    assert out1 != out3


def test_weighted_sample_k_log_weights_no_overflow(spark):
    from blueetl_spark.operators.sampling import weighted_sample_k

    df = spark.createDataFrame(
        [(1, 0.0), (2, -800.0), (3, 0.5)], "doc_id long, lw double"
    )
    out = weighted_sample_k(df, 2, "lw", log_weights=True, seed="z")
    picked = {r.doc_id for r in out.collect()}
    # exp(-(-800)) -> inf race key multiplier -> -inf score: never wins
    assert picked == {1, 3}


def test_quantile_buckets_equi_depth_and_grouped(spark):
    """Global path: ~equal bucket occupancy on distinct values; grouped
    path: each group gets its own boundaries (a value that is 'high'
    in one group can be 'low' in another)."""
    import pandas as pd

    from blueetl_spark.operators.sampling import quantile_buckets

    pdf = pd.DataFrame({"id": range(100), "v": [float(i) for i in range(100)]})
    out = quantile_buckets(spark.createDataFrame(pdf), "v", 4).toPandas()
    counts = out.groupby("bucket").size()
    assert sorted(counts.index) == [1, 2, 3, 4]
    assert counts.min() >= 24 and counts.max() <= 26
    # monotone: higher values never land in lower buckets
    assert out.sort_values("v").bucket.is_monotonic_increasing

    g = pd.DataFrame(
        {
            "grp": ["a"] * 4 + ["b"] * 4,
            "v": [0.0, 1.0, 2.0, 3.0, 100.0, 101.0, 102.0, 103.0],
        }
    )
    got = quantile_buckets(spark.createDataFrame(g), "v", 2, by="grp").toPandas()
    # 102/103 are top-half of b; 2/3 top-half of a — same buckets
    top = got[got.bucket == 2].sort_values("v").v.tolist()
    assert top == [2.0, 3.0, 102.0, 103.0]


def test_quantile_buckets_rejects_single_bucket(spark):
    import pandas as pd

    from blueetl_spark.operators.sampling import quantile_buckets

    df = spark.createDataFrame(pd.DataFrame({"v": [1.0]}))
    with pytest.raises(ValueError, match="n_buckets"):
        quantile_buckets(df, "v", 1)


def test_split_assign_deterministic_partition_invariant(spark):
    """Membership is a pure key function: identical across
    repartitionings; proportions land near the weights; weight order
    defines the boundary order."""
    from blueetl_spark.operators.sampling import split_assign

    df = spark.range(20_000).selectExpr("CAST(id AS STRING) AS doc_id")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = split_assign(df, w).toPandas().set_index("doc_id")["split"]
    b = (
        split_assign(df.repartition(17), w)
        .toPandas()
        .set_index("doc_id")["split"]
    )
    assert a.sort_index().equals(b.sort_index())
    frac = a.value_counts(normalize=True)
    for k, v in w.items():
        assert abs(frac[k] - v) < 0.01, (k, frac[k])


def test_leakage_safe_split_groups_never_straddle(spark):
    """All rows of a group land in one split; assignment is invariant
    to group-id RENUMBERING (it hashes the canonical member, not the
    group value); composing with duplicate clusters keeps near-dups on
    one side of the boundary."""
    import pyspark.sql.functions as F

    from blueetl_spark.operators.sampling import leakage_safe_split

    df = spark.range(5_000).select(
        F.col("id").alias("doc_id"), F.pmod("id", F.lit(137)).alias("grp")
    )
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = leakage_safe_split(
        df, w, group_col="grp", key_col="doc_id", seed="s"
    ).toPandas()
    per_group = out.groupby("grp")["split"].nunique()
    assert (per_group == 1).all()
    # renumber the groups arbitrarily: same membership -> same splits
    renum = df.withColumn("grp", (F.col("grp") * 7919 + 13) % 100_000)
    out2 = leakage_safe_split(
        renum, w, group_col="grp", key_col="doc_id", seed="s"
    ).toPandas()
    a = out.set_index("doc_id")["split"].sort_index()
    b = out2.set_index("doc_id")["split"].sort_index()
    assert a.equals(b)
    # group-level proportions track the weights
    gfrac = (
        out.drop_duplicates("grp")["split"].value_counts(normalize=True)
    )
    for k, v in w.items():
        assert abs(gfrac.get(k, 0.0) - v) < 0.1, (k, gfrac)


def test_split_assign_rejects_bad_weights(spark):
    from blueetl_spark.operators.sampling import split_assign

    df = spark.range(1).selectExpr("CAST(id AS STRING) AS doc_id")
    with pytest.raises(ValueError, match="non-negative"):
        split_assign(df, {"a": -1.0})
    with pytest.raises(ValueError, match="positive"):
        split_assign(df, {"a": 0.0, "b": 0.0})


def test_quantile_buckets_null_values_get_null_bucket(spark):
    import pandas as pd

    from blueetl_spark.operators.sampling import quantile_buckets

    pdf = pd.DataFrame({"v": [1.0, 2.0, 3.0, 4.0, None]})
    out = quantile_buckets(spark.createDataFrame(pdf), "v", 2).toPandas()
    assert out.bucket.isna().sum() == 1
    assert out[out.v.notna()].bucket.notna().all()


def test_curate_gopher_and_split_steps(spark):
    """'gopher' filters on the conjunction of the published rules;
    'split' tags rows without dropping any."""
    import pandas as pd

    from blueetl_spark.plans.curate import curate_corpus

    good = " ".join(
        ["the quick brown fox jumps over lazy dogs near riverbank"] * 8
    )
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": ["a", "b"],
                "text": [good, "x"],  # "x": fails min_words
                "lang": ["en", "en"],
            }
        )
    )
    cfg = {
        "steps": [
            {"op": "gopher", "min_words": 10, "min_stopword_hits": 1},
            {"op": "split", "weights": {"train": 0.5, "test": 0.5},
             "method": "md5", "seed": "s"},
        ]
    }
    kept, stats = curate_corpus(docs, cfg, collect_stats=True)
    out = kept.toPandas()
    assert out.doc_id.tolist() == ["a"]
    assert set(out.columns) >= {"doc_id", "text", "lang", "split"}
    assert out.split.isin(["train", "test"]).all()
    assert [s["op"] for s in stats] == ["input", "gopher", "split"]
    assert stats[2]["rows"] == stats[1]["rows"]  # split never drops


def test_leakage_safe_split_null_groups_get_per_row_splits(spark):
    """Rows with a NULL group must not vanish (the inner join on the
    group key would silently drop them): each is split per-row on its
    own key, identically to split_assign."""
    import pyspark.sql.functions as F

    from blueetl_spark.operators.sampling import (
        leakage_safe_split,
        split_assign,
    )

    df = spark.range(2_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, F.pmod("id", F.lit(37))).alias("grp"),
    )
    w = {"train": 0.8, "test": 0.2}
    out = leakage_safe_split(
        df, w, group_col="grp", key_col="doc_id", seed="s"
    ).toPandas()
    assert len(out) == 2_000  # every input row got a split
    # NULL-group rows match per-row split_assign on doc_id exactly
    nulls = out[out["grp"].isna()].set_index("doc_id")["split"].sort_index()
    expect = (
        split_assign(
            df.filter(F.col("grp").isNull()), w, key_col="doc_id", seed="s"
        )
        .toPandas()
        .set_index("doc_id")["split"]
        .sort_index()
    )
    assert nulls.equals(expect)
    # grouped rows still never straddle
    grouped = out[out["grp"].notna()]
    assert (grouped.groupby("grp")["split"].nunique() == 1).all()


@pytest.mark.parametrize("hashed", [False, True])
def test_contamination_ratio(spark, hashed):
    """Ratio = shared distinct n-grams / total distinct n-grams; every
    train doc appears; threshold applies to the ROUNDED ratio."""
    train = spark.createDataFrame(
        [
            # 3 distinct trigrams, 1 shared -> ratio 1/3
            (1, "the quick brown fox jumps here"),
            (2, "totally different words in this doc"),  # ratio 0
            # identical to an eval doc -> ratio 1.0
            (3, "a quick brown fox ran"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "a quick brown fox ran")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in text.contamination_ratio(
            train, ev, n=3, threshold=0.5, hashed=hashed
        ).collect()
    }
    assert len(out) == 3
    assert out[1]["n_grams"] == 4 and out[1]["n_shared"] == 1
    assert out[1]["ratio"] == 0.25 and not out[1]["contaminated"]
    assert out[2]["ratio"] == 0.0 and not out[2]["contaminated"]
    assert out[3]["ratio"] == 1.0 and out[3]["contaminated"]
    with pytest.raises(ValueError, match="threshold"):
        text.contamination_ratio(train, ev, threshold=1.5)


@pytest.mark.parametrize("broadcast_unigrams", [True, False])
def test_pmi_collocations_matches_python_replay(spark, broadcast_unigrams):
    """PMI of adjacent pairs equals the textbook formula computed
    sequentially; min_count thins rare pairs; single-token docs are
    pair-free but still count unigrams."""
    import math
    from collections import Counter

    docs = [
        (1, "new york new york city"),
        (2, "york new york is big"),
        (3, "big apple"),
        (4, "solo"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["w1"], r["w2"]): (r["n_pair"], r["pmi"])
        for r in text.pmi_collocations(
            df, min_count=2, broadcast_unigrams=broadcast_unigrams
        ).collect()
    }
    toks = [t.split() for _, t in docs]
    unis = Counter(w for tk in toks for w in tk)
    prs = Counter(
        (tk[i], tk[i + 1]) for tk in toks for i in range(len(tk) - 1)
    )
    n = sum(unis.values())
    nb = sum(prs.values())
    expect = {
        p: (c, round(math.log((c * n * n) / (nb * unis[p[0]] * unis[p[1]])), 6))
        for p, c in prs.items()
        if c >= 2
    }
    assert got == expect
    assert ("big", "apple") not in got  # count 1 < min_count
    with pytest.raises(ValueError, match="min_count"):
        text.pmi_collocations(df, min_count=0)


def test_weighted_sample_k_grouped_budgets(spark):
    """by= gives exactly min(k, group size) rows per group, each
    group's selection identical to running the global sampler on that
    group alone, invariant under repartitioning."""
    from blueetl_spark.operators.sampling import weighted_sample_k

    df = spark.range(300).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).alias("grp"),
        (F.pmod(F.xxhash64("id"), F.lit(100)) + 1.0).alias("w"),
    )
    tiny = spark.range(2).select(
        (F.col("id") + 1000).alias("doc_id"),
        F.lit(9).alias("grp"),
        F.lit(1.0).alias("w"),
    )
    full = df.unionByName(tiny)
    out = weighted_sample_k(
        full, k=10, weight_col="w", key_col="doc_id", seed="s",
        by=["grp"],
    ).toPandas()
    sizes = out.groupby("grp")["doc_id"].count().to_dict()
    assert sizes == {0: 10, 1: 10, 2: 10, 3: 10, 9: 2}
    # per-group equality with the global sampler restricted to the group
    for g in (0, 3):
        solo = weighted_sample_k(
            full.filter(F.col("grp") == g), k=10, weight_col="w",
            key_col="doc_id", seed="s",
        ).toPandas()
        assert set(solo["doc_id"]) == set(out[out["grp"] == g]["doc_id"])
    # partition-layout invariance
    out2 = weighted_sample_k(
        full.repartition(13), k=10, weight_col="w", key_col="doc_id",
        seed="s", by=["grp"],
    ).toPandas()
    assert set(map(tuple, out[["grp", "doc_id"]].values)) == set(
        map(tuple, out2[["grp", "doc_id"]].values)
    )


def test_target_encode_kfold_leakage_free_and_null_safe(spark):
    """The encoding a fold sees is built ONLY from other folds
    (sequential replay agrees); a category seen in just one fold gets
    the pure smoothed prior in that fold; NULL categories keep their
    own counts (eqNullSafe spine join — the chi2-advice bug class);
    k < 2 and negative alpha raise."""
    import hashlib

    import pytest as _pytest

    from blueetl_spark.operators.sampling import BUCKETS, target_encode_kfold

    k, alpha, seed = 3, 4.0, "s"

    def fold_of(key):
        h = int(hashlib.md5((seed + str(key)).encode()).hexdigest()[:15], 16)
        return (h % BUCKETS) % k

    rows = []
    for i in range(120):
        cat = ["a", "b", None][i % 3]
        rows.append((i, cat, 10 * (i % 7)))
    rows.append((999, "lonely", 500))  # appears in exactly one fold
    df = spark.createDataFrame(rows, "doc_id long, cat string, t long")
    got = {
        (r["category"], r["fold"]): (r["n_other"], r["encoded"])
        for r in target_encode_kfold(
            df, "cat", "t", key_col="doc_id", k=k, alpha=alpha, seed=seed
        ).collect()
    }
    assert len(got) == 4 * k  # densified: every (category, fold)

    # sequential replay
    from collections import defaultdict

    cf_n, cf_s = defaultdict(int), defaultdict(int)
    for key, cat, t in rows:
        f = fold_of(key)
        cf_n[(cat, f)] += 1
        cf_s[(cat, f)] += t
    cats = {c for _, c, _ in rows}
    for cat in cats:
        nc = sum(cf_n[(cat, f)] for f in range(k))
        sc = sum(cf_s[(cat, f)] for f in range(k))
        for f in range(k):
            ng_o = sum(v for (c2, f2), v in cf_n.items() if f2 != f)
            sg_o = sum(v for (c2, f2), v in cf_s.items() if f2 != f)
            prior = sg_o / ng_o
            n_o = nc - cf_n[(cat, f)]
            s_o = sc - cf_s[(cat, f)]
            enc = round((s_o + alpha * prior) / (n_o + alpha), 6)
            assert got[(cat, f)] == (n_o, enc), (cat, f)

    # the lonely category's own fold sees NO self-leak: pure prior
    lf = fold_of(999)
    n_o, enc = got[("lonely", lf)]
    assert n_o == 0
    ng_o = sum(v for (c2, f2), v in cf_n.items() if f2 != lf)
    sg_o = sum(v for (c2, f2), v in cf_s.items() if f2 != lf)
    assert enc == round(sg_o / ng_o, 6)  # (0 + a*prior)/(0 + a)

    with _pytest.raises(ValueError, match="k must be"):
        target_encode_kfold(df, "cat", "t", k=1)
    with _pytest.raises(ValueError, match="alpha"):
        target_encode_kfold(df, "cat", "t", alpha=-1)
