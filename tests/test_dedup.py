"""MinHash+LSH unit tests (both hash families).

The md5 family is additionally hash-verified against DuckDB end-to-end by
the ``minhash_lsh_md5`` oracle entry; these tests pin the invariants that
must hold for ANY hash family.
"""
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, base),  # exact duplicate of 1
        (3, base + " with a small tail appended here"),  # near-dup of 1
        (4, "completely different content about spark sql catalyst tungsten"),
        (5, "unrelated text mentioning parquet arrow pandas numpy duckdb"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5"])
def test_exact_duplicates_are_candidates_with_sim_one(docs, hash_fn):
    from blueetl_spark.operators import dedup

    cand = dedup.minhash_lsh_candidates(
        docs, num_hashes=16, bands=4, hash_fn=hash_fn
    ).collect()
    pairs = {(r.id_a, r.id_b): r.est_jaccard for r in cand}
    # identical docs share every band bucket and every signature entry
    assert pairs[(1, 2)] == 1.0
    # estimates are valid fractions of num_hashes
    assert all(0.0 <= v <= 1.0 for v in pairs.values())
    # a disjoint-content pair should not have similarity 1
    assert pairs.get((4, 5), 0.0) < 1.0


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5"])
def test_signatures_shape_and_determinism(docs, hash_fn):
    from blueetl_spark.operators import dedup

    sig1 = dedup.minhash_signatures(docs, num_hashes=8, hash_fn=hash_fn)
    sig2 = dedup.minhash_signatures(docs, num_hashes=8, hash_fn=hash_fn)
    a = {r.doc_id: r.signature for r in sig1.collect()}
    b = {r.doc_id: r.signature for r in sig2.collect()}
    assert a == b  # deterministic, no RNG
    assert all(len(v) == 8 for v in a.values())
    assert a[1] == a[2]  # identical text -> identical signature


def test_md5_60_matches_duckdb():
    """The bigint base hash must agree with DuckDB for the oracle to hold."""
    import duckdb

    from blueetl_spark.operators.dedup import md5_60
    from blueetl_spark.session import get_spark

    spark = get_spark(app_name="blueetl_spark_tests")
    got = (
        spark.range(1)
        .select(md5_60(F.lit("hello world")).alias("h"))
        .first()
        .h
    )
    want = duckdb.sql(
        "SELECT CAST(concat('0x', substring(md5('hello world'), 1, 15)) "
        "AS BIGINT) AS h"
    ).fetchone()[0]
    assert got == want


def test_bruteforce_near_dup_size_gate(spark):
    """The bruteforce path must refuse to collect a corpus past the cap
    (it broadcasts the whole matrix) and point at method='lsh' instead."""
    from blueetl_spark.operators import dedup

    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="method='lsh'"):
        dedup.embedding_near_dup(vecs, max_broadcast_rows=5)
    # under the cap the same corpus scores fine
    out = dedup.embedding_near_dup(vecs, threshold=0.999, max_broadcast_rows=10)
    assert out.count() > 0


@pytest.mark.parametrize("cap", [1_000_000, 0], ids=["driver", "distributed"])
def test_connected_components_chain_and_singletons(spark, cap):
    """A 5-node chain needs multiple propagation rounds (diameter 4);
    singletons from `nodes` label themselves. Both execution paths (the
    size-gated driver union-find and the distributed pointer jumping)
    must produce the identical labeling."""
    from blueetl_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 5, 10, 11, 99]],
                                  "doc_id long")
    comp = dedup.connected_components(pairs, nodes=nodes, max_driver_edges=cap).toPandas()
    got = dict(zip(comp.id, comp.component))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 99: 99}


def test_connected_components_paths_agree_and_cap_overflow(spark):
    """Random graph: driver union-find == distributed labels; a cap
    smaller than the edge count falls through to the distributed path;
    edge ids absent from `nodes` still emit (universe = edges ∪ nodes)."""
    import numpy as np

    from blueetl_spark.operators import dedup

    rng = np.random.default_rng(3)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 60, (80, 2)) if a != b]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    fast = dedup.connected_components(pairs).toPandas()
    slow = dedup.connected_components(pairs, max_driver_edges=0).toPandas()
    assert dict(zip(fast.id, fast.component)) == dict(zip(slow.id, slow.component))
    # cap below edge count -> distributed path, same answer
    over = dedup.connected_components(pairs, max_driver_edges=5).toPandas()
    assert dict(zip(over.id, over.component)) == dict(zip(fast.id, fast.component))
    # nodes missing an edge id: the edge id still appears
    nodes = spark.createDataFrame([(99,)], "doc_id long")
    with_nodes = dedup.connected_components(pairs, nodes=nodes).toPandas()
    assert set(with_nodes.id) == set(fast.id) | {99}


def test_keep_canonical_drops_non_minimal_members(spark):
    from blueetl_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "id_a long, id_b long")
    kept = sorted(r.doc_id for r in dedup.keep_canonical(pairs, docs).collect())
    assert kept == [0, 1, 2, 4]


def test_keep_canonical_no_forced_broadcast(spark):
    """The losers set is O(duplicate docs) — unbounded at scale — so the
    anti join must carry no broadcast hint; AQE decides the strategy."""
    from blueetl_spark.operators import dedup

    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    docs = spark.createDataFrame(
        [(i, "x") for i in range(5)], "doc_id long, text string"
    )
    out = dedup.keep_canonical(pairs, docs)
    logical = out._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" not in logical, logical
    assert len(out.toPandas()) == 3  # 1 canonical of {1,2,3} + docs 0,4


def test_connected_components_string_ids(spark):
    """Non-numeric ids take the join-based convergence path (the decimal
    label-sum witness would crash under ANSI, or silently stop early
    with it off) — a 5-hop string chain must fully contract."""
    from blueetl_spark.operators import dedup

    pairs = spark.createDataFrame(
        [("e", "d"), ("d", "c"), ("c", "b"), ("b", "a"), ("x", "y")],
        "id_a string, id_b string",
    )
    comp = {
        r.id: r.component
        for r in dedup.connected_components(pairs, max_driver_edges=0).collect()
    }
    assert {comp[k] for k in "abcde"} == {"a"}
    # the driver path handles string ids too
    fast = {r.id: r.component for r in dedup.connected_components(pairs).collect()}
    assert fast == comp
    assert comp["x"] == comp["y"] == "x"


def test_embedding_near_dup_string_ids_and_empty(spark):
    """Bruteforce output ids keep the input id type, and both paths
    short-circuit an empty corpus instead of crashing."""
    from blueetl_spark.operators import dedup

    emb = spark.createDataFrame(
        [("x", [1.0, 0.0]), ("y", [1.0, 0.001]), ("z", [0.0, 1.0])],
        "name string, embedding array<double>",
    )
    out = dedup.embedding_near_dup(
        emb, threshold=0.99, id_col="name", vec_col="embedding"
    ).toPandas()
    assert set(zip(out.id_a, out.id_b)) == {("x", "y")}
    empty = spark.createDataFrame([], "name string, embedding array<double>")
    for method in ("bruteforce", "lsh"):
        assert (
            dedup.embedding_near_dup(
                empty, id_col="name", vec_col="embedding", method=method
            ).count()
            == 0
        )


def test_shingle_sets_multi_row_docs(spark):
    """One doc_id across several rows (chunked corpus): ids_unique=False
    must dedup (id, shingle) globally so Jaccard stays a set measure."""
    from blueetl_spark.operators.dedup import shingle_sets

    chunked = spark.createDataFrame(
        [(1, "a b c d"), (1, "a b c d"), (2, "a b c x")],
        "doc_id long, text string",
    )
    rows = shingle_sets(chunked, n=3, ids_unique=False).collect()
    pairs = [(r.doc_id, r.shingle) for r in rows]
    assert len(pairs) == len(set(pairs))
    assert sum(1 for d, _ in pairs if d == 1) == 2  # 'a b c', 'b c d' once each


def test_shared_passage_pairs_detects_copied_passage(spark):
    """Two long documents differing everywhere except one copied passage:
    whole-doc Jaccard is low, but the winnowing co-occurrence finds the
    pair; an unrelated doc pairs with nobody."""
    from blueetl_spark.operators.dedup import jaccard_pairs, shared_passage_pairs

    passage = "the quick brown fox jumps over the lazy dog every single day"
    a = "alpha beta gamma delta " * 12 + passage
    b = "one two three four five six " * 12 + passage
    c = "completely unrelated filler words repeated again and again " * 14
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    pairs = shared_passage_pairs(docs, n=5, w=4, min_shared=1).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)]
    assert pairs[0].n_shared >= 1
    # the whole-doc jaccard at a typical threshold misses this pair
    jac = jaccard_pairs(docs, n=3, threshold=0.5).collect()
    assert jac == []


def test_shared_passage_pairs_max_doc_freq_prunes_boilerplate(spark):
    """A boilerplate passage present in EVERY doc pairs everything with
    everything; the doc-frequency cap removes exactly that signal."""
    from blueetl_spark.operators.dedup import shared_passage_pairs

    boiler = "standard legal footer applies to all documents in this corpus"
    rows = [(i, f"unique content {i} " * 10 + boiler) for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    dense = shared_passage_pairs(docs, n=5, w=4, min_shared=1)
    assert dense.count() == 15  # all 6-choose-2 pairs
    pruned = shared_passage_pairs(docs, n=5, w=4, min_shared=1, max_doc_freq=3)
    assert pruned.count() == 0


# -- incremental dedup -------------------------------------------------------


def test_incremental_exact_across_batches(spark, tmp_path):
    """Three daily batches against one digest index: within-batch dups
    collapse, cross-batch dups are dropped, fresh content survives and
    extends the index for the next batch."""
    from blueetl_spark.operators.dedup import incremental_exact

    idx = str(tmp_path / "exact_idx")
    b1 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha beta")],
        "doc_id long, text string",
    )
    out1 = incremental_exact(b1, idx).orderBy("doc_id").collect()
    assert [r.doc_id for r in out1] == [1, 2]  # 3 is a within-batch dup of 1
    b2 = spark.createDataFrame(
        [(10, "gamma delta"), (11, "epsilon zeta")], "doc_id long, text string"
    )
    out2 = incremental_exact(b2, idx).collect()
    assert [r.doc_id for r in out2] == [11]  # 10 duplicates batch-1 content
    b3 = spark.createDataFrame(
        [(20, "epsilon zeta"), (21, "alpha beta")], "doc_id long, text string"
    )
    # update=False: dedups against history but leaves the index untouched
    assert incremental_exact(b3, idx, update=False).count() == 0
    assert incremental_exact(b3, idx, update=False).count() == 0
    # index holds exactly the 3 distinct digests ever admitted
    assert spark.read.parquet(idx).distinct().count() == 3


def test_incremental_minhash_matches_history(spark, tmp_path):
    """Near-dup of a historical doc is matched (with its signature
    similarity) without re-reading historical text; unrelated docs match
    nothing; the index grows per batch."""
    from blueetl_spark.operators.dedup import incremental_minhash

    idx = str(tmp_path / "mh_idx")
    base = (
        "the quick brown fox jumps over the lazy dog while the calm river "
        "flows past the old stone bridge under a bright summer sky and the "
        "birds sing their morning song"
    )
    b1 = spark.createDataFrame(
        [(1, base), (2, "completely different words " * 5)],
        "doc_id long, text string",
    )
    # first batch: empty history, no matches, index seeded
    assert incremental_minhash(b1, idx).count() == 0
    near = base.replace("lazy", "sleepy")
    b2 = spark.createDataFrame(
        [(10, near), (11, "unrelated filler content " * 6)],
        "doc_id long, text string",
    )
    m = incremental_minhash(b2, idx).collect()
    assert [(r.new_id, r.old_id) for r in m] == [(10, 1)]
    assert m[0].est_jaccard >= 0.7
    # batch 2 was appended: an exact copy of doc 11 now matches it
    b3 = spark.createDataFrame(
        [(20, "unrelated filler content " * 6)], "doc_id long, text string"
    )
    m3 = incremental_minhash(b3, idx, update=False).collect()
    assert [(r.new_id, r.old_id) for r in m3] == [(20, 11)]
    assert m3[0].est_jaccard == 1.0


def test_incremental_exact_batch_split_invariance(spark, tmp_path):
    """Property: for ANY split of a corpus into ordered batches, feeding
    them through incremental_exact yields exactly one surviving document
    per distinct content — the same distinct set a single batch
    dedup_exact computes — and the union of survivors never contains two
    docs with equal text."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from blueetl_spark.operators.dedup import incremental_exact

    texts = [f"content {i % 7}" for i in range(20)]  # 7 distinct contents

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(cut=st.lists(st.integers(1, 19), min_size=0, max_size=3, unique=True))
    def check(cut):
        import shutil
        import uuid

        idx = str(tmp_path / f"idx_{uuid.uuid4().hex[:8]}")
        bounds = [0] + sorted(cut) + [len(texts)]
        survivors = []
        for lo, hi in zip(bounds, bounds[1:]):
            if lo == hi:
                continue
            batch = spark.createDataFrame(
                [(i, texts[i]) for i in range(lo, hi)], "doc_id long, text string"
            )
            survivors += incremental_exact(batch, idx).collect()
        shutil.rmtree(idx, ignore_errors=True)
        surviving_texts = [r.text for r in survivors]
        assert len(surviving_texts) == len(set(surviving_texts))
        assert set(surviving_texts) == set(texts)
        # first-occurrence wins within the ordered batch sequence
        assert {r.doc_id for r in survivors} == {texts.index(t) for t in set(texts)}

    check()


def test_purge_and_compact_minhash_index(spark, tmp_path):
    """Right-to-forget on the incremental LSH index: tombstoned ids stop
    matching immediately at O(purged) cost; compaction folds them in,
    rewrites the text-free index tables, clears the tombstones, and
    allows the id to be re-ingested."""
    from blueetl_spark.operators.dedup import (
        compact_minhash_index,
        incremental_minhash,
        purge_minhash_index,
    )

    idx = str(tmp_path / "mh_idx")
    base = (
        "the quick brown fox jumps over the lazy dog while the calm river "
        "flows past the old stone bridge under a bright summer sky"
    )
    b1 = spark.createDataFrame(
        [(1, base), (2, "completely different words " * 5)],
        "doc_id long, text string",
    )
    assert incremental_minhash(b1, idx).count() == 0
    probe = spark.createDataFrame([(10, base)], "doc_id long, text string")
    assert [
        (r.new_id, r.old_id)
        for r in incremental_minhash(probe, idx, update=False).collect()
    ] == [(10, 1)]

    # purge doc 1: the same probe now matches nothing, doc 2 still works
    purge_minhash_index(
        spark.createDataFrame([(1,)], "doc_id long"), idx
    )
    assert incremental_minhash(probe, idx, update=False).count() == 0
    probe2 = spark.createDataFrame(
        [(11, "completely different words " * 5)], "doc_id long, text string"
    )
    assert incremental_minhash(probe2, idx, update=False).count() == 1

    # compact: index rows for doc 1 are physically gone, tombstones cleared
    counts = compact_minhash_index(spark, idx)
    sigs = spark.read.parquet(f"{idx}/signatures.parquet")
    assert counts["signatures"] == sigs.count() == 1
    assert [r.doc_id for r in sigs.collect()] == [2]
    import os

    assert not os.path.exists(f"{idx}/tombstones.parquet")

    # re-ingest the purged content under the old id: matchable again
    assert incremental_minhash(
        spark.createDataFrame([(1, base)], "doc_id long, text string"), idx
    ).count() == 0
    assert [
        (r.new_id, r.old_id)
        for r in incremental_minhash(probe, idx, update=False).collect()
    ] == [(10, 1)]

    # idempotent compaction with no tombstones: counts only
    counts2 = compact_minhash_index(spark, idx)
    assert counts2["signatures"] == 2


def test_purge_exact_index_allows_reingest(spark, tmp_path):
    """Takedown + re-crawl on the exact-dedup digest index: purged
    content's digest is rewritten out, so identical text survives the
    next batch; unrelated digests are untouched."""
    from blueetl_spark.operators.dedup import incremental_exact, purge_exact_index

    idx = str(tmp_path / "exact_idx")
    b1 = spark.createDataFrame(
        [(1, "alpha content"), (2, "beta content")], "doc_id long, text string"
    )
    assert incremental_exact(b1, idx).count() == 2
    again = spark.createDataFrame(
        [(10, "alpha content")], "doc_id long, text string"
    )
    assert incremental_exact(again, idx, update=False).count() == 0

    n = purge_exact_index(
        spark.createDataFrame([(1, "alpha content")], "doc_id long, text string"),
        idx,
    )
    assert n == 1  # beta's digest survives
    assert incremental_exact(again, idx, update=False).count() == 1
    still = spark.createDataFrame(
        [(11, "beta content")], "doc_id long, text string"
    )
    assert incremental_exact(still, idx, update=False).count() == 0


def test_semantic_decontaminate_methods_agree(spark, sf_dir):
    """The HOF (oracle) path and the Arrow-matmul scale path must keep
    the same surviving rows; dropped rows really are within threshold of
    an eval vector; eval-set size guard trips."""
    import pytest as _pytest

    from blueetl_spark.operators import similarity as S
    from blueetl_spark.sources import tables

    emb = tables.load(spark, sf_dir, "embeddings")
    eval_df = emb.filter(F.col("vec_id") % 37 == 0)
    corpus = emb.filter(F.col("vec_id") % 37 != 0)

    hof = {r.vec_id for r in
           S.semantic_decontaminate(corpus, eval_df, 0.3).select("vec_id").collect()}
    arrow = {r.vec_id for r in
             S.semantic_decontaminate(corpus, eval_df, 0.3, method="arrow")
             .select("vec_id").collect()}
    assert hof == arrow
    n_corpus = corpus.count()
    assert 0 < len(hof) < n_corpus  # some dropped, not all

    # dropped rows are genuinely contaminated: max cosine >= threshold
    dropped = corpus.join(
        S.semantic_decontaminate(corpus, eval_df, 0.3).select("vec_id"),
        "vec_id", "left_anti",
    )
    import numpy as np

    ev = np.asarray(
        [r[0] for r in eval_df.select("embedding").collect()], dtype="float64"
    )
    ev /= np.linalg.norm(ev, axis=1, keepdims=True)
    for r in dropped.select("embedding").collect():
        v = np.asarray(r[0], dtype="float64")
        assert (ev @ (v / np.linalg.norm(v))).max() >= 0.3 - 1e-12

    with _pytest.raises(ValueError, match="max_eval_rows"):
        S.semantic_decontaminate(corpus, eval_df, 0.3, max_eval_rows=3)


def test_incremental_minhash_bucketed_storage(spark, tmp_path):
    """The bucketed catalog-table layout matches the parquet layout
    result-for-result through the full lifecycle (seed → match → purge →
    compact → re-ingest), validates the bucket count on append, and its
    match plan scans the history side bucketed (no exchange needed on
    the big side)."""
    import uuid

    from blueetl_spark.operators.dedup import (
        compact_minhash_index,
        incremental_minhash,
        purge_minhash_index,
    )

    prefix = f"mhb_{uuid.uuid4().hex[:8]}"
    pq_idx = str(tmp_path / "mh_pq")
    base = (
        "the quick brown fox jumps over the lazy dog while the calm river "
        "flows past the old stone bridge under a bright summer sky"
    )
    b1 = spark.createDataFrame(
        [(1, base), (2, "completely different words " * 5)],
        "doc_id long, text string",
    )
    probe = spark.createDataFrame(
        [(10, base.replace("lazy", "sleepy"))], "doc_id long, text string"
    )
    try:
        assert incremental_minhash(
            b1, prefix, storage="bucketed", n_buckets=8
        ).count() == 0
        assert incremental_minhash(b1, pq_idx).count() == 0

        kw = dict(update=False, storage="bucketed", n_buckets=8)
        m_b = incremental_minhash(probe, prefix, **kw).collect()
        m_p = incremental_minhash(probe, pq_idx, update=False).collect()
        assert [(r.new_id, r.old_id, r.est_jaccard) for r in m_b] == [
            (r.new_id, r.old_id, r.est_jaccard) for r in m_p
        ]
        assert len(m_b) == 1

        # history side is a bucketed scan (no exchange required on it)
        plan = incremental_minhash(
            probe, prefix, **kw
        )._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan

        # mismatched bucket count on append is a hard error
        with pytest.raises(ValueError, match="buckets"):
            incremental_minhash(probe, prefix, storage="bucketed", n_buckets=16)

        # purge + compact + re-ingest, all in bucketed mode
        purge_minhash_index(
            spark.createDataFrame([(1,)], "doc_id long"), prefix,
            storage="bucketed", n_buckets=8,
        )
        assert incremental_minhash(probe, prefix, **kw).count() == 0
        counts = compact_minhash_index(
            spark, prefix, storage="bucketed", n_buckets=8
        )
        assert counts["signatures"] == 1
        assert not spark.catalog.tableExists(f"{prefix}_tombstones")
        assert incremental_minhash(
            spark.createDataFrame([(1, base)], "doc_id long, text string"),
            prefix, storage="bucketed", n_buckets=8,
        ).count() == 0
        assert incremental_minhash(probe, prefix, **kw).count() == 1
        # compacted table still bucketed with the original spec
        from blueetl_spark.plans.bucketing import bucket_spec

        assert bucket_spec(spark, f"{prefix}_buckets") == (
            ["band", "band_hash"], 8,
        )
    finally:
        for t in ("signatures", "buckets", "tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")
            spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}__compact")


def test_simhash_candidates_exact_recall(spark, sf_dir):
    """The pigeonhole banding loses NOTHING: banded candidates filtered
    by popcount equal the brute-force all-pairs Hamming result, at
    several band counts (including one that leaves bits uncovered)."""
    from blueetl_spark.operators.dedup import (
        hamming_distance,
        simhash,
        simhash_candidates,
    )
    from blueetl_spark.sources import tables

    docs = tables.load(spark, sf_dir, "documents").limit(200)
    sigs = simhash(docs, bits=60, hash_fn="md5")
    a = sigs.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sa"))
    b = sigs.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sb"))
    brute = {
        (r.id_a, r.id_b, r.h)
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("h", hamming_distance(F.col("sa"), F.col("sb")).cast("long"))
        .filter(F.col("h") <= 6)
        .collect()
    }
    for n_bands in (7, 10, 13):  # 13 leaves 60 % 13 = 8 bits uncovered
        banded = {
            (r.id_a, r.id_b, r.hamming)
            for r in simhash_candidates(
                docs, bits=60, hash_fn="md5", max_distance=6, n_bands=n_bands
            ).collect()
        }
        assert banded == brute, n_bands

    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_candidates(docs, max_distance=6, n_bands=6)
    with pytest.raises(ValueError, match="exceeds bits"):
        simhash_candidates(docs, bits=60, max_distance=63, n_bands=64)


def test_band_bucket_stats_and_cap(spark):
    """VERDICT r5 #5: degenerate band buckets (boilerplate docs sharing a
    signature band) funnel the banded join; band_bucket_stats surfaces
    them and max_bucket_size bounds the candidate count, while distinct
    near-dup pairs outside the degenerate cluster keep full recall."""
    from pyspark.sql import functions as F

    k = 200  # identical boilerplate docs -> k^2/2 exact-dup pairs
    boiler = spark.range(k).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate footer text repeated on every page").alias(
            "text"
        ),
    )
    # distinct docs, plus one true duplicate pair (1000/1001) that lives
    # in its own size-2 buckets — must survive any reasonable cap
    uniq = spark.range(1000, 1040).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id").isin(1000, 1001),
            F.lit("a genuinely unique duplicated article body nobody else shares"),
        )
        .otherwise(
            F.concat(
                F.lit("document body number "),
                F.col("id").cast("string"),
                F.lit(" with plenty of distinct words to hash"),
            )
        )
        .alias("text"),
    )
    docs = boiler.unionByName(uniq)

    # stats: at least one band bucket holds the whole boilerplate cluster
    from blueetl_spark.operators.dedup import (
        band_bucket_stats,
        simhash,
        simhash_candidates,
    )

    sigs = simhash(docs)
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright("simhash", b * 16)
                    .bitwiseAND(F.lit((1 << 16) - 1))
                    .alias("band_bits"),
                )
                for b in range(4)
            ])
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.band_bits")
    stats = band_bucket_stats(banded, ["band", "band_bits"]).toPandas()
    assert stats.max_bucket.max() >= k
    assert stats.est_pairs.max() >= k * (k - 1) // 2

    # uncapped: the boilerplate cluster dominates the pair count
    full = simhash_candidates(docs).toPandas()
    assert len(full) >= k * (k - 1) // 2

    # capped: boilerplate buckets pruned, candidate count bounded, and the
    # genuine near-dup pair (which lives in small buckets) survives
    capped = simhash_candidates(docs, max_bucket_size=50).toPandas()
    assert len(capped) < k * (k - 1) // 2 / 10
    pairs = set(map(tuple, capped[["id_a", "id_b"]].to_numpy()))
    assert (1000, 1001) in pairs

    # image twin: same valve bounds a blank-image cluster
    from blueetl_spark.operators.multimodal import image_near_dup

    media = spark.range(60).select(
        F.col("id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.when(F.col("id") < 40, F.lit(b""))  # 40 identical blanks
        .otherwise(F.col("id").cast("string").cast("binary"))
        .alias("payload"),
    )
    full_img = image_near_dup(media).toPandas()
    capped_img = image_near_dup(media, max_bucket_size=10).toPandas()
    assert len(full_img) >= 40 * 39 // 2
    assert len(capped_img) < len(full_img)


def test_compaction_swap_crash_recovery(spark, tmp_path):
    """VERDICT r5 #7: the compaction swap is temp-write -> backup-rename ->
    publish-rename. Simulate a crash at BOTH interruption points and assert
    the index stays readable (old or new state, never neither) and that
    matching still works after recovery."""
    import shutil

    from pyspark.sql import functions as F

    from blueetl_spark.operators.dedup import (
        _ParquetMinhashStore,
        incremental_minhash,
        purge_minhash_index,
    )

    def mkdocs(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("document body "), F.col("id").cast("string"),
                F.lit(" alpha beta gamma delta epsilon zeta eta theta"),
            ).alias("text"),
        )

    idx = str(tmp_path / "idx")
    incremental_minhash(mkdocs(0, 50), idx)
    purge_minhash_index(
        spark.range(0, 10).select(F.col("id").alias("doc_id")), idx
    )
    store = _ParquetMinhashStore(spark, idx, "doc_id")
    old_ids = {r.doc_id for r in store.read_signatures().select("doc_id").collect()}
    assert old_ids == set(range(10, 50))

    def compacted_dir(cur):
        """What compaction would have staged: cur minus tombstones."""
        tmp = f"{idx}/.crash-stage.parquet"
        store._minus_ts(spark.read.parquet(cur)).write.mode("overwrite").parquet(tmp)
        return tmp

    # -- crash point 1: backup rename done, publish rename NOT done --------
    for cur in (store.sig_dir, store.bucket_dir):
        staged = compacted_dir(cur)
        shutil.move(cur, cur + ".old")  # the backup rename
        # crash here: cur missing, cur.old = old state, temp holds new
        ids = {r.doc_id for r in
               _ParquetMinhashStore(spark, idx, "doc_id")
               .read_signatures().select("doc_id").collect()}
        assert ids == old_ids  # recovered to the OLD state, readable
        shutil.rmtree(staged, ignore_errors=True)

    # -- crash point 2: publish rename done, backup delete NOT done --------
    for cur in (store.sig_dir, store.bucket_dir):
        staged = compacted_dir(cur)
        shutil.copytree(cur, cur + ".old")
        shutil.rmtree(cur)
        shutil.move(staged, cur)  # the publish rename
        # crash here: cur = new state, stale .old left behind
        s = _ParquetMinhashStore(spark, idx, "doc_id")
        ids = {r.doc_id for r in s.read_signatures().select("doc_id").collect()}
        assert ids == old_ids  # new state reads the same surviving ids
        import os
        assert not os.path.exists(cur + ".old")  # stale backup cleaned

    # the index still matches end-to-end after all the recoveries
    probe = mkdocs(20, 21)
    m = incremental_minhash(probe, idx, update=False).collect()
    assert {r.old_id for r in m} == {20}


def test_compaction_swap_crash_recovery_bucketed(spark, tmp_path):
    """Catalog-table twin of the swap crash-recovery contract: a crash
    between DROP and RENAME (main table gone, __compact staged) promotes
    the staging table; a crash before the DROP (both present) drops the
    re-derivable staging table and keeps the old state."""
    from pyspark.sql import functions as F

    from blueetl_spark.operators.dedup import (
        _BucketedMinhashStore,
        incremental_minhash,
        purge_minhash_index,
    )

    docs = spark.range(30).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("bucketed body "), F.col("id").cast("string"),
            F.lit(" alpha beta gamma delta epsilon"),
        ).alias("text"),
    )
    prefix = "crashrec_idx"
    for t in ("_signatures", "_buckets", "_tombstones"):
        spark.sql(f"DROP TABLE IF EXISTS {prefix}{t}")
        spark.sql(f"DROP TABLE IF EXISTS {prefix}{t}__compact")
    incremental_minhash(docs, prefix, storage="bucketed", n_buckets=4)
    purge_minhash_index(
        spark.range(0, 5).select(F.col("id").alias("doc_id")),
        prefix, storage="bucketed", n_buckets=4,
    )
    store = _BucketedMinhashStore(spark, prefix, "doc_id", 4)
    old_ids = {r.doc_id for r in store.read_signatures().select("doc_id").collect()}
    assert old_ids == set(range(5, 30))

    tbl = store.sig_tbl
    tmp = f"{tbl}__compact"

    # crash point A: staging written, DROP+RENAME not yet run (both exist)
    (
        store._minus_ts(spark.table(tbl))
        .write.mode("overwrite").format("parquet")
        .bucketBy(4, "doc_id").sortBy("doc_id").saveAsTable(tmp)
    )
    ids = {r.doc_id for r in
           _BucketedMinhashStore(spark, prefix, "doc_id", 4)
           .read_signatures().select("doc_id").collect()}
    assert ids == old_ids
    assert not spark.catalog.tableExists(tmp)  # staging dropped

    # crash point B: DROP done, RENAME not — main gone, staging complete
    (
        store._minus_ts(spark.table(tbl))
        .write.mode("overwrite").format("parquet")
        .bucketBy(4, "doc_id").sortBy("doc_id").saveAsTable(tmp)
    )
    spark.sql(f"DROP TABLE {tbl}")
    ids = {r.doc_id for r in
           _BucketedMinhashStore(spark, prefix, "doc_id", 4)
           .read_signatures().select("doc_id").collect()}
    assert ids == old_ids  # promoted staging reads identically
    assert spark.catalog.tableExists(tbl)
    for t in ("_signatures", "_buckets", "_tombstones"):
        spark.sql(f"DROP TABLE IF EXISTS {prefix}{t}")


@pytest.mark.parametrize("storage", ["parquet", "bucketed"])
def test_incremental_simhash_matches_history(spark, tmp_path, storage):
    """SimHash twin of the incremental MinHash index: a near-dup of a
    historical doc matches with its true Hamming distance, text is never
    stored, the index grows per batch, and purge/compact manage it via
    the shared store lifecycle."""
    from blueetl_spark.operators.dedup import (
        compact_minhash_index,
        incremental_simhash,
        purge_minhash_index,
    )

    if storage == "bucketed":
        import shutil

        idx = "sh_inc_idx"
        warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        for t in ("_signatures", "_buckets", "_tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS {idx}{t}")
            spark.sql(f"DROP TABLE IF EXISTS {idx}{t}__compact")
            # a previously-failed run can leave the physical location
            # behind after the catalog entry is gone
            shutil.rmtree(f"{warehouse}/{idx}{t}", ignore_errors=True)
            shutil.rmtree(f"{warehouse}/{idx}{t}__compact", ignore_errors=True)
        store_kw = {"storage": "bucketed", "n_buckets": 4}
    else:
        idx = str(tmp_path / "sh_idx")
        store_kw = {}
    # one word changed in a ~30-word doc measures Hamming 14 on the
    # 64-bit simhash; 16 keeps the near-dup inside the radius
    kw = {**store_kw, "max_distance": 16}

    base = (
        "the quick brown fox jumps over the lazy dog while the calm river "
        "flows past the old stone bridge under a bright summer sky and the "
        "birds sing their morning song"
    )
    b1 = spark.createDataFrame(
        [(1, base), (2, "completely different words " * 5)],
        "doc_id long, text string",
    )
    assert incremental_simhash(b1, idx, **kw).count() == 0  # empty history

    b2 = spark.createDataFrame(
        [(10, base.replace("lazy", "sleepy")),
         (11, "unrelated filler content " * 6)],
        "doc_id long, text string",
    )
    m = incremental_simhash(b2, idx, **kw).collect()
    assert [(r.new_id, r.old_id) for r in m] == [(10, 1)]
    assert 0 < m[0].hamming <= 16

    # batch 2 appended: an exact copy of doc 11 matches at distance 0
    b3 = spark.createDataFrame(
        [(20, "unrelated filler content " * 6)], "doc_id long, text string"
    )
    m3 = incremental_simhash(b3, idx, update=False, **kw).collect()
    assert [(r.new_id, r.old_id, r.hamming) for r in m3] == [(20, 11, 0)]

    # purge doc 11 -> no match; compact folds it in; doc 1 still matches
    purge_minhash_index(
        spark.createDataFrame([(11,)], "doc_id long"), idx, **store_kw
    )
    assert incremental_simhash(b3, idx, update=False, **kw).count() == 0
    compact_minhash_index(spark, idx, **store_kw)
    assert incremental_simhash(b3, idx, update=False, **kw).count() == 0
    m4 = incremental_simhash(
        spark.createDataFrame([(30, base)], "doc_id long, text string"),
        idx, update=False, **kw,
    ).collect()
    # exact copy of doc 1 at distance 0, and batch-2's near-dup (doc 10)
    # at its measured distance 14 — both are real index members
    assert sorted((r.new_id, r.old_id, r.hamming) for r in m4) == [
        (30, 1, 0), (30, 10, 14),
    ]
    if storage == "bucketed":
        for t in ("_signatures", "_buckets", "_tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS {idx}{t}")


def test_incremental_match_with_injected_signatures(spark, tmp_path):
    """The sig= injection point (r7 single-hash streaming batch) must be
    behavior-identical to the self-computed path, for both hash families."""
    from blueetl_spark.operators import dedup

    docs1 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "totally different words live in this one here")],
        "doc_id long, text string",
    )
    docs2 = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta eta theta"),
         (11, "novel content again unlike anything before now")],
        "doc_id long, text string",
    )
    for method in ("minhash", "simhash"):
        idx = str(tmp_path / f"idx-{method}")
        if method == "minhash":
            dedup.incremental_minhash(docs1, idx)  # seed history
            auto = dedup.incremental_minhash(docs2, idx, update=False)
            sig = dedup.minhash_signatures(docs2, "text", "doc_id").localCheckpoint()
            injected = dedup.incremental_minhash(docs2, idx, update=False, sig=sig)
        else:
            dedup.incremental_simhash(docs1, idx)
            auto = dedup.incremental_simhash(docs2, idx, update=False)
            sig = dedup.simhash(docs2, "text", "doc_id").localCheckpoint()
            injected = dedup.incremental_simhash(docs2, idx, update=False, sig=sig)
        got_a = {tuple(r) for r in auto.collect()}
        got_i = {tuple(r) for r in injected.collect()}
        assert got_a == got_i and {r[0] for r in got_a} == {10}, (method, got_a)


# -- cross-corpus fuzzy decontamination --------------------------------------


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5"])
def test_cross_lsh_matches_hand_checked(spark, hash_fn):
    from blueetl_spark.operators import dedup

    base = "the quick brown fox jumps over the lazy dog again and again"
    train = spark.createDataFrame(
        [
            (1, base),  # exact copy of eval doc 100
            (2, base + " with a small tail appended here"),  # near-dup
            (3, "completely different content about spark sql catalyst"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(100, base)], "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in dedup.cross_lsh_matches(
            train, ev, num_hashes=16, bands=4, hash_fn=hash_fn
        ).collect()
    }
    assert len(out) == 3  # zero-match docs kept
    assert out[1]["n_matches"] == 1 and out[1]["max_est_jaccard"] == 1.0
    assert out[1]["contaminated_fuzzy"]
    assert out[3]["n_matches"] == 0 and not out[3]["contaminated_fuzzy"]
    assert out[3]["max_est_jaccard"] is None  # no match -> no estimate


@pytest.mark.parametrize("broadcast_eval", [True, False])
def test_cross_lsh_matches_equals_selfjoin_cross_pairs(spark, broadcast_eval):
    """The cross-side operator must agree with the self-join candidate
    finder restricted to pairs that straddle the train/eval split."""
    from blueetl_spark.operators import dedup

    rows = [
        (i, f"shared prefix tokens w{i % 4} w{(i + 1) % 4} w{(i + 2) % 4} tail")
        for i in range(24)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ev = docs.filter(F.col("doc_id") % 4 == 0)
    tr = docs.filter(F.col("doc_id") % 4 != 0)
    thr = 0.5
    got = {
        r["doc_id"]: (r["n_matches"], r["max_est_jaccard"])
        for r in dedup.cross_lsh_matches(
            tr, ev, num_hashes=16, bands=4,
            min_est_jaccard=thr, broadcast_eval=broadcast_eval,
        ).collect()
    }
    cand = dedup.minhash_lsh_candidates(docs, num_hashes=16, bands=4).collect()
    expect: dict[int, list[float]] = {}
    for r in cand:
        if r.est_jaccard < thr:
            continue
        a, b = r.id_a, r.id_b
        for t, e in ((a, b), (b, a)):
            if t % 4 != 0 and e % 4 == 0:
                expect.setdefault(t, []).append(r.est_jaccard)
    for doc_id in (r[0] for r in rows):
        if doc_id % 4 == 0:
            continue
        ms = expect.get(doc_id, [])
        assert got[doc_id] == (len(ms), max(ms) if ms else None), doc_id


def test_cross_lsh_broadcast_plan(spark):
    """broadcast_eval=True: the band probe and similarity verify are
    broadcast joins — no shuffle keyed on band_hash or the eval id."""
    from blueetl_spark.operators import dedup

    rows = [(i, f"w{i} w{i+1} w{i+2} w{i+3} w{i+4}") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ev = docs.filter(F.col("doc_id") % 4 == 0)
    tr = docs.filter(F.col("doc_id") % 4 != 0)
    out = dedup.cross_lsh_matches(tr, ev, num_hashes=16, bands=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    assert "Exchange hashpartitioning(band" not in plan
    assert "Exchange hashpartitioning(__ev_id" not in plan


def test_containment_candidates_arithmetic_and_clamp(spark):
    """Containment estimates are the documented pure function of
    (est_jaccard, sizes): identical docs hit 1.0 both ways; a doc whose
    shingles are a subset of a bigger doc's scores higher containment
    than Jaccard on its own side; estimates never exceed 1.0."""
    from blueetl_spark.operators.dedup import (
        containment_candidates,
        minhash_lsh_candidates,
        shingle_sets,
    )

    small = "alpha beta gamma delta epsilon"
    big = small + " zeta eta theta iota kappa lambda mu nu xi omicron pi"
    docs = spark.createDataFrame(
        [(1, small), (2, big), (3, small)], "doc_id long, text string"
    )
    out = {
        (r["id_a"], r["id_b"]): r
        for r in containment_candidates(docs, n=3, num_hashes=16, bands=16).collect()
    }
    sizes = {
        r["doc_id"]: r["n"]
        for r in shingle_sets(docs, n=3)
        .groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    ej = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_lsh_candidates(docs, n=3, num_hashes=16, bands=16).collect()
    }
    # identical docs: J=1, containment 1.0 both directions
    assert out[(1, 3)]["est_containment_a"] == 1.0
    assert out[(1, 3)]["est_containment_b"] == 1.0
    # subset doc 1 inside doc 2: containment_a > est_jaccard, clamped
    r = out[(1, 2)]
    j = ej[(1, 2)]
    inter = j / (1.0 + j) * (sizes[1] + sizes[2])
    assert r["size_a"] == sizes[1] and r["size_b"] == sizes[2]
    assert r["est_containment_a"] == round(min(1.0, inter / sizes[1]), 6)
    assert r["est_containment_b"] == round(min(1.0, inter / sizes[2]), 6)
    assert r["est_containment_a"] > r["est_jaccard"]
    assert r["est_containment_a"] <= 1.0


def test_jaccard_prefix_matches_brute_with_fewer_candidates(spark):
    """Prefix filtering must return exactly the brute-force pair set at
    every threshold (exact recall by the prefix theorem), while its
    prefix self-join emits strictly fewer shingle-collision rows than
    the full self-join on a corpus with hot shingles."""
    from blueetl_spark.operators.dedup import (
        jaccard_pairs,
        jaccard_pairs_prefix,
        shingle_sets,
    )

    # 30 docs sharing a hot phrase + distinct tails; a few near-dups
    rows = []
    for i in range(30):
        tail = " ".join(f"w{i}x{j}" for j in range(6))
        rows.append((i, f"the common hot phrase here {tail}"))
    rows.append((100, rows[0][1]))              # exact dup of doc 0
    rows.append((101, rows[1][1] + " extra"))   # near dup of doc 1
    df = spark.createDataFrame(rows, "doc_id long, text string")

    for t in (0.3, 0.5, 0.8):
        brute = sorted(map(tuple, jaccard_pairs(df, n=3, threshold=t)
                           .collect()))
        pref = sorted(map(tuple, jaccard_pairs_prefix(df, n=3, threshold=t)
                          .collect()))
        assert pref == brute, t

    # candidate-generation work: full self-join collisions vs prefix ones
    s = shingle_sets(df, "text", "doc_id", 3)
    full_collisions = (
        s.select(F.col("doc_id").alias("a"), "shingle")
        .join(s.select(F.col("doc_id").alias("b"), "shingle"), "shingle")
        .filter(F.col("a") < F.col("b"))
        .count()
    )
    pref_pairs = jaccard_pairs_prefix(df, n=3, threshold=0.5)  # noqa: F841
    # the hot shared phrase makes every doc collide with every other in
    # the full join; prefixes are rarest-first, so the distinct candidate
    # set stays near the true near-dup pairs
    from blueetl_spark.operators import dedup as dd

    sizes = s.groupBy("doc_id").agg(F.count("*").alias("set_size"))
    freq = s.groupBy("shingle").agg(F.count("*").alias("__df"))
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy(F.col("__df").asc(),
                                        F.col("shingle").asc())
    ranked = (s.join(freq, "shingle")
              .withColumn("rk", F.row_number().over(w))
              .join(sizes, "doc_id"))
    plen = (F.col("set_size")
            - F.floor(F.lit(0.5) * F.col("set_size")).cast("long") + 1)
    pref_sh = ranked.filter(F.col("rk") <= plen).select("doc_id", "shingle")
    pref_collisions = (
        pref_sh.select(F.col("doc_id").alias("a"), "shingle")
        .join(pref_sh.select(F.col("doc_id").alias("b"), "shingle"),
              "shingle")
        .filter(F.col("a") < F.col("b"))
        .count()
    )
    assert pref_collisions < full_collisions / 3, (
        pref_collisions, full_collisions)


def test_connected_components_broadcast_strategy_identical(spark):
    """r13 optimization contract: broadcast_max_labels only picks the
    propagate/jump join strategy — labels are exact mins, so the
    distributed path must emit identical components with the label
    broadcast on (default) and forced off (0)."""
    from blueetl_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (20, 20)],
        "id_a long, id_b long",
    )
    bc = sorted(
        map(tuple, dedup.connected_components(pairs, max_driver_edges=0).collect())
    )
    sh = sorted(
        map(
            tuple,
            dedup.connected_components(
                pairs, max_driver_edges=0, broadcast_max_labels=0
            ).collect(),
        )
    )
    assert bc == sh
    comp = dict(bc)
    assert comp[1] == comp[2] == comp[3] == comp[4] == 1
    assert comp[10] == comp[11] == comp[12] == 10
