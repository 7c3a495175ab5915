"""Streaming corpus curation: the curate-pipeline steps that are sound
on an unbounded stream, composed from the same operators the batch
pipeline uses (``plans/curate.py``) so a document passes or fails
identically in both — batch/stream parity is pinned in
``tests/test_streaming.py``.

What runs on a stream and why:

- **Stateless, row-local steps** run verbatim: ``quality`` (the signal
  columns ride as a projection — no join-back, unlike the batch form,
  because a stream cannot self-join), ``pii_scrub`` (sequential
  ``regexp_replace``), ``mixture`` (pure hash filter),
  ``decontaminate`` (the eval n-gram set is benchmark-sized and
  capped — small sets inline as a literal-array ``array_intersect``,
  larger ones ship once per task as an Arrow-kernel set probe;
  semantically the distinct-shared-n-gram count of the batch
  ``ngram_overlap``), ``semantic_decontaminate`` (eval
  vectors in-closure, Arrow batched matmul — stateless ``mapInPandas``).
- **``exact_dedup``** is the one stateful step:
  ``dropDuplicatesWithinWatermark`` on the content fingerprint
  (``streaming_dedup_exact``) — state bounded by the watermark horizon,
  which is the documented trade vs the batch path's global groupBy.
- **Rejected steps** raise with the correct alternative: ``near_dedup``
  and ``classifier``-training-style steps need cross-row joins over
  history — on a stream that is the ``foreachBatch`` +
  ``incremental_minhash``/``incremental_exact`` index pattern
  (``operators/dedup.py``), not a continuous query. That pattern is
  wired here as :func:`streaming_near_dedup` /
  :func:`near_dedup_batch` (replay-safe, see their contracts). (A *fitted*
  classifier would be stateless, but the batch step's model loading is
  driver-side; score with ``classifier.score_documents`` on the stream
  directly if needed.)
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STREAM_OPS = (
    "exact_dedup",
    "quality",
    "decontaminate",
    "semantic_decontaminate",
    "pii_scrub",
    "mixture",
)

def streaming_curate(
    stream: DataFrame,
    config: dict[str, Any],
    eval_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    event_time_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Apply the configured curation steps to a streaming DataFrame;
    returns the transformed stream (caller attaches the sink). Config
    shape matches :func:`blueetl_spark.plans.curate.curate_corpus` for
    the supported ops."""
    from blueetl_spark.operators import sampling, text

    steps = config.get("steps", [])
    for s in steps:
        op = s.get("op")
        if op not in STREAM_OPS:
            hint = (
                "use foreachBatch + operators/dedup.py incremental indexes"
                if op in ("near_dedup", "classifier")
                else f"supported streaming ops: {STREAM_OPS}"
            )
            raise ValueError(f"op {op!r} is not streamable; {hint}")
        if op in ("decontaminate", "semantic_decontaminate") and eval_df is None:
            raise ValueError(f"{op} step requires eval_df")

    cur = stream
    for s in steps:
        op = s["op"]
        if op == "exact_dedup":
            from blueetl_spark.streaming.windows import streaming_dedup_exact

            cur = streaming_dedup_exact(
                cur, text_col, id_col,
                event_time_col=event_time_col,
                watermark=s.get("watermark", watermark),
            )
        elif op == "quality":
            passthrough = tuple(c for c in cur.columns if c != id_col)
            qf = text.quality_features(cur, text_col, id_col, passthrough=passthrough)
            bad = F.lit(False)
            if "min_tokens" in s:
                bad = bad | (F.col("n_tokens") < int(s["min_tokens"]))
            if "max_punct_ratio" in s:
                bad = bad | (F.col("punct_ratio") > float(s["max_punct_ratio"]))
            if "min_stopword_ratio" in s:
                bad = bad | (
                    F.col("stopword_ratio") < float(s["min_stopword_ratio"])
                )
            # batch parity: NULL signals (empty text) are NOT bad
            cur = qf.filter(~F.coalesce(bad, F.lit(False))).select(
                id_col, *passthrough
            )
        elif op == "decontaminate" and s.get("method") == "bloom":
            # Unbounded-eval streaming path: the eval n-gram set folds
            # into a fixed-size Bloom array (no collect cap, no plan
            # literal), joined in as a ONE-ROW static frame via a
            # constant-key stream-static equi-join (supported append-
            # mode shape), and each row's might-shared count is a pure
            # JVM HOF over its shingles. Semantics are CONSERVATIVE
            # approximate: no false negatives (a truly contaminated doc
            # is always dropped — Bloom filters never miss members), but
            # a false-positive gram can drop a clean doc at ~0.5^k per
            # gram per doc; size m_bits >= ~100x the eval distinct-gram
            # count to make that negligible (default 2^24 bits = 2 MiB).
            # The exact batch operator is text.ngram_overlap_bloom; its
            # verify join is a per-doc AGGREGATE, which is why the
            # stateless streaming path stops at the Bloom probe.
            n = int(s.get("ngram", 3))
            max_shared = int(s.get("max_shared", 0))
            m_bits = int(s.get("m_bits", 1 << 24))
            k_hashes = int(s.get("k_hashes", 7))
            ev_hashed = (
                eval_df.select(
                    F.explode(
                        F.array_distinct(text.shingles(text_col, n))
                    ).alias("__ng")
                )
                .distinct()
                .select(
                    F.xxhash64("__ng").alias("__h1"),
                    F.xxhash64("__ng", F.lit(1)).alias("__h2"),
                )
            )
            arr = text._build_bloom_array(ev_hashed, m_bits, k_hashes)
            bloom_row = cur.sparkSession.createDataFrame(
                [(1, arr)], "__one: int, __bloom: array<long>"
            )
            grams = F.transform(
                F.array_distinct(text.shingles(text_col, n)),
                lambda g: F.struct(
                    F.xxhash64(g).alias("h1"),
                    F.xxhash64(g, F.lit(1)).alias("h2"),
                ),
            )
            n_might = F.size(
                F.filter(
                    grams,
                    lambda s_: text.bloom_hit(
                        s_["h1"], s_["h2"], F.col("__bloom"), m_bits, k_hashes
                    ),
                )
            )
            cur = (
                cur.withColumn("__one", F.lit(1))
                .join(F.broadcast(bloom_row), "__one")
                .filter(n_might <= max_shared)
                .drop("__one", "__bloom")
            )
        elif op == "decontaminate":
            n = int(s.get("ngram", 3))
            max_shared = int(s.get("max_shared", 0))
            # Eval n-grams are collected once; the cap mirrors the batch
            # path's bounded broadcast (similarity.py max_eval_rows) — an
            # unbounded eval suite would otherwise become a million-element
            # plan literal or a worker-memory hazard (VERDICT r5 #2).
            max_eval_ngrams = int(s.get("max_eval_ngrams", 1_000_000))
            ev = [
                r["g"]
                for r in eval_df.select(
                    F.explode(
                        F.array_distinct(text.shingles(text_col, n))
                    ).alias("g")
                )
                .distinct()
                .limit(max_eval_ngrams + 1)
                .collect()
            ]
            if len(ev) > max_eval_ngrams:
                raise ValueError(
                    f"decontaminate eval set exceeds max_eval_ngrams="
                    f"{max_eval_ngrams} distinct {n}-grams; a corpus-sized "
                    "eval side needs the foreachBatch + "
                    "operators/dedup.py incremental-index pattern, not a "
                    "continuous query"
                )
            # Two probe shapes by eval size: a small set inlines as a JVM
            # literal (codegen'd array_intersect, zero Python); a large one
            # would bloat the Catalyst plan O(|eval|) per row-batch, so it
            # ships once per task in an Arrow-kernel closure instead —
            # still stateless, so still streamable.
            literal_max = int(s.get("literal_max_ngrams", 10_000))
            if len(ev) <= literal_max:
                ev_arr = (
                    F.array(*[F.lit(g) for g in ev])
                    if ev
                    else F.array().cast("array<string>")
                )
                n_shared = F.size(
                    F.array_intersect(
                        F.array_distinct(text.shingles(text_col, n)), ev_arr
                    )
                )
                cur = cur.filter(n_shared <= max_shared)
            else:
                ev_set = frozenset(ev)
                shingled = cur.withColumn(
                    "__sh", F.array_distinct(text.shingles(text_col, n))
                )
                schema = shingled.schema

                def drop_contaminated(it):
                    for pdf in it:
                        if not len(pdf):
                            continue
                        # Arrow hands list cells over as numpy arrays (or
                        # None for null text) — no truthiness on arrays
                        keep = [
                            sum(g in ev_set for g in (sh if sh is not None else ()))
                            <= max_shared
                            for sh in pdf["__sh"]
                        ]
                        yield pdf[keep]

                cur = shingled.mapInPandas(drop_contaminated, schema).drop(
                    "__sh"
                )
        elif op == "semantic_decontaminate":
            from blueetl_spark.operators import similarity

            if s.get("method") == "hof":
                raise ValueError(
                    "semantic_decontaminate on a stream requires the arrow "
                    "method (the hof path anti-joins the stream with itself)"
                )
            cur = similarity.semantic_decontaminate(
                cur,
                eval_df,
                threshold=float(s.get("threshold", 0.95)),
                id_col=id_col,
                vec_col=s.get("vec_col", "embedding"),
                method="arrow",
            )
        elif op == "pii_scrub":
            cur = text.pii_scrub(cur, text_col, count=False)
        elif op == "mixture":
            cur = sampling.mixture_sample(
                cur,
                s["rates"],
                group_col=s.get("group_col", "source"),
                key_col=id_col,
                seed=s.get("seed", ""),
                method=s.get("method", "xxhash64"),
                default_rate=float(s.get("default_rate", 0.0)),
            )
    return cur


def near_dedup_batch(
    batch: DataFrame,
    batch_id: int,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    method: str = "minhash",
    threshold: float = 0.7,
    max_distance: int = 3,
    within_batch: bool = True,
    storage: str = "parquet",
    n_buckets: int = 64,
) -> DataFrame:
    """One micro-batch of streaming near-dedup against an incremental
    index; returns the surviving (novel) documents and appends their
    signatures to the index. This is the function
    :func:`streaming_near_dedup` hands to ``foreachBatch`` — exposed so
    the replay contract is directly testable.

    Semantics per batch:

    1. (``within_batch``) drop in-batch near-duplicates, keeping the
       smallest id per duplicate component (``keep_canonical``).
    2. Drop documents within ``threshold``/``max_distance`` of ANY
       indexed document — matching on stored signatures only, history
       text is never re-read (``incremental_minhash``/``_simhash``
       with ``update=False``). Self-id matches are ignored, which is
       what makes an at-least-once REPLAY safe: a re-run batch finds its
       own previous append in the index, matches itself by id, and still
       passes through — same survivor set, never an empty batch.
    3. Append the survivors' signatures/bands to the index directly (no
       second match pass). A replayed batch appends duplicate signature
       rows for the same id — harmless for matching (candidates are
       distinct pairs) and folded out by the next
       ``compact_minhash_index``.

    The batch is signatured exactly ONCE: one pinned signature frame
    feeds the within-batch pair-finding, the index match, and the append
    (semi-join filters over the checkpointed rows as the survivor set
    shrinks) — it used to be hashed three times over nested subsets.

    The caller's sink writes the returned survivors; stamp ``batch_id``
    if downstream needs replay-exact outputs (see
    :func:`streaming_near_dedup`).
    """
    from blueetl_spark.operators import dedup

    spark = batch.sparkSession
    # snapshot: the batch feeds the signature job, the canonical filter,
    # and the sink
    batch = batch.localCheckpoint(eager=True)
    if method == "minhash":
        sig_full = dedup.minhash_signatures(
            batch, text_col, id_col
        ).localCheckpoint(eager=True)
    elif method == "simhash":
        sig_full = dedup.simhash(batch, text_col, id_col).localCheckpoint(
            eager=True
        )
    else:
        raise ValueError(f"unknown method {method!r}; 'minhash' or 'simhash'")
    sig = sig_full
    if within_batch:
        if method == "minhash":
            pairs = dedup.minhash_lsh_candidates(
                batch, text_col, id_col, sig=sig_full
            ).filter(F.col("est_jaccard") >= threshold)
        else:
            pairs = dedup.simhash_candidates(
                batch, text_col, id_col, max_distance=max_distance, sig=sig_full
            )
        batch = dedup.keep_canonical(pairs, batch, id_col=id_col).localCheckpoint(
            eager=True
        )
        sig = sig_full.join(batch.select(id_col), id_col, "left_semi")
    if method == "minhash":
        matches = dedup.incremental_minhash(
            batch, index_path, text_col, id_col,
            threshold=threshold, update=False,
            storage=storage, n_buckets=n_buckets, sig=sig,
        )
    else:
        matches = dedup.incremental_simhash(
            batch, index_path, text_col, id_col,
            max_distance=max_distance, update=False,
            storage=storage, n_buckets=n_buckets, sig=sig,
        )
    dup_ids = (
        matches.filter(F.col("new_id") != F.col("old_id"))
        .select(F.col("new_id").alias(id_col))
        .distinct()
    )
    survivors = batch.join(dup_ids, id_col, "left_anti").localCheckpoint(
        eager=True
    )
    # direct store append — the survivors' signature rows are a semi-join
    # over the pinned frame, not a third hash pass
    store = dedup._mh_store(spark, index_path, storage, id_col, n_buckets)
    sig_surv = sig_full.join(survivors.select(id_col), id_col, "left_semi")
    if method == "minhash":
        banded = dedup.banded_buckets(sig_surv, id_col, 16, 4, "xxhash64")
    else:
        banded = dedup.simhash_bands(
            sig_surv, id_col, max_distance + 1, 64 // (max_distance + 1)
        ).withColumnRenamed("band_bits", "band_hash")
    store.append(sig_surv, banded)
    return survivors


def streaming_near_dedup(
    stream: DataFrame,
    index_path: str,
    output_path: str,
    checkpoint_path: str,
    **kwargs,
):
    """The ``foreachBatch`` + incremental-index pattern the streamable
    ops' rejection hint points at, wired: each micro-batch is near-deduped
    within itself and against the growing index
    (:func:`near_dedup_batch`), and the novel documents land in
    ``output_path`` stamped with the batch id (at-least-once sink —
    replay-exact consumers dedup on (``__batch_id``, id), one
    ``drop_duplicates`` away). Returns the started StreamingQuery.
    """

    def run(batch: DataFrame, batch_id: int) -> None:
        survivors = near_dedup_batch(batch, batch_id, index_path, **kwargs)
        (
            survivors.withColumn("__batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(output_path)
        )

    return (
        stream.writeStream.foreachBatch(run)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )


def semantic_dedup_batch(
    batch: DataFrame,
    batch_id: int,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_probe: int = 4,
    within_batch: bool = True,
    within_batch_method: str = "bruteforce",
    index_kind: str = "ivf",
) -> DataFrame:
    """One micro-batch of streaming SEMANTIC dedup against a persisted
    IVF index (the embedding twin of :func:`near_dedup_batch`): drop
    in-batch near-duplicates (keeping the smallest id per duplicate
    component), drop every remaining vector whose cosine against ANY
    indexed vector is ≥ ``threshold``, append the survivors to the index
    (``similarity.append_ivf_index`` — the stored codebook assigns
    cells, history is never re-read), and return the survivors.

    ``index_kind="ivf_pq"`` runs the same protocol against a persisted
    IVF-PQ index (``operators/pq.py``) — the 10⁹-vector scale path where
    history is 8-byte codes instead of float payloads. The cosine
    threshold translates to an ADC bound via ``adc ≤ 2·(1 − threshold)``
    (exact for L2-NORMALIZED vectors, since ‖a−b‖² = 2·(1−cosθ));
    because ADC is computed against quantized codes it carries the
    index's quantization distortion, so the decision is approximate.
    The index stores its self-ADC distortion floor at build time
    (``stats.parquet``) and this function REFUSES a bound below that
    floor — such a configuration cannot catch even exact duplicates.
    Keep the flat index where exactness matters; the within-batch step
    stays exact either way.

    Replay contract (at-least-once ``foreachBatch``): a re-run batch must
    emit the SAME survivor set even when the failed attempt already
    appended to the index. Two pieces make that exact:

    1. (``within_batch``) in-batch near-duplicates are resolved FIRST,
       deterministically (``keep_canonical``: smallest id wins) — so
       mutually-near-duplicate vectors in one batch can never all
       survive on the first run and then all match each other's appends
       on a replay.
    2. ANY id of this batch is excluded from the index search BEFORE
       ranking (``search_ivf_index(exclude=...)``, not a filter on the
       returned top-k) — a replayed batch matching its own or sibling
       survivors' prior appends sees exactly the pre-append index, so
       the historic-duplicate decision is bit-identical across retries.
       Excluding after the top-k truncation would let sibling appends
       occupy the k slots and mask a genuine historic hit whenever the
       in-batch dedup was skipped or (LSH mode) missed a pair.

    The index must exist (``similarity.build_ivf_index`` on a seed
    corpus — the coarse quantizer is frozen at build time).
    """
    from blueetl_spark.operators import dedup, similarity

    spark = batch.sparkSession
    batch = batch.localCheckpoint(eager=True)
    if within_batch:
        pairs = dedup.embedding_near_dup(
            batch, threshold=threshold, id_col=id_col, vec_col=vec_col,
            method=within_batch_method,
        )
        batch = dedup.keep_canonical(pairs, batch, id_col=id_col).localCheckpoint(
            eager=True
        )
    if index_kind == "ivf":
        hits = (
            similarity.search_ivf_index(
                spark, batch, index_path, k=1, n_probe=n_probe,
                id_col=id_col, vec_col=vec_col,
                exclude=batch.select(id_col),
            )
            .filter(F.col("cosine") >= threshold)
            .select(F.col("query_id").alias(id_col))
            .distinct()
        )
    elif index_kind == "ivf_pq":
        from blueetl_spark.operators import pq
        from blueetl_spark.plans.atomic import fs_exists

        adc_bound = 2.0 * (1.0 - threshold)
        stats_dir = f"{index_path}/stats.parquet"
        if fs_exists(spark, stats_dir):
            floor = spark.read.parquet(stats_dir).collect()[0]["adc_p99"]
            if adc_bound < floor:
                raise ValueError(
                    f"ADC bound 2*(1-threshold)={adc_bound:.4f} is below the "
                    f"index's quantization-distortion floor (self-ADC p99="
                    f"{floor:.4f}): even an EXACT duplicate of an indexed "
                    "vector would survive, so this configuration dedups "
                    "nothing. Lower the threshold, rebuild the index with "
                    "more codes/subspaces, or use index_kind='ivf'."
                )
        hits = (
            pq.search_ivf_pq_index(
                spark, batch, index_path, k=1, n_probe=n_probe,
                id_col=id_col, vec_col=vec_col,
                exclude=batch.select(id_col),
            )
            .filter(F.col("adc") <= adc_bound)
            .select(F.col("query_id").alias(id_col))
            .distinct()
        )
    else:
        raise ValueError(f"unknown index_kind {index_kind!r}; 'ivf' or 'ivf_pq'")
    survivors = batch.join(hits, id_col, "left_anti").localCheckpoint(
        eager=True
    )
    if index_kind == "ivf":
        similarity.append_ivf_index(survivors, index_path, id_col, vec_col)
    else:
        from blueetl_spark.operators import pq

        pq.append_ivf_pq_index(survivors, index_path, id_col, vec_col)
    return survivors


def streaming_semantic_dedup(
    stream: DataFrame,
    index_path: str,
    output_path: str,
    checkpoint_path: str,
    **kwargs,
):
    """foreachBatch wiring for :func:`semantic_dedup_batch`: novel
    vectors land in ``output_path`` stamped with the batch id
    (at-least-once sink; replay-exact consumers dedup on
    (``__batch_id``, id)). Returns the started StreamingQuery."""

    def run(batch: DataFrame, batch_id: int) -> None:
        survivors = semantic_dedup_batch(batch, batch_id, index_path, **kwargs)
        (
            survivors.withColumn("__batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(output_path)
        )

    return (
        stream.writeStream.foreachBatch(run)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
