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
  (``operators/dedup.py``), not a continuous query. (A *fitted*
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
