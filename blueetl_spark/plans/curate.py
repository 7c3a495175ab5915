"""Config-driven corpus curation: compose the engine's dedup / quality /
PII / decontamination / mixture operators into one declarative pipeline,
ending (optionally) in the sharded, manifest-verified corpus export.

This is the "assemble a training set" entry point a real pipeline runs
daily — each step is one of the already-scale-shaped operators, so the
composition inherits their properties (hash-only dedup shuffles,
broadcast eval sets, pure-filter sampling, map-only scrubbing). Steps
see the full row (id + text + metadata columns pass through), so later
steps can group on anything earlier steps preserved.

Config shape (JSON/YAML-friendly):

    {"steps": [
        {"op": "exact_dedup"},
        {"op": "near_dedup", "threshold": 0.8, "num_hashes": 64,
         "bands": 16, "ngram": 3},
        {"op": "quality", "min_tokens": 10, "max_punct_ratio": 0.2,
         "min_stopword_ratio": 0.02},
        {"op": "decontaminate", "ngram": 3},       # needs eval_df
        {"op": "semantic_decontaminate", "threshold": 0.95,
         "vec_col": "embedding"},                   # needs eval_df w/ vectors
        {"op": "pii_scrub"},
        {"op": "classifier", "model_path": "/models/quality",
         "threshold": 0.5},                        # Spark ML LR, map-only
        {"op": "temperature_mixture", "alpha": 0.7, "group_col": "lang"},
        {"op": "mixture", "rates": {"en": 1.0}, "group_col": "lang",
         "default_rate": 0.1},
        {"op": "epoch_mixture", "epochs": {"wiki": 3.0, "cc": 0.4},
         "group_col": "source"},                   # up-sampling allowed
    ]}
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KNOWN_OPS = (
    "exact_dedup",
    "near_dedup",
    "quality",
    "decontaminate",
    "semantic_decontaminate",
    "pii_scrub",
    "temperature_mixture",
    "mixture",
    "classifier",
    "epoch_mixture",
    "gopher",
    "split",
)


def curate_corpus(
    docs: DataFrame,
    config: dict[str, Any],
    eval_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    collect_stats: bool = False,
) -> tuple[DataFrame, list[dict[str, Any]]]:
    """Run the configured steps over ``docs``; returns (kept rows, stats).

    ``collect_stats=True`` counts rows after every step — one extra
    Spark action (a full recompute of the pipeline prefix) per step.
    The default is False: at corpus scale the cheap path must be the
    default, the export manifest already carries the final counts, and
    interactive callers (the ``curate`` CLI) opt in explicitly. With
    the default, the whole pipeline is ONE job at the terminal action.
    """
    from blueetl_spark.operators import dedup, sampling, text

    steps = config.get("steps", [])
    for s in steps:  # validate before touching any data
        if s.get("op") not in KNOWN_OPS:
            raise ValueError(
                f"unknown curation op {s.get('op')!r}; one of {KNOWN_OPS}"
            )
        if s["op"] in ("decontaminate", "semantic_decontaminate") and eval_df is None:
            raise ValueError(f"{s['op']} step requires eval_df")
        if s["op"] == "classifier" and not (
            s.get("model_path") or s.get("model") is not None
        ):
            raise ValueError("classifier step requires model_path or model")

    stats: list[dict[str, Any]] = []
    cur = docs
    if collect_stats:
        stats.append({"op": "input", "rows": cur.count()})
    for s in steps:
        op = s["op"]
        if op == "exact_dedup":
            keep = dedup.dedup_exact(cur, text_col, id_col).select(
                F.col("keep_id").alias(id_col)
            )
            cur = cur.join(keep, id_col, "left_semi")
        elif op == "near_dedup":
            cand = dedup.minhash_lsh_candidates(
                cur,
                text_col,
                id_col,
                n=int(s.get("ngram", 3)),
                num_hashes=int(s.get("num_hashes", 64)),
                bands=int(s.get("bands", 16)),
            )
            pairs = cand.filter(
                F.col("est_jaccard") >= float(s.get("threshold", 0.8))
            ).select("id_a", "id_b")
            cur = dedup.keep_canonical(
                pairs, cur, id_col=id_col, assume_distinct_pairs=True
            )
        elif op == "quality":
            qf = text.quality_features(cur, text_col, id_col)
            cond = F.lit(False)
            if "min_tokens" in s:
                cond = cond | (F.col("n_tokens") < int(s["min_tokens"]))
            if "max_punct_ratio" in s:
                cond = cond | (F.col("punct_ratio") > float(s["max_punct_ratio"]))
            if "min_stopword_ratio" in s:
                cond = cond | (
                    F.col("stopword_ratio") < float(s["min_stopword_ratio"])
                )
            bad = qf.filter(cond).select(id_col)
            cur = cur.join(bad, id_col, "left_anti")
        elif op == "decontaminate":
            hits = (
                text.ngram_overlap(
                    cur, eval_df, text_col, id_col, n=int(s.get("ngram", 3))
                )
                .filter(F.col("n_shared") > int(s.get("max_shared", 0)))
                .select(id_col)
            )
            cur = cur.join(hits, id_col, "left_anti")
        elif op == "semantic_decontaminate":
            from blueetl_spark.operators import similarity

            cur = similarity.semantic_decontaminate(
                cur,
                eval_df,
                threshold=float(s.get("threshold", 0.95)),
                id_col=id_col,
                vec_col=s.get("vec_col", "embedding"),
                # arrow matmul by default: the map-only scale path
                method=s.get("method", "arrow"),
            )
        elif op == "pii_scrub":
            cur = text.pii_scrub(cur, text_col, count=False)
        elif op == "temperature_mixture":
            cur = sampling.temperature_mixture(
                cur,
                alpha=float(s.get("alpha", 0.5)),
                group_col=s.get("group_col", "source"),
                key_col=id_col,
                seed=s.get("seed", ""),
                method=s.get("method", "xxhash64"),
            )
        elif op == "classifier":
            from blueetl_spark.operators import classifier as clf

            model = s.get("model")
            if model is None:
                model = clf.load_quality_classifier(s["model_path"])
            cur = clf.filter_by_quality(
                model,
                cur,
                threshold=float(s.get("threshold", 0.5)),
                text_col=text_col,
                id_col=id_col,
                # None → the model's persisted featurization decides
                bigrams=(None if s.get("bigrams") is None else bool(s["bigrams"])),
            )
        elif op == "gopher":
            from blueetl_spark.operators.text import gopher_rules

            kw = {
                k: s[k]
                for k in (
                    "min_words", "max_words", "min_mean_word_len",
                    "max_mean_word_len", "max_symbol_ratio",
                    "max_bullet_frac", "max_ellipsis_frac",
                    "min_alpha_frac", "min_stopword_hits",
                )
                if k in s
            }
            flags = gopher_rules(cur, id_col=id_col, **kw)
            cur = cur.join(
                flags.filter(F.col("keep")).select(id_col), id_col, "left_semi"
            )
        elif op == "split":
            # additive: tags rows with a deterministic split column
            # (downstream exports filter on it); never drops rows
            cur = sampling.split_assign(
                cur,
                {k: float(v) for k, v in s["weights"].items()},
                key_col=id_col,
                seed=s.get("seed", ""),
                method=s.get("method", "xxhash64"),
                out_col=s.get("out_col", "split"),
            )
        elif op == "epoch_mixture":
            cur = sampling.epoch_mixture(
                cur,
                {k: float(v) for k, v in s["epochs"].items()},
                group_col=s.get("group_col", "source"),
                key_col=id_col,
                seed=s.get("seed", ""),
                method=s.get("method", "xxhash64"),
            )
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
        if collect_stats:
            stats.append({"op": op, "rows": cur.count()})
    return cur, stats
