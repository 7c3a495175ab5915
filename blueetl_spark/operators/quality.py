"""Declarative data-quality constraint checking (Deequ-style).

A 100 TB ingest needs its contract checked WHERE the data lives: null
rates, key uniqueness, value ranges, format regexes, membership, and
referential integrity — the public pattern established by AWS Deequ
(Schelter et al., VLDB 2018) re-expressed as plain Catalyst
expressions.

Scale design — the row-local rules (not_null / range / regex / isin /
custom predicate) and the uniqueness rules all fold into **one
map-side-combined aggregate pass** over the data:

- row-local rules become conditional sums;
- ``unique`` becomes ``count(col…) − countDistinct(col…)`` (the number
  of surplus duplicate rows) in the SAME aggregate — Spark plans
  multi-distinct aggregates with one Expand, still a single scan;
- ``ref`` (foreign key) rules are the only extra jobs: one LEFT ANTI
  join each against the referenced key set (broadcast when the
  dimension is small; a big-big FK check shuffles on the key, which is
  the floor for that question).

Output is one row per rule: ``(rule, column, n_checked, n_violations,
passed)`` — tiny, driver-safe, and exactly replayable in SQL (every
count is a deterministic integer).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _rule_label(rule: Mapping) -> tuple[str, str]:
    kind = rule["type"]
    if kind == "unique":
        return kind, ",".join(rule["columns"])
    return kind, rule["column"]


def check_constraints(df: DataFrame, rules: Sequence[Mapping]) -> DataFrame:
    """Evaluate ``rules`` against ``df``; returns one row per rule:
    ``(rule_idx, rule, column, n_checked, n_violations, passed)`` —
    ``rule_idx`` is the rule's position in ``rules``, so two rules of
    the same type on the same column stay distinguishable.

    Rule shapes (dicts)::

        {"type": "not_null", "column": c}
        {"type": "range", "column": c, "lo": x, "hi": y}   # inclusive,
                                                 # either bound optional
        {"type": "regex", "column": c, "pattern": p}       # full match
        {"type": "isin", "column": c, "values": [...]}
        {"type": "unique", "columns": [c, ...]}
        {"type": "ref", "column": c, "ref": DataFrame, "ref_col": r}

    Semantics: NULL values violate only ``not_null`` (the other
    row-local rules check the values that are present — compose with
    ``not_null`` to forbid them); ``n_checked`` counts the rows the
    rule actually examined. ``unique`` counts surplus duplicate rows
    among fully-non-null key tuples; ``ref`` counts non-null values
    missing from the referenced key set.
    """
    if not rules:
        raise ValueError("rules must be non-empty")
    aggs: list[Column] = []
    meta: list[tuple[int, str, str]] = []
    ref_rules: list[tuple[int, Mapping]] = []
    for i, rule in enumerate(rules):
        kind = rule["type"]
        if kind == "ref":
            ref_rules.append((i, rule))
            continue
        label = _rule_label(rule)
        if kind == "unique":
            cols = [F.col(c) for c in rule["columns"]]
            nn = F.count(F.when(
                ~F.greatest(*[c.isNull() for c in cols])
                if len(cols) > 1 else cols[0].isNotNull(),
                F.lit(1),
            ))
            aggs += [
                nn.alias(f"__n{i}"),
                (nn - F.countDistinct(*cols)).alias(f"__v{i}"),
            ]
            meta.append((i, *label))
            continue
        c = F.col(rule["column"])
        if kind == "not_null":
            checked, viol = F.count(F.lit(1)), F.sum(c.isNull().cast("long"))
        elif kind == "range":
            ok = F.lit(True)
            if "lo" in rule:
                ok &= c >= F.lit(rule["lo"])
            if "hi" in rule:
                ok &= c <= F.lit(rule["hi"])
            checked = F.count(c)
            viol = F.sum((c.isNotNull() & ~ok).cast("long"))
        elif kind == "regex":
            ok = c.cast("string").rlike(f"^(?:{rule['pattern']})$")
            checked = F.count(c)
            viol = F.sum((c.isNotNull() & ~ok).cast("long"))
        elif kind == "isin":
            ok = c.isin(list(rule["values"]))
            checked = F.count(c)
            viol = F.sum((c.isNotNull() & ~ok).cast("long"))
        else:
            raise ValueError(f"unknown rule type {kind!r}")
        aggs += [checked.alias(f"__n{i}"), viol.alias(f"__v{i}")]
        meta.append((i, *label))

    spark = df.sparkSession
    rows: list[DataFrame] = []
    if aggs:
        wide = df.agg(*aggs)
        # typed lit() labels, not interpolated SQL literals: a quote in
        # a rule kind/column name can't break the generated plan
        entries = [
            F.struct(
                F.lit(i).cast("long").alias("rule_idx"),
                F.lit(kind).alias("rule"),
                F.lit(col).alias("column"),
                F.coalesce(F.col(f"__n{i}"), F.lit(0))
                .cast("long")
                .alias("n_checked"),
                F.coalesce(F.col(f"__v{i}"), F.lit(0))
                .cast("long")
                .alias("n_violations"),
            )
            for i, kind, col in meta
        ]
        rows.append(
            wide.select(F.explode(F.array(*entries)).alias("__r"))
            .select("__r.*")
        )
    for i, rule in ref_rules:
        c, ref, ref_col = rule["column"], rule["ref"], rule["ref_col"]
        present = df.filter(F.col(c).isNotNull())
        missing = present.join(
            ref.select(F.col(ref_col).alias(c)).distinct(), c, "left_anti"
        )
        rows.append(
            present.agg(F.count(F.lit(1)).alias("__n"))
            .crossJoin(missing.agg(F.count(F.lit(1)).alias("__v")))
            .select(
                F.lit(i).cast("long").alias("rule_idx"),
                F.lit("ref").alias("rule"),
                F.lit(c).alias("column"),
                F.col("__n").alias("n_checked"),
                F.col("__v").alias("n_violations"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.select(
        "rule_idx", "rule", "column", "n_checked", "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


def k_anonymity(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 5,
    sensitive_col: str | None = None,
) -> DataFrame:
    """Per-equivalence-class k-anonymity audit (Sweeney 2002) — the
    re-identification screen a dataset needs BEFORE it ships to
    training or release: rows sharing the same quasi-identifier tuple
    (zip+age+gender-style columns) form an equivalence class, and any
    class smaller than ``k`` marks its members as re-identifiable by
    linkage. One row per class: ``(quasi…, class_size, violates_k)``
    plus, with ``sensitive_col``, ``l_distinct`` — the class's count
    of distinct sensitive values (l-diversity, Machanavajjhala 2007:
    a k-anonymous class with ONE distinct diagnosis still leaks it).
    NULL quasi values form their own classes (SQL grouping semantics —
    a NULL zip is itself a linkable signature).

    Scale shape: ONE map-side-combined aggregate on the quasi tuple
    (count + optional count-distinct — the distinct adds Spark's
    Expand but it's still a single scan). Output is class-count-sized.
    All integer; trivially oracle-exact.
    """
    quasi = list(quasi_cols)
    if not quasi:
        raise ValueError("quasi_cols must be non-empty")
    if k < 2:
        raise ValueError("k must be >= 2 (k=1 is vacuous)")
    aggs = [F.count(F.lit(1)).alias("class_size")]
    if sensitive_col is not None:
        aggs.append(F.countDistinct(sensitive_col).alias("l_distinct"))
    out = df.groupBy(*quasi).agg(*aggs)
    return out.select(
        *quasi,
        "class_size",
        (F.col("class_size") < k).alias("violates_k"),
        *(["l_distinct"] if sensitive_col is not None else []),
    )


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 5,
    sensitive_col: str | None = None,
    l: int = 2,
    round_to: int | None = 6,
) -> DataFrame:
    """One-row release-gate summary over :func:`k_anonymity`:
    ``(n_rows, n_classes, min_class_size, violating_classes,
    violating_rows, at_risk_fraction)`` and, with a sensitive column,
    ``l_violating_classes`` (classes with < ``l`` distinct sensitive
    values — counted over ALL classes, k-anonymous or not). The
    dataset passes k-anonymity iff ``min_class_size >= k``, i.e.
    ``violating_classes = 0``. Class-count-sized input, one terminal
    aggregate; only ``at_risk_fraction`` is float.
    """
    classes = k_anonymity(df, quasi_cols, k=k, sensitive_col=sensitive_col)
    aggs = [
        F.sum("class_size").alias("n_rows"),
        F.count(F.lit(1)).alias("n_classes"),
        F.min("class_size").alias("min_class_size"),
        F.sum(F.col("violates_k").cast("long")).alias("violating_classes"),
        F.sum(
            F.when(F.col("violates_k"), F.col("class_size")).otherwise(0)
        ).alias("violating_rows"),
    ]
    if sensitive_col is not None:
        aggs.append(
            F.sum((F.col("l_distinct") < l).cast("long")).alias(
                "l_violating_classes"
            )
        )
    out = classes.agg(*aggs)
    frac = F.col("violating_rows").cast("double") / F.col("n_rows").cast(
        "double"
    )
    if round_to is not None:
        frac = F.round(frac, round_to) + 0.0
    return out.select("*", frac.alias("at_risk_fraction"))
