"""Whole-registry physical-plan audit.

Builds every ``queries()`` entry at sf0.001 (plan shape, not timing) and
extracts the plan statistics that matter at 100 TB: exchange count,
join strategies, Python-execution nodes, scan count. Prints one JSON
line per query plus a summary.

The point is a standing, mechanical answer to "did a refactor silently
regress a plan": `tests/test_plans.py` pins the headline shapes
individually; this sweeps the long tail. Run:

    python tools/audit_plans.py            # all queries
    python tools/audit_plans.py name ...   # a subset
"""

from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, ".")

SF_DIR = "/root/testdata/sf0.001"

# Nodes that mean a row-at-a-time Python UDF is in the plan. These are
# BANNED everywhere in the repo: every Python kernel must be an
# Arrow-batched mapInPandas/applyInPandas over bounded per-group data.
ROW_UDF_NODES = ("BatchEvalPython",)
# Arrow-batched Python nodes: allowed, but listed so additions are
# deliberate.
ARROW_NODES = ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas",
               "MapInArrow")


def plan_stats(df) -> dict:
    jdf = df._jdf
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = jdf.queryExecution().explainString(mode)

    def n(pat: str) -> int:
        return len(re.findall(rf"\(\d+\) {pat}\b", plan))

    return {
        "exchanges": n("Exchange"),
        "broadcasts": n("BroadcastExchange"),
        "bhj": n("BroadcastHashJoin"),
        "smj": n("SortMergeJoin"),
        "bnlj": n("BroadcastNestedLoopJoin"),
        "scans": n("Scan parquet") + n("Scan ExistingRDD"),
        "sorts": n("Sort"),
        "row_udf": sum(plan.count(x) for x in ROW_UDF_NODES),
        "arrow_python": sum(n(x) for x in ARROW_NODES),
    }


def main() -> int:
    from __spark_entry__ import queries
    from blueetl_spark.session import get_spark

    spark = get_spark(app_name="plan_audit")
    qs = queries()
    names = sys.argv[1:] or list(qs)

    rows, errors = {}, []
    for name in names:
        try:
            rows[name] = plan_stats(qs[name](spark, SF_DIR))
        except Exception as e:  # noqa: BLE001
            errors.append(name)
            print(f"ERROR {name}: {e}", file=sys.stderr)

    for name, s in rows.items():
        flags = []
        if s["row_udf"]:
            flags.append("ROW_UDF")
        if s["smj"]:
            flags.append("SMJ")
        print(json.dumps({"query": name, **s,
                          "flags": flags}, separators=(",", ":")))
    total = (
        {k: sum(s[k] for s in rows.values()) for k in next(iter(rows.values()))}
        if rows
        else {}
    )
    print(json.dumps({"summary": total, "n_queries": len(rows),
                      "errors": errors}, separators=(",", ":")))
    return 1 if errors or total.get("row_udf") else 0


if __name__ == "__main__":
    raise SystemExit(main())
