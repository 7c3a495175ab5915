"""Capture the PER-ITERATION physical plans of the iterative graph
operators — the plans an end-of-query ``explain`` cannot show because
every round ends in a localCheckpoint that truncates lineage.

Hooks ``DataFrame.localCheckpoint`` to dump each checkpointed frame's
plan (the round's full plan, formed immediately before the pin) while
the REAL operator runs on a small graph, forced onto the shuffled
(above-the-broadcast-bound) path. Plan SHAPE is size-independent here:
both broadcast gates are explicit flags, not size estimates.

    python tools/capture_iter_plans.py <op> <legacy|layout>

Writes plans/r14/<op>_iter_<mode>.txt (all rounds concatenated).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.classic.dataframe import DataFrame as CDF

from blueetl_spark.session import get_spark


def main() -> int:
    op = sys.argv[1]
    mode = sys.argv[2]
    layout = mode == "layout"
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_DIR", "r14"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"capture_iter_{op}_{mode}")

    dumps: list[str] = []
    orig = CDF.localCheckpoint

    def hooked(self, eager=True):
        m = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        dumps.append(self._jdf.queryExecution().explainString(m))
        return orig(self, eager)

    # Big enough that the persisted edge cache's (accurate) statistics
    # exceed autoBroadcastJoinThreshold — at toy sizes the planner
    # broadcasts the cached EDGE side outright, which is not the shape
    # a 100 TB graph runs (there the edge side never fits).
    n_edges = int(os.environ.get("CAPTURE_EDGES", 2_000_000))
    n_nodes = max(800, n_edges // 10)
    e = spark.range(n_edges).select(
        F.pmod(F.col("id"), F.lit(n_nodes)).alias("src"),
        F.pmod(F.xxhash64("id"), F.lit(n_nodes)).alias("dst"),
    )
    CDF.localCheckpoint = hooked
    try:
        if op == "pagerank":
            from blueetl_spark.operators.graph import pagerank

            pagerank(
                e, max_iter=3, tol=0.0, broadcast_ranks=False,
                edge_cache=layout,
            ).write.format("noop").mode("overwrite").save()
        elif op == "bfs_hops":
            from blueetl_spark.operators.graph import bfs_hops

            bfs_hops(
                e, spark.range(10), max_hops=3,
                broadcast_frontier=False, edge_cache=layout,
            ).write.format("noop").mode("overwrite").save()
        elif op == "shortest_paths":
            from blueetl_spark.operators.graph import shortest_paths

            shortest_paths(
                e.withColumn("weight", F.lit(1.0)), spark.range(10),
                rounds=3, broadcast_dist=False, edge_cache=layout,
            ).write.format("noop").mode("overwrite").save()
        elif op == "components":
            from blueetl_spark.operators.dedup import connected_components

            connected_components(
                e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
                .filter("a != b"),
                "a", "b", max_driver_edges=0, broadcast_max_labels=0,
                edge_cache=layout,
            ).write.format("noop").mode("overwrite").save()
        else:
            raise SystemExit(f"unknown op {op}")
    finally:
        CDF.localCheckpoint = orig

    path = os.path.join(out_dir, f"{op}_iter_{mode}.txt")
    with open(path, "w") as fh:
        for i, d in enumerate(dumps):
            fh.write(f"=== checkpointed frame {i} ===\n{d}\n")
    # quick shape summary to stderr
    import re

    for i, d in enumerate(dumps):
        ex = len(re.findall(r"\bExchange\b", d))
        so = len(re.findall(r"\(\d+\) Sort\b", d))
        smj = len(re.findall(r"SortMergeJoin", d))
        bhj = len(re.findall(r"BroadcastHashJoin", d))
        imts = len(re.findall(r"InMemoryTableScan", d))
        print(
            f"# frame {i}: Exchange={ex} Sort={so} SMJ={smj} BHJ={bhj} "
            f"InMemoryTableScan={imts}",
            file=sys.stderr,
        )
    print(path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
