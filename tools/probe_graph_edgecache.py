"""Matched-calib A/B for the iterative-graph edge-cache layout above the
broadcast bound (VERDICT r13 next-round #3): the 20M-edge stress graph
(replicated byte-for-byte from bench.py's run_stress) run with the
broadcast gate forced OFF — the regime a 100 TB graph actually runs in —
comparing the legacy per-round-exchange shape (edge_cache=False) against
the partitioned+sorted persisted edge layout (edge_cache=True).

    python tools/probe_graph_edgecache.py <op> <legacy|layout> [n_reps] [calib_bar]

ops: pagerank | shortest_paths | bfs_hops | components
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from blueetl_spark.session import get_spark

N_EVENTS = 20_000_000
G_NODES = 2_000_000


def calib(spark) -> float:
    t0 = time.perf_counter()
    spark.range(20_000_000).select(
        F.pmod(F.xxhash64("id"), F.lit(1000)).alias("k")
    ).groupBy("k").count().collect()
    return round(time.perf_counter() - t0, 3)


def calib_mc(spark) -> float:
    """Parallel probe (one task per core): the single-core probe is
    blind to multi-core co-tenant load (VERDICT r13 #1) — this probe's
    wall rises with the host run-queue. ~0.3-0.4 s idle at 32 cores."""
    cores = spark.sparkContext.defaultParallelism
    t0 = time.perf_counter()
    spark.range(0, cores * 8_000_000, 1, cores).select(
        F.expr("bit_xor(xxhash64(id))")
    ).collect()
    return round(time.perf_counter() - t0, 3)


def barrier(spark) -> None:
    import gc

    spark.catalog.clearCache()
    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:  # noqa: BLE001
        pass
    time.sleep(0.5)


def stress_edges(spark):
    return spark.range(N_EVENTS).select(
        F.pmod(F.col("id"), F.lit(G_NODES)).alias("src"),
        F.pmod(F.xxhash64("id"), F.lit(G_NODES)).alias("dst"),
    ).unionAll(
        spark.range(100_000).select(
            F.lit(0).cast("long").alias("src"),
            F.pmod(F.xxhash64(F.col("id") + 7), F.lit(G_NODES)).alias("dst"),
        )
    )


def thunk_pagerank(spark, layout: bool):
    from blueetl_spark.operators.graph import pagerank

    e = stress_edges(spark)
    return lambda: pagerank(
        e, max_iter=5, tol=0.0, broadcast_ranks=False, edge_cache=layout
    ).write.format("noop").mode("overwrite").save()


def thunk_shortest_paths(spark, layout: bool):
    from blueetl_spark.operators.graph import shortest_paths

    e = stress_edges(spark).select(
        "src", "dst", (F.pmod(F.xxhash64("src", "dst"), F.lit(100)) + 1)
        .cast("double").alias("weight")
    )
    srcs = spark.range(1000).select(F.col("id"))
    return lambda: shortest_paths(
        e, srcs, rounds=4, broadcast_dist=False, edge_cache=layout
    ).write.format("noop").mode("overwrite").save()


def thunk_bfs_hops(spark, layout: bool):
    from blueetl_spark.operators.graph import bfs_hops

    e = stress_edges(spark)
    srcs = spark.range(1000).select(F.col("id"))
    return lambda: bfs_hops(
        e, srcs, max_hops=4, broadcast_frontier=False, edge_cache=layout
    ).write.format("noop").mode("overwrite").save()


def thunk_components(spark, layout: bool):
    from blueetl_spark.operators.dedup import connected_components

    e = stress_edges(spark).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    return lambda: connected_components(
        e, "a", "b", max_driver_edges=0, broadcast_max_labels=0,
        edge_cache=layout,
    ).write.format("noop").mode("overwrite").save()


THUNKS = {
    "pagerank": thunk_pagerank,
    "shortest_paths": thunk_shortest_paths,
    "bfs_hops": thunk_bfs_hops,
    "components": thunk_components,
}


def main() -> None:
    op = sys.argv[1]
    mode = sys.argv[2]
    n_reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    bar = float(sys.argv[4]) if len(sys.argv) > 4 else 0.47
    budget_s = float(os.environ.get("PROBE_BUDGET_S", 2400))
    spark = get_spark(app_name=f"probe_edgecache_{op}_{mode}")
    thunk = THUNKS[op](spark, mode == "layout")

    thunk()  # unmeasured warm-up (codegen; the record's min rides later reps)
    barrier(spark)

    bar_mc = float(os.environ.get("PROBE_MC_BAR", 0.6))
    reps, skipped = [], 0
    t_start = time.perf_counter()
    while len(reps) < n_reps and time.perf_counter() - t_start < budget_s:
        c = calib(spark)
        cm = calib_mc(spark)
        if c > bar or cm > bar_mc:
            skipped += 1
            print(
                f"# calib {c} (bar {bar}) / mc {cm} (bar {bar_mc}), waiting",
                file=sys.stderr, flush=True,
            )
            time.sleep(3)
            continue
        t0 = time.perf_counter()
        thunk()
        dt = round(time.perf_counter() - t0, 3)
        reps.append({"wall_s": dt, "calib": c, "calib_mc": cm,
                     "loadavg_1m": round(os.getloadavg()[0], 1)})
        print(f"# rep {len(reps)}: {dt}s at calib {c} / mc {cm}",
              file=sys.stderr, flush=True)
        barrier(spark)
    print(json.dumps({
        "op": op,
        "mode": mode,
        "calib_bar": bar,
        "reps": reps,
        "spiked_probes_waited_out": skipped,
        "min": min((r["wall_s"] for r in reps), default=None),
        "median": sorted(r["wall_s"] for r in reps)[len(reps) // 2]
        if reps else None,
    }, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
