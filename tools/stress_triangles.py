"""Ad-hoc stress for degree-oriented triangle counting.

Synthetic graph: ~uniform random edges plus one deliberately hot hub
(100k-degree node 0) — the case where an unoriented wedge join would
generate 10^10 hub wedges. With orientation the hub contributes only
its out-side (≈ bounded by the degree order), so runtime tracks the
global wedge mass Σ out_deg², not the hub.

Usage: python tools/stress_triangles.py [n_edges] [n_nodes]
Round-7 record (local[32], box load ~6 — full suite running
concurrently): 2.1M edges / 50k nodes (avg deg ≈ 84, wedge mass ≈ 88M)
→ 40-48 s, 1,592,632 triangles, both reps identical.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    from pyspark.sql import functions as F

    from blueetl_spark.operators.graph import triangle_count
    from blueetl_spark.session import get_spark

    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_nodes = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    spark = get_spark(app_name="stress_triangles")
    base = spark.range(n_edges).select(
        F.pmod(F.col("id"), F.lit(n_nodes)).alias("src"),
        F.pmod(F.xxhash64("id"), F.lit(n_nodes)).alias("dst"),
    )
    hub = spark.range(100_000).select(
        F.lit(0).cast("long").alias("src"),
        F.pmod(F.xxhash64(F.col("id") + 7), F.lit(n_nodes)).alias("dst"),
    )
    edges = base.unionAll(hub)
    for rep in range(2):
        t0 = time.time()
        tot = triangle_count(edges, per_node=False).collect()[0]["triangles"]
        print(f"rep{rep}: {time.time() - t0:.2f}s triangles={tot}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
