"""Stage profile of the knn_ivf_fixed gate (VERDICT r13 next-round #4):
time the three stages (flat path / index build / persisted-path search)
separately at $SPARK_GRAFT_SF_DIR, and dump the search plan to verify the
probed-cell filter prunes at the assignments scan (PartitionFilters).

    python tools/probe_ivf_stages.py [n_reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from blueetl_spark.session import get_spark


def main() -> int:
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="probe_ivf_stages")

    from blueetl_spark.operators import similarity
    from blueetl_spark.queries import (
        IVF_FIXED_CENTROIDS,
        IVF_FIXED_PROBE,
        KNN_K,
        KNN_QUERY_MAX_ID,
    )
    from blueetl_spark.sources import tables

    emb = tables.load(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < KNN_QUERY_MAX_ID)

    def timed(name, thunk, out):
        walls = []
        for _ in range(n_reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            thunk()
            walls.append(round(time.perf_counter() - t0, 3))
        out[name] = {"walls": walls, "min": min(walls)}
        print(f"# {name}: {walls}", file=sys.stderr, flush=True)

    out: dict = {}
    timed(
        "cents_collect",
        lambda: emb.filter(F.col("vec_id") < IVF_FIXED_CENTROIDS)
        .orderBy("vec_id")
        .collect(),
        out,
    )
    cents = [
        r.embedding
        for r in emb.filter(F.col("vec_id") < IVF_FIXED_CENTROIDS)
        .orderBy("vec_id")
        .collect()
    ]
    timed(
        "flat_path",
        lambda: similarity.knn_ivf(
            queries_df, emb, k=KNN_K, n_centroids=IVF_FIXED_CENTROIDS,
            n_probe=IVF_FIXED_PROBE, centroids=cents,
        ).write.format("noop").mode("overwrite").save(),
        out,
    )

    idx = tempfile.mkdtemp(prefix="ivf_probe_")
    try:
        timed(
            "build_index",
            lambda: similarity.build_ivf_index(emb, idx, centroids=cents),
            out,
        )
        timed(
            "search_index",
            lambda: similarity.search_ivf_index(
                spark, queries_df, idx, k=KNN_K, n_probe=IVF_FIXED_PROBE
            ).write.format("noop").mode("overwrite").save(),
            out,
        )
        # plan: does the probed-cell filter reach the assignments scan?
        sdf = similarity.search_ivf_index(
            spark, queries_df, idx, k=KNN_K, n_probe=IVF_FIXED_PROBE
        )
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = sdf._jdf.queryExecution().explainString(mode)
        out_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans",
            os.environ.get("SPARK_GRAFT_PLANS_DIR", "r14"),
        )
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "ivf_search_plan.txt"), "w") as fh:
            fh.write(plan)
        out["search_plan_partition_filters"] = [
            line.strip()
            for line in plan.splitlines()
            if "PartitionFilters" in line
        ]
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    print(json.dumps(out, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
