"""Calibrated 5-rep probe of pareto_parts at sf0.1 (VERDICT r11 #1).

Protocol = the r11 class_index protocol (commit 9dfa5df): host calib
before/after, 5 isolated reps with the bench's clearCache+gc barrier,
per-rep load note (1-min loadavg).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from blueetl_spark.queries import QUERIES
from blueetl_spark.session import get_spark


def calib(spark):
    t0 = time.perf_counter()
    spark.range(20_000_000).select(
        F.pmod(F.xxhash64("id"), F.lit(1000)).alias("k")
    ).groupBy("k").count().collect()
    return round(time.perf_counter() - t0, 3)


def barrier(spark):
    import gc

    spark.catalog.clearCache()
    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass
    time.sleep(0.5)


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "pareto_parts"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="probe")
    # warm the input table
    from blueetl_spark.sources import tables

    tables.load(spark, sf_dir, "part").count()
    calib_before = min(calib(spark) for _ in range(2))
    reps = []
    for i in range(5):
        load1 = os.getloadavg()[0]
        rep_calib = calib(spark)  # per-rep load label (VERDICT r12 #2)
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        reps.append({
            "wall_s": dt,
            "calib": rep_calib,
            "loadavg_1m_at_start": round(load1, 1),
        })
        barrier(spark)
    calib_after = min(calib(spark) for _ in range(2))
    print(json.dumps({
        "query": name,
        "sf_dir": sf_dir,
        "calib_before": calib_before,
        "calib_after": calib_after,
        "reps": reps,
        "min": min(r["wall_s"] for r in reps),
        "median": sorted(r["wall_s"] for r in reps)[2],
    }, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
