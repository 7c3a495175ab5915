"""As-of join stress: deep per-key history, no pair blow-up (PLANS.md).

Usage: python tools/stress_asof.py [n_left] [n_right] [n_keys]

A naive range-join encoding of as-of (equi-key AND l.t >= r.t, then
max-per-left-row) builds (left_per_key × right_per_key) candidate pairs
per key before collapsing; this script shows `asof_join` holds the
union-window shape — output rows == left rows — and reports wall time.
Defaults reproduce the PLANS.md figure: 20M × 2M over 100k keys
(≈400M intermediate pairs for the naive plan, 22M union rows here).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    n_left = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_right = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    n_keys = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000

    from blueetl_spark.operators import timeseries as ts
    from blueetl_spark.session import get_spark

    spark = get_spark(app_name="stress_asof")
    left = spark.range(n_left).select(
        (F.col("id") % n_keys).alias("gid"),
        (F.xxhash64("id") % 1_000_000_000 / 1000.0).alias("time"),
    )
    right = spark.range(n_right).select(
        (F.col("id") % n_keys).alias("gid"),
        (F.xxhash64("id", F.lit(1)) % 1_000_000_000 / 1000.0).alias("time"),
        F.rand(7).alias("v"),
    )
    t0 = time.perf_counter()
    res = ts.asof_join(left, right, on="time", by=["gid"])
    res.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    n_out = res.count()
    n_matched = res.filter(F.col("time_asof").isNotNull()).count()
    print(
        f"asof_join left={n_left:,} right={n_right:,} keys={n_keys:,}: "
        f"{dt:.1f}s wall, {n_out:,} rows out (== left), {n_matched:,} matched"
    )
    assert n_out == n_left, "as-of join must never change left cardinality"
    spark.stop()


if __name__ == "__main__":
    main()
