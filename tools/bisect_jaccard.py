"""One-off bisect harness for the r4 jaccard_pairs bench regression.

Replays the bench.py measurement protocol (warm-up table scan, pass-1
cold+warm reps, clearCache after each query's samples, interleaved later
passes) for jaccard_pairs plus two controls (token_stats as a cheap
baseline, minhash_lsh as a sibling shingle query), three full passes, and
prints per-pass samples so host-load spikes are visible individually.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NAMES = ["token_stats", "jaccard_pairs", "minhash_lsh"]


def main() -> None:
    from blueetl_spark.queries import QUERIES
    from blueetl_spark.session import get_spark
    from blueetl_spark.sources import tables

    spark = get_spark(app_name="bisect_jaccard")
    for t in tables.TABLES:
        try:
            tables.load(spark, SF_DIR, t).count()
        except Exception:  # noqa: BLE001
            pass

    samples: dict[str, list[float]] = {n: [] for n in NAMES}
    for _pass in range(3):
        for name in NAMES:
            for _rep in range(2 if _pass == 0 else 1):
                t0 = time.perf_counter()
                QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = round(time.perf_counter() - t0, 3)
                samples[name].append(dt)
                print(f"# pass{_pass} {name}: {dt}s", file=sys.stderr, flush=True)
            spark.catalog.clearCache()
    print(
        json.dumps(
            {
                "samples": samples,
                "best": {n: min(v) for n, v in samples.items()},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
