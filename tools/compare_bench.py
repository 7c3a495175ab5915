"""Cross-round bench comparison on the CANONICAL accepted-min basis
(PLANS.md round-13 definition): per-query ratios over the intersection
of two records' `queries` maps, median/quartiles, calib context, and
the queries beyond a flag threshold.

    python tools/compare_bench.py BENCH_LOCAL_r12.json /tmp/bench_r13.json
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    prev_p, cur_p = sys.argv[1], sys.argv[2]
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    prev, cur = json.load(open(prev_p)), json.load(open(cur_p))
    pq, cq = prev.get("queries", {}), cur.get("queries", {})
    shared = sorted(set(pq) & set(cq))
    ratios = {n: cq[n] / pq[n] for n in shared if pq[n] > 0}
    vals = sorted(ratios.values())
    med = statistics.median(vals)
    out = {
        "shared": len(shared),
        "median_ratio": round(med, 3),
        "q1": round(vals[len(vals) // 4], 3),
        "q3": round(vals[3 * len(vals) // 4], 3),
        "prev_calib": prev.get("host_calib_s"),
        "cur_calib": cur.get("host_calib_s"),
        "prev_calib_median": prev.get("calib_median"),
        "cur_calib_median": cur.get("calib_median"),
        "total_prev": round(sum(pq[n] for n in shared), 2),
        "total_cur": round(sum(cq[n] for n in shared), 2),
        "flagged": {
            n: {"prev": pq[n], "cur": cq[n], "ratio": round(r, 2)}
            for n, r in sorted(ratios.items(), key=lambda kv: -kv[1])
            if r > flag
        },
        "improved": {
            n: round(r, 2)
            for n, r in sorted(ratios.items(), key=lambda kv: kv[1])[:8]
        },
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
