"""Distributed Pareto frontier (skyline) operator.

"Which parts are not beaten on BOTH price and size by any other part" —
the multi-objective selection step (data valuation, config sweeps,
quality/cost trade curves) that SQL expresses as a quadratic
``NOT EXISTS`` anti self-join.

Scale design — the classic two-level reduction, sound because
dominance is transitive:

1. **Local frontiers** (``mapInPandas``, Arrow): each partition
   computes its own skyline. Every global skyline point survives its
   partition's local pass (nothing outside the partition is consulted,
   and a local dominator would also dominate globally), so the union of
   local frontiers is a superset of the answer. A partition's skyline
   is typically orders of magnitude smaller than the partition —
   frontier size grows ~log^(d-1)(n) for independent dims.
2. **Global frontier**: the surviving candidates collapse to ONE
   partition (size-gated: the candidate count is measured first and a
   too-big frontier raises with the bound to tune, never OOMs an
   executor) and the same kernel runs once more.

The kernel is a vectorized two-pass numpy filter: a sorted sweep drops
most dominated rows in O(n·|frontier|), then an exact pairwise pass
over the survivors removes any equal-first-dim stragglers — no
Python-per-row work, no UDF registration.

Duplicate rows: points equal on every objective do not STRICTLY
dominate each other, so all copies are kept — matching the SQL
``NOT EXISTS`` semantics the oracle replays.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _frontier_mask(x: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the Pareto frontier of ``x`` (rows =
    points, all objectives MINIMIZED). Strict dominance: q dominates p
    iff q <= p everywhere and q < p somewhere.

    Exactness: rows are swept in lexicographic order, where every
    dominator precedes the points it dominates (<= on the first
    objective; on a tie, <= on the next, ...; all-equal points don't
    strictly dominate). So filtering each chunk against the
    already-kept frontier plus one pairwise pass WITHIN the chunk is
    exact — by induction a dominated point always meets a kept
    dominator (transitivity covers dominators that were themselves
    dominated). Vectorized in chunks sized to a fixed comparison
    budget; no per-row Python work.
    """
    n, d = x.shape
    if n <= 1:
        return np.ones(n, dtype=bool)
    order = np.lexsort(x.T[::-1])  # by first objective, then the rest
    keep = np.zeros(n, dtype=bool)
    kept = np.empty((0, d), dtype=np.float64)
    budget = 32_000_000  # pairwise comparisons per chunk step
    s = 0
    while s < n:
        chunk = int(max(64, min(4096, budget // max(len(kept), 1))))
        idx = order[s : s + chunk]
        s += len(idx)
        c = x[idx]
        if len(kept):
            alive = np.ones(len(c), dtype=bool)
            blk = max(1, budget // max(len(c) * d, 1))
            for ks in range(0, len(kept), blk):
                kb = kept[ks : ks + blk]
                le = np.all(kb[:, None, :] <= c[None, :, :], axis=2)
                lt = np.any(kb[:, None, :] < c[None, :, :], axis=2)
                alive &= ~np.any(le & lt, axis=0)
            c, idx = c[alive], idx[alive]
        m = len(c)
        if not m:
            continue
        le = np.all(c[:, None, :] <= c[None, :, :], axis=2)
        lt = np.any(c[:, None, :] < c[None, :, :], axis=2)
        dom = np.any(le & lt, axis=0)
        keep[idx[~dom]] = True
        kept = np.concatenate([kept, c[~dom]], axis=0)
    return keep


def pareto_frontier(
    df: DataFrame,
    minimize: Sequence[str] = (),
    maximize: Sequence[str] = (),
    max_candidate_rows: int = 2_000_000,
) -> DataFrame:
    """Rows of ``df`` not strictly dominated on the given objectives
    (``minimize`` lower-is-better, ``maximize`` higher-is-better).
    All original columns pass through; rows with a NULL objective are
    excluded (dominance is undefined for them), as in the SQL replay.
    """
    minimize, maximize = list(minimize), list(maximize)
    cols = minimize + maximize
    if not cols:
        raise ValueError("need at least one objective column")
    clean = df
    for c in cols:
        clean = clean.filter(F.col(c).isNotNull())
    out_schema = clean.schema
    obj = [(c, 1.0) for c in minimize] + [(c, -1.0) for c in maximize]

    def local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = list(batches)
        if not parts:  # empty partition
            return
        pdf = pd.concat(parts, ignore_index=True)
        if not len(pdf):
            return
        x = np.column_stack(
            [pdf[c].to_numpy(dtype=np.float64) * s for c, s in obj]
        )
        yield pdf[_frontier_mask(x)]

    candidates = clean.mapInPandas(local, out_schema).localCheckpoint(eager=True)
    n_cand = candidates.count()
    if n_cand > max_candidate_rows:
        raise ValueError(
            f"{n_cand} local-frontier candidates exceed max_candidate_rows="
            f"{max_candidate_rows}; the objectives are too anti-correlated "
            "for a single-partition global pass — raise the bound or reduce "
            "dimensionality"
        )
    return candidates.repartition(1).mapInPandas(local, out_schema)
