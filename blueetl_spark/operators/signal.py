"""Signal-analysis features: PSD, pairwise correlation, complexity PDF,
spike-train distances.

Reference semantics (SURVEY §2.4 A18-A21):

- PSD via Welch over the per-class concatenated spike train
  (``/root/reference/src/blueetl/external/bluecv/neuron_class.py:38-44``).
- Pairwise binned spike-train correlation, upper triangle
  (``neuron_class.py:47-49``).
- Complexity PDF — population synchrony histogram
  (``neuron_class.py:52-55``).
- van Rossum / Victor-Purpura distances between two trains
  (``/root/reference/src/blueetl/external/bluecv/comparison.py:11-21``).

Spark-first split: correlation and complexity are pure DataFrame
aggregations (JVM-side, map-side combinable, one or two shuffles — they
scale to any report size). PSD and the spike-train distances need FFT /
dynamic programming, so they run as ``applyInPandas`` over *per-group
aggregates* (a PSTH vector or a pair of spike-time arrays) — the Arrow
batch is bounded by window duration / train length, never by the event
count. scipy is absent from the runtime image; the numerics are
numpy-only re-implementations.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blueetl_spark.operators.features import GROUP_KEYS, _window_meta


def binned_counts(
    report: DataFrame,
    windows: DataFrame,
    bin_size: float,
    per_gid: bool = True,
    per_trial: bool = False,
) -> DataFrame:
    """Sparse per-bin spike counts: (group keys[, gid][, trial], bin, n).

    ``bin = floor((time - t_start)/bin_size)`` clamped into
    ``[0, n_bins-1]`` — one scan, one map-side-combined shuffle.
    """
    keys = [*GROUP_KEYS] + (["gid"] if per_gid else []) + (
        ["trial"] if per_trial else []
    )
    meta = _window_meta(windows)
    return (
        report.join(F.broadcast(meta), ["simulation_id", "window"])
        .withColumn("n_bins", F.ceil(F.col("duration") / F.lit(bin_size)).cast("long"))
        .withColumn(
            "bin",
            F.least(
                F.floor((F.col("time") - F.col("t_start")) / F.lit(bin_size)),
                F.col("n_bins") - 1,
            ).cast("long"),
        )
        .groupBy(*keys, "bin")
        .agg(F.count("*").alias("n"))
    )


def pairwise_correlation(
    report: DataFrame,
    windows: DataFrame,
    bin_size: float,
    persist_binned: bool = True,
) -> DataFrame:
    """Pearson correlation of binned spike trains for every gid pair within
    a group (A19) — fully JVM-side, no pivot, no Python.

    The dense-vector correlation (zero bins included) is computed from
    sparse sums:

    ``corr = (B·Σxy − Σx·Σy) / sqrt((B·Σx² − (Σx)²)(B·Σy² − (Σy)²))``

    where B = total bin count. Σx, Σx² come from each gid's sparse bins
    (zeros contribute nothing); Σxy comes from the self-join on (group,
    bin), which only touches bins where *both* trains are nonzero. At
    scale the join key (group, bin) spreads pairs across the cluster;
    no per-group matrix is ever materialized.

    Multi-trial windows: trials are POOLED into the window's ``n_bins``
    bins (each gid's vector is its trial-summed PSTH), with B = n_bins —
    i.e. this correlates trial-averaged responses. To correlate trials
    as separate segments, pre-split the window into per-trial windows
    (``binned_counts(per_trial=True)`` carries the key).

    Output: (group keys, gid_a, gid_b, corr), gid_a < gid_b.

    ``persist_binned`` pins the post-aggregation binned counts (size =
    active gids × occupied bins — orders of magnitude below the event
    table), because the plan references them three times (per-gid sums +
    both sides of the pair join); without it the event scan and first
    shuffle run three times. The pin is an eager localCheckpoint, not a
    persist: blocks are reaped on GC, so repeated calls leak nothing and
    the caller has no unpersist obligation (the old private ``_binned``
    handle was the ADVICE r5 leak class).
    """
    b = binned_counts(report, windows, bin_size, per_gid=True)
    if persist_binned:
        b = b.localCheckpoint(eager=True)
    meta = _window_meta(windows).withColumn(
        "n_bins", F.ceil(F.col("duration") / F.lit(bin_size)).cast("long")
    )
    sums = b.groupBy(*GROUP_KEYS, "gid").agg(
        F.sum("n").alias("sx"), F.sum(F.col("n") * F.col("n")).alias("sxx")
    )
    left = b.select(
        *GROUP_KEYS, "bin", F.col("gid").alias("gid_a"), F.col("n").alias("na")
    )
    right = b.select(
        *GROUP_KEYS, "bin", F.col("gid").alias("gid_b"), F.col("n").alias("nb")
    )
    sxy = (
        left.join(right, [*GROUP_KEYS, "bin"])
        .filter(F.col("gid_a") < F.col("gid_b"))
        .groupBy(*GROUP_KEYS, "gid_a", "gid_b")
        .agg(F.sum(F.col("na") * F.col("nb")).alias("sxy"))
    )
    sa = sums.select(
        *GROUP_KEYS,
        F.col("gid").alias("gid_a"),
        F.col("sx").alias("sx_a"),
        F.col("sxx").alias("sxx_a"),
    )
    sb = sums.select(
        *GROUP_KEYS,
        F.col("gid").alias("gid_b"),
        F.col("sx").alias("sx_b"),
        F.col("sxx").alias("sxx_b"),
    )
    num = F.col("n_bins") * F.col("sxy") - F.col("sx_a") * F.col("sx_b")
    var_a = F.col("n_bins") * F.col("sxx_a") - F.col("sx_a") ** 2
    var_b = F.col("n_bins") * F.col("sxx_b") - F.col("sx_b") ** 2
    # Pair universe from the per-gid sums table, NOT from sxy: two trains
    # whose occupied bins are disjoint have no (group, bin) join row, but
    # their correlation is well-defined (and negative: sxy = 0) — an
    # inner base would silently drop exactly the most anti-correlated
    # pairs. The cross join within a group is the output's own
    # cardinality (all-pairs is inherently O(active gids²) per group).
    out = (
        sa.join(sb, [*GROUP_KEYS])
        .filter(F.col("gid_a") < F.col("gid_b"))
        .join(sxy, [*GROUP_KEYS, "gid_a", "gid_b"], "left")
        .withColumn("sxy", F.coalesce(F.col("sxy"), F.lit(0)))
        .join(F.broadcast(meta.select("simulation_id", "window", "n_bins")),
              ["simulation_id", "window"])
        .withColumn(
            "corr",
            F.when(
                (var_a > 0) & (var_b > 0), num / F.sqrt(var_a * var_b)
            ),
        )
        .select(*GROUP_KEYS, "gid_a", "gid_b", "corr")
    )
    return out


def complexity_pdf(
    report: DataFrame, windows: DataFrame, bin_size: float
) -> DataFrame:
    """Population-synchrony PDF (A20): per group, the distribution of the
    number of *distinct neurons* spiking in the same time bin.

    Two map-side-combinable shuffles: (group, trial, bin) → complexity,
    then (group, complexity) → bin count. A neuron counts once per
    (trial, bin) regardless of how many spikes it fired there (elephant's
    binarized-spiketrain semantics). Empty bins contribute complexity-0
    mass: ``P(0) = (B − #nonzero bins) / B`` with ``B = n_bins ×
    n_trials``, so the PDF sums to 1.
    """
    per_bin = (
        binned_counts(report, windows, bin_size, per_gid=True, per_trial=True)
        .groupBy(*GROUP_KEYS, "trial", "bin")
        .agg(F.count("*").alias("complexity"))  # distinct gids: input is per-gid rows
    )
    meta = _window_meta(windows).withColumn(
        "n_bins",
        F.ceil(F.col("duration") / F.lit(bin_size)).cast("long")
        * F.col("n_trials"),
    )
    occupied = per_bin.groupBy(*GROUP_KEYS, "complexity").agg(
        F.count("*").alias("n_occurrences")
    ).localCheckpoint(eager=True)
    # occupied-bin total per group — derived from the (tiny, pinned)
    # occupied aggregate, NOT from per_bin. The pin matters: occupied
    # feeds BOTH the zero-mass branch and the final union, and without
    # it the whole events pipeline plans twice (AQE reuses some of the
    # duplicated exchanges at runtime but not the map stages — measured
    # r13: cold floor 3.13 -> 2.28 s at sf0.1 with the pin).
    totals = occupied.groupBy(*GROUP_KEYS).agg(
        F.sum("n_occurrences").alias("n_nonzero")
    )
    zero_rows = (
        totals.join(
            F.broadcast(meta.select("simulation_id", "window", "n_bins")),
            ["simulation_id", "window"],
        )
        .select(
            *GROUP_KEYS,
            F.lit(0).cast("long").alias("complexity"),
            (F.col("n_bins") - F.col("n_nonzero")).alias("n_occurrences"),
        )
        .filter(F.col("n_occurrences") > 0)
    )
    return (
        occupied.unionByName(zero_rows)
        .join(
            F.broadcast(meta.select("simulation_id", "window", "n_bins")),
            ["simulation_id", "window"],
        )
        .select(
            *GROUP_KEYS,
            "complexity",
            "n_occurrences",
            (F.col("n_occurrences") / F.col("n_bins")).alias("probability"),
        )
    )


def _welch_psd(x: np.ndarray, fs: float, nperseg: int) -> tuple[np.ndarray, np.ndarray]:
    """Welch PSD, numpy-only: Hann window, 50% overlap, density scaling —
    matches ``scipy.signal.welch`` defaults for real input."""
    x = np.asarray(x, dtype=float)
    nperseg = int(min(nperseg, len(x)))
    if nperseg < 2:
        freqs = np.fft.rfftfreq(max(nperseg, 1), d=1.0 / fs)
        return freqs, np.zeros_like(freqs)
    step = nperseg - nperseg // 2  # scipy: nperseg - noverlap (exact for odd)
    window = np.hanning(nperseg)
    scale = 1.0 / (fs * (window * window).sum())
    n_seg = max((len(x) - nperseg) // step + 1, 1)
    acc = None
    for i in range(n_seg):
        seg = x[i * step : i * step + nperseg]
        seg = (seg - seg.mean()) * window  # detrend='constant'
        spec = np.abs(np.fft.rfft(seg)) ** 2 * scale
        acc = spec if acc is None else acc + spec
    psd = acc / n_seg
    if nperseg % 2 == 0:  # one-sided correction (all but DC and Nyquist)
        psd[1:-1] *= 2
    else:
        psd[1:] *= 2
    return np.fft.rfftfreq(nperseg, d=1.0 / fs), psd


def psd_welch(
    report: DataFrame,
    windows: DataFrame,
    bin_size: float = 1.0,
    nperseg: int = 256,
) -> DataFrame:
    """Welch power spectral density of each group's PSTH (A18).

    Stage 1 (JVM): sparse per-bin counts — the heavy reduction. Stage 2
    (Python, ``applyInPandas``): densify to the PSTH vector and FFT it.
    Each Arrow group is one histogram (≤ duration/bin_size values), so
    executor memory is bounded regardless of event count; ``fs`` is
    1000/bin_size Hz (times are in ms).
    """
    counts = binned_counts(report, windows, bin_size, per_gid=False)
    meta = _window_meta(windows).withColumn(
        "n_bins", F.ceil(F.col("duration") / F.lit(bin_size)).cast("long")
    )
    dense_in = counts.join(
        F.broadcast(meta.select("simulation_id", "window", "n_bins")),
        ["simulation_id", "window"],
    )
    fs = 1000.0 / bin_size
    schema = (
        "simulation_id smallint, circuit_id smallint, neuron_class string, "
        "window string, freq double, psd double"
    )

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        n_bins = int(pdf["n_bins"].iloc[0])
        x = np.zeros(n_bins)
        x[pdf["bin"].to_numpy(int)] = pdf["n"].to_numpy(float)
        freqs, psd = _welch_psd(x, fs=fs, nperseg=nperseg)
        out = pd.DataFrame({"freq": freqs, "psd": psd})
        for k in GROUP_KEYS:
            out[k] = pdf[k].iloc[0]
        return out[[*GROUP_KEYS, "freq", "psd"]]

    return dense_in.groupBy(*GROUP_KEYS).applyInPandas(per_group, schema)


def _van_rossum(a: np.ndarray, b: np.ndarray, tau: float) -> float:
    """van Rossum distance with exponential kernel, closed form:

    D² = Σᵢⱼ e^(−|aᵢ−aⱼ|/τ)/2 + Σᵢⱼ e^(−|bᵢ−bⱼ|/τ)/2 − Σᵢⱼ e^(−|aᵢ−bⱼ|/τ)
    """

    def k(x: np.ndarray, y: np.ndarray) -> float:
        if len(x) == 0 or len(y) == 0:
            return 0.0
        return float(np.exp(-np.abs(x[:, None] - y[None, :]) / tau).sum())

    d2 = 0.5 * k(a, a) + 0.5 * k(b, b) - k(a, b)
    return float(np.sqrt(max(d2, 0.0)))


def _victor_purpura(a: np.ndarray, b: np.ndarray, q: float) -> float:
    """Victor-Purpura spike-time distance via the standard O(n·m) DP:
    cost 1 to add/delete a spike, ``q·|Δt|`` to move one."""
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return float(n + m)
    prev = np.arange(m + 1, dtype=float)
    for i in range(1, n + 1):
        cur = np.empty(m + 1)
        cur[0] = i
        for j in range(1, m + 1):
            cur[j] = min(
                prev[j] + 1.0,
                cur[j - 1] + 1.0,
                prev[j - 1] + q * abs(a[i - 1] - b[j - 1]),
            )
        prev = cur
    return float(prev[m])


def spike_train_distances(
    report: DataFrame,
    pairs: DataFrame,
    tau: float = 10.0,
    q: float = 0.1,
    max_spikes: int | None = None,
) -> DataFrame:
    """van Rossum + Victor-Purpura distances for requested gid pairs (A21).

    ``pairs``: (gid_a, gid_b) — the pair list is an explicit input because
    all-pairs is O(n²); produce it from LSH/correlation candidates or a
    class sample. Trains are gathered per (group, gid) with
    ``sort_array(collect_list(time))`` (JVM), the pair join is broadcast
    when small, and only the DP/kernel math runs in Python per pair.

    ``max_spikes`` truncates each sorted train to its first N spikes —
    bounds the O(n·m) DP per pair, and is what makes the
    ``spike_distances_fixed`` oracle twin cheap to recompute in SQL.

    Pair universe: a pair is evaluated in every window of a (simulation,
    circuit, class) where **both gids belong** — membership inferred as
    "fired in at least one of the group's windows" (the operator has no
    membership table). A gid silent in one window but active in another
    gets the defined empty-train distances there (VP = other train's
    length, vR = √(k(a,a)/2)) instead of silently vanishing; gids from
    different classes are never paired (no cross-class junk rows).
    """
    times_expr = F.sort_array(F.collect_list("time"))
    if max_spikes is not None:
        times_expr = F.slice(times_expr, 1, max_spikes)
    # Pinned: trains feeds FOUR consumers (window universe, class
    # membership — itself joined on both pair sides — and both train
    # attach sides), so without the pin the report scan + sort-collect
    # aggregate plans and executes ~6x (r13: 20 scans in the fixed
    # gate's plan). (group, gid)-grain — the operator's natural
    # materialization size.
    trains = (
        report.groupBy(*GROUP_KEYS, "gid")
        .agg(times_expr.alias("times"))
        .localCheckpoint(eager=True)
    )
    class_keys = [k for k in GROUP_KEYS if k != "window"]
    member = trains.select(*class_keys, "gid").distinct()
    wins = trains.select(*GROUP_KEYS).distinct()
    univ = (
        wins.join(
            member.select(*class_keys, F.col("gid").alias("gid_a")), class_keys
        )
        .join(F.broadcast(pairs), ["gid_a"])
        .join(
            member.select(*class_keys, F.col("gid").alias("gid_b")),
            [*class_keys, "gid_b"],
        )
    )
    ta = trains.select(
        *GROUP_KEYS, F.col("gid").alias("gid_a"), F.col("times").alias("times_a")
    )
    tb = trains.select(
        *GROUP_KEYS, F.col("gid").alias("gid_b"), F.col("times").alias("times_b")
    )
    empty = F.array().cast("array<double>")
    joined = (
        univ.join(ta, [*GROUP_KEYS, "gid_a"], "left")
        .join(tb, [*GROUP_KEYS, "gid_b"], "left")
        .withColumn("times_a", F.coalesce("times_a", empty))
        .withColumn("times_b", F.coalesce("times_b", empty))
    )
    schema = (
        "simulation_id smallint, circuit_id smallint, neuron_class string, "
        "window string, gid_a bigint, gid_b bigint, "
        "van_rossum double, victor_purpura double"
    )

    def per_batch(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                a = np.asarray(r.times_a, dtype=float)
                b = np.asarray(r.times_b, dtype=float)
                rows.append(
                    (
                        r.simulation_id, r.circuit_id, r.neuron_class, r.window,
                        r.gid_a, r.gid_b,
                        _van_rossum(a, b, tau), _victor_purpura(a, b, q),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    *GROUP_KEYS, "gid_a", "gid_b", "van_rossum", "victor_purpura"
                ],
            )

    return joined.mapInPandas(per_batch, schema)
