"""Signal features (A18-A21): PSD, correlation, complexity, distances.

Each Spark result is cross-checked against an independent numpy
reference computation on the same tiny synthetic report.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from blueetl_spark.operators import signal

KEYS = dict(simulation_id=0, circuit_id=0, neuron_class="EXC", window="w")


@pytest.fixture(scope="module")
def report(spark):
    rows = []
    rng = np.random.default_rng(7)
    for gid in [1, 2, 3]:
        for trial in [0, 1]:
            times = np.sort(rng.uniform(0.0, 100.0, size=20))
            for t in times:
                rows.append((0, 0, "EXC", "w", int(trial), int(gid), float(t)))
    return spark.createDataFrame(
        rows,
        "simulation_id smallint, circuit_id smallint, neuron_class string, "
        "window string, trial smallint, gid bigint, time double",
    )


@pytest.fixture(scope="module")
def windows(spark):
    return spark.createDataFrame(
        [(0, 0, "w", 0, 0.0, 0.0, 100.0, 0.0, 100.0, ""),
         (0, 0, "w", 1, 0.0, 0.0, 100.0, 0.0, 100.0, "")],
        "simulation_id smallint, circuit_id smallint, window string, "
        "trial smallint, offset double, t_start double, t_stop double, "
        "t_step double, duration double, window_type string",
    )


def _dense(pdf, gid, n_bins, bin_size=10.0):
    x = np.zeros(n_bins)
    sub = pdf[pdf.gid == gid]
    for t in sub.time:
        x[min(int(t // bin_size), n_bins - 1)] += 1
    return x


def test_pairwise_correlation_matches_numpy(report, windows):
    out = signal.pairwise_correlation(report, windows, bin_size=10.0).toPandas()
    pdf = report.toPandas()
    for _, r in out.iterrows():
        a = _dense(pdf, r.gid_a, 10)
        b = _dense(pdf, r.gid_b, 10)
        expected = np.corrcoef(a, b)[0, 1]
        assert r["corr"] == pytest.approx(expected, abs=1e-9), (r.gid_a, r.gid_b)
    assert len(out) == 3  # (1,2), (1,3), (2,3)
    assert (out.gid_a < out.gid_b).all()


def test_complexity_pdf_sums_to_one(report, windows):
    out = signal.complexity_pdf(report, windows, bin_size=10.0).toPandas()
    assert out.probability.sum() == pytest.approx(1.0)
    # numpy reference: per (trial, bin), number of distinct gids
    pdf = report.toPandas()
    counts = {}
    for (trial, b), sub in pdf.assign(
        b=np.minimum((pdf.time // 10.0).astype(int), 9)
    ).groupby(["trial", "b"]):
        counts[(trial, b)] = sub.gid.nunique()
    total_bins = 10 * 2
    from collections import Counter

    c = Counter(counts.values())
    c[0] = total_bins - len(counts)
    for _, r in out.iterrows():
        assert r.n_occurrences == c[r.complexity], r.complexity
        assert r.probability == pytest.approx(c[r.complexity] / total_bins)


def test_psd_welch_matches_numpy(report, windows):
    out = signal.psd_welch(report, windows, bin_size=1.0, nperseg=64).toPandas()
    pdf = report.toPandas()
    x = np.zeros(100)
    for t in pdf.time:
        x[min(int(t), 99)] += 1
    freqs, expected = signal._welch_psd(x, fs=1000.0, nperseg=64)
    out = out.sort_values("freq").reset_index(drop=True)
    assert len(out) == len(freqs)
    np.testing.assert_allclose(out.freq.to_numpy(), freqs)
    np.testing.assert_allclose(out.psd.to_numpy(), expected, rtol=1e-9)


def test_welch_psd_of_sine_peaks_at_frequency():
    fs = 1000.0
    t = np.arange(0, 1.0, 1 / fs)
    x = np.sin(2 * np.pi * 50 * t)
    freqs, psd = signal._welch_psd(x, fs=fs, nperseg=256)
    assert freqs[np.argmax(psd)] == pytest.approx(50.0, abs=fs / 256)


def test_van_rossum_properties():
    a = np.array([10.0, 20.0, 30.0])
    assert signal._van_rossum(a, a, tau=5.0) == pytest.approx(0.0, abs=1e-9)
    d_near = signal._van_rossum(a, np.array([10.0, 20.0, 31.0]), tau=5.0)
    d_far = signal._van_rossum(a, np.array([10.0, 20.0, 80.0]), tau=5.0)
    assert 0 < d_near < d_far
    # one spike vs empty → distance sqrt(1/2)
    assert signal._van_rossum(
        np.array([5.0]), np.array([]), tau=5.0
    ) == pytest.approx(np.sqrt(0.5))


def test_victor_purpura_properties():
    a = np.array([10.0, 20.0])
    assert signal._victor_purpura(a, a, q=0.1) == 0.0
    # move one spike by 5 → cost q*5 = 0.5 (cheaper than delete+add = 2)
    assert signal._victor_purpura(a, np.array([10.0, 25.0]), q=0.1) == pytest.approx(0.5)
    # far move costs 2 (delete + add)
    assert signal._victor_purpura(a, np.array([10.0, 200.0]), q=0.1) == pytest.approx(2.0)
    assert signal._victor_purpura(a, np.array([]), q=0.1) == 2.0


def test_spike_train_distances(spark, report, windows):
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "gid_a bigint, gid_b bigint")
    out = signal.spike_train_distances(report, pairs, tau=5.0, q=0.1).toPandas()
    assert set(zip(out.gid_a, out.gid_b)) == {(1, 2), (1, 3)}
    pdf = report.toPandas()
    for _, r in out.iterrows():
        a = np.sort(pdf[pdf.gid == r.gid_a].time.to_numpy())
        b = np.sort(pdf[pdf.gid == r.gid_b].time.to_numpy())
        assert r.van_rossum == pytest.approx(signal._van_rossum(a, b, 5.0))
        assert r.victor_purpura == pytest.approx(signal._victor_purpura(a, b, 0.1))


def test_knn_ivf_with_kmeans_centroids(spark):
    """IVF with Spark-ML-trained centroids: output contract holds and
    recall vs bruteforce is reasonable on clustered data."""
    import numpy as np
    from blueetl_spark.operators import similarity as sim

    rng = np.random.default_rng(11)
    # 3 well-separated clusters in 8-d
    centers = rng.standard_normal((3, 8)) * 10
    vecs = [
        (i, (centers[i % 3] + rng.standard_normal(8) * 0.5).astype(float).tolist())
        for i in range(120)
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    cents = sim.train_centroids_kmeans(emb, n_centroids=3, seed=1)
    assert len(cents) == 3 and len(cents[0]) == 8

    queries = emb.filter("vec_id < 6")
    ivf = sim.knn_ivf(queries, emb, k=5, centroids=cents, n_probe=1)
    bf = sim.knn_bruteforce(queries, emb, k=5)
    ivf_p, bf_p = ivf.toPandas(), bf.toPandas()
    assert set(ivf_p.columns) == {"query_id", "neighbor_id", "cosine", "rank"}
    # same-cluster neighbors dominate -> single-probe recall should be high
    hits = len(
        set(zip(ivf_p.query_id, ivf_p.neighbor_id))
        & set(zip(bf_p.query_id, bf_p.neighbor_id))
    )
    assert hits / len(bf_p) > 0.8, hits


def test_correlation_includes_disjoint_bin_pairs(spark):
    """Two trains that never co-occupy a bin must still get their
    (negative) correlation — the pair universe comes from the sums
    table, not the bin self-join."""
    import pandas as pd
    from pyspark.sql import functions as F

    from blueetl_spark.operators import signal

    rows = []
    for t in (0.0, 10.0, 20.0):      # gid 1: bins 0-2
        rows.append((0, 0, "A", 1, t))
    for t in (30.0, 40.0, 50.0):     # gid 2: bins 3-5
        rows.append((0, 0, "A", 2, t))
    report = spark.createDataFrame(
        pd.DataFrame(rows, columns=[
            "simulation_id", "circuit_id", "neuron_class", "gid", "time",
        ])
    ).withColumn("window", F.lit("w")).withColumn("trial", F.lit(0))
    windows = spark.createDataFrame(
        [(0, "w", 0, 0.0, 0.0, 60.0, 60.0)],
        "simulation_id long, window string, trial long, offset double, "
        "t_start double, t_stop double, duration double",
    )
    out = signal.pairwise_correlation(report, windows, bin_size=10.0).toPandas()
    assert len(out) == 1
    assert out["corr"].iloc[0] < 0  # disjoint occupancy -> anti-correlated


def test_spike_distances_window_silent_member(spark):
    """A gid silent in one window but active in another stays in the pair
    universe with empty-train distances (VP = other train's length)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from blueetl_spark.operators import signal

    rows = [
        # w1: both gids fire; w2: only gid 1 fires
        (0, 0, "A", 1, "w1", 1.0), (0, 0, "A", 2, "w1", 2.0),
        (0, 0, "A", 1, "w2", 5.0),
    ]
    report = spark.createDataFrame(
        pd.DataFrame(rows, columns=[
            "simulation_id", "circuit_id", "neuron_class", "gid", "window",
            "time",
        ])
    ).withColumn("trial", F.lit(0))
    pairs = spark.createDataFrame([(1, 2)], "gid_a long, gid_b long")
    out = signal.spike_train_distances(report, pairs, tau=1.0, q=1.0).toPandas()
    byw = out.set_index("window")
    assert set(byw.index) == {"w1", "w2"}
    assert byw.loc["w2"].victor_purpura == 1.0  # empty vs 1-spike train
