"""Feature library tests, cross-checked against straightforward
numpy/pandas reimplementations of the reference semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from blueetl_spark.operators import features as feat

KEYS = ["simulation_id", "circuit_id", "neuron_class", "window"]


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.default_rng(11)
    n = 4000
    report_pdf = pd.DataFrame(
        {
            "simulation_id": rng.integers(0, 2, n).astype("int16"),
            "circuit_id": np.zeros(n, dtype="int16"),
            "neuron_class": rng.choice(["EXC", "INH"], n),
            "window": np.full(n, "w1"),
            "trial": rng.integers(0, 2, n).astype("int16"),
            "gid": rng.integers(0, 30, n).astype("int64"),
            "time": rng.uniform(0.0, 100.0, n),
        }
    )
    windows_pdf = pd.DataFrame(
        [
            (s, 0, "w1", t, 0.0, 0.0, 100.0, 0.0, 100.0, "")
            for s in (0, 1)
            for t in (0, 1)
        ],
        columns=[
            "simulation_id", "circuit_id", "window", "trial", "offset",
            "t_start", "t_stop", "t_step", "duration", "window_type",
        ],
    )
    counts_pdf = pd.DataFrame(
        {"circuit_id": [0, 0], "neuron_class": ["EXC", "INH"], "count": [30, 30]}
    )
    return (
        spark.createDataFrame(report_pdf).cache(),
        spark.createDataFrame(windows_pdf).cache(),
        spark.createDataFrame(counts_pdf).cache(),
        report_pdf,
    )


def test_by_gid_and_trial(data):
    report, windows, counts, pdf = data
    got = feat.by_gid_and_trial(report).toPandas()
    grp = pdf.groupby(KEYS + ["gid", "trial"])
    exp_counts = grp.size()
    for row in got.sample(50, random_state=0).itertuples():
        k = (row.simulation_id, row.circuit_id, row.neuron_class, row.window,
             row.gid, row.trial)
        assert row.count == exp_counts[k]
        times = sorted(grp.get_group(k).time)
        assert row.times == pytest.approx(times)
        assert row.first == pytest.approx(times[0])


def test_by_gid_rates(data):
    report, windows, counts, pdf = data
    got = feat.by_gid(report, windows).toPandas()
    # spot-check one gid
    row = got.iloc[0]
    sub = pdf[
        (pdf.simulation_id == row.simulation_id)
        & (pdf.neuron_class == row.neuron_class)
        & (pdf.gid == row.gid)
    ]
    n_trials = 2
    exp_mean_count = len(sub) / n_trials
    assert row.mean_spike_counts == pytest.approx(exp_mean_count)
    assert row.mean_firing_rates_per_second == pytest.approx(
        exp_mean_count * 1000.0 / 100.0
    )


def test_by_neuron_class_population_stats(data):
    report, windows, counts, pdf = data
    got = feat.by_neuron_class(report, windows, counts).toPandas()
    row = got[(got.simulation_id == 0) & (got.neuron_class == "EXC")].iloc[0]
    sub = pdf[(pdf.simulation_id == 0) & (pdf.neuron_class == "EXC")]
    per_gid = sub.groupby("gid").size() / 2  # mean count over 2 trials
    # densify to all 30 neurons (silent = 0), like the reference's fillna(0)
    dense = per_gid.reindex(range(30), fill_value=0.0)
    rates = dense * 1000.0 / 100.0
    assert row.mean_of_mean_spike_counts == pytest.approx(dense.mean())
    assert row.mean_of_mean_firing_rates_per_second == pytest.approx(rates.mean())
    assert row.std_of_mean_firing_rates_per_second == pytest.approx(
        rates.std(ddof=0)
    )


def test_histogram_matches_numpy(data):
    report, windows, counts, pdf = data
    got = feat.histogram(report, windows, counts, bin_size=1.0).toPandas()
    sub = pdf[(pdf.simulation_id == 1) & (pdf.neuron_class == "INH")]
    exp_hist, _ = np.histogram(sub.time, bins=100, range=(0.0, 100.0))
    g = (
        got[(got.simulation_id == 1) & (got.neuron_class == "INH")]
        .sort_values("bin")
        .reset_index(drop=True)
    )
    assert len(g) == 100  # densified
    np.testing.assert_allclose(g["hist"].to_numpy(), exp_hist)
    np.testing.assert_allclose(
        g.hist_normalized.to_numpy(), exp_hist / (30 * 2)
    )


def test_histogram_right_edge(spark):
    # a spike exactly at t_stop lands in the last bin (numpy semantics)
    report = spark.createDataFrame(
        [(0, 0, "X", "w", 0, 5, 100.0)],
        "simulation_id smallint, circuit_id smallint, neuron_class string, "
        "window string, trial smallint, gid bigint, time double",
    )
    windows = spark.createDataFrame(
        [(0, 0, "w", 0, 0.0, 0.0, 100.0, 0.0, 100.0, "")],
        "simulation_id smallint, circuit_id smallint, window string, "
        "trial smallint, offset double, t_start double, t_stop double, "
        "t_step double, duration double, window_type string",
    )
    counts = spark.createDataFrame(
        [(0, "X", 1)], "circuit_id smallint, neuron_class string, count bigint"
    )
    got = feat.histogram(report, windows, counts).toPandas()
    assert got[got["hist"] > 0].bin.iloc[0] == 99


def test_gaussian_smoothing(data):
    report, windows, counts, _ = data
    hist = feat.histogram(report, windows, counts)
    sm = feat.gaussian_smooth_histogram(hist, sigma=3.0).toPandas()
    g = sm[(sm.simulation_id == 0) & (sm.neuron_class == "EXC")].sort_values("bin")
    # independent direct implementation: explicit loop over kernel window
    x = g.hist_normalized.to_numpy(float)
    radius = int(4.0 * 3.0 + 0.5)
    grid = np.arange(-radius, radius + 1, dtype=float)
    kernel = np.exp(-0.5 * (grid / 3.0) ** 2)
    kernel /= kernel.sum()
    n = len(x)
    exp = np.empty(n)
    for i in range(n):
        acc = 0.0
        for j, w in zip(range(-radius, radius + 1), kernel):
            idx = i + j
            # reflect (symmetric) boundary
            while idx < 0 or idx >= n:
                idx = -idx - 1 if idx < 0 else 2 * n - idx - 1
            acc += w * x[idx]
        exp[i] = acc
    np.testing.assert_allclose(g.smoothed.to_numpy(), exp, rtol=1e-9)
    # smoothing preserves mass (reflect boundary, normalized kernel)
    assert g.smoothed.sum() == pytest.approx(x.sum(), rel=1e-6)


def test_isi_stats(data):
    report, windows, counts, pdf = data
    got = feat.isi_stats(report).toPandas()
    row = got.dropna().iloc[0]
    sub = pdf[
        (pdf.simulation_id == row.simulation_id)
        & (pdf.neuron_class == row.neuron_class)
        & (pdf.gid == row.gid)
    ]
    isis = np.concatenate(
        [np.diff(np.sort(t.time.to_numpy())) for _, t in sub.groupby("trial")]
    )
    assert row.mean_isi == pytest.approx(isis.mean())
    assert row.cv == pytest.approx(isis.std() / isis.mean())
    # LV against direct formula per trial
    lv_terms = []
    for _, t in sub.groupby("trial"):
        d = np.diff(np.sort(t.time.to_numpy()))
        if len(d) >= 2:
            lv_terms.extend(3 * (d[:-1] - d[1:]) ** 2 / (d[:-1] + d[1:]) ** 2)
    assert row.lv == pytest.approx(np.mean(lv_terms))


def test_latency(data):
    report, windows, counts, pdf = data
    got = feat.latency(report, windows).toPandas()
    row = got.iloc[0]
    sub = pdf[
        (pdf.simulation_id == row.simulation_id)
        & (pdf.neuron_class == row.neuron_class)
        & (pdf.trial == row.trial)
    ]
    assert row.latency == pytest.approx(sub.time.min() - 0.0)


def test_apply_feature_registry(data, spark):
    report, windows, counts, pdf = data

    @feat.register_feature("test_mean_time")
    def mean_time(g: pd.DataFrame, params: dict) -> pd.DataFrame:
        return pd.DataFrame({"mean_time": [g.time.mean() * params.get("k", 1.0)]})

    out = feat.apply_feature(
        report,
        KEYS,
        "test_mean_time",
        "simulation_id smallint, circuit_id smallint, neuron_class string, "
        "window string, mean_time double",
        params={"k": 2.0},
    ).toPandas()
    exp = pdf.groupby(KEYS).time.mean() * 2.0
    for row in out.itertuples():
        assert row.mean_time == pytest.approx(
            exp[(row.simulation_id, row.circuit_id, row.neuron_class, row.window)]
        )


def test_by_neuron_class_and_trial_densifies_silent_trials(spark):
    """A class silent in one trial still emits its 0-mean row when the
    windows spine is provided (reference parity: its NaN-row report
    yields a row per (trial, class))."""
    import pandas as pd
    from pyspark.sql import functions as F

    from blueetl_spark.operators import features as feat

    report = spark.createDataFrame(
        pd.DataFrame(
            {
                "simulation_id": [0, 0],
                "circuit_id": [0, 0],
                "neuron_class": ["A", "A"],
                "window": ["w", "w"],
                "trial": [0, 1],          # trial 2 silent
                "gid": [1, 2],
                "time": [1.0, 2.0],
            }
        )
    )
    counts = spark.createDataFrame(
        [(0, "A", 4)], "circuit_id long, neuron_class string, count long"
    )
    windows = spark.createDataFrame(
        [(0, "w", t, 0.0, 0.0, 10.0, 10.0) for t in (0, 1, 2)],
        "simulation_id long, window string, trial long, offset double, "
        "t_start double, t_stop double, duration double",
    )
    out = feat.by_neuron_class_and_trial(report, counts, windows=windows).toPandas()
    got = out.set_index("trial").mean_of_spike_counts_for_each_trial
    assert got.loc[2] == 0.0 and len(out) == 3
    # without the spine: silent trial omitted (legacy events-only shape)
    legacy = feat.by_neuron_class_and_trial(report, counts).toPandas()
    assert len(legacy) == 2


def test_get_feature_dotted_path_fallback(spark, tmp_path, monkeypatch):
    """A config naming a feature function by module path (the reference's
    ``import_by_string``, utils.py:146-156) resolves without an explicit
    register_feature call — and runs end-to-end through apply_feature."""
    mod = tmp_path / "bnac_style_features.py"
    mod.write_text(
        "import pandas as pd\n"
        "def count_rows(g, params):\n"
        "    return pd.DataFrame({'n': [len(g) * params.get('k', 1)]})\n"
        "NOT_CALLABLE = 42\n"
    )
    monkeypatch.syspath_prepend(str(tmp_path))

    fn = feat.get_feature("bnac_style_features.count_rows")
    assert callable(fn)
    # memoized: second lookup hits the registry, same object
    assert feat.get_feature("bnac_style_features.count_rows") is fn

    df = spark.createDataFrame([("a", 1.0), ("a", 2.0), ("b", 3.0)], "g string, v double")
    out = feat.apply_feature(
        df, ["g"], "bnac_style_features.count_rows", "g string, n long",
        params={"k": 10},
    ).toPandas().set_index("g").n
    assert out.loc["a"] == 20 and out.loc["b"] == 10


def test_get_feature_dotted_path_errors(monkeypatch):
    """Missing module / missing attribute / non-callable / non-dotted
    unregistered names all raise KeyError with an actionable message."""
    import pytest

    with pytest.raises(KeyError, match="not registered"):
        feat.get_feature("no_such_registered_name")
    with pytest.raises(KeyError, match="could not be imported"):
        feat.get_feature("definitely_no_such_module_xyz.fn")
    with pytest.raises(KeyError, match="no attribute"):
        feat.get_feature("operator.no_such_attr_xyz")
    with pytest.raises(KeyError, match="not callable"):
        feat.get_feature("math.pi")


def test_apply_feature_multi_nonfinite_values_survive(spark):
    """Non-finite floats inside array cells (ADVICE r5): json.dumps used to
    emit bare NaN/Infinity, which from_json parses to a NULL ROW — silent
    loss of the whole output row. They must round-trip as in-place nulls."""
    import numpy as np

    def fn(pdf, params):
        return {
            "out": pd.DataFrame(
                {
                    "times": [np.array([1.0, np.nan, 3.0])],
                    "peak": [float("inf")],
                    "n": [np.int64(len(pdf))],
                }
            )
        }

    df = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "g string, v double")
    out = feat.apply_feature_multi(
        df, ["g"], fn, {"out": "times array<double>, peak double, n long"}
    )["out"].toPandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert row["n"] == 2  # the row itself survived
    assert row["times"][0] == 1.0 and row["times"][2] == 3.0
    assert pd.isna(row["times"][1]) and pd.isna(row["peak"])
