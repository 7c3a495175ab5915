"""Property-based tests (hypothesis) for the round-7 operators: each
Spark implementation must agree with a direct Python evaluation of the
same semantics on random inputs — the same discipline as the q-DSL
property suite, extended to rolling windows, equi-depth bucketing, and
deterministic splits."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # gid
        st.integers(min_value=0, max_value=20),  # time (int: exact compares)
        st.integers(min_value=-5, max_value=5),  # value
    ),
    min_size=1,
    max_size=40,
)


@SLOW
@given(rows=ROWS, span=st.integers(min_value=1, max_value=8))
def test_rolling_agg_property(spark, rows, span):
    """Every row's trailing-window stats equal a brute-force filter —
    including duplicate timestamps (shared RANGE frame)."""
    from blueetl_spark.operators.timeseries import rolling_agg

    pdf = pd.DataFrame(rows, columns=["gid", "time", "value"]).astype(
        {"gid": "int64", "time": "float64", "value": "float64"}
    )
    got = rolling_agg(
        spark.createDataFrame(pdf), span=float(span), by=("gid",),
        aggs=("count", "sum"),
    ).toPandas()
    for _, r in got.iterrows():
        frame = pdf[
            (pdf.gid == r.gid)
            & (pdf.time >= r.time - span)
            & (pdf.time <= r.time)
        ].value
        assert r.rolling_count == len(frame)
        assert r.rolling_sum == pytest.approx(frame.sum())


@SLOW
@given(
    vals=st.lists(
        st.integers(min_value=-50, max_value=50), min_size=4, max_size=60
    ),
    n_buckets=st.integers(min_value=2, max_value=5),
)
def test_quantile_buckets_property(spark, vals, n_buckets):
    """Monotone in value; total rows preserved; bucket ids within
    [1, n]; ties land in one bucket."""
    from blueetl_spark.operators.sampling import quantile_buckets

    pdf = pd.DataFrame({"v": [float(v) for v in vals]})
    out = quantile_buckets(
        spark.createDataFrame(pdf), "v", n_buckets
    ).toPandas()
    assert len(out) == len(pdf)
    assert out.bucket.between(1, n_buckets).all()
    s = out.sort_values("v")
    assert s.bucket.is_monotonic_increasing
    assert (out.groupby("v").bucket.nunique() == 1).all()


@SLOW
@given(
    n=st.integers(min_value=50, max_value=300),
    seed=st.text(
        alphabet="abc123", min_size=0, max_size=6
    ),
)
def test_split_assign_property(spark, n, seed):
    """Total preservation, determinism across partitionings, and
    method-independence of those invariants."""
    from blueetl_spark.operators.sampling import split_assign

    w = {"train": 0.7, "test": 0.3}
    df = spark.range(n).selectExpr("CAST(id AS STRING) AS doc_id")
    a = split_assign(df, w, seed=seed, method="md5").toPandas()
    b = split_assign(
        df.repartition(5), w, seed=seed, method="md5"
    ).toPandas()
    assert len(a) == n
    assert set(a.split) <= {"train", "test"}
    assert (
        a.set_index("doc_id").split.sort_index()
        == b.set_index("doc_id").split.sort_index()
    ).all()


@SLOW
@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(min_value=-100, max_value=100)),
        min_size=3,
        max_size=50,
    ).filter(lambda v: sum(x is not None for x in v) >= 2)
)
def test_winsorize_property(spark, vals):
    """Clipped values stay within the observed non-null range, order of
    non-clipped values is preserved, NULLs stay NULL."""
    from blueetl_spark.operators.timeseries import winsorize

    pdf = pd.DataFrame({"v": [None if x is None else float(x) for x in vals]})
    out = winsorize(
        spark.createDataFrame(pdf), "v", 0.1, 0.9, out_col="w"
    ).toPandas()
    nn = pdf.v.dropna()
    got = out.w
    assert got.isna().sum() == pdf.v.isna().sum()
    assert got.dropna().between(nn.min(), nn.max()).all()


@SLOW
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),   # group
            st.integers(min_value=0, max_value=99),  # doc order key
            st.integers(min_value=0, max_value=30),  # token count (0 drops)
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda r: (r[0], r[1]),
    ),
    seq_len=st.integers(min_value=1, max_value=16),
)
def test_pack_sequences_property(spark, rows, seq_len):
    """On random corpora: segments tile each group's token stream with
    no gaps or overlaps (per-group lengths sum to total tokens; every
    bin except the last is exactly full), per-doc segments sum to the
    doc's own length, and offsets stay inside [0, seq_len]."""
    from blueetl_spark.operators.text import pack_sequences

    pdf = pd.DataFrame(rows, columns=["g", "doc_id", "n"])
    out = pack_sequences(
        spark.createDataFrame(pdf), "n", seq_len, by=["g"],
        order=["doc_id"],
    ).toPandas()
    live = pdf[pdf.n > 0]
    assert out.seg_start.between(0, seq_len).all()
    assert out.seg_end.between(0, seq_len).all()
    assert (out.seg_end > out.seg_start).all()
    seg_len = out.seg_end - out.seg_start
    # per-doc segments reassemble the doc
    per_doc = seg_len.groupby([out.g, out.doc_id]).sum()
    for (g, d), tot in per_doc.items():
        assert tot == int(live[(live.g == g) & (live.doc_id == d)].n.iloc[0])
    # per-(group, bin) tiling: all bins full except possibly the last
    for g, sub in out.assign(sl=seg_len).groupby("g"):
        per_bin = sub.groupby("bin").sl.sum()
        n_tok = int(live[live.g == g].n.sum())
        assert per_bin.sum() == n_tok
        last = per_bin.index.max()
        assert (per_bin.drop(index=last) == seq_len).all()


@SLOW
@given(
    xs=st.lists(st.integers(min_value=-20, max_value=20),
                min_size=2, max_size=50),
    ys=st.lists(st.integers(min_value=-20, max_value=20),
                min_size=2, max_size=50),
    buckets=st.integers(min_value=2, max_value=8),
)
def test_psi_drift_property(spark, xs, ys, buckets):
    """PSI on random integer samples equals the sequential reference
    (integer disc-quantile edges, tie-to-lower buckets, eps floor,
    ordered fold) to the rounding digit."""
    import math
    from collections import Counter, OrderedDict

    from blueetl_spark.operators.timeseries import psi_drift

    a = spark.createDataFrame([("g", float(v)) for v in xs],
                              "g string, v double")
    b = spark.createDataFrame([("g", float(v)) for v in ys],
                              "g string, v double")
    row = psi_drift(a, b, "v", by=["g"], buckets=buckets).head()

    n = len(xs)
    cnt = OrderedDict(sorted(Counter(xs).items()))
    cum, edges = 0, {}
    for v, c in cnt.items():
        prev, cum = cum, cum + c
        for i in range(prev * buckets // n + 1,
                       min(cum * buckets // n, buckets - 1) + 1):
            if i >= 1:
                edges[i] = v
    es = [edges[i] for i in sorted(edges)]
    bx = lambda v: sum(1 for e in es if v > e)  # noqa: E731
    pc, qc = Counter(bx(v) for v in xs), Counter(bx(v) for v in ys)
    acc = 0.0
    for j in range(buckets):
        p = max(pc.get(j, 0) / len(xs), 1e-6)
        q = max(qc.get(j, 0) / len(ys), 1e-6)
        acc += (p - q) * math.log(p / q)
    assert row["psi"] == pytest.approx(round(acc, 6), abs=2e-6)
    assert (row["n_ref"], row["n_new"]) == (len(xs), len(ys))


RANK_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),   # group
        st.integers(min_value=0, max_value=6),   # value (small pool -> ties)
        st.booleans(),                           # side / label
    ),
    min_size=2,
    max_size=50,
)


def _avg_ranks(vals):
    from collections import Counter

    cnt = Counter(vals)
    out, before = {}, 0
    for v in sorted(cnt):
        out[v] = before + (cnt[v] + 1) / 2
        before += cnt[v]
    return out


@SLOW
@given(rows=RANK_ROWS)
def test_mann_whitney_property(spark, rows):
    """U, its complement, and the tie-corrected z agree with a direct
    average-rank evaluation on random tied data, including one-sided
    and zero-variance groups."""
    import math

    from collections import Counter

    from blueetl_spark.operators.timeseries import mann_whitney

    pdf = pd.DataFrame(rows, columns=["g", "v", "side"]).astype(
        {"g": "int64", "v": "float64"}
    )
    a = spark.createDataFrame(pdf[pdf.side][["g", "v"]], "g long, v double")
    b = spark.createDataFrame(pdf[~pdf.side][["g", "v"]], "g long, v double")
    got = {
        r["g"]: (r["n_a"], r["n_b"], r["u_a"], r["u_b"], r["z"])
        for r in mann_whitney(a, b, "v", by=["g"]).collect()
    }
    for g in sorted(pdf.g.unique()):
        xs = list(pdf[(pdf.g == g) & pdf.side].v)
        ys = list(pdf[(pdf.g == g) & ~pdf.side].v)
        na, nb, n = len(xs), len(ys), len(xs) + len(ys)
        if na == 0 or nb == 0:
            assert got[g] == (na, nb, None, None, None)
            continue
        ranks = _avg_ranks(xs + ys)
        ua = sum(ranks[v] for v in xs) - na * (na + 1) / 2
        ties = sum(t**3 - t for t in Counter(xs + ys).values())
        var = na * nb / 12 * ((n + 1) - ties / (n * (n - 1)))
        z = (
            round((ua - na * nb / 2) / math.sqrt(var), 6)
            if var > 0
            else None
        )
        assert got[g] == (na, nb, round(ua, 6), round(na * nb - ua, 6), z)


@SLOW
@given(rows=RANK_ROWS)
def test_roc_auc_property(spark, rows):
    """AUC equals the pairwise win/tie probability on random tied
    scores; one-class groups are NULL."""
    from blueetl_spark.operators.classifier import roc_auc

    pdf = pd.DataFrame(rows, columns=["g", "sc", "y"]).astype(
        {"g": "int64", "sc": "float64"}
    )
    got = {
        r["g"]: (r["n_pos"], r["n_neg"], r["auc"])
        for r in roc_auc(
            spark.createDataFrame(pdf), "sc", "y", by=["g"]
        ).collect()
    }
    for g in sorted(pdf.g.unique()):
        pos = list(pdf[(pdf.g == g) & pdf.y].sc)
        neg = list(pdf[(pdf.g == g) & ~pdf.y].sc)
        if not pos or not neg:
            assert got[g] == (len(pos), len(neg), None)
            continue
        wins = sum(
            1.0 if p > q else 0.5 if p == q else 0.0
            for p in pos
            for q in neg
        )
        assert got[g] == (
            len(pos),
            len(neg),
            round(wins / (len(pos) * len(neg)), 6),
        )


@SLOW
@given(rows=RANK_ROWS)
def test_spearman_property(spark, rows):
    """rho agrees with Pearson over average ranks on random tied data;
    constant columns and sub-2-row groups are NULL."""
    from blueetl_spark.operators.profile import spearman

    pdf = pd.DataFrame(rows, columns=["g", "x", "yb"]).astype(
        {"g": "int64", "x": "float64"}
    )
    pdf["y"] = pdf.yb.astype("int64").astype("float64") * 3 - pdf.x
    df = spark.createDataFrame(pdf[["g", "x", "y"]], "g long, x double, y double")
    got = {
        r["g"]: (r["n_rows"], r["rho"])
        for r in spearman(df, "x", "y", by=["g"]).collect()
    }
    for g in sorted(pdf.g.unique()):
        sub = pdf[pdf.g == g]
        xs, ys = list(sub.x), list(sub.y)
        n = len(xs)
        rx_map, ry_map = _avg_ranks(xs), _avg_ranks(ys)
        rx = [rx_map[v] for v in xs]
        ry = [ry_map[v] for v in ys]
        sx, sy = sum(rx), sum(ry)
        sxx = sum(v * v for v in rx)
        syy = sum(v * v for v in ry)
        sxy = sum(p * q for p, q in zip(rx, ry))
        den = (n * sxx - sx * sx) * (n * syy - sy * sy)
        rho = round((n * sxy - sx * sy) / den**0.5, 6) if den > 0 else None
        assert got[g] == (n, rho)
