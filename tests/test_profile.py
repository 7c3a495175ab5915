"""Table profiling: exact stats vs pandas, sketch-vs-exact agreement,
and the mergeable-shard invariant (profile(all) == merge(profiles(batches)))."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from blueetl_spark.operators import profile as P


@pytest.fixture()
def mixed_df(spark):
    rows = [
        (1, 10.5, "a", True),
        (2, None, "b", False),
        (3, 2.5, None, None),
        (4, 2.5, "a", True),
        (None, 7.0, "c", False),
    ]
    return spark.createDataFrame(
        rows, "k int, v double, s string, flag boolean"
    )


def test_profile_exact(mixed_df):
    got = {r["column"]: r.asDict() for r in P.profile(mixed_df).collect()}
    assert set(got) == {"k", "v", "s", "flag"}
    k = got["k"]
    assert (k["n_rows"], k["n_null"], k["n_distinct"]) == (5, 1, 4)
    assert (k["min_num"], k["max_num"], k["avg_value"]) == (1.0, 4.0, 2.5)
    assert k["min_str"] is None and k["max_str"] is None
    v = got["v"]
    assert (v["n_null"], v["n_distinct"], v["min_num"], v["max_num"]) == (1, 3, 2.5, 10.5)
    assert v["avg_value"] == pytest.approx(22.5 / 4)
    s = got["s"]
    assert (s["n_null"], s["n_distinct"], s["min_str"], s["max_str"]) == (1, 3, "a", "c")
    assert s["min_num"] is None and s["avg_value"] is None
    # booleans profile as strings
    assert got["flag"]["n_distinct"] == 2


def test_profile_column_selection_and_errors(mixed_df, spark):
    only = P.profile(mixed_df, columns=["k"]).collect()
    assert [r["column"] for r in only] == ["k"]
    with pytest.raises(ValueError, match="not in"):
        P.profile(mixed_df, columns=["nope"])
    arr = spark.range(3).select(F.array("id").alias("a"))
    with pytest.raises(ValueError, match="no atomic columns"):
        P.profile(arr)


def test_profile_skips_non_atomic_by_default(spark):
    df = spark.range(10).select(
        F.col("id"), F.array("id").alias("arr"), F.lit("x").alias("s")
    )
    cols = [r["column"] for r in P.profile(df).collect()]
    assert cols == ["id", "s"]


def test_profile_sketch_matches_exact_at_small_cardinality(spark, sf_dir):
    from blueetl_spark.sources import tables

    orders = tables.load(spark, sf_dir, "orders")
    exact = {r["column"]: r for r in P.profile(orders).collect()}
    sk = {r["column"]: r for r in P.profile_sketch(orders).collect()}
    assert set(exact) == set(sk)
    for c in exact:
        e, s = exact[c], sk[c]
        # everything except the estimated cardinality is identical
        for f in ("n_rows", "n_null", "min_num", "max_num", "min_str",
                  "max_str", "avg_value"):
            assert e[f] == s[f], (c, f)
        # HLL at lgk=12: exact below sketch threshold, ~2% relative above
        assert s["n_distinct"] == pytest.approx(e["n_distinct"], rel=0.05)


def test_shard_merge_equals_oneshot(spark, sf_dir, tmp_path):
    """The 100 TB contract: merging per-batch shard rows reproduces the
    one-shot profile without re-reading data."""
    from blueetl_spark.sources import tables

    orders = tables.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    path = str(tmp_path / "profile_shards")
    # three disjoint batches
    for i in range(3):
        batch = orders.filter(F.pmod("o_orderkey", F.lit(3)) == i)
        P.write_profile_shard(batch, path, batch_id=f"b{i}")
    merged = {r["column"]: r for r in P.merge_profile_shards(spark, path).collect()}
    oneshot = {r["column"]: r for r in P.profile_sketch(orders).collect()}
    assert set(merged) == set(oneshot)
    for c in oneshot:
        m, o = merged[c], oneshot[c]
        for f in ("n_rows", "n_null", "min_num", "max_num", "min_str",
                  "max_str", "avg_value"):
            assert m[f] == o[f], (c, f)
        # sketch-union estimate vs one-shot sketch estimate
        assert m["n_distinct"] == pytest.approx(o["n_distinct"], rel=0.05)
    # batch restriction: merging one batch profiles exactly that batch
    one = {r["column"]: r for r in
           P.merge_profile_shards(spark, path, batch_ids=["b0"]).collect()}
    b0 = orders.filter(F.pmod("o_orderkey", F.lit(3)) == 0)
    assert one["o_orderkey"]["n_rows"] == b0.count()


def test_shard_merge_dedups_replayed_batch(spark, sf_dir, tmp_path):
    """An at-least-once writer (a replayed foreachBatch epoch, a retried
    batch job) appends the same batch's rows a second time under the same
    batch_id; the merge must count that batch exactly once."""
    from blueetl_spark.sources import tables

    orders = tables.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    path = str(tmp_path / "profile_shards")
    for i in range(3):
        batch = orders.filter(F.pmod("o_orderkey", F.lit(3)) == i)
        P.write_profile_shard(batch, path, batch_id=f"b{i}")
    clean = {r["column"]: r for r in P.merge_profile_shards(spark, path).collect()}
    # replay batch b1: identical rows, same batch_id, appended again
    P.write_profile_shard(
        orders.filter(F.pmod("o_orderkey", F.lit(3)) == 1), path, batch_id="b1"
    )
    merged = {r["column"]: r for r in P.merge_profile_shards(spark, path).collect()}
    oneshot = {r["column"]: r for r in P.profile_sketch(orders).collect()}
    fields = ("n_rows", "n_null", "min_num", "max_num", "min_str",
              "max_str", "avg_value", "n_distinct")
    for c in oneshot:
        # the replay must be invisible vs the clean merge (exact for the
        # additive/foldable stats; the kept duplicate's HLL binary is one
        # of two sketches of the same value set, so estimate-level equal)
        for f in fields[:-1]:
            assert merged[c][f] == clean[c][f], (c, f)
        assert merged[c]["n_distinct"] == pytest.approx(
            clean[c]["n_distinct"], rel=0.02
        )
        # and the additive stats still reproduce the one-shot profile
        for f in fields[:-1]:
            assert merged[c][f] == oneshot[c][f], (c, f)
        assert merged[c]["n_distinct"] == pytest.approx(
            oneshot[c]["n_distinct"], rel=0.05
        )


def test_merge_handles_all_null_sum(spark, tmp_path):
    df = spark.createDataFrame([("x",), ("y",)], "s string")
    path = str(tmp_path / "shards")
    P.write_profile_shard(df, path, batch_id="b0")
    m = P.merge_profile_shards(spark, path).collect()[0]
    assert m["avg_value"] is None and m["n_distinct"] == 2


def test_frequent_values(spark):
    df = spark.createDataFrame(
        [("a",)] * 3 + [("b",)] * 3 + [("c",)] * 1 + [(None,)],
        "v string",
    )
    got = [(r["value"], r["n"]) for r in P.frequent_values(df, "v", k=2).collect()]
    # tie between a and b at 3 → value asc
    assert got == [("a", 3), ("b", 3)]


def test_profile_scan_shapes(mixed_df):
    """The sketch profile is ONE pass; the exact profile is exactly TWO
    (stats + distinct-Expand kept apart — mixing them makes Spark
    evaluate every stat on every Expand replica, measured 4x slower)."""
    sk = P.profile_sketch(mixed_df)._jdf.queryExecution().optimizedPlan().toString()
    assert sk.count("LocalRelation") + sk.count("LogicalRDD") <= 1
    ex = P.profile(mixed_df)._jdf.queryExecution().optimizedPlan().toString()
    assert ex.count("LocalRelation") + ex.count("LogicalRDD") == 2


def test_histogram_shard_merge_equals_direct(spark):
    """Splitting the data any way and merging the shards must equal
    binning the whole frame — the mergeability contract; a replayed
    batch_id folds out."""
    pdf = pd.DataFrame({"v": [float(x) for x in range(-10, 110)] + [None]})
    df = spark.createDataFrame(pdf)
    whole = P.histogram_shard(df, "v", 0.0, 100.0, 10, "all").collect()[0]
    a = P.histogram_shard(df.filter("v < 37 OR v IS NULL"), "v", 0.0, 100.0, 10, "a")
    b = P.histogram_shard(df.filter("v >= 37"), "v", 0.0, 100.0, 10, "b")
    merged = P.merge_histogram_shards(
        a.unionByName(b).unionByName(b)  # replayed batch "b"
    ).collect()[0]
    assert merged.counts == whole.counts
    assert merged.n_obs == whole.n_obs == 120
    # underflow 10 (−10…−1), 10 per interior bin, overflow 10 (100…109)
    assert merged.counts == [10] + [10] * 10 + [10]


def test_histogram_quantiles_interpolation_and_clamps(spark):
    pdf = pd.DataFrame({"v": [float(x) for x in range(100)]})  # 0..99
    h = P.histogram_shard(spark.createDataFrame(pdf), "v", 0.0, 100.0, 10)
    got = {
        r.p: r.est
        for r in P.histogram_quantiles(h, 0.0, 100.0, 10, [0.1, 0.5, 1.0]).collect()
    }
    # bin k holds 10k..10k+9; r=p*100 interpolates to exactly 10*r/10
    assert got[0.1] == pytest.approx(10.0)
    assert got[0.5] == pytest.approx(50.0)
    assert got[1.0] == pytest.approx(100.0)


def test_histogram_quantiles_clamp_outside_edges(spark):
    pdf = pd.DataFrame({"v": [-5.0, -4.0, 200.0, 300.0]})
    h = P.histogram_shard(spark.createDataFrame(pdf), "v", 0.0, 100.0, 4)
    got = {
        r.p: r.est
        for r in P.histogram_quantiles(h, 0.0, 100.0, 4, [0.25, 0.9]).collect()
    }
    assert got[0.25] == 0.0  # rank lands in the underflow bin -> lo
    assert got[0.9] == 100.0  # overflow bin -> hi


def test_histogram_shard_rejects_bad_edges(spark):
    df = spark.createDataFrame(pd.DataFrame({"v": [1.0]}))
    with pytest.raises(ValueError, match="n_bins"):
        P.histogram_shard(df, "v", 5.0, 5.0, 10)


def test_histogram_quantiles_empty_and_bad_p(spark):
    """n_obs = 0 keeps one row per p with NULL est; p outside (0,1]
    raises up front."""
    empty = P.histogram_shard(
        spark.createDataFrame(pd.DataFrame({"v": [None]})).selectExpr(
            "CAST(v AS DOUBLE) AS v"
        ),
        "v", 0.0, 10.0, 5,
    )
    rows = P.histogram_quantiles(empty, 0.0, 10.0, 5, [0.5, 0.9]).collect()
    assert [r.p for r in rows] == [0.5, 0.9]
    assert all(r.est is None for r in rows)
    with pytest.raises(ValueError, match="in \\(0, 1\\]"):
        P.histogram_quantiles(empty, 0.0, 10.0, 5, [0.0, 0.5])


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5"])
def test_cms_upper_bound_and_exactness_when_wide(spark, hash_fn):
    """Count-Min estimates are ALWAYS >= true counts, and exact when
    the grid is wide enough that keys don't collide."""
    from collections import Counter

    from blueetl_spark.operators.profile import (
        cms_estimate,
        cms_shard,
        merge_cms_shards,
    )

    vals = [i % 7 for i in range(300)]
    df = spark.createDataFrame([(v,) for v in vals], "k long")
    true = Counter(vals)
    keys = spark.createDataFrame([(k,) for k in true], "k long")
    # narrow grid: upper bound
    grid = merge_cms_shards(
        cms_shard(df, "k", width=4, depth=3, batch_id="b0", hash_fn=hash_fn)
    )
    est = {
        r["k"]: r["est"]
        for r in cms_estimate(grid, keys, "k", 4, 3, hash_fn).collect()
    }
    assert all(est[k] >= c for k, c in true.items())
    assert sum(est.values()) >= sum(true.values())
    # wide grid: exact (7 keys over 512 slots x 4 rows)
    wide = merge_cms_shards(
        cms_shard(df, "k", width=512, depth=4, batch_id="b0", hash_fn=hash_fn)
    )
    est_w = {
        r["k"]: r["est"]
        for r in cms_estimate(wide, keys, "k", 512, 4, hash_fn).collect()
    }
    assert est_w == dict(true)


def test_cms_shards_merge_split_invariant_and_replay_safe(spark):
    """Sharding the input arbitrarily (and replaying one batch) merges
    to the same grid as one whole-table shard."""
    from blueetl_spark.operators.profile import cms_shard, merge_cms_shards

    df = spark.range(1_000).select((F.col("id") % 37).alias("k"))
    whole = merge_cms_shards(
        cms_shard(df, "k", width=64, depth=4, batch_id="all")
    )
    parts = None
    for i in range(3):
        s = cms_shard(
            df.filter(F.pmod("id", F.lit(3)) == i), "k", 64, 4, f"b{i}"
        )
        parts = s if parts is None else parts.unionByName(s)
    parts = parts.unionByName(  # at-least-once replay of b2
        cms_shard(df.filter(F.pmod("id", F.lit(3)) == 2), "k", 64, 4, "b2")
    )
    merged = merge_cms_shards(parts)
    a = {r["d"]: (r["counts"], r["n_obs"]) for r in whole.collect()}
    b = {r["d"]: (r["counts"], r["n_obs"]) for r in merged.collect()}
    assert a == b
    with pytest.raises(ValueError, match="width"):
        cms_shard(df, "k", width=0, depth=1)


def test_hll_bucket_rho_matches_python_md5_replay(spark):
    """The (bucket, rho) derivation agrees bit-for-bit with a pure
    Python md5 replay — the property the SQL oracle relies on."""
    import hashlib

    from blueetl_spark.operators.profile import hll_shard

    keys = list(range(500))
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {}
    for r in hll_shard(df, "k", batch_id="b").collect():
        got[r["bucket"]] = r["rho"]

    ref = {}
    for k in keys:
        h = hashlib.md5(str(k).encode()).hexdigest()
        bucket = int(h[:2], 16)
        bits = bin(int(h[2:15], 16))[2:].zfill(52)
        rho = 53 if set(bits) == {"0"} else bits.index("1") + 1
        ref[bucket] = max(ref.get(bucket, 0), rho)
    assert got == ref


def test_hll_estimate_accuracy_merge_idempotent_and_linear_branch(spark):
    """The merged-shard estimate lands within ~3 standard errors
    (1.04/sqrt(256) ≈ 6.5%) of the true distinct count; replaying a
    whole batch changes nothing (max-merge idempotence — no batch_id
    dedup anywhere); a tiny key set takes the linear-counting branch
    and NULL keys are excluded."""
    from blueetl_spark.operators.profile import (
        hll_estimate,
        hll_shard,
        merge_hll_shards,
    )

    n = 5_000
    df = spark.range(n).select(F.col("id").alias("k"))
    parts = None
    for i in range(3):
        s = hll_shard(df.filter(F.pmod("k", F.lit(3)) == i), "k", f"b{i}")
        parts = s if parts is None else parts.unionByName(s)
    parts = parts.unionByName(  # at-least-once replay of b1, verbatim
        hll_shard(df.filter(F.pmod("k", F.lit(3)) == 1), "k", "b1")
    )
    est = hll_estimate(merge_hll_shards(parts)).head()
    assert est["method"] == "hll"
    assert abs(est["estimate"] - n) / n < 0.20  # 3 SE of the 256-reg sketch
    whole = hll_estimate(
        merge_hll_shards(hll_shard(df, "k", "all"))
    ).head()
    assert whole["estimate"] == est["estimate"]  # split/replay invariant

    small = spark.createDataFrame(
        [(i % 7,) for i in range(100)] + [(None,)], "k long"
    )
    s = hll_estimate(merge_hll_shards(hll_shard(small, "k", "b"))).head()
    assert s["method"] == "linear"
    assert s["n_zero"] >= 249  # at most 7 registers touched
    assert abs(s["estimate"] - 7) < 1.0


def test_cms_estimate_rejects_mismatched_width(spark):
    """A width different from the one the grid was built with would
    probe wrong slots and silently break the upper-bound guarantee —
    the estimate must fail loudly instead (advisor r9)."""
    from blueetl_spark.operators.profile import (
        cms_estimate,
        cms_shard,
        merge_cms_shards,
    )

    df = spark.range(100).select((F.col("id") % 5).alias("k"))
    grid = merge_cms_shards(cms_shard(df, "k", width=8, depth=2, batch_id="b"))
    keys = spark.range(5).select(F.col("id").alias("k"))
    # matching width works
    assert cms_estimate(grid, keys, "k", width=8, depth=2).count() == 5
    # mismatched width fails loudly (Spark wraps the raise_error)
    with pytest.raises(Exception, match="cms_estimate: grid row has width"):
        cms_estimate(grid, keys, "k", width=16, depth=2).collect()


def test_topk_shards_bounds_contain_truth_and_merge_replay_safe(spark):
    """Every true count lies in [count_lb, count_ub]; a shard with
    fewer distinct keys than m proves absence (bound 0, exact=True for
    keys it fully accounts for); replaying a batch cannot double-count;
    heavy keys surface with lb already above everyone else's ub."""
    from collections import Counter

    from blueetl_spark.operators.profile import merge_topk_shards, topk_shard

    # 3 shards, skewed: key 0 dominates, long tail of singletons
    rows = [(s, k) for s in range(3)
            for k in [0] * 40 + [1] * 12 + [2] * 8 + list(range(3, 30))]
    truth = Counter(k for _, k in rows)
    df = spark.createDataFrame(rows, "sh int, k long")
    parts = None
    for s in range(3):
        p = topk_shard(df.filter(F.col("sh") == s).select("k"), "k",
                       m=5, batch_id=f"b{s}")
        parts = p if parts is None else parts.unionByName(p)
    # at-least-once replay of b1 must not change the merge
    replay = topk_shard(df.filter(F.col("sh") == 1).select("k"), "k",
                        m=5, batch_id="b1")
    merged = {r["k"]: r for r in
              merge_topk_shards(parts.unionByName(replay), "k").collect()}
    for k, r in merged.items():
        assert r["count_lb"] <= truth[k] <= r["count_ub"], (k, r, truth[k])
    # the dominant key is certified: its lb beats every other ub
    others_ub = max(r["count_ub"] for k, r in merged.items() if k != 0)
    assert merged[0]["count_lb"] == truth[0] > others_ub
    assert merged[0]["exact"]

    # wide shards (m >= distinct keys): every count exact
    wide = None
    for s in range(3):
        p = topk_shard(df.filter(F.col("sh") == s).select("k"), "k",
                       m=100, batch_id=f"b{s}")
        wide = p if wide is None else wide.unionByName(p)
    exact = {r["k"]: r for r in merge_topk_shards(wide, "k").collect()}
    assert all(r["exact"] for r in exact.values())
    assert {k: r["count_lb"] for k, r in exact.items()} == dict(truth)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="m must"):
        topk_shard(df.select("k"), "k", m=0)


def test_benford_deviation_known_distribution(spark):
    """An exact-Benford sample scores tvd 0; a digit that never occurs
    still gets a densified row; zeros/NULLs/negatives and sub-1 values
    resolve to the true leading digit."""
    import math

    from blueetl_spark.operators.profile import benford_deviation

    # counts proportional to Benford over 100 rows is impossible with
    # integers; instead verify per-digit mechanics + densification
    vals = ([1.5] * 4 + [0.0023] * 2 + [-900.0] * 3 + [None, 0.0])
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    rows = {r["digit"]: r for r in benford_deviation(df, "v").collect()}
    assert set(rows) == set(range(1, 10))  # densified
    assert rows[1]["n"] == 4 and rows[2]["n"] == 2 and rows[9]["n"] == 3
    assert rows[5]["n"] == 0  # absent digit still present
    assert rows[1]["share"] == round(4 / 9, 6)
    assert rows[1]["benford"] == round(math.log10(2), 6)
    # tvd equals the sequential 9-term reference
    obs = {1: 4 / 9, 2: 2 / 9, 9: 3 / 9}
    tvd = sum(
        abs(obs.get(d, 0.0) - math.log10(1 + 1 / d)) for d in range(1, 10)
    ) / 2
    assert rows[1]["tvd"] == rows[5]["tvd"] == round(tvd, 6)


def test_mutual_information_known_cases(spark):
    """MI: 0 for independent columns, H(X) when Y fully determines X
    (npmi 1 for a bijection); NULL categories count; a constant column
    reports NULL npmi (no entropy to normalize by). Checked against a
    sequential entropy reference."""
    import math
    from collections import Counter

    from blueetl_spark.operators.profile import mutual_information

    def mk(rows):
        return spark.createDataFrame(rows, "x string, y string")

    # independent 2x2 uniform grid, 25 rows per cell
    indep = mk([(str(i % 2), str((i // 2) % 2)) for i in range(100)])
    r = mutual_information(indep, "x", "y").head()
    assert (r.n_rows, r.n_x, r.n_y) == (100, 2, 2)
    assert r.mi == 0.0 and r.npmi == 0.0
    assert r.h_x == round(math.log(2), 6)

    # bijection: y = f(x) -> MI = H(X), npmi = 1
    bij = mk([(str(i % 3), str((i % 3) * 7)) for i in range(90)])
    b = mutual_information(bij, "x", "y").head()
    assert b.mi == b.h_x == b.h_y == round(math.log(3), 6)
    assert b.npmi == 1.0

    # skewed dependent case vs a sequential reference
    rows = [("a", "p")] * 30 + [("a", "q")] * 10 + [("b", "q")] * 50 + [
        (None, "r")] * 10
    dep = mk(rows)
    d = mutual_information(dep, "x", "y").head()

    n = len(rows)
    cxy = Counter(rows)
    cx = Counter(r_[0] for r_ in rows)
    cy = Counter(r_[1] for r_ in rows)
    mi = sum(
        (c / n) * math.log((c / n) / ((cx[x] / n) * (cy[y] / n)))
        for (x, y), c in cxy.items()
    )
    assert d.n_x == 3 and d.n_y == 3  # NULL is a category
    assert abs(d.mi - mi) < 1e-6

    # constant column: h == 0 -> npmi NULL, mi 0
    const = mk([("k", str(i % 4)) for i in range(40)])
    c = mutual_information(const, "x", "y").head()
    assert c.mi == 0.0 and c.h_x == 0.0 and c.npmi is None


def test_key_skew_uniform_vs_hot_key(spark):
    """Uniform keys score entropy_ratio 1.0; a single dominant key
    drives top_share up and the ratio down; NULL keys count as a key;
    a one-key frame reports ratio 0."""
    from blueetl_spark.operators.profile import key_skew

    uniform = spark.range(900).select((F.col("id") % 9).alias("k"))
    r = key_skew(uniform, "k", top_k=3).head()
    assert (r.n_rows, r.n_keys, r.max_count) == (900, 9, 100)
    assert r.entropy_ratio == 1.0
    assert r.top_share == round(100 / 900, 6)
    assert r.topk_share == round(300 / 900, 6)

    hot = spark.range(1000).select(
        F.when(F.col("id") < 910, 0).otherwise(F.col("id")).alias("k")
    )
    h = key_skew(hot, "k", top_k=3).head()
    assert h.n_keys == 91 and h.max_count == 910
    assert h.top_share == 0.91 and h.entropy_ratio < 0.2

    withnull = spark.range(10).select(
        F.when(F.col("id") < 9, None).otherwise(F.lit(1)).alias("k")
    )
    w = key_skew(withnull, "k").head()
    assert w.n_keys == 2 and w.max_count == 9

    one = key_skew(spark.range(5).select(F.lit(1).alias("k")), "k").head()
    assert one.entropy_ratio == 0.0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="top_k"):
        key_skew(uniform, "k", top_k=0)


def test_gini_known_distributions(spark):
    """Gini: 0 for perfectly even values, (n-1)/n for one-holder
    concentration, matches the sequential formula on a mixed case;
    ties are rank-assignment-invariant; all-zero groups report NULL."""
    from blueetl_spark.operators.profile import gini

    rows = (
        [("even", 10)] * 5
        + [("one", 0)] * 4 + [("one", 100)]
        + [("mix", v) for v in [1, 2, 2, 5, 10]]
        + [("zero", 0)] * 3
    )
    df = spark.createDataFrame(rows, "g string, x long")
    got = {r["g"]: (r["n"], r["total"], r["gini"])
           for r in gini(df, "x", by=["g"]).collect()}
    assert got["even"] == (5, 50, 0.0)
    assert got["one"] == (5, 100, round(4 / 5, 6))  # (n-1)/n
    xs = sorted([1, 2, 2, 5, 10])
    n, tot = len(xs), sum(xs)
    ref = 2 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * tot) \
        - (n + 1) / n
    assert got["mix"] == (5, 20, round(ref, 6))
    assert got["zero"] == (3, 0, None)




def test_chi2_independence_known_cases(spark):
    """chi2 matches the textbook 2x2 computation (zero-observed cells
    included via the o²/e identity); independent columns give ~0;
    a constant column gives dof 0 and NULL cramers_v."""
    from blueetl_spark.operators.profile import chi2_independence

    def mk(rows):
        return spark.createDataFrame(rows, "x string, y string")

    # 2x2 with counts [[10, 20], [20, 10]]: e = 15 everywhere,
    # chi2 = 4 * 25/15 = 20/3, V = sqrt(chi2 / (60 * 1))
    dep = mk(
        [("a", "p")] * 10 + [("a", "q")] * 20
        + [("b", "p")] * 20 + [("b", "q")] * 10
    )
    r = chi2_independence(dep, "x", "y").head()
    assert (r.n_rows, r.n_x, r.n_y, r.dof) == (60, 2, 2, 1)
    assert r.chi2 == round(20 / 3, 6)
    assert r.cramers_v == round((20 / 3 / 60) ** 0.5, 6)

    # independent uniform grid -> chi2 exactly 0
    indep = mk([(str(i % 2), str((i // 2) % 2)) for i in range(100)])
    i = chi2_independence(indep, "x", "y").head()
    assert i.chi2 == 0.0 and i.cramers_v == 0.0

    # a zero-observed cell: x=b never sees y=r
    gap = mk(
        [("a", "p")] * 5 + [("a", "r")] * 5 + [("b", "p")] * 5
    )
    g = chi2_independence(gap, "x", "y").head()
    # sequential reference over the FULL grid including the zero cell
    n, cells = 15, {("a", "p"): 5, ("a", "r"): 5, ("b", "p"): 5}
    rx = {"a": 10, "b": 5}
    cy = {"p": 10, "r": 5}
    chi2 = sum(
        (cells.get((xx, yy), 0) - rx[xx] * cy[yy] / n) ** 2
        / (rx[xx] * cy[yy] / n)
        for xx in rx
        for yy in cy
    )
    assert abs(g.chi2 - chi2) < 1e-6

    # constant y: dof 0, V NULL
    const = chi2_independence(mk([("k", str(i % 4)) for i in range(40)]),
                              "y", "x").head()
    assert const.dof == 0 and const.cramers_v is None and const.chi2 == 0.0


def test_chi2_independence_null_categories(spark):
    """NULL categories COUNT as categories (the docstring's contract):
    20 perfectly-dependent rows plus 5 NULL-x rows must keep all 25
    rows in n_rows AND in the chi2 sum — the r10-advice regression
    where a non-null-safe margin join dropped the NULL-x cells from
    the statistic while the margins still counted them (chi2=0.0,
    n_rows=15 on this exact input)."""
    from blueetl_spark.operators.profile import chi2_independence

    rows = (
        [("a", "p")] * 10 + [("b", "q")] * 10 + [(None, "p")] * 5
    )
    r = chi2_independence(
        spark.createDataFrame(rows, "x string, y string"), "x", "y"
    ).head()
    assert (r.n_rows, r.n_x, r.n_y, r.dof) == (25, 3, 2, 2)
    # sequential reference over the full 3x2 grid, NULL as a category
    cells = {("a", "p"): 10, ("b", "q"): 10, (None, "p"): 5}
    rx = {"a": 10, "b": 10, None: 5}
    cy = {"p": 15, "q": 10}
    chi2 = sum(
        (cells.get((xx, yy), 0) - rx[xx] * cy[yy] / 25) ** 2
        / (rx[xx] * cy[yy] / 25)
        for xx in rx
        for yy in cy
    )
    assert abs(r.chi2 - chi2) < 1e-6 and r.chi2 > 10  # strongly dependent
    # NULL on BOTH sides simultaneously stays a real cell too
    both = chi2_independence(
        spark.createDataFrame(
            [("a", "p")] * 6 + [(None, None)] * 4, "x string, y string"
        ),
        "x",
        "y",
    ).head()
    assert (both.n_rows, both.n_x, both.n_y) == (10, 2, 2)
    # perfect 2x2 dependence: chi2 = n
    assert both.chi2 == 10.0


def test_join_size_estimate_empty_keys_raises(spark):
    """An empty keys sequence raises a ValueError at entry instead of
    the opaque TypeError DataFrame.filter(None) used to produce."""
    import pytest as _pytest

    from blueetl_spark.operators.profile import join_size_estimate

    df = spark.range(3)
    with _pytest.raises(ValueError, match="keys must be non-empty"):
        join_size_estimate(df, df, [])


def test_cohens_kappa_known_cases(spark):
    """kappa matches the textbook computation (classic 2-rater
    example), is 1 on perfect agreement, ~0 on independent margins,
    negative on systematic disagreement, NULL when both raters are the
    same constant (pe = 1), and NULL-rated rows are excluded."""
    from blueetl_spark.operators.profile import cohens_kappa

    def mk(rows):
        return spark.createDataFrame(rows, "a string, b string")

    # classic example: 50 items, counts [[20, 5], [10, 15]]
    rows = (
        [("y", "y")] * 20 + [("y", "n")] * 5
        + [("n", "y")] * 10 + [("n", "n")] * 15
    )
    r = cohens_kappa(mk(rows), "a", "b").head()
    po = 35 / 50
    pe = (25 * 30 + 25 * 20) / 50**2
    assert (r["n_rows"], r["n_cats"]) == (50, 2)
    assert r["po"] == round(po, 6) and r["pe"] == round(pe, 6)
    assert r["kappa"] == round((po - pe) / (1 - pe), 6)

    perfect = cohens_kappa(
        mk([("x", "x")] * 3 + [("y", "y")] * 7), "a", "b"
    ).head()
    assert perfect["kappa"] == 1.0

    # disjoint label use: diag 0, kappa negative
    disj = cohens_kappa(mk([("x", "y")] * 5 + [("y", "x")] * 5), "a", "b").head()
    assert disj["kappa"] < 0 and disj["po"] == 0.0

    # same constant on both sides: pe = 1 -> NULL kappa, po = 1
    const = cohens_kappa(mk([("k", "k")] * 9), "a", "b").head()
    assert const["kappa"] is None and const["po"] == 1.0

    # NULL ratings are excluded from everything
    withnull = cohens_kappa(
        mk([("y", "y")] * 4 + [(None, "y"), ("y", None)]), "a", "b"
    ).head()
    assert (withnull["n_rows"], withnull["kappa"]) == (4, None)  # pe=1 again


def test_spearman_known_cases(spark):
    """rho is 1 for any monotone map, -1 reversed, matches a sequential
    average-rank Pearson reference under ties, NULL for a constant
    column, and NULL-coordinate rows are excluded."""
    from blueetl_spark.operators.profile import spearman

    rows = (
        [("mono", float(i), float(i * i)) for i in range(10)]
        + [("anti", float(i), float(-i)) for i in range(8)]
        + [("tied", 1.0, 2.0), ("tied", 1.0, 3.0), ("tied", 2.0, 3.0),
           ("tied", 3.0, 1.0), ("tied", 3.0, 1.0)]
        + [("const", float(i), 5.0) for i in range(5)]
        + [("nulls", 1.0, 1.0), ("nulls", 2.0, 2.0), ("nulls", 3.0, None)]
    )
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {
        r["g"]: (r["n_rows"], r["rho"])
        for r in spearman(df, "x", "y", by=["g"]).collect()
    }
    assert got["mono"] == (10, 1.0)
    assert got["anti"] == (8, -1.0)
    assert got["const"] == (5, None)
    assert got["nulls"] == (2, 1.0)

    def brute(pairs):
        from collections import Counter

        def avg_ranks(vs):
            cnt = Counter(vs)
            out, before = {}, 0
            for v in sorted(cnt):
                out[v] = before + (cnt[v] + 1) / 2
                before += cnt[v]
            return [out[v] for v in vs]

        xs = avg_ranks([p[0] for p in pairs])
        ys = avg_ranks([p[1] for p in pairs])
        n = len(pairs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(v * v for v in xs)
        syy = sum(v * v for v in ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        den = (n * sxx - sx * sx) * (n * syy - sy * sy)
        return round((n * sxy - sx * sy) / den**0.5, 6)

    tied = [(p[1], p[2]) for p in rows if p[0] == "tied"]
    assert got["tied"] == (5, brute(tied))


def test_join_size_estimate_exact_convolution(spark):
    """The estimate IS the inner-join cardinality: hot keys convolve
    multiplicatively, NULL keys never count, disjoint key sets give 0
    with NULL ratios, and topk_share isolates the skew mass."""
    from blueetl_spark.operators.profile import join_size_estimate

    left = spark.createDataFrame(
        [("a",)] * 3 + [("b",)] * 2 + [("c",)] + [(None,)], "k string"
    )
    right = spark.createDataFrame(
        [("a",)] * 4 + [("b",)] * 1 + [("d",)] * 5 + [(None,)], "k string"
    )
    r = join_size_estimate(left, right, "k", top_k=1).head()
    true_join = left.join(right, "k").count()
    assert r.join_rows == true_join == 3 * 4 + 2 * 1
    assert (r.n_left, r.n_right, r.n_join_keys) == (6, 10, 2)
    assert r.expansion == round(14 / 10, 6)
    assert r.topk_share == round(12 / 14, 6)  # key 'a' dominates

    disjoint = join_size_estimate(
        left, spark.createDataFrame([("z",)], "k string"), "k"
    ).head()
    assert disjoint.join_rows == 0
    assert disjoint.topk_share is None


def test_jackknife_ratio_matches_sequential_replay(spark):
    """ratio/se/CI match a sequential delete-one-bucket replay with the
    same md5 bucket assignment; a group where one bucket owns the whole
    denominator reports NULL se; n_buckets < 2 raises."""
    import hashlib

    import pytest as _pytest

    from blueetl_spark.operators.profile import jackknife_ratio
    from blueetl_spark.operators.sampling import BUCKETS

    nb = 7

    def bucket_of(u):
        return (int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
                % BUCKETS) % nb

    rows = [("g", u, 10 + (u * 13) % 50, 1 + u % 4) for u in range(200)]
    # concentrated group: all denominator mass in one unit/bucket
    rows += [("solo", 999, 50, 5)]
    df = spark.createDataFrame(rows, "g string, u long, num long, den long")
    got = {
        r["g"]: r
        for r in jackknife_ratio(
            df, "u", "num", "den", by=["g"], n_buckets=nb
        ).collect()
    }

    from collections import defaultdict

    nbk, dbk = defaultdict(int), defaultdict(int)
    for g, u, num, den in rows:
        if g != "g":
            continue
        b = bucket_of(u)
        nbk[b] += num
        dbk[b] += den
    n_tot, d_tot = sum(nbk.values()), sum(dbk.values())
    buckets = sorted(nbk)
    ris = [(n_tot - nbk[b]) / (d_tot - dbk[b]) for b in buckets]
    bcount = len(buckets)
    rbar = 0.0
    for r_ in ris:
        rbar += r_
    rbar /= bcount
    var = 0.0
    for r_ in ris:
        var += (r_ - rbar) ** 2
    var *= (bcount - 1) / bcount
    se = var**0.5
    r = got["g"]
    assert r["n_units"] == 200 and r["n_buckets_used"] == bcount
    assert r["ratio"] == round(n_tot / d_tot, 6)
    assert r["se"] == round(se, 6)
    assert r["ci_lo"] == round(n_tot / d_tot - 1.96 * se, 6)
    assert r["ci_hi"] == round(n_tot / d_tot + 1.96 * se, 6)

    s = got["solo"]
    assert s["ratio"] == 10.0  # 50/5
    assert s["se"] is None and s["ci_lo"] is None  # B < 2

    with _pytest.raises(ValueError, match="n_buckets"):
        jackknife_ratio(df, "u", "num", "den", n_buckets=1)


def test_fdr_bh_matches_stepup_reference(spark):
    """q-values replicate the textbook suffix-min computation (checked
    against an independent numpy replay), ties share one q, NULL p's
    are excluded, and rejection is the step-up set at alpha."""
    import numpy as np
    from pyspark.sql import functions as F

    from blueetl_spark.operators.profile import fdr_bh

    rng = np.random.default_rng(9)
    ps = np.round(rng.uniform(0, 1, 40), 4).tolist() + [0.02, 0.02]
    rows = [(i, float(p)) for i, p in enumerate(ps)] + [(99, None)]
    df = spark.createDataFrame(rows, "tid int, p double")
    out = {r.tid: (r.m, r.q_value, r.rejected)
           for r in fdr_bh(df, "p", alpha=0.1, tie_col="tid").collect()}
    assert 99 not in out and len(out) == 42
    m = 42
    order = np.argsort(ps, kind="stable")
    q = np.empty(m)
    prev = 1.0
    for idx in range(m - 1, -1, -1):
        prev = min(prev, m * ps[order[idx]] / (idx + 1))
        q[order[idx]] = prev
    for i in range(m):
        assert out[i][0] == m
        assert abs(out[i][1] - q[i]) < 1e-6, (i, out[i][1], q[i])
        assert out[i][2] == (out[i][1] <= 0.1)
    # tied p-values share one q_value
    assert out[40][1] == out[41][1]


def test_js_divergence_bounds_and_symmetry(spark):
    """JSD(P,P)=0, disjoint supports -> ~1 (exactly 1 without bucket
    collisions), symmetric in its arguments, NULL when a side is
    empty, md5 twin agrees with the xxhash64 default on the same
    collision-free data."""
    from pyspark.sql import functions as F

    from blueetl_spark.operators.profile import js_divergence

    a = spark.createDataFrame([(f"t{i % 20}",) for i in range(400)], "k string")
    b = spark.createDataFrame([(f"u{i % 20}",) for i in range(300)], "k string")
    same = js_divergence(a, a, "k").head()
    assert same.jsd == 0.0 and same.n_a == same.n_b == 400
    big = 1 << 14  # 40 keys in 16k buckets: collision-free w.h.p.
    dis = js_divergence(a, b, "k", n_buckets=big).head()
    assert dis.jsd == 1.0
    ab = js_divergence(a, b, "k", n_buckets=64).head()
    ba = js_divergence(b, a, "k", n_buckets=64).head()
    assert ab.jsd == ba.jsd and 0.0 < ab.jsd <= 1.0
    empty = spark.createDataFrame([], "k string")
    vs_empty = js_divergence(a, empty, "k").head()
    assert vs_empty.jsd is None  # empty side: NULL, not 0 or 1
    assert vs_empty.n_a == 400 and vs_empty.n_b == 0
    md5 = js_divergence(a, b, "k", n_buckets=big, hash_fn="md5").head()
    assert md5.jsd == 1.0


def test_quantile_normalize_classic_example(spark):
    """Reproduces the classic worked 4x3 example (ties averaged), and
    the in-plan equal-size guard fires on a trimmed group."""
    import pytest as _pytest

    from blueetl_spark.operators.profile import quantile_normalize

    rows = [
        ("A", "g1", 5.0), ("B", "g1", 2.0), ("C", "g1", 3.0), ("D", "g1", 4.0),
        ("A", "g2", 4.0), ("B", "g2", 1.0), ("C", "g2", 4.0), ("D", "g2", 2.0),
        ("A", "g3", 3.0), ("B", "g3", 4.0), ("C", "g3", 6.0), ("D", "g3", 8.0),
    ]
    df = spark.createDataFrame(rows, "gene string, grp string, v double")
    got = {
        (r.grp, r.gene): r.normalized
        for r in quantile_normalize(df, "v", "grp", tie_col="gene").collect()
    }
    want = {
        ("g1", "A"): 5.666667, ("g1", "B"): 2.0, ("g1", "C"): 3.0,
        ("g1", "D"): 4.666667,
        ("g2", "A"): 5.166667, ("g2", "B"): 2.0, ("g2", "C"): 5.166667,
        ("g2", "D"): 3.0,
        ("g3", "A"): 2.0, ("g3", "B"): 3.0, ("g3", "C"): 4.666667,
        ("g3", "D"): 5.666667,
    }
    assert got == want
    from pyspark.sql import functions as F

    trimmed = df.filter(~((F.col("grp") == "g3") & (F.col("gene") == "D")))
    with _pytest.raises(Exception, match="EQUAL group"):
        quantile_normalize(trimmed, "v", "grp").collect()
