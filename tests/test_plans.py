"""Physical-plan regression guards (the properties PLANS.md documents).

These assert on `.explain` output so a future refactor that silently
drops predicate pushdown, broadcasts, or single-pass shapes fails CI —
the failure modes that don't change results, only 100 TB behavior.
"""

import re

import pytest

SF = "/root/testdata/sf0.001"


def _formatted_plan(df) -> str:
    jdf = df._jdf
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jdf.queryExecution().explainString(mode)


def test_report_extract_pushes_ts_bounds_to_scan(spark):
    from blueetl_spark import queries as Q

    plan = _formatted_plan(Q.q_report_extract(spark, SF))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any(
        "GreaterThanOrEqual(ts" in l and "LessThan(ts" in l for l in pushed
    ), f"time envelope not pushed to parquet scan:\n{pushed}"


def test_report_extract_broadcasts_windows_not_events(spark):
    from blueetl_spark import queries as Q

    plan = _formatted_plan(Q.q_report_extract(spark, SF))
    # the interval join must be a broadcast hash join whose range condition
    # references the window bounds — never a shuffle of the event table
    assert re.search(r"BroadcastHashJoin[\s\S]*__lo", plan)
    assert "SortMergeJoin" not in plan


def test_pricing_summary_prunes_and_pushes(spark):
    from blueetl_spark import queries as Q

    plan = _formatted_plan(Q.q_pricing_summary(spark, SF))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {
        "l_quantity", "l_extendedprice", "l_discount",
        "l_returnflag", "l_linestatus", "l_shipdate",
    }, cols
    assert "LessThan(l_shipdate" in plan


def test_histogram_scans_events_once(spark):
    from blueetl_spark import queries as Q

    plan = _formatted_plan(Q.q_histogram(spark, SF))
    # single-pass densify: exactly one events.parquet scan carrying the
    # pushed ts bounds (the second events scan builds the gid->class map)
    bounded_scans = [
        l for l in plan.splitlines()
        if "PushedFilters" in l and "GreaterThanOrEqual(ts" in l
    ]
    assert len(bounded_scans) == 1, bounded_scans


def test_dedup_exact_single_shuffle(spark):
    from blueetl_spark import queries as Q

    plan = _formatted_plan(Q.q_dedup_exact(spark, SF))
    exchanges = [
        l for l in plan.splitlines()
        if re.match(r"\(\d+\) Exchange", l.strip())
    ]
    assert len(exchanges) == 1, exchanges


def test_knn_lsh_joins_on_bucket_not_cross(spark):
    from blueetl_spark import queries as Q

    plan = _formatted_plan(Q.QUERIES["knn_lsh"](spark, SF))
    # the candidate join must be an equi-join on (table, bucket); the only
    # acceptable broadcast-nested-loop is none at all here
    assert "__bucket" in plan
    assert "BroadcastNestedLoopJoin" not in plan.split("== Physical Plan ==")[-1]


def test_condition_codes_no_full_table_single_partition_sort(spark):
    """A7 scale shape: only the distinct code table is globally sorted;
    the full table reaches the codes via a broadcast join, never a
    single-partition window."""
    from blueetl_spark import queries as Q

    plan = _formatted_plan(Q.q_condition_codes(spark, SF))
    assert "BroadcastHashJoin" in plan
    # every single-partition exchange must sit under a distinct aggregate
    # (the code table), not take the raw customer scan
    sp = plan.count("Exchange SinglePartition")
    assert sp <= 1, plan
    assert "HashAggregate" in plan


def test_ivf_index_search_prunes_cell_partitions(spark, tmp_path):
    """search_ivf_index must read only the probed cells' partitions: the
    assignments scan carries a PartitionFilters entry on `cell`."""
    from pyspark.sql import functions as F

    from blueetl_spark.operators import similarity as sim
    from blueetl_spark.sources import tables

    emb = tables.load(spark, SF, "embeddings")
    cents = [
        r.embedding
        for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    idx = str(tmp_path / "ivf")
    info = sim.build_ivf_index(emb, idx, centroids=cents)
    assert info["n_centroids"] == 8 and info["n_vectors"] == emb.count()
    out = sim.search_ivf_index(
        spark, emb.filter(F.col("vec_id") < 3), idx, k=3, n_probe=2
    )
    plan = _formatted_plan(out)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert any("cell" in l and "IN" in l.upper() for l in pf), plan
    assert out.count() > 0


def test_sessionization_single_shuffle_pruned_scan(spark):
    """Gaps-and-islands runs with ONE exchange (the session fold on
    by+session reuses the window's partitioning on by) and the scan is
    pruned to the two columns the query touches."""
    from blueetl_spark import queries as Q

    plan = _formatted_plan(Q.q_sessionization(spark, SF))
    exchanges = {
        l.strip() for l in plan.splitlines()
        if re.match(r"\(\d+\) Exchange", l.strip())
    }
    assert len(exchanges) == 1, exchanges
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"ts", "user_id"}, cols


def test_minhash_signatures_codegen_and_one_exchange(spark):
    """The signature stage must stay the codegen'd explode+groupBy shape
    (PLANS.md round-5): exactly ONE data exchange (on the doc id, after
    map-side partial agg collapses each doc to its signature) beyond the
    small-scan fan-out repartition, and ZERO nested higher-order
    min-transforms (the interpreted rewrite this guards against)."""
    from blueetl_spark.operators.dedup import minhash_signatures
    from blueetl_spark.sources import tables

    docs = tables.load(spark, SF, "documents")
    plan = _formatted_plan(minhash_signatures(docs))
    # no array_min-over-transform signature kernel
    assert "array_min" not in plan
    # partial aggregation present (map-side combine of the 64 mins)
    assert re.search(r"HashAggregate[\s\S]*partial_min", plan) or \
        "partial_min" in plan
    # exchanges: exactly one hash exchange (the signature groupBy);
    # the small-scan fan-out may add one RoundRobin, never a second hash
    assert len(re.findall(r"hashpartitioning\(", plan)) == 1, plan[:2000]


def test_language_id_broadcasts_profiles(spark):
    """Classification must broadcast the (config-sized) profile table
    and the penalty scalar — no profile-side shuffle, no corpus-wide
    window."""
    from blueetl_spark import queries as Q

    plan = _formatted_plan(Q.q_language_id(spark, SF))
    assert "BroadcastExchange" in plan
    # the only row_number window allowed is the per-language profile
    # ranking (partition by lang) — never one partitioned by doc
    win = [l for l in plan.splitlines() if "row_number" in l]
    assert all("lang" in l for l in win), win
    assert not any("doc_id" in l for l in win), win
    # round-7 single-subtree shape (language_id_pipeline): the corpus
    # gram aggregation ran ONCE at construction and the classify plan
    # reads its checkpointed rows — normalization/explode never re-runs
    assert "ExistingRDD" in plan
    assert "regexp_replace" not in plan
    assert "explode" not in plan


def test_two_phase_index_no_global_sort(spark):
    """dense_index(two_phase=True) must not plan a global Sort+window
    over the data. Since the 871ad17 rewrite the rank pass is a pure-JVM
    broadcast hash join against a config-sized per-(partition, group)
    offset table — no Window, and no Arrow/mapInPandas pass either."""
    from blueetl_spark.operators.extraction import dense_index
    from blueetl_spark.sources import tables

    customer = tables.load(spark, SF, "customer")
    plan = _formatted_plan(
        dense_index(customer, ["c_nationkey"], "c_custkey", "idx", two_phase=True)
    )
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan
    assert "mapInPandas" not in plan and "MapInPandas" not in plan


def test_lsh_candidates_read_checkpointed_signatures(spark):
    """Round-6 pin: the MinHash/SimHash pair-finders eagerly
    localCheckpoint the signature frame, so the candidates plan must scan
    the checkpointed RDD on every consumer instead of recomputing the
    shingle aggregation per self-join side (verified regression: 3x
    signature recompute, 13.5s vs 2.4s+join at 200k docs)."""
    from blueetl_spark.operators import dedup
    from blueetl_spark.sources import tables

    docs = tables.load(spark, SF, "documents")
    for fn in (dedup.minhash_lsh_candidates, dedup.simhash_candidates):
        plan = _formatted_plan(fn(docs))
        # the signature subtree ran at construction; the remaining plan
        # reads blocks (ExistingRDD) and must not contain the shingle
        # explode/aggregation pipeline anywhere
        assert "ExistingRDD" in plan, plan[:1500]
        assert "partial_min" not in plan and "bit_count(xor" not in plan.split(
            "ExistingRDD"
        )[0]  # no recompute upstream of the scan
        assert "regexp" not in plan  # shingling never re-runs


def test_ivf_pq_search_prunes_cells_after_dedup_and_exclude(spark, tmp_path):
    """The r7 tombstone anti-join / exclude / dropDuplicates additions in
    search_ivf_pq_index must not defeat partition pruning: the codes scan
    still carries a PartitionFilters entry on `cell`."""
    from pyspark.sql import functions as F

    from blueetl_spark.operators import pq
    from blueetl_spark.sources import tables

    emb = tables.load(spark, SF, "embeddings")
    idx = str(tmp_path / "ivfpq")
    pq.build_ivf_pq_index(emb, idx, n_centroids=8, n_subspaces=8, n_codes=16)
    q = emb.filter(F.col("vec_id") < 3)
    out = pq.search_ivf_pq_index(
        spark, q, idx, k=3, n_probe=2,
        exclude=emb.filter(F.col("vec_id") >= 490).select("vec_id"),
    )
    plan = _formatted_plan(out)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert any("cell" in l and "IN" in l.upper() for l in pf), plan
    assert out.count() > 0


def test_semdedup_pairs_one_shuffle_group_kernel(spark):
    """semdedup_pairs is one plan: assignment mapInPandas feeds a single
    cluster-key exchange into the grouped blocked-matmul kernel — no
    self-join, no per-pair Arrow rows."""
    import re

    from pyspark.sql import functions as F

    from blueetl_spark.operators import clustering
    from blueetl_spark.sources import tables

    emb = tables.load(spark, SF, "embeddings")
    cents = [
        r.embedding
        for r in emb.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()
    ]
    plan = _formatted_plan(clustering.semdedup_pairs(emb, cents, threshold=0.3))
    assert "FlatMapGroupsInPandas" in plan
    assert "Join" not in plan
    assert len(re.findall(r"hashpartitioning\(", plan)) == 1, plan[:2000]


def test_linear_hashed_scorer_is_map_only(spark):
    """score_linear_hashed rides the weight vector as an array literal
    inside one whole-stage-codegen'd project — zero exchanges, zero
    joins, zero Python: a 100 TB scan scores at I/O speed."""
    from blueetl_spark.operators.classifier import score_linear_hashed
    from blueetl_spark.sources import tables

    docs = tables.load(spark, SF, "documents").select("doc_id", "text")
    plan = _formatted_plan(score_linear_hashed(docs, [0.1] * 64))
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "InPandas" not in plan and "ArrowEvalPython" not in plan
    # the whole query is literally Project-over-Scan (the aggregate
    # higher-order function is JVM interpreted-eval, not codegen — still
    # no Python and no extra operator)
    assert "Project" in plan and "Aggregate" not in plan


def test_dsir_scoring_broadcasts_bucket_ratios(spark):
    """dsir_logweights' distribution estimates collapse to n_buckets
    rows and are broadcast back into the scoring join; the only
    doc-scale shuffle keys on the output group-by."""
    from pyspark.sql import functions as F

    from blueetl_spark.operators.text import dsir_logweights
    from blueetl_spark.sources import tables

    docs = tables.load(spark, SF, "documents")
    plan = _formatted_plan(
        dsir_logweights(docs, docs.filter(F.col("lang") == "en"))
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_rollup_revenue_broadcasts_dims_single_shuffle(spark):
    """ROLLUP over the dim chain: all three dimension joins broadcast
    (orders never shuffles for a join) and the grouping sets land as
    Expand + ONE aggregate exchange — the plan that scales to a 100 TB
    fact table."""
    import re

    from blueetl_spark import queries as Q

    plan = _formatted_plan(Q.q_rollup_revenue(spark, SF))
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) == 3
    assert "SortMergeJoin" not in plan
    assert re.search(r"\(\d+\) Expand", plan)
    # exactly one non-broadcast exchange: the rollup aggregate
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_order_gaps_single_shuffle_pruned_scan(spark):
    """LAG gap query: one exchange (the window's custkey partitioning),
    no join, and the scan reads only the three referenced columns."""
    import re

    from blueetl_spark import queries as Q

    plan = _formatted_plan(Q.q_order_gaps(spark, SF))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "Join" not in plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"o_orderkey", "o_custkey", "o_orderdate"}, cols


def test_pivot_no_distinct_discovery_job(spark):
    """Explicit pivot values: the plan must be a pure two-level
    aggregate (partial combine map-side, partials bounded by
    |status|x|priority| per task) with NO separate distinct-value
    collect job — `.pivot(col)` without values would run one."""
    import re

    from blueetl_spark import queries as Q

    plan = _formatted_plan(Q.q_status_priority_pivot(spark, SF))
    assert "Join" not in plan and "Window" not in plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"o_orderstatus", "o_orderpriority"}, cols


def test_rolling_stats_single_exchange_pruned_scan(spark):
    """RANGE-frame rolling agg: one keyed exchange + one Window, no
    join (a time self-join would blow up with span), scan pruned to the
    three referenced columns."""
    import re

    from blueetl_spark import queries as Q

    plan = _formatted_plan(Q.q_rolling_value_stats(spark, SF))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "Join" not in plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"ts", "user_id", "value"}, cols


def test_value_deciles_no_global_sort(spark):
    """Equi-depth bucketing must NOT be the ntile shape: no Sort, no
    Window — boundaries reduce to one broadcast row and assignment is
    map-side (the only joins are against the 1-row boundary frame)."""
    from blueetl_spark import queries as Q

    import re

    plan = _formatted_plan(Q.q_value_deciles(spark, SF))
    assert "Window" not in plan
    assert re.search(r"\(\d+\) Sort\b", plan) is None
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row boundary frame


def test_cube_single_expand_single_exchange(spark):
    """CUBE compiles to Expand + one aggregate exchange — never a
    union of per-grouping-set scans."""
    import re

    from blueetl_spark import queries as Q

    plan = _formatted_plan(Q.q_cube_status_priority(spark, SF))
    assert len(re.findall(r"\(\d+\) Expand", plan)) == 1
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_market_share_semi_joins_and_pruned_lineitem_scan(spark):
    """Q8-style join tree: the pure-filter dims (part type, customer
    region) must reduce via SEMI joins carrying no payload, the part
    type predicate must reach its scan, and the lineitem scan must read
    only the join keys + money columns."""
    from blueetl_spark import queries as Q

    plan = _formatted_plan(Q.q_market_share(spark, SF))
    assert plan.count("LeftSemi") >= 2, plan[:2000]
    assert "EqualTo(p_type,PROMO)" in plan
    m = [
        re.search(r"struct<([^>]*)>", line).group(1)
        for line in plan.splitlines()
        if "ReadSchema" in line and "l_orderkey" in line
    ]
    assert m, plan
    cols = {c.split(":")[0] for c in m[0].split(",")}
    assert cols == {
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount",
    }, cols


def test_funnel_one_user_exchange_no_window(spark):
    """The funnel's sequential-min fold must stay a single user-key
    exchange with the step-type filter pushed to the scan — never a
    per-stage join chain or a window."""
    from blueetl_spark import queries as Q

    plan = _formatted_plan(Q.q_funnel_conversion(spark, SF))
    assert "Window" not in plan
    assert "In(event_type" in plan  # step filter reaches the scan
    # exactly one keyed exchange (the user groupBy); the k-row tally
    # and sort exchanges are not hash partitionings
    assert len(re.findall(r"hashpartitioning\(", plan)) == 1
    assert "partial_collect_list" in plan  # map-side combine engaged


def test_pareto_two_arrow_passes_single_final_partition(spark):
    """The skyline runs exactly two Arrow passes (local frontiers, then
    the single-partition global pass over the pinned candidates) and
    never a quadratic join."""
    from blueetl_spark import queries as Q

    plan = _formatted_plan(Q.q_pareto_parts(spark, SF))
    # two MapInPandas nodes in ONE lazy plan (local frontiers, then the
    # global pass), separated by the single-partition exchange; the
    # candidate-size gate lives inside the global kernel, so no eager
    # localCheckpoint/count materializations remain (r11 verdict #1)
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 2
    assert "Join" not in plan
    assert "SinglePartition" in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_value_trend_single_aggregate_pass(spark):
    """The grouped OLS must be ONE map-side-combined aggregate over the
    data — five running sums, no second pass, no join, no window."""
    from blueetl_spark import queries as Q

    plan = _formatted_plan(Q.q_value_trend(spark, SF))
    assert "Window" not in plan and "Join" not in plan
    assert "partial_" in plan  # map-side combine engaged
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_basket_rules_pins_items_and_joins_on_basket(spark):
    """The distinct (basket, item) frame is pinned (consumed by totals,
    item counts, and both self-join sides) — the plan reads the
    checkpointed RDD, never re-scans/re-distincts lineitem four times."""
    from blueetl_spark import queries as Q

    plan = _formatted_plan(Q.q_basket_rules(spark, SF))
    assert "Scan parquet" not in plan  # all consumers read the pin
    assert plan.count("Scan ExistingRDD") >= 3
    assert "BatchEvalPython" not in plan


def test_registry_wide_no_row_python_udfs(spark):
    """Sweep EVERY registered query's physical plan: row-at-a-time
    Python (BatchEvalPython) is banned repo-wide — all Python kernels
    must be Arrow-batched. The headline shapes are pinned individually
    above; this catches the long tail after any refactor."""
    from blueetl_spark.queries import QUERIES

    offenders = {}
    for name, fn in QUERIES.items():
        plan = _formatted_plan(fn(spark, SF))
        if "BatchEvalPython" in plan:
            offenders[name] = "BatchEvalPython"
    assert not offenders, offenders


def test_incremental_rollup_maintenance_identity(spark):
    """The incrementally maintained rollup equals a recompute from the
    patched base: updates as -old/+new pairs, full retraction drops the
    key, first-seen keys appear; a delta that over-retracts raises."""
    import pytest
    from pyspark.sql import functions as F

    from blueetl_spark.plans.stores import incremental_rollup

    base = spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 5), ("c", 7)], "k string, v long"
    )
    agg0 = base.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("sum_v")
    )
    delta = spark.createDataFrame(
        [
            ("a", 20, -1), ("a", 25, 1),   # update 20 -> 25
            ("b", 5, -1),                  # retract b entirely
            ("d", 100, 1), ("d", 1, 1),    # brand-new key
        ],
        "k string, v long, sign long",
    )
    got = {
        r["k"]: (r["n_rows"], r["sum_v"])
        for r in incremental_rollup(agg0, delta, "k", ["v"]).collect()
    }
    assert got == {"a": (2, 35), "c": (1, 7), "d": (2, 101)}

    bad = spark.createDataFrame([("c", 7, -1), ("c", 9, -1)],
                                "k string, v long, sign long")
    with pytest.raises(Exception, match="negative"):
        incremental_rollup(agg0, bad, "k", ["v"]).collect()

    with pytest.raises(ValueError, match="missing column"):
        incremental_rollup(agg0.drop("sum_v"), delta, "k", ["v"])


def test_continuation_gates_plan_shapes(spark):
    """Exchange-count pins for the round-10 continuation gates: the
    rank statistics ride one pre-agg exchange + one window partition;
    the scorer-eval gates never re-join documents on doc_id (no SMJ);
    KM keeps its three keyed stages; no row-at-a-time Python anywhere."""
    from blueetl_spark import queries as Q

    def exchanges(plan):
        return sum(
            "Exchange hashpartitioning" in l for l in plan.splitlines()
        )

    mw = _formatted_plan(Q.q_mann_whitney(spark, SF))
    assert exchanges(mw) <= 2, mw
    assert "BatchEvalPython" not in mw

    auc = _formatted_plan(Q.q_score_auc(spark, SF))
    assert exchanges(auc) <= 2, auc
    assert "SortMergeJoin" not in auc, "doc_id re-join crept back in"

    cal = _formatted_plan(Q.q_score_calibration(spark, SF))
    assert "SortMergeJoin" not in cal, "doc_id re-join crept back in"
    assert exchanges(cal) <= 3, cal

    km = _formatted_plan(Q.q_kaplan_meier(spark, SF))
    assert exchanges(km) <= 3, km

    sa = _formatted_plan(Q.q_seasonal_anomalies(spark, SF))
    assert exchanges(sa) <= 3, sa
    # baseline attaches via broadcast, never a data-sized shuffle join
    assert "BroadcastHashJoin" in sa, sa

    for q in (mw, auc, cal, km, sa):
        assert "BatchEvalPython" not in q


def test_round11_gates_plan_shapes(spark):
    """Plan pins for the round-11 gates: the HLL shard path is one
    map-side-combined max per shard with a broadcast register merge;
    kappa/CUPED/jackknife/target-encode attach their small re-aggregated
    sides by broadcast (no SortMergeJoin anywhere — a data-sized SMJ
    would mean a stats table stopped being category/bucket-sized); no
    row-at-a-time Python anywhere."""
    from blueetl_spark import queries as Q

    plans = {
        name: _formatted_plan(fn(spark, SF))
        for name, fn in [
            ("hll_distinct", Q.q_hll_distinct),
            ("cuped_experiment", Q.q_cuped_experiment),
            ("jackknife_rpo", Q.q_jackknife_rpo),
            ("target_encode", Q.q_target_encode),
            ("theil_sen_windowed", Q.q_theil_sen_windowed),
        ]
    }
    for name, p in plans.items():
        assert "BatchEvalPython" not in p, name
        assert "SortMergeJoin" not in p, (name, "data-sized join crept in")
    # jackknife: the customer dim attaches by broadcast
    assert "BroadcastHashJoin" in plans["jackknife_rpo"]
    # windowed TS: exactly the two keyed exchanges of the two-level
    # design (per-(gid, window) then per-gid)
    ts_ex = sum(
        "Exchange hashpartitioning" in l
        for l in plans["theil_sen_windowed"].splitlines()
    )
    assert ts_ex <= 2, plans["theil_sen_windowed"]


def test_round12_gates_plan_shapes(spark):
    """Plan pins for the round-12 gates: no row-at-a-time Python
    anywhere; the windowed/statistical gates keep their data-sized
    sides out of SortMergeJoins (jsd's bucket-grain full-outer SMJ and
    qnorm's rank-grain joins are the two deliberate exceptions — both
    join frames are already aggregate-bounded); pareto-style kernels
    stay two Arrow passes; the quantile-normalize rework holds at 4
    exchanges / 4 scans (first cut: 13 / 6)."""
    import re

    from blueetl_spark import queries as Q

    plans = {
        name: _formatted_plan(Q.QUERIES[name](spark, SF))
        for name in [
            "fdr_correction",
            "nelson_aalen",
            "conformal_thresholds",
            "qnorm_shards",
            "jsd_shards",
            "auc_delong",
            "k_anonymity",
            "isotonic_curve",
            "mmr_diverse",
        ]
    }
    for name, p in plans.items():
        assert "BatchEvalPython" not in p, name
    # single-scan single-window families
    for name in ("fdr_correction", "nelson_aalen", "auc_delong"):
        assert len(re.findall(r"\(\d+\) Scan parquet", plans[name])) == 1, name
        assert "SortMergeJoin" not in plans[name], name
    # k-anonymity: one aggregate, no join at all
    assert "Join" not in plans["k_anonymity"]
    ka_ex = len(re.findall(r"\(\d+\) Exchange", plans["k_anonymity"]))
    assert ka_ex <= 2, plans["k_anonymity"]  # count + countDistinct Expand
    # qnorm rework pin: the groupBy+join-back tie rule would re-inflate
    # these counts (13 exchanges / 6 scans before the window rework)
    assert len(re.findall(r"\(\d+\) Exchange", plans["qnorm_shards"])) <= 5
    assert len(re.findall(r"\(\d+\) Scan parquet", plans["qnorm_shards"])) <= 4
    # Arrow (not row) Python kernels where Python is used at all
    assert "FlatMapGroupsInPandas" in plans["mmr_diverse"]
    assert "FlatMapGroupsInPandas" in plans["isotonic_curve"]


def test_round13_ranking_gates_plan_shapes(spark):
    """Plan pins for the round-13 ranking-eval kit: the metric kernel is
    ONE scan + one rank window + one collect_list aggregate — pure JVM
    (no Python of any kind), no join; the summary adds one scalar
    aggregate on top, nothing else. The ANN eval's two label lookups
    attach by broadcast (never a data-sized SMJ)."""
    import re

    from blueetl_spark import queries as Q

    plans = {
        name: _formatted_plan(Q.QUERIES[name](spark, SF))
        for name in [
            "ranking_eval_orders",
            "retrieval_eval_ann",
            "retrieval_eval_summary",
            "rrf_orders",
            "fleiss_agreement",
            "krippendorff_agreement",
            "rbo_rankings",
        ]
    }
    for name, p in plans.items():
        assert "BatchEvalPython" not in p, name
        assert "FlatMapGroupsInPandas" not in p, (name, "metric is JVM-only")
    for name in ("ranking_eval_orders", "retrieval_eval_summary"):
        p = plans[name]
        assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, name
        assert "Join" not in p, (name, "metrics never need a join")
        # rank window shuffle + metric groupBy (+ AQE singles)
        assert len(re.findall(r"\(\d+\) Exchange hashpartitioning", p)) <= 2, p
    ann = plans["retrieval_eval_ann"]
    assert "SortMergeJoin" not in ann, ann
    assert "BroadcastHashJoin" in ann, ann
    # RRF: union of the two rank windows (each its own custkey
    # exchange), ONE fuse groupBy + per-query rank window — no join
    # anywhere, nothing beyond the custkey-keyed exchanges
    rrf = plans["rrf_orders"]
    assert "Join" not in rrf, rrf
    assert len(re.findall(r"\(\d+\) Exchange hashpartitioning", rrf)) <= 4, rrf
    # Fleiss: ONE linear chain — vote-grain explode -> (item,cat)
    # count -> GROUPING SETS over an Expand folds the item-grain and
    # category-grain moments in a single aggregate (the r13 rework:
    # the old two-branch shape re-executed the vote pipeline per
    # branch and needed AQE exchange reuse to dedup it; now there is
    # nothing duplicated to reuse). Pin: one scan, an Expand, no join
    # of any kind, and at most 3 data exchanges.
    fl = plans["fleiss_agreement"]
    assert len(re.findall(r"\(\d+\) Scan parquet", fl)) == 1, fl
    assert "Expand" in fl, fl
    assert "Join" not in fl, fl
    assert len(re.findall(r"\(\d+\) Exchange hashpartitioning", fl)) <= 3, fl
    # Krippendorff: same grouping-sets fold over the unit-keyed
    # window; no data-sized SMJ (the only joins are scalar crosses)
    ka = plans["krippendorff_agreement"]
    assert "SortMergeJoin" not in ka, ka
    assert len(re.findall(r"\(\d+\) Scan parquet", ka)) == 1, ka
    assert "Expand" in ka, ka
    # RBO: both sides are k-bounded lists sharing the custkey
    # partitioning — the (query, doc) equi-join and the universe
    # left-join must not introduce a fresh data-sized exchange chain
    rb = plans["rbo_rankings"]
    assert "BatchEvalPython" not in rb, rb
    assert len(re.findall(r"\(\d+\) Exchange hashpartitioning", rb)) <= 5, rb


def test_triangle_corner_fold_single_wedge_pass(spark):
    """r13 optimization pin: the per-node corner fold is an explode of
    the (s, t, t2) corner array — ONE evaluation of the wedge+closing
    join subtree. The previous 3-branch union planned the subtree three
    times (one wedge self-join + closing semi-join per branch)."""
    from blueetl_spark.operators import graph

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5)], ["src", "dst"]
    )
    plan = _formatted_plan(graph.triangle_count(edges))
    assert "Union" not in plan, plan
    assert plan.count("Generate") == 2, plan  # tree + detail of ONE explode
    assert len(re.findall(r"LeftSemi", plan)) <= 2, plan  # one semi-join


def test_jaccard_prefix_single_rank_pass_no_size_joins(spark):
    """r13 optimization pin: the rarest-first rank window runs once
    (inside the pinned prefix frame — the final plan carries NO Window
    nodes), and set sizes ride the candidate pairs instead of two
    per-doc size aggregates + verify-side joins."""
    from blueetl_spark import queries as Q

    plan = _formatted_plan(Q.QUERIES["jaccard_prefix"](spark, SF))
    assert "Window" not in plan, plan
    # scans: pinned pref x2 (candidate self-join) + pinned shingles x2
    # (verify) — the committed shape re-planned the window subtree per
    # side and scanned the shingle frame 8 times
    assert len(re.findall(r"\(\d+\) Scan ExistingRDD", plan)) <= 4, plan


def test_heavy_hitters_single_subtree_per_shard(spark):
    """r13 optimization pin: topk_shard derives n_kept/bound as window
    functions over the ≤m-row kept frame and merge_topk_shards folds
    the stream-wide bound total via a window over the deduped rows —
    so each shard's data-sized count + top-m subtree appears EXACTLY
    once in the plan. The previous aggregate-branch + crossJoin shape
    planned every shard's source scan 4x (12 scans for the 3-shard
    gate; 3 now)."""
    from blueetl_spark import queries as Q

    plan = _formatted_plan(Q.QUERIES["heavy_hitters_shards"](spark, SF))
    n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scans == Q.HH_SHARDS, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan


def test_containment_sizes_ride_signature_pass(spark):
    """r13 optimization pin: containment set sizes come out of the SAME
    pinned per-doc aggregate as the MinHash signatures (with_size), so
    the final plan reads only the pinned frame — no parquet re-scan, no
    second shingle explode (the committed shape re-exploded the corpus
    once per join side)."""
    from blueetl_spark import queries as Q

    plan = _formatted_plan(Q.QUERIES["containment_md5"](spark, SF))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 0, plan
    # the only Generates are the two band explodes over the pinned
    # signatures (one per candidate self-join side) — never the
    # corpus-wide shingle explode (that runs once, inside the pin job)
    assert len(re.findall(r"\(\d+\) Generate", plan)) <= 2, plan


def test_bloom_prejoin_builds_word_table_once(spark):
    """r13 optimization pin: the Bloom word table is pinned before the
    k probe broadcasts, so the dim-side scan + bit_or aggregate runs
    once — the final plan's only parquet scans are the fact side and
    the real join's dim side (the committed shape re-planned the build
    under every one of the k broadcasts: 7 scans, now 2)."""
    from blueetl_spark import queries as Q

    plan = _formatted_plan(Q.QUERIES["bloom_join_revenue"](spark, SF))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 2, plan
