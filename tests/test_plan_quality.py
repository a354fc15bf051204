"""Physical-plan quality gates (the 100 TB design checks, SURVEY.md §4.3).

Correct results are necessary, not sufficient: these tests pin the plan
properties that keep queries viable at 1000× the test data —
filter pushdown into the parquet scan, column pruning, broadcast joins
for bounded dims, and no cross products where an equi-join is intended.
"""

from __future__ import annotations

import re

import pytest

from etl_pipeline_with_alpha_vantage_spark import registry

registry.load_all()


def plan_of(spark, name, sf_dir, mode="formatted"):
    df = registry.QUERIES[name](spark, sf_dir)
    jvm_mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jvm_mode)


def read_widths(plan: str) -> list[int]:
    return [s.count(":") for s in re.findall(r"ReadSchema: struct<([^>]*)>", plan)]


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = plan_of(spark, "filter_predicates", sf_dir)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)", plan)
    assert pushed and any("l_shipdate" in p for p in pushed), plan
    assert any("l_quantity" in p or "GreaterThan" in p for p in pushed)
    # 5 columns used of 11 in lineitem — scan must not read the rest
    assert max(read_widths(plan)) <= 5, plan


def test_column_pruning_on_joins(spark, sf_dir):
    plan = plan_of(spark, "join_customer_orders", sf_dir)
    # customer: (c_custkey, c_mktsegment); orders: (o_custkey, o_totalprice)
    assert read_widths(plan) and max(read_widths(plan)) <= 3, plan


def test_dims_broadcast_in_star_join(spark, sf_dir):
    plan = plan_of(spark, "join_broadcast_dims", sf_dir)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_no_cartesian_in_equi_joins(spark, sf_dir):
    for name in (
        "join_customer_orders",
        "q3_shipping_priority",
        "q5_local_supplier_volume",
        "dedup_minhash_lsh",
    ):
        plan = plan_of(spark, name, sf_dir)
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"


def test_topk_plans_take_ordered(spark, sf_dir):
    plan = plan_of(spark, "topk_orders", sf_dir)
    assert "TakeOrderedAndProject" in plan, plan


def test_brute_force_broadcasts_query_side(spark, sf_dir):
    # corpus side must stream; only the 5 query vectors are broadcast
    plan = plan_of(spark, "similarity_topk_brute", sf_dir)
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_asof_join_single_shuffle_no_blowup(spark, sf_dir):
    """The union-window as-of formulation must not contain any join at
    all — one shuffle on user_id, then a window."""
    plan = plan_of(spark, "asof_join", sf_dir)
    assert "Join" not in plan, plan
    assert "Window" in plan


# Queries where a nested-loop join is the INTENDED plan: bounded cross
# join, brute-force scoring against a broadcast query set, band range join.
_NESTED_LOOP_OK = {
    "cross_join_grid",
    "similarity_topk_brute",
    "dedup_embedding_cosine",
    "range_join_bands",
    "q22_dormant_value",  # 1-row scalar-subquery (global avg) broadcast
    "q11_important_parts",  # 1-row global-total broadcast (non-equi filter)
    "text_tfidf",  # 1-row corpus-size broadcast
    "text_perplexity_proxy",  # 1-row corpus-token-count broadcast
    "text_bigram_lm",  # 1-row vocabulary-size broadcast
    "agg_equidepth_buckets",  # 1-row quartile-boundary broadcast
    "rfm_segments",  # 1-row threshold broadcast
    "basket_affinity",  # 1-row order-count broadcast
    "sample_balanced_classes",  # 1-row min-class-quota broadcast
    "abc_pareto_classes",  # 1-row revenue-total broadcast
    "embedding_quantize_int8",  # 1-row per-dim range-arrays broadcast
    "similarity_sq8_topk",  # broadcast query vectors + 1-row range arrays
    "dq_expectations",  # crossJoin of two 1-row aggregates (FK block)
    "churn_rate_by_nation",  # 1-row data-derived horizon broadcast
    "search_bm25_topk",  # 1-row corpus-stats (N, Σdl) broadcast
    "churn_survival_km",  # 1-row data-derived max-date broadcast
    "ab_cuped_adjustment",  # 1-row midpoint + 1-row pooled-θ broadcasts
    "similarity_pq_adc_topk",  # 5-row query-id fan-out (ADC scoring)
    "agg_kmv_set_ops",  # 2-row pair frame joined on a disjunctive key
    "ml_logistic_gd",  # 1-row weight/gradient broadcasts per iteration
    "corpus_novelty_decay",  # 1-row max-doc-id broadcast (batch bounds)
    "ml_naive_bayes_langid",  # 1-row n/vocab + 5-row class-prior broadcasts
    "layout_zorder_skipping",  # 1-row min/max bounds broadcast (bucketing)
    "search_rrf_fusion",  # 1-row query-vector broadcast (dense ranking arm)
    "similarity_pq_rerank_topk",  # PQ stage's 5-row query fan-out (shared)
    "eval_retrieval_ndcg",  # BM25 corpus-stats + 1-row DCG x IDCG joins
    "ml_decision_stump",  # 1-row (N, P) total broadcast over the histogram
    "sample_stratified_neyman",  # 1-row Σweight + 1-row remainder broadcasts
    "stats_kruskal_wallis",  # 1-row N/k + 1-row tie-term broadcasts
    "stats_welch_anova",  # 1-row wmax/N/k + 1-row Σpin broadcasts
    "stats_games_howell",  # k-row group self-join (non-equi pair orient)
    "stats_anova_twoway",  # 1-row A-margin + 1-row B-margin broadcasts
    "privacy_t_closeness",  # bounded band-grid + 1-row totals broadcasts
    "graph_clustering_global",  # two 1-row count broadcasts (edges, tri)
    "graph_hits",  # 1-row global-max broadcast per rescale
    "graph_modularity",  # 1-row (m2, total-degree) broadcast
    "stats_dunn_test",  # k-row pair orient + 1-row N/tie broadcasts
    "stats_spearman_rank",  # two 1-row distinct-count broadcasts
    "eval_retrieval_map",  # BM25 corpus-stats + 1-row relevant-count
    "encode_target_smoothed",  # 1-row global prior broadcast
    "stats_friedman_test",  # 1-row b/k/S1/S2 aggregate broadcasts
    "stats_page_trend",  # 1-row b/k/L aggregate broadcasts
}


def test_no_cartesian_anywhere_no_unintended_nested_loops(spark, sf_dir):
    """Global plan lint: no query may plan a CartesianProduct, and only
    the whitelisted (bounded) queries may plan a nested-loop join."""
    offenders = []
    for name in sorted(registry.QUERIES):
        plan = plan_of(spark, name, sf_dir, mode="simple")
        if "CartesianProduct" in plan:
            offenders.append((name, "CartesianProduct"))
        if "BroadcastNestedLoopJoin" in plan and name not in _NESTED_LOOP_OK:
            offenders.append((name, "BroadcastNestedLoopJoin"))
    assert not offenders, offenders


def test_pack_sequences_one_shuffle_grouped_pandas(spark, sf_dir):
    """Packing is one shuffle on the group key into a single grouped
    Arrow UDF — the sequential recurrence never touches the driver."""
    plan = plan_of(spark, "pack_sequences", sf_dir, mode="simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "FlatMapGroupsInPandas" in plan, plan


def test_cohort_retention_partial_distinct_before_shuffle(spark, sf_dir):
    """The fact scan is read once and collapses map-side (partial
    HashAggregate below the first exchange) before anything shuffles."""
    plan = plan_of(spark, "cohort_retention", sf_dir, mode="simple")
    assert plan.count("Scan parquet") == 1, plan
    # partial agg appears under the exchange: HashAggregate → Exchange →
    # HashAggregate sandwich for the distinct
    assert plan.count("HashAggregate") >= 2, plan


def test_text_repetition_two_keyed_shuffles(spark, sf_dir):
    plan = plan_of(spark, "text_repetition", sf_dir, mode="simple")
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert plan.count("Scan parquet") == 1, plan


def test_concurrency_peak_segmented_sweep(spark, sf_dir):
    """Sweep-line via segmented prefix sum: ONE fact scan (explode, not a
    self-union), the intra-bucket window and per-bucket rollup share one
    exchange, and only the tiny per-bucket rows re-shuffle for the
    cross-bucket offset."""
    plan = plan_of(spark, "concurrency_peak", sf_dir, mode="simple")
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_no_row_at_a_time_python_udfs(spark, sf_dir):
    """Global plan lint: Python must only enter a plan through Arrow
    (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas / cogrouped).
    A BatchEvalPython node is a row-at-a-time pickle loop — 10-100×
    slower on the 100 TB hot path — so no registered query may plan one.
    BatchEvalPythonUDTF is distinct: a table-function fan-out has no
    Arrow evaluation mode, and udtf_lateral_ngrams exists precisely to
    cover that surface, so it alone may plan one."""
    offenders = []
    for name in sorted(registry.QUERIES):
        plan = plan_of(spark, name, sf_dir, mode="simple")
        scrubbed = plan.replace("BatchEvalPythonUDTF", "") \
            if name in {"udtf_lateral_ngrams"} else plan
        if "BatchEvalPython" in scrubbed:
            offenders.append(name)
    assert not offenders, offenders


def test_basket_affinity_reuses_exchange(spark, sf_dir):
    """basket_affinity's static plan duplicates the basket build
    (groupBy okey) across its pairs / freq / n_orders branches — 7
    static shuffles. At RUNTIME, AQE's ReuseExchange must collapse the
    fat duplicates: freq's basket branch becomes a ReusedExchange of
    the pairs branch's [okey, buf] exchange, and fb rides freq's
    broadcast. The one branch intentionally NOT reused is n_orders,
    which the optimizer prunes to a one-column distinct-okey count —
    cheaper than re-reading the basket exchange. This test pins all
    three facts on the executed adaptive plan."""
    df = registry.QUERIES["basket_affinity"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "isFinalPlan=true" in final, final[:2000]
    # basket exchange reused (carries the collect_set partial buffer)
    assert re.search(r"ReusedExchange \[okey#\d+L, buf#\d+", final), final
    # freq's broadcast reused for the part_b side
    assert re.search(r"ReusedExchange \[part_b#\d+L, n_part_b#\d+", final), (
        final
    )
    executed_okey = [
        line
        for line in final.splitlines()
        if "Exchange hashpartitioning(okey" in line
        and "ReusedExchange" not in line
    ]
    # exactly 2 executed okey shuffles: the shared basket build + the
    # pruned single-column distinct count for n_orders
    assert len(executed_okey) == 2, final


def test_aqe_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


@pytest.mark.parametrize(
    "name", ["q1_pricing_summary", "flagship_daily_change", "text_stats"]
)
def test_aggs_have_partial_stage(spark, sf_dir, name):
    """Aggregations must plan partial (map-side) + final HashAggregate —
    the shape that keeps shuffle volume O(groups), not O(rows)."""
    plan = plan_of(spark, name, sf_dir, mode="simple")
    assert plan.count("HashAggregate") >= 2, plan


def test_q6_is_scan_bound(spark, sf_dir):
    """TPC-H Q6 must push every predicate to the scan and read only the
    4 referenced columns of lineitem's 11."""
    plan = plan_of(spark, "q6_forecast_revenue", sf_dir)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)", plan)
    assert pushed and any("l_shipdate" in p and "l_discount" in p for p in pushed), plan
    assert max(read_widths(plan)) <= 4, plan


def test_exists_decorrelates_to_semi_and_anti(spark, sf_dir):
    """Correlated EXISTS / NOT EXISTS must decorrelate into hash
    semi/anti joins — never a per-row subquery or cartesian."""
    plan = plan_of(spark, "subquery_exists", sf_dir, mode="simple")
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_sessionize_single_shuffle(spark, sf_dir):
    """Both windows and the rollup of sessionize_batch share the user_id
    partitioning: exactly one exchange in the whole plan."""
    plan = plan_of(spark, "sessionize_batch", sf_dir, mode="simple")
    n_exchanges = plan.count("Exchange") - plan.count("AQEShuffleRead")
    assert n_exchanges <= 1, plan


def test_q21_single_fact_exchange(spark, sf_dir):
    """Q21's agg+window rewrite must keep ONE hash exchange on the fact
    path (the explicit orderkey repartition) plus the trivial final agg
    on s_name — the classic 3-self-join form would shuffle lineitem
    three times."""
    plan = plan_of(spark, "q21_waiting_suppliers", sf_dir)
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2, plan
    assert "CartesianProduct" not in plan


def test_q11_reuses_partkey_exchange(spark, sf_dir):
    """Q11 derives the global total FROM the per-part aggregate; the two
    branches share the groupBy(l_partkey) exchange via ReusedExchange in
    the final adaptive plan, so lineitem is scanned+shuffled once."""
    df = registry.QUERIES["q11_important_parts"](spark, sf_dir)
    # collect() drives df's OWN QueryExecution to its final adaptive plan
    # (a .write would plan a separate QueryExecution and leave this one
    # unexecuted)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "ReusedExchange" in plan, plan


def test_q16_broadcasts_dim_and_denylist(spark, sf_dir):
    """Q16's part filter and supplier denylist must both broadcast —
    the fact table shuffles only for the distinct-count aggregation."""
    plan = plan_of(spark, "q16_supplier_relation", sf_dir)
    assert plan.count("BroadcastExchange") >= 2, plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2, plan


def test_q20_window_total_adds_no_exchange(spark, sf_dir):
    """Q20's per-part total is a window over the per-(part,supplier)
    aggregate riding the same hash(partkey) clustering — the plan must
    show only the partkey repartition and the final supplier agg."""
    plan = plan_of(spark, "q20_excess_share_suppliers", sf_dir)
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2, plan
    assert "CartesianProduct" not in plan


def test_q2_dims_filter_before_single_fact_exchange(spark, sf_dir):
    """Q2's part/region filters broadcast into the fact scan BEFORE the
    one partkey repartition — the agg and min-window then ride that
    clustering with no further exchange."""
    plan = plan_of(spark, "q2_min_cost_supplier", sf_dir)
    assert plan.count("BroadcastExchange") >= 2, plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 1, plan


def test_median_2pass_second_scan_is_pruned(spark, sf_dir):
    """The two-pass median's second scan must carry a pushed literal
    o_totalprice range (the collected-targets design) — a join-based
    bucket filter would silently re-read the whole column at 100 TB."""
    plan = plan_of(spark, "agg_exact_median_2pass", sf_dir)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)", plan)
    assert any(
        "GreaterThanOrEqual(o_totalprice" in p_ for p_ in pushed
    ), plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_plan_audit_covers_full_registry():
    """PLAN_AUDIT.md must carry one row per registered query — a query
    registered after the last plan_report.py run would otherwise ship
    without its 100 TB plan audit (round-9 verdict: 4 late queries were
    missing from the committed artifact)."""
    import os

    audit_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLAN_AUDIT.md",
    )
    rows = set()
    for line in open(audit_path):
        m = re.match(r"\| ([a-z0-9_]+) \|", line)
        if m and m.group(1) != "query":
            rows.add(m.group(1))
    registered = set(registry.QUERIES)
    assert rows == registered, (
        f"PLAN_AUDIT.md lags registry: missing={sorted(registered - rows)} "
        f"stale={sorted(rows - registered)} — rerun tools/plan_report.py"
    )
