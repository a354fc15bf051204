"""Differential test: every registered query vs its DuckDB oracle.

Local replica of the driver's correctness gate: row count, column names,
and order-insensitive value comparison. Values are compared EXACTLY
(stringified, full precision) — the engine's queries are designed to be
bit-reproducible across engines (see functions/exact.py), so any drift is
a real bug, not noise.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import pytest

from etl_pipeline_with_alpha_vantage_spark import registry

registry.load_all()

ORACLE_CASES = sorted(registry.ORACLES)
ROWS_ONLY_CASES = sorted(set(registry.QUERIES) - set(registry.ORACLES))

# Vacuous-oracle lint: a green parity row on an EMPTY result proves nothing
# (round-3 verdict: interval_overlap_join passed on 0-vs-0 rows). Any
# oracled query returning 0 rows at the test SF fails unless listed here
# with a justification. Keep this list empty unless a query is
# empty-by-design.
EMPTY_OK: dict[str, str] = {}

# Two-SF adversarial coverage: these families have never appeared in a
# driver sample (round-3 verdict), so their only gate is this suite — and
# data-dependent bugs (ties, empties, boundary predicates) can hide at a
# single scale factor. Each runs at BOTH sf0.001 (the default suite SF)
# and sf0.01 (the driver's SF), giving every data-dependent branch two
# chances to surface.
SECOND_SF_DIR = "/root/testdata/sf0.01"
TWO_SF_CASES = [
    "dedup_span_ngrams",
    "ewma_smoothing",
    "graph_triangles",
    "agg_hll_mergeable",
    "sample_balanced_classes",
    "multimodal_audio_rms",
    "stream_topk_trending",
    "asof_join_nearest",
    "attribution_linear",
    "window_streak_longest",
    "dedup_simhash_pairs",
    "gapfill_interpolate",
    "multimodal_image_ahash",
    "agg_exact_median_2pass",
    "join_point_in_time",
    "abc_pareto_classes",
    "text_bigram_lm",
    "dedup_minhash_verify",
    "multimodal_scene_cuts",
    "embedding_quantize_int8",
    "similarity_sq8_topk",
    "snapshot_diff",
    "rollup_cascade",
    "funnel_strict_windowed",
    "dedup_image_phash_pairs",
    "pipeline_modality_manifest",
    "stream_sliding_unique",
    "orders_interarrival",
    "agg_exact_percentiles_2pass",
    "bpe_apply_encode",
    "sample_domain_cap",
    "shuffle_training_order",
    "pack_length_buckets",
    "agg_cms_heavy_hitters",
    "dq_expectations",
    "agg_winsorized_mean",
    "search_keyword_topk",
    "watermark_lateness_profile",
    "observe_inflight_metrics",
    "seasonality_weekday_index",
    "gdpr_user_erasure",
    "udtf_lateral_ngrams",
    "agg_corr_matrix",
    "ab_test_proportions",
    "schema_evolution_merge",
    "pipeline_curation_funnel",
    "path_trigram_top",
    "ohlc_resample_bars",
    "join_bloom_semi",
    "rollup_delta_maintenance",
    "drift_psi_monitor",
    "stream_ohlc_candles",
    "text_oov_rate",
    "dq_fd_discovery",
    "embedding_class_scatter",
    "embedding_fisher_ratio",
    "text_quality_model",
    "cohort_ltv_curve",
    "embedding_label_outliers",
    "export_shard_plan",
    "sma_crossover_signals",
    "drawdown_max",
    "volatility_realized",
    "returns_correlation_pairs",
    "dedup_canonical_best",
    "search_diverse_topk",
    "dq_volume_anomaly",
    "sql_udf_pricing_bands",
    "dim_surrogate_keys",
    "rsi_indicator",
    "bollinger_breakouts",
    "sla_fulfilment_attainment",
    "churn_rate_by_nation",
    "revenue_mom_growth",
    "skyline_pareto",
    "window_rolling_median",
    "chi_square_assoc",
    "q2_min_cost_supplier",
    "q11_important_parts",
    "q16_supplier_relation",
    "q20_excess_share_suppliers",
    "q21_waiting_suppliers",
    "scd2_customer_status",
    "stream_dedup_window",
    "stream_join_attribution",
    "stream_session",
    "stream_sliding",
    "stream_stateful_totals",
    "stream_static_enrich",
    "stream_tumbling",
]


def canon(v):
    """Canonicalize a scalar for order-insensitive cross-engine compare."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr round-trips doubles exactly; -0.0 folded to 0.0
        return repr(v + 0.0)
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def rows_to_multiset(rows, col_order):
    return sorted(tuple(canon(r[i]) for i in col_order) for r in rows)


def assert_query_matches_oracle(spark, duck, sf_dir, name):
    sdf = registry.QUERIES[name](spark, sf_dir)
    spark_cols = [c.lower() for c in sdf.columns]
    srows = sdf.collect()

    rel = duck.sql(registry.ORACLES[name])
    duck_cols = [c.lower() for c in rel.columns]
    drows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(srows) == len(drows), (
        f"{name}: row count spark={len(srows)} duck={len(drows)}"
    )
    if len(drows) == 0 and name not in EMPTY_OK:
        raise AssertionError(
            f"{name}: vacuous oracle — 0 rows at {sf_dir}; a 0-vs-0 match "
            f"proves nothing. Make the query produce rows at this SF or "
            f"add it to EMPTY_OK with a justification."
        )

    s_order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    d_order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    s_set = rows_to_multiset([tuple(r) for r in srows], s_order)
    d_set = rows_to_multiset(drows, d_order)
    if s_set != d_set:
        diffs = [
            (a, b) for a, b in zip(s_set, d_set) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs {diffs}")


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    assert_query_matches_oracle(spark, duck, sf_dir, name)


@pytest.fixture(scope="module")
def duck_second_sf():
    import os

    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.sql(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM '{os.path.join(SECOND_SF_DIR, name + '.parquet')}'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(TWO_SF_CASES))
def test_never_sampled_families_at_second_sf(spark, duck_second_sf, name):
    assert_query_matches_oracle(spark, duck_second_sf, SECOND_SF_DIR, name)


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    assert df.columns  # stable schema
    df.collect()  # executes without error


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
