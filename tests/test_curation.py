"""Semantic-invariant tests for the round-4 curation/serving batch.

Hash parity (test_oracle_parity) proves Spark ≡ DuckDB; these tests pin
down properties a matching PAIR of wrong implementations could still
violate — monotone drop counts, one-sided sketch error, cap boundaries
at exact powers of two, certificate columns actually certifying.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_with_alpha_vantage_spark import registry

registry.load_all()


def _run(spark, sf_dir, name):
    return registry.QUERIES[name](spark, sf_dir).collect()


def test_pow2_caps_hit_exact_boundaries(spark):
    # The bucket cap must be the smallest power of two >= n (floor 16):
    # 2^bitlength(n-1) via bin(), asserted at the exact-power boundaries
    # where a floating log2 implementation goes wrong.
    df = spark.createDataFrame(
        [(n,) for n in (1, 2, 15, 16, 17, 31, 32, 33, 63, 64, 65, 99)],
        "n int",
    )
    cap = F.greatest(
        F.lit(16), F.pow(F.lit(2), F.length(F.bin(F.col("n") - 1))).cast("long")
    )
    got = {r["n"]: r["cap"] for r in df.select("n", cap.alias("cap")).collect()}
    expected = {
        1: 16, 2: 16, 15: 16, 16: 16, 17: 32, 31: 32, 32: 32,
        33: 64, 63: 64, 64: 64, 65: 128, 99: 128,
    }
    assert got == expected


def test_length_buckets_account_for_every_document(spark, sf_dir, duck):
    rows = _run(spark, sf_dir, "pack_length_buckets")
    n_docs = duck.sql("SELECT COUNT(*) FROM documents").fetchone()[0]
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert r["padded_tokens"] == r["bucket_cap"] * r["n_docs"]
        assert 0.0 <= r["waste_frac"] < 1.0
        # every doc in the bucket fits under its cap: waste < cap*n
        assert r["total_tokens"] <= r["padded_tokens"]


def test_domain_cap_keeps_exactly_the_longest(spark, sf_dir, duck):
    rows = _run(spark, sf_dir, "sample_domain_cap")
    for r in rows:
        assert r["n_kept"] + r["n_dropped"] == r["n_docs"]
        assert r["n_kept"] <= 10
        if r["n_dropped"] > 0:
            # kept set = the longest 10: its minimum length must be >=
            # the maximum dropped length (rank orders by n_chars desc).
            lo_kept, hi_drop = duck.sql(
                f"""
                WITH ranked AS (
                    SELECT n_chars, row_number() OVER (
                        PARTITION BY source
                        ORDER BY n_chars DESC, doc_id) AS rk
                    FROM documents WHERE source = '{r["source"]}'
                )
                SELECT (SELECT MIN(n_chars) FROM ranked WHERE rk <= 10),
                       (SELECT MAX(n_chars) FROM ranked WHERE rk > 10)
                """
            ).fetchone()
            assert lo_kept >= hi_drop


def test_shuffle_order_positions_are_dense_and_key_sorted(spark, sf_dir):
    rows = _run(spark, sf_dir, "shuffle_training_order")
    assert [r["position"] for r in rows] == list(range(1, len(rows) + 1))
    keys = [(r["shuffle_key"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)
    # A seeded hash order must not accidentally be the ingest order.
    assert [r["doc_id"] for r in rows] != sorted(r["doc_id"] for r in rows)


def test_cms_never_underestimates_and_depth_tightens(spark, sf_dir):
    rows = _run(spark, sf_dir, "agg_cms_heavy_hitters")
    assert len(rows) == 10
    for r in rows:
        assert r["never_underestimates"] is True
        assert r["cms_est"] >= r["exact_cnt"]


def test_watermark_drop_counts_are_monotone(spark, sf_dir):
    rows = _run(spark, sf_dir, "watermark_lateness_profile")
    assert rows
    for r in rows:
        assert (
            r["dropped_at_1h"] <= r["dropped_at_10m"] <= r["dropped_at_1m"]
        )
        assert 0 <= r["dropped_at_1m"] <= r["n_events"]
        assert r["max_late_us"] >= 0


def test_winsorized_mean_is_clamped_and_bounded(spark, sf_dir):
    rows = _run(spark, sf_dir, "agg_winsorized_mean")
    assert rows
    n_clamped = 0
    for r in rows:
        assert r["lo_bound"] <= r["mean_winsorized"] <= r["hi_bound"]
        n_clamped += r["n_clamped_low"] + r["n_clamped_high"]
    # The 1/8 and 7/8 bounds must actually clamp ~2/8 of rows globally.
    total = sum(r["n_rows"] for r in rows)
    assert 0 < n_clamped < total
    assert abs(n_clamped / total - 0.25) < 0.05


def test_dq_suite_reports_both_outcomes(spark, sf_dir):
    rows = {r["expectation"]: r for r in _run(spark, sf_dir, "dq_expectations")}
    assert rows["l_orderkey_fk_orders"]["passed"] is True
    # The corpus genuinely violates this contract — the suite must say so.
    bad = rows["l_shipdate_after_orderdate"]
    assert bad["passed"] is False and bad["n_violations"] > 0
    for r in rows.values():
        assert 0 <= r["n_violations"] <= r["n_checked"]
        assert r["passed"] == (r["n_violations"] == 0)


def test_erasure_certificate_holds_and_purge_is_nonvacuous(spark, sf_dir):
    rows = _run(spark, sf_dir, "gdpr_user_erasure")
    assert rows
    assert all(r["clean_after_purge"] is True for r in rows)
    assert sum(r["n_purged"] for r in rows) > 0


def test_bpe_encode_actually_compresses(spark, sf_dir):
    rows = _run(spark, sf_dir, "bpe_apply_encode")
    assert rows
    for r in rows:
        assert r["tokens_bpe"] < r["tokens_char"]
        assert r["tokens_saved"] == r["tokens_char"] - r["tokens_bpe"]


def test_search_results_contain_all_terms(spark, sf_dir, duck):
    rows = _run(spark, sf_dir, "search_keyword_topk")
    assert rows
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    ids = tuple(int(r["doc_id"]) for r in rows)
    n_bad = duck.sql(
        f"""
        SELECT COUNT(*) FROM documents
        WHERE doc_id IN {ids}
          AND NOT (text LIKE '%window%' AND text LIKE '%merge%')
        """
    ).fetchone()[0]
    assert n_bad == 0


def test_ohlc_bars_are_internally_consistent(spark, sf_dir):
    rows = _run(spark, sf_dir, "ohlc_resample_bars")
    assert rows
    for r in rows:
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]
        assert r["n_ticks"] >= 1
        if r["n_ticks"] == 1:
            assert r["open"] == r["close"] == r["high"] == r["low"]


def test_bloom_verdicts_partition_and_never_miss(spark, sf_dir):
    r = _run(spark, sf_dir, "join_bloom_semi")[0]
    assert r["no_false_negatives"] is True
    assert r["n_definitely_out"] + r["n_maybe"] == r["n_probed"]
    # maybe = members + false positives (one-sided error, both ways)
    assert r["n_maybe"] == r["n_members"] + r["n_false_positives"]
    assert r["n_members"] > 0


def test_curation_funnel_is_monotone(spark, sf_dir):
    rows = sorted(
        _run(spark, sf_dir, "pipeline_curation_funnel"),
        key=lambda r: r["stage_id"],
    )
    assert [r["stage"] for r in rows] == [
        "raw", "dedup_normhash", "domain_cap", "quality_min_tokens",
    ]
    for a, b in zip(rows, rows[1:]):
        assert b["n_docs"] <= a["n_docs"]
        assert b["n_tokens"] <= a["n_tokens"]
    assert rows[-1]["n_docs"] > 0


def test_path_trigrams_are_ranked_and_bounded(spark, sf_dir):
    rows = _run(spark, sf_dir, "path_trigram_top")
    assert 0 < len(rows) <= 10
    counts = [r["n_occurrences"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert r["path"].count(" > ") == 2
        assert 1 <= r["n_users"] <= r["n_occurrences"]


def test_fisher_components_are_nonnegative_and_consistent(spark, sf_dir):
    scatter = {r["label"]: r for r in _run(spark, sf_dir, "embedding_class_scatter")}
    fisher = {r["label"]: r for r in _run(spark, sf_dir, "embedding_fisher_ratio")}
    assert set(scatter) == set(fisher)
    for lbl, f in fisher.items():
        assert f["within_scatter"] >= 0 and f["between_scatter"] >= 0
        assert f["separability"] >= 0
        # within-scatter must agree with the standalone operator
        assert abs(f["within_scatter"] - scatter[lbl]["within_class_scatter"]) < 1e-9


def test_label_outliers_are_ranked_and_per_label(spark, sf_dir):
    rows = _run(spark, sf_dir, "embedding_label_outliers")
    per = {}
    for r in rows:
        per.setdefault(r["label"], []).append(r)
    for lbl, rs in per.items():
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        dists = [r["dist2"] for r in rs]
        assert dists == sorted(dists, reverse=True)
        assert all(d >= 0 for d in dists)


def test_ltv_curve_cumulative_is_running_sum(spark, sf_dir):
    rows = _run(spark, sf_dir, "cohort_ltv_curve")
    per = {}
    for r in sorted(rows, key=lambda r: (r["cohort_ym"], r["age_months"])):
        per.setdefault(r["cohort_ym"], []).append(r)
    for rs in per.values():
        run = 0.0
        assert rs[0]["age_months"] == 0  # a cohort exists from its first order
        for r in rs:
            run = round(run + r["revenue"], 2)
            assert abs(r["cum_revenue"] - run) < 1e-6
            assert r["n_active"] >= 1


def test_quality_model_keep_rate_and_score_bounds(spark, sf_dir):
    rows = _run(spark, sf_dir, "text_quality_model")
    assert rows
    for r in rows:
        assert 0.0 <= r["mean_score"] <= 1.0
        assert 0 <= r["n_keep"] <= r["n_docs"]
    # the threshold must actually split (not everything kept or dropped)
    total_keep = sum(r["n_keep"] for r in rows)
    total = sum(r["n_docs"] for r in rows)
    assert 0 < total_keep < total


def test_shard_plan_covers_corpus_with_bounded_skew(spark, sf_dir, duck):
    rows = _run(spark, sf_dir, "export_shard_plan")
    n_docs = duck.sql("SELECT COUNT(*) FROM documents").fetchone()[0]
    assert sum(r["n_docs"] for r in rows) == n_docs
    mean = sum(r["skew_vs_mean"] for r in rows) / len(rows)
    assert abs(mean - 1.0) < 1e-9  # skews average to exactly 1 by construction


def test_kmv_estimates_bounded_and_set_algebra_sane(spark, sf_dir):
    """KMV invariants hash-parity can't pin: every estimate within the
    k=128 error envelope of its exact companion, and the set algebra
    holds (union ≥ both inputs' exacts, intersection ≤ both, inclusion-
    exclusion consistent on the exact side)."""
    rows = registry.QUERIES["agg_kmv_set_ops"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        for est, exact in (
            (r.est_a, r.exact_a),
            (r.est_b, r.exact_b),
            (r.est_union, r.exact_union),
        ):
            assert abs(est - exact) <= max(0.35 * exact, 5), r
        # exact_union is derived by inclusion-exclusion in-plan, so
        # test the non-derived algebra only
        assert r.exact_union >= max(r.exact_a, r.exact_b)
        assert r.exact_inter <= min(r.exact_a, r.exact_b)
        assert abs(r.est_inter - r.exact_inter) <= max(
            0.5 * r.exact_inter, 10
        ), r


def test_weighted_priority_sampling_invariants(spark, sf_dir):
    """Priority-sampling invariants hash-parity can't pin: per-language
    sample size = min(k, |lang|); τ = 0 exactly when the language fits
    inside k (then the 'sample' is the population and the estimate is
    exact); the inclusion guarantee w > τ ⟹ selected (priority = w/u ≥
    w, so any doc outweighing the threshold races in deterministically);
    and the DLT estimator Σ max(w, τ) lands near the language's true
    total character count."""
    from pyspark.sql import functions as F

    K = 25
    out = registry.QUERIES["sample_weighted_priority"](spark, sf_dir)
    rows = out.collect()
    assert rows
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pop = {
        r.lang: (r.n, r.tot)
        for r in docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("tot"))
        .collect()
    }
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    assert set(by_lang) == set(pop)
    for lang, sel in by_lang.items():
        n, tot = pop[lang]
        assert len(sel) == min(K, n)
        taus = {r.tau for r in sel}
        assert len(taus) == 1
        tau = taus.pop()
        if n <= K:
            assert tau == 0
            assert sum(r.contrib for r in sel) == tot  # exact: whole pop
        else:
            assert tau > 0
            est = sum(r.contrib for r in sel)
            assert abs(est - tot) <= 0.3 * tot, (lang, est, tot)
            # inclusion guarantee: every doc heavier than τ is sampled
            selected_ids = {r.doc_id for r in sel}
            heavy = [
                r.doc_id
                for r in docs.filter(
                    (F.col("lang") == lang) & (F.col("n_chars") > tau)
                ).collect()
            ]
            assert set(heavy) <= selected_ids
