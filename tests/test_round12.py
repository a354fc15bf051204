"""Round-12 pins: ADVICE r11 items + Observation volume extensions.

* HITS int64 pole tripwire (ADVICE r11): the binding constraint of the
  integer HITS recurrence is the rescale's PRE-DIVISION multiply
  ``raw * SCALE DIV mx`` — raw ≤ deg_max·1e6, so raw·1e6 wraps int64
  once deg_max exceeds ~9.2e6 (2⁶³/1e12), where Spark's non-ANSI
  arithmetic wraps silently while DuckDB raises on BIGINT overflow.
  The fixture tripwire (the ``_WELCH_A_PIN`` discipline) asserts the
  corpus' max degree on BOTH bipartite sides sits an order of
  magnitude inside that pole.
"""

from __future__ import annotations

import os

import duckdb


def test_hits_rescale_degree_pole_holds_on_fixture(sf_dir):
    """hits_sweeps (graph.py): raw scores are bounded by deg·SCALE with
    SCALE = 1e6, and the rescale multiplies raw by SCALE again before
    the exact DIV — int64-safe only while max degree < 2⁶³/1e12 ≈
    9.2e6. Assert the fixture's max part in-degree (suppliers per
    part) AND max supplier out-degree (parts per supplier) stay an
    order of magnitude inside the pole, so the exact-bigint recurrence
    is safe on this corpus with margin."""
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"'{os.path.join(sf_dir, 'lineitem.parquet')}'"
    )
    (dmax_part, dmax_supp) = con.sql(
        """
        WITH sp AS (
            SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS supp,
                            CAST(l_partkey AS BIGINT) AS part
            FROM lineitem
        )
        SELECT (SELECT MAX(d) FROM (
                    SELECT COUNT(*) AS d FROM sp GROUP BY part)),
               (SELECT MAX(d) FROM (
                    SELECT COUNT(*) AS d FROM sp GROUP BY supp))
        """
    ).fetchone()
    pole = 9_200_000
    assert dmax_part < pole / 10, dmax_part
    assert dmax_supp < pole / 10, dmax_supp


# --------------------------------------------------------------------------
# Observation intermediate-volume pins (VERDICT r11 task 1): the four
# blocked kernels that previously proved only OUTPUT-side bounds now
# expose a counter ON the bounded stage; each test replays the closed
# form in pure Python and asserts the measured volume equals it.
# --------------------------------------------------------------------------


def _tri_expected_wedges(pairs):
    """Pure-Python replay of the degree-ordered orientation: wedge rows
    of the t1⨝t2 stage == Σ over nodes m of in_eo(m)·out_eo(m)."""
    from collections import Counter

    deg = Counter()
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    ine, oute = Counter(), Counter()
    for a, b in pairs:
        u, v = (a, b) if (deg[a], a) < (deg[b], b) else (b, a)
        oute[u] += 1
        ine[v] += 1
    return sum(ine[m] * oute[m] for m in set(ine) | set(oute))


def test_triangle_wedge_volume_is_closed_form_and_hub_bounded(spark):
    """oriented_triangles: a 20-leaf star hub contributes ZERO wedges
    (all star edges orient INTO the hub: out_eo(hub) = 0) while the
    naive undirected wedge join would materialize C(20,2) = 190 rows
    through it. The counter on the t1⨝t2 stage must read exactly
    Σ in_eo(m)·out_eo(m)."""
    from math import comb

    from pyspark.sql import Observation

    from etl_pipeline_with_alpha_vantage_spark.operators.graph import (
        oriented_triangles,
    )

    pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]  # K4
    pairs += [(100, 200 + i) for i in range(20)]  # star hub, no triangles
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    obs = Observation()
    tri = oriented_triangles(df, wedge_observation=obs)
    n_tri = tri.count()
    assert n_tri == 4  # the K4's C(4,3) triangles, none through the hub
    expected = _tri_expected_wedges(pairs)
    assert expected < comb(20, 2)  # the bound the orientation buys
    assert obs.get["wedges"] == expected, (obs.get, expected)


def test_basket_pair_volume_is_closed_form_and_capped(spark, tmp_path):
    """basket_affinity: the in-row pair expansion must materialize
    exactly Σ over orders of C(min(b, cap), 2) rows — a 70-item
    mega-basket contributes C(64,2), not C(70,2)."""
    from math import comb

    from pyspark.sql import Observation

    from etl_pipeline_with_alpha_vantage_spark.operators.agg_ext import (
        _BASKET_ITEM_CAP,
        basket_affinity,
    )

    rows = []
    rows += [(1, p) for p in range(5)]  # 5-item basket
    rows += [(1, 0)]  # duplicate line: collect_set dedups it
    rows += [(2, 10), (2, 11)]  # 2-item basket
    rows += [(3, 1000 + p) for p in range(70)]  # mega-basket > cap
    rows += [(4, 42)]  # singleton: zero pairs
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).coalesce(1).write.parquet(str(tmp_path / "lineitem.parquet"))
    obs = Observation()
    out = basket_affinity(spark, str(tmp_path), pair_observation=obs)
    out.count()  # support floor (>=3) prunes everything — that's the point
    assert _BASKET_ITEM_CAP == 64
    expected = comb(5, 2) + comb(2, 2) + comb(64, 2) + 0
    assert obs.get["pair_rows"] == expected, (obs.get, expected)


def test_span_dup_occurrence_volume_is_closed_form(spark, tmp_path):
    """dedup_span_ngrams: the duplicated-gram join-back materializes
    exactly Σ over 8-grams with corpus count ≥ 2 of that count —
    replayed in Python over positional token 8-grams."""
    from collections import Counter

    from pyspark.sql import Observation

    from etl_pipeline_with_alpha_vantage_spark.operators.dedup import (
        _SPAN_N,
        dedup_span_ngrams,
    )

    shared = [f"s{i}" for i in range(10)]  # 10-token span shared verbatim
    docs = [
        (1, " ".join([f"a{i}" for i in range(6)] + shared)),
        (2, " ".join(shared + [f"b{i}" for i in range(6)])),
        (3, " ".join([f"c{i}" for i in range(12)])),  # clean doc
        (4, "too short"),  # < 8 tokens: no grams at all
    ]
    counts = Counter()
    for _id, text in docs:
        t = text.split(" ")
        for i in range(len(t) - _SPAN_N + 1):
            counts[tuple(t[i : i + _SPAN_N])] += 1
    expected = sum(c for c in counts.values() if c >= 2)
    assert expected == 2 * (10 - _SPAN_N + 1)  # sanity: 3 shared grams ×2
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(tmp_path / "documents.parquet"))
    obs = Observation()
    out = dedup_span_ngrams(spark, str(tmp_path), span_observation=obs)
    # collect(), not count(): a count-only action lets Catalyst drop the
    # left join to per_doc (its aggregate keys are unique), and with it
    # the whole observed subtree — obs.get would then hang on an empty
    # metrics row.
    assert len(out.collect()) == len(docs)
    assert obs.get["dup_occurrences"] == expected, (obs.get, expected)


def _md5_bucket(doc_id: int) -> int:
    import hashlib

    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100


def test_decontaminate_shared_gram_volume_is_closed_form(spark, tmp_path):
    """decontaminate_splits: the train⨝test gram join materializes
    exactly Σ over distinct trigrams of df_train(g)·df_test(g) —
    replayed in Python with the same md5 split buckets."""
    from collections import Counter

    from pyspark.sql import Observation

    from etl_pipeline_with_alpha_vantage_spark.operators.dedup import (
        decontaminate_splits,
    )

    train_ids = [i for i in range(200) if _md5_bucket(i) < 80][:3]
    test_ids = [i for i in range(200) if _md5_bucket(i) >= 90][:2]
    assert len(train_ids) == 3 and len(test_ids) == 2
    leak = "alpha beta gamma delta"  # 2 shared trigrams
    docs = [(i, f"{leak} t{i} u{i} v{i}") for i in train_ids]
    docs += [(i, f"w{i} {leak} x{i}") for i in test_ids]
    tri_df = {"train": Counter(), "test": Counter()}
    for i, text in docs:
        side = "train" if _md5_bucket(i) < 80 else "test"
        t = text.split(" ")
        grams = {tuple(t[j : j + 3]) for j in range(len(t) - 2)}
        for g in grams:
            tri_df[side][g] += 1
    expected = sum(
        c * tri_df["test"][g] for g, c in tri_df["train"].items()
    )
    assert expected >= 2 * len(train_ids) * len(test_ids)  # the leak
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(tmp_path / "documents.parquet"))
    obs = Observation()
    out = decontaminate_splits(spark, str(tmp_path), pair_observation=obs)
    got = out.count()
    assert got == len(train_ids) * len(test_ids)  # every pair shares 2
    assert obs.get["shared_gram_pairs"] == expected, (obs.get, expected)


# --------------------------------------------------------------------------
# Welch over-pole runtime guard (VERDICT r11 task 3): past the pinned
# products' int64 poles both engines must yield NULL + over_pole = 1
# instead of Spark clamping while DuckDB raises.
# --------------------------------------------------------------------------


def _welch_both_engines(spark, rows):
    import duckdb

    from etl_pipeline_with_alpha_vantage_spark.operators.stats import (
        _WELCH_ORACLE,
        welch_anova,
    )

    ev = spark.createDataFrame(rows, "event_type string, value double")
    got = welch_anova(ev).collect()[0]
    con = duckdb.connect()
    con.sql("CREATE TABLE events (event_type VARCHAR, value DOUBLE)")
    con.executemany("INSERT INTO events VALUES (?, ?)", rows)
    want = con.sql(_WELCH_ORACLE).fetchone()
    return got, want


def test_welch_dm_pole_nulls_and_flags_in_both_engines(spark):
    """Two tight groups with means ~$0 and ~$70k: |mean − x̄w| crosses
    the 3.0e6-cent A-pin pole, so F/df2 are NULL with over_pole = 1 in
    BOTH engines — and crucially the DuckDB replay RUNS (the unguarded
    form raised on BIGINT overflow)."""
    rows = [("lo", 0.00), ("lo", 0.01), ("lo", 0.02)]
    rows += [("hi", 70_000.00), ("hi", 70_000.01), ("hi", 70_000.02)]
    got, want = _welch_both_engines(spark, rows)
    assert got["f_micro"] is None and got["df2"] is None
    assert got["over_pole"] == 1
    assert want[2] is None and want[3] is None and want[4] == 1


def test_welch_mean_pole_nulls_and_flags_in_both_engines(spark):
    """Group means ~$1M (1e8 cents) cross the 9.0e6-cent WM-pin pole
    even though they'd agree on the A term — same NULL + flag."""
    rows = [("a", 1_000_000.00), ("a", 1_000_000.01), ("a", 1_000_000.02)]
    rows += [("b", 1_000_000.05), ("b", 1_000_000.06), ("b", 1_000_000.07)]
    got, want = _welch_both_engines(spark, rows)
    assert got["f_micro"] is None and got["df2"] is None
    assert got["over_pole"] == 1
    assert want[2] is None and want[3] is None and want[4] == 1


def test_welch_in_bound_corpus_keeps_exact_f_and_zero_flag(spark):
    """An ordinary heteroscedastic corpus stays far inside both poles:
    the guards must not perturb the exact pinned F — both engines
    produce identical non-NULL values and over_pole = 0."""
    rows = [("t", 10.00 + 0.01 * (i % 3)) for i in range(40)]
    rows += [("w", 12.00 + 0.40 * (i % 25)) for i in range(30)]
    got, want = _welch_both_engines(spark, rows)
    assert got["f_micro"] is not None and got["over_pole"] == 0
    assert (
        got["n_total"],
        got["k_groups"],
        got["f_micro"],
        got["df2"],
        got["over_pole"],
    ) == tuple(want)


def test_brier_decimal_sum_is_exact_past_the_old_int64_pole(spark):
    """eval_model_brier's aggregate (VERDICT r11 task 3): the squared-
    error sum now accumulates in DECIMAL(38,0). Drive the exact
    aggregation expression over 10M rows of the worst-case per-doc
    value (e = 1e12): the true sum 1e19 exceeds int64 max (~9.22e18) —
    the old accumulator wrapped here — and both Spark and DuckDB must
    return it exactly, along with the identical rounded brier mean."""
    n, e = 10_000_000, 10**12
    df = spark.range(n).selectExpr(f"CAST({e} AS BIGINT) AS e")
    row = df.selectExpr(
        "SUM(CAST(e AS DECIMAL(38,0))) AS s",
        "CAST(round(CAST(SUM(CAST(e AS DECIMAL(38,0))) AS DOUBLE)"
        " / COUNT(*) / 1000000.0) AS BIGINT) AS brier_micro",
    ).collect()[0]
    assert int(row["s"]) == n * e  # > 2^63: exact only in decimal
    want = duckdb.sql(
        f"SELECT SUM(e), CAST(round(CAST(SUM(e) AS DOUBLE)"
        f" / COUNT(*) / 1000000.0) AS BIGINT)"
        f" FROM (SELECT CAST({e} AS BIGINT) AS e FROM range({n}))"
    ).fetchone()
    assert (int(row["s"]), row["brier_micro"]) == (int(want[0]), want[1])


def test_modularity_partition_invariants(spark, sf_dir):
    """graph_modularity (r12 capability): the per-community accounting
    must tile the graph exactly — node counts sum to V, degree sums to
    2m, intra edges to at most m — and the global Q = Σ Q_c stays in
    Newman's [-1/2, 1) range."""
    from etl_pipeline_with_alpha_vantage_spark.operators.graph import (
        _cosupply_edges,
        graph_modularity,
    )

    out = graph_modularity(spark, sf_dir).collect()
    assert out
    edges = _cosupply_edges(spark, sf_dir)
    m2 = edges.count()
    v = edges.select("src").distinct().count()
    assert sum(r["n_nodes"] for r in out) == v
    assert sum(r["degree_sum"] for r in out) == m2
    assert sum(r["intra_edges"] for r in out) <= m2 // 2
    q = sum(r["modq_micro"] for r in out) / 1e6
    assert -0.5 <= q < 1.0, q


# --------------------------------------------------------------------------
# Weighted PageRank (r12 capability): pure-Python arbitrary-precision
# replay + both-engine agreement on a corpus that exercises the weight
# clip, + fixture multiplicity tripwire (the graph_hits discipline).
# --------------------------------------------------------------------------


def _prw_replay(pairs_mult, iters=3, cap=1000):
    """Exact-integer replay of the weighted-PageRank recurrence over
    {(supp_node, part_node): multiplicity}."""
    from collections import defaultdict

    edges = []
    for (s, p), w in pairs_mult.items():
        w = min(w, cap)
        edges.append((s, p, w))
        edges.append((p, s, w))
    wsum = defaultdict(int)
    for u, _v, w in edges:
        wsum[u] += w
    r = {n: 1_000_000 for n in wsum}
    for _ in range(iters):
        inflow = defaultdict(int)
        for u, v, w in edges:
            inflow[v] += (r[u] * w) // wsum[u]
        r = {n: 150000 + (850 * inflow[n]) // 1000 for n in r}
    return r


def test_pagerank_weighted_matches_replay_and_oracle(spark, tmp_path):
    """graph_pagerank_weighted on a handcrafted multigraph — including
    one pair ABOVE the 1000 clip so LEAST binds in all three
    implementations — must match the pure-Python replay and the DuckDB
    oracle exactly."""
    from etl_pipeline_with_alpha_vantage_spark.operators.graph import (
        _prw_oracle,
        graph_pagerank_weighted,
    )

    mult = {
        (1, 10): 3,   # supplier 1 ships part 10 three times
        (1, 11): 1,
        (2, 10): 1005,  # above the clip: LEAST(., 1000) must bind
        (2, 12): 7,
        (3, 12): 2,
    }
    rows = [
        (s, p)
        for (s, p), w in mult.items()
        for _ in range(min(w, 1010))
    ]
    spark.createDataFrame(
        rows, "l_suppkey long, l_partkey long"
    ).coalesce(1).write.parquet(str(tmp_path / "lineitem.parquet"))
    got = {
        r["node_id"]: r["rank_units"]
        for r in graph_pagerank_weighted(spark, str(tmp_path)).collect()
    }
    want = _prw_replay(
        {(s * 2, p * 2 + 1): w for (s, p), w in mult.items()}
    )
    assert got == want, (got, want)
    con = duckdb.connect()
    con.sql("CREATE TABLE lineitem (l_suppkey BIGINT, l_partkey BIGINT)")
    con.executemany("INSERT INTO lineitem VALUES (?, ?)", rows)
    oracle = {r[0]: r[3] for r in con.sql(_prw_oracle()).fetchall()}
    assert oracle == want, (oracle, want)


def test_pagerank_weighted_clip_headroom_holds_on_fixture(sf_dir):
    """The w ≤ 1000 clip is part of the defined semantics but should
    never BIND on the shipped fixture — assert max co-supply
    multiplicity sits an order of magnitude inside it."""
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"'{os.path.join(sf_dir, 'lineitem.parquet')}'"
    )
    (mx,) = con.sql(
        "SELECT MAX(c) FROM (SELECT COUNT(*) AS c FROM lineitem"
        " GROUP BY l_suppkey, l_partkey)"
    ).fetchone()
    assert mx < 100, mx


# --------------------------------------------------------------------------
# Dunn post-hoc (r12 capability): double-for-double replay on a
# handcrafted tied frame + the all-tied degenerate pole in BOTH engines.
# --------------------------------------------------------------------------


def _dunn_replay(groups):
    """Double-for-double replay of the Dunn pair statistics over
    {grp: [cents, ...]} — exact integer doubled ranks, then the same
    pinned expressions the kernels evaluate."""
    import math
    from collections import Counter

    pooled = Counter(c for vs in groups.values() for c in vs)
    # doubled average rank of each distinct value
    rank2, before = {}, 0
    for c in sorted(pooled):
        t = pooled[c]
        rank2[c] = 2 * before + t + 1
        before += t
    n_tot = sum(pooled.values())
    tie = sum(t * t * t - t for t in pooled.values())
    per_g = {
        g: (len(vs), sum(rank2[c] for c in vs))
        for g, vs in groups.items()
    }
    out = {}
    for ga in sorted(per_g):
        for gb in sorted(per_g):
            if ga >= gb:
                continue
            n_a, r2_a = per_g[ga]
            n_b, r2_b = per_g[gb]
            diff = r2_a / (2.0 * n_a) - r2_b / (2.0 * n_b)
            if n_tot <= 1 or float(tie) >= float(n_tot) * n_tot * n_tot - n_tot:
                z = None
            else:
                sig2 = (
                    float(n_tot) * (n_tot + 1.0) / 12.0
                    - float(tie) / (12.0 * (n_tot - 1.0))
                ) * (1.0 / n_a + 1.0 / n_b)
                z = int(round(diff / math.sqrt(sig2) * 1_000_000))
            out[(ga, gb)] = (n_a, n_b, int(round(1000.0 * diff)), z)
    return out


def test_dunn_matches_replay_with_ties(spark):
    """Handcrafted 3-group frame with cross-group ties: the kernel must
    match the pure-Python replay of the pinned expressions exactly."""
    from etl_pipeline_with_alpha_vantage_spark.operators.stats import (
        dunn_test,
    )

    groups = {
        "a": [100, 100, 250, 300, 300, 300],
        "b": [100, 250, 250, 400],
        "c": [300, 400, 400, 500, 500],
    }
    rows = [(g, c) for g, vs in groups.items() for c in vs]
    base = spark.createDataFrame(rows, "grp string, cents long")
    got = {
        (r["grp_a"], r["grp_b"]): (
            r["n_a"], r["n_b"], r["rankdiff_milli"], r["z_micro"]
        )
        for r in dunn_test(base).collect()
    }
    assert got == _dunn_replay(groups), got


def test_dunn_all_tied_pole_nulls_in_both_engines(spark):
    """All pooled values identical → tie-corrected variance exactly 0 →
    z must be NULL (not Inf/overflow) in Spark AND DuckDB."""
    from etl_pipeline_with_alpha_vantage_spark.operators.stats import (
        _DUNN_ORACLE,
        dunn_test,
    )

    rows = [("a", 7), ("a", 7), ("b", 7), ("b", 7), ("b", 7)]
    base = spark.createDataFrame(rows, "grp string, cents long")
    out = dunn_test(base).collect()
    assert len(out) == 1
    assert out[0]["z_micro"] is None
    assert out[0]["rankdiff_milli"] == 0
    con = duckdb.connect()
    con.sql("CREATE TABLE events (event_type VARCHAR, value DOUBLE)")
    con.executemany(
        "INSERT INTO events VALUES (?, ?)",
        [(g, c / 100.0) for g, c in rows],
    )
    oracle = con.sql(_DUNN_ORACLE).fetchall()
    assert len(oracle) == 1 and oracle[0][5] is None


# --------------------------------------------------------------------------
# Spearman rank correlation (r12 capability): closed-form poles, a
# tied-frame replay against scipy-free exact math, and both engines.
# --------------------------------------------------------------------------


def _spearman_replay(xy):
    """Exact replay: doubled average ranks, wide-int sums, the pinned
    double expression."""
    import math
    from collections import Counter

    def rank2(vals):
        pooled = Counter(vals)
        r, before = {}, 0
        for v in sorted(pooled):
            t = pooled[v]
            r[v] = 2 * before + t + 1
            before += t
        return r

    rx = rank2([x for x, _ in xy])
    ry = rank2([y for _, y in xy])
    n = len(xy)
    a = [rx[x] for x, _ in xy]
    b = [ry[y] for _, y in xy]
    sx, sy = sum(a), sum(b)
    sxx = sum(v * v for v in a)
    syy = sum(v * v for v in b)
    sxy = sum(u * v for u, v in zip(a, b))
    da = float(n * sxx - sx * sx)
    db = float(n * syy - sy * sy)
    if da <= 0.0 or db <= 0.0:
        return n, None
    num = float(n * sxy - sx * sy)
    return n, int(round(num / math.sqrt(da * db) * 1_000_000))


def _spearman_run(spark, rows):
    from etl_pipeline_with_alpha_vantage_spark.operators.stats import (
        stats_spearman_rank,
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "l_quantity long, l_extendedprice double"
        ).coalesce(1).write.parquet(os.path.join(d, "lineitem.parquet"))
        return stats_spearman_rank(spark, d).collect()[0]


def test_spearman_poles_and_tied_replay(spark):
    """Perfect monotone → exactly 1e6; anti-monotone → exactly −1e6;
    a tied mixed frame matches the exact replay; all-tied x → NULL."""
    mono = [(i, 10.0 * i) for i in range(1, 8)]
    r = _spearman_run(spark, mono)
    assert (r["n"], r["rho_micro"]) == (7, 1_000_000)

    anti = [(i, -3.0 * i) for i in range(1, 6)]
    assert _spearman_run(spark, anti)["rho_micro"] == -1_000_000

    tied = [(1, 5.0), (1, 7.0), (2, 5.0), (2, 9.0), (3, 9.0), (3, 2.0)]
    want_n, want_rho = _spearman_replay(
        [(x, int(round(y * 100))) for x, y in tied]
    )
    got = _spearman_run(spark, tied)
    assert (got["n"], got["rho_micro"]) == (want_n, want_rho)

    flat = [(4, float(i)) for i in range(5)]
    assert _spearman_run(spark, flat)["rho_micro"] is None


def test_spearman_oracle_agrees_on_tied_frame():
    """The DuckDB oracle replays the same tied frame bit-for-bit."""
    from etl_pipeline_with_alpha_vantage_spark.operators.stats import (
        _SP_ORACLE,
    )

    tied = [(1, 5.0), (1, 7.0), (2, 5.0), (2, 9.0), (3, 9.0), (3, 2.0)]
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE lineitem (l_quantity BIGINT, l_extendedprice DOUBLE)"
    )
    con.executemany("INSERT INTO lineitem VALUES (?, ?)", tied)
    n, rho = con.sql(_SP_ORACLE).fetchall()[0][0], con.sql(
        _SP_ORACLE
    ).fetchall()[0][3]
    want_n, want_rho = _spearman_replay(
        [(x, int(round(y * 100))) for x, y in tied]
    )
    assert (n, rho) == (want_n, want_rho)


def test_spearman_wide_pole_headroom_on_fixture(sf_dir):
    """The wide-integer pole is ~4N⁴ < 1e38 (N ≈ 2.2e9 rows); assert
    the fixture sits orders of magnitude inside it."""
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"'{os.path.join(sf_dir, 'lineitem.parquet')}'"
    )
    (n,) = con.sql("SELECT COUNT(*) FROM lineitem").fetchone()
    assert 4 * n**4 < 1e38 / 1e6, n


# --------------------------------------------------------------------------
# AP@k / MRR (r12 capability): pure-Python metric replay from the
# engine-independent ranking + structural invariants.
# --------------------------------------------------------------------------


def test_retrieval_map_matches_python_metric_replay(spark, sf_dir):
    """Fetch the BM25 top-k ranking and binary relevance via DuckDB
    (engine-independent), replay AP@k/MRR with exact integer
    arithmetic in Python, and compare against the Spark kernel."""
    from etl_pipeline_with_alpha_vantage_spark.operators.search import (
        _BM25_SCORE_CTES,
        _MAP_K,
        eval_retrieval_map,
    )

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(sf_dir, 'documents.parquet')}'"
    )
    ranked = con.sql(
        f"""
        WITH {_BM25_SCORE_CTES},
        rel AS (SELECT doc_id, COUNT(DISTINCT tok) AS rel
                FROM postings GROUP BY doc_id)
        SELECT CASE WHEN COALESCE(g.rel, 0) >= 1 THEN 1 ELSE 0 END
        FROM (SELECT doc_id, row_number() OVER (
                  ORDER BY bm25_micro DESC, doc_id) AS rn FROM bm25) r
        LEFT JOIN rel g USING (doc_id)
        WHERE rn <= {_MAP_K} ORDER BY rn
        """
    ).fetchall()
    (n_rel,) = con.sql(
        f"""WITH {_BM25_SCORE_CTES},
        rel AS (SELECT doc_id, COUNT(DISTINCT tok) AS rel
                FROM postings GROUP BY doc_id)
        SELECT COUNT(*) FROM rel WHERE rel >= 1"""
    ).fetchone()
    hits = [h for (h,) in ranked]
    ap_num, cum, first = 0, 0, None
    for pos, h in enumerate(hits, start=1):
        if h:
            cum += 1
            ap_num += (1_000_000 * cum) // pos
            if first is None:
                first = pos
    denom = min(n_rel, _MAP_K)
    want = {
        "n_relevant": n_rel,
        "hits_at_k": sum(hits),
        "first_rel_pos": first,
        "mrr_micro": None if first is None else 1_000_000 // first,
        "ap_micro": None if denom == 0 else ap_num // denom,
    }
    got = eval_retrieval_map(spark, sf_dir).collect()[0].asDict()
    assert got == want, (got, want)
    assert got["ap_micro"] is None or 0 <= got["ap_micro"] <= 1_000_000


# --------------------------------------------------------------------------
# Landmark closeness (r12 capability): pure-Python BFS replay on a
# handcrafted graph with a disconnected component, in both engines.
# --------------------------------------------------------------------------


def _closeness_replay(pairs, lm_supps, hops):
    """Exact BFS-by-landmark replay over {(supp, part)} edges."""
    from collections import defaultdict, deque

    adj = defaultdict(set)
    for s, p in pairs:
        adj[s * 2].add(p * 2 + 1)
        adj[p * 2 + 1].add(s * 2)
    out = defaultdict(lambda: [0, 0])  # node -> [n_reached, harm]
    for node in adj:
        out[node]
    for lsupp in lm_supps:
        lm = lsupp * 2
        if lm not in adj:
            continue
        dist = {lm: 0}
        q = deque([lm])
        while q:
            u = q.popleft()
            if dist[u] >= hops:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        for v, d in dist.items():
            if d > 0:
                out[v][0] += 1
                out[v][1] += 1_000_000 // d
    # nodes never reached by ANY landmark and not landmarks themselves
    # are absent from the kernel output
    return {
        n: tuple(v)
        for n, v in out.items()
        if v[0] > 0 or n in {s * 2 for s in lm_supps}
    }


def test_closeness_matches_bfs_replay(spark, tmp_path):
    """Handcrafted graph: chain off landmark 1, a hub shared by
    landmarks 2 and 3, and a DISCONNECTED pair (supp 9, part 90) that
    must be absent from the output; 3-hop truncation exercised."""
    from etl_pipeline_with_alpha_vantage_spark.operators.graph import (
        _LM_HOPS,
        _LM_SUPPS,
        graph_closeness_landmark,
    )

    pairs = [
        (1, 10),                           # landmark 1 -> part 10
        (5, 10), (5, 11),                  # chain: 1-10-5-11
        (6, 11), (6, 12),                  # deeper: 4 hops to part 12
        (2, 20), (3, 20),                  # landmarks 2,3 share part 20
        (4, 21),                           # landmark 4 isolated-ish
        (9, 90),                           # disconnected from landmarks
    ]
    pairs = sorted(set(pairs))
    spark.createDataFrame(
        pairs, "l_suppkey long, l_partkey long"
    ).coalesce(1).write.parquet(str(tmp_path / "lineitem.parquet"))
    got = {
        r["node_id"]: (r["n_reached"], r["harm_micro"])
        for r in graph_closeness_landmark(spark, str(tmp_path)).collect()
    }
    want = _closeness_replay(pairs, _LM_SUPPS, _LM_HOPS)
    assert got == want, (got, want)
    assert 180 not in got and 181 not in got  # 9*2=18? guard below
    assert 18 not in got and 90 * 2 + 1 not in got


# --------------------------------------------------------------------------
# Sampled betweenness (r12 capability): pure-Python truncated-Brandes
# replay with the identical integer semantics + closed-form bridge pole.
# --------------------------------------------------------------------------


def _brandes_replay(pairs, lm_supps, hops):
    """Exact integer replay: layered BFS with sigma sums, then the
    backward micro-pinned accumulation (sigma_v*(1e6+delta_w)) //
    sigma_w, per landmark; returns {node: (n_sources, bc_micro)}."""
    from collections import defaultdict

    adj = defaultdict(set)
    for s, p in pairs:
        adj[s * 2].add(p * 2 + 1)
        adj[p * 2 + 1].add(s * 2)
    acc = defaultdict(lambda: [0, 0])
    for lsupp in lm_supps:
        lm = lsupp * 2
        if lm not in adj:
            continue
        dist, sigma = {lm: 0}, {lm: 1}
        layers = {0: [lm]}
        for d in range(1, hops + 1):
            cand = defaultdict(int)
            for u in layers.get(d - 1, []):
                for v in adj[u]:
                    cand[v] += sigma[u]
            fresh = [v for v in cand if v not in dist]
            for v in fresh:
                dist[v], sigma[v] = d, cand[v]
            layers[d] = fresh
        delta = {v: 0 for v in layers.get(hops, [])}
        for d in range(hops - 1, 0, -1):
            nxt = {}
            for v in layers.get(d, []):
                tot = 0
                for w in adj[v]:
                    if dist.get(w) == d + 1:
                        tot += (sigma[v] * (1_000_000 + delta[w])) // sigma[w]
                nxt[v] = tot
            for v in layers.get(d, []):
                acc[v][0] += 1
                acc[v][1] += nxt[v]
            delta = nxt
        for v in layers.get(hops, []):
            acc[v][0] += 1
    return {n: tuple(x) for n, x in acc.items()}


def test_betweenness_bridge_pole_and_replay(spark, tmp_path):
    """A pure path 1-10-5-11 from landmark supplier 1 gives the
    closed-form Brandes deltas (2e6 on the first hop, 1e6 on the
    bridge); a denser handcrafted graph with converging shortest paths
    must match the integer replay exactly."""
    from etl_pipeline_with_alpha_vantage_spark.operators.graph import (
        _LM_HOPS,
        _LM_SUPPS,
        graph_betweenness_sampled,
    )

    pairs = [
        (1, 10), (5, 10), (5, 11),        # path: 2 -> 21 -> 10 -> 23
        (2, 20), (3, 20), (6, 20),        # lms 2,3 converge on part 20
        (6, 21), (7, 21),                 # and fan out through supp 6
        (4, 22), (7, 22),
        (9, 90),                          # disconnected
    ]
    pairs = sorted(set(pairs))
    spark.createDataFrame(
        pairs, "l_suppkey long, l_partkey long"
    ).coalesce(1).write.parquet(str(tmp_path / "lineitem.parquet"))
    got = {
        r["node_id"]: (r["n_sources"], r["bc_micro"])
        for r in graph_betweenness_sampled(spark, str(tmp_path)).collect()
    }
    want = _brandes_replay(pairs, _LM_SUPPS, _LM_HOPS)
    assert got == want, (got, want)
    # closed-form check on the path arm: part 10 (node 21) relays
    # landmark 1's paths to both supp 5 and (via supp 5) part 11.
    assert got[21][1] >= 2_000_000


def test_betweenness_sigma_pole_headroom_on_fixture(sf_dir):
    """Backward products are bounded by deg_max^(H-1)·1e6·(1+deg_max);
    with H=3 that wraps int64 near deg_max ≈ 2e4. Assert the fixture's
    max degree sits an order of magnitude inside."""
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"'{os.path.join(sf_dir, 'lineitem.parquet')}'"
    )
    (dmax,) = con.sql(
        """
        WITH sp AS (SELECT DISTINCT l_suppkey s, l_partkey p FROM lineitem),
        deg AS (
            SELECT s AS n, COUNT(*) c FROM sp GROUP BY s
            UNION ALL
            SELECT p AS n, COUNT(*) c FROM sp GROUP BY p
        )
        SELECT MAX(c) FROM deg
        """
    ).fetchone()
    assert dmax < 2_000, dmax


# --------------------------------------------------------------------------
# MAD outliers (r12 capability): exact-median replay with odd/even/
# degenerate groups, in both engines.
# --------------------------------------------------------------------------


def _mad_replay(groups):
    """Exact replay over {grp: [cents...]}: doubled medians, Hampel
    fence, degenerate mad4=0 behavior."""
    out = {}
    for g, vs in groups.items():
        s = sorted(vs)
        n = len(s)
        r1, r2 = (n + 1) // 2, (n + 2) // 2
        m2 = s[r1 - 1] + s[r2 - 1]
        dev2 = sorted(abs(2 * x - m2) for x in vs)
        mad4 = dev2[r1 - 1] + dev2[r2 - 1]
        n_out = sum(
            1 for d in dev2 if float(d) > 3.0 * 1.4826 * (mad4 / 2.0)
        )
        out[g] = (n, m2, mad4, n_out, (1_000_000 * n_out) // n)
    return out


def test_mad_outliers_matches_replay(spark, tmp_path):
    """Odd group with one wild outlier, even group, and an all-equal
    degenerate group (mad4 = 0: every nonzero deviation flags) — the
    kernel and the DuckDB oracle must both match the exact replay."""
    from etl_pipeline_with_alpha_vantage_spark.operators.timeseries import (
        _MAD_ORACLE,
        anomaly_mad_outliers,
    )

    groups = {
        "odd": [100, 200, 300, 400, 90000],      # median 300, one wild
        "even": [100, 200, 300, 1000],           # half-integer median
        "flat": [500, 500, 500, 500, 501],       # mad4 = 0 degeneracy
    }
    import datetime

    ts0 = datetime.datetime(2024, 1, 1)
    rows = [(g, c / 100.0, ts0) for g, vs in groups.items() for c in vs]
    spark.createDataFrame(
        rows, "event_type string, value double, ts timestamp"
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    rows = [(g, v) for g, v, _ in rows]
    got = {
        r["grp"]: (
            r["n"], r["med2_cents"], r["mad4_cents"],
            r["n_outliers"], r["outlier_ppm"],
        )
        for r in anomaly_mad_outliers(spark, str(tmp_path)).collect()
    }
    want = _mad_replay(groups)
    assert got == want, (got, want)
    assert got["flat"][3] == 1  # the 501 flags under the degeneracy
    con = duckdb.connect()
    con.sql("CREATE TABLE events (event_type VARCHAR, value DOUBLE)")
    con.executemany("INSERT INTO events VALUES (?, ?)", rows)
    oracle = {
        r[0]: tuple(r[1:]) for r in con.sql(_MAD_ORACLE).fetchall()
    }
    assert oracle == want, (oracle, want)


# --------------------------------------------------------------------------
# RAKE (r12 capability): textbook-style replay on a handcrafted corpus.
# --------------------------------------------------------------------------


def test_rake_matches_handcrafted_replay(spark, tmp_path):
    """Two documents sharing a 2-word phrase: degree/frequency scores
    and phrase ranks computed by hand with the same integer semantics
    must match the kernel and the oracle."""
    from etl_pipeline_with_alpha_vantage_spark.operators.text import (
        _RAKE_ORACLE,
        _STOPWORDS,
        text_keyword_rake,
    )
    from collections import Counter, defaultdict

    docs = [
        (1, "deep learning of the neural network"),
        (2, "neural network training in deep water"),
        (3, "the of and"),  # all stopwords: no candidates at all
    ]

    def replay(docs):
        freq, deg = Counter(), Counter()
        phrases = []
        for _id, text in docs:
            cur = []
            for tok in text.split(" ") + [None]:
                if tok is None or tok in _STOPWORDS:
                    if cur:
                        phrases.append(tuple(cur))
                        for w in cur:
                            freq[w] += 1
                            deg[w] += len(cur)
                        cur = []
                else:
                    cur.append(tok)
        wscore = {w: (1_000_000 * deg[w]) // freq[w] for w in freq}
        out = defaultdict(lambda: [0, 0])
        for p in phrases:
            out[" ".join(p)][0] += 1
            out[" ".join(p)][1] = sum(wscore[w] for w in p)
        return {p: tuple(v) for p, v in out.items()}

    want = replay(docs)
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["phrase"]: (r["n_occurrences"], r["score_micro"])
        for r in text_keyword_rake(spark, str(tmp_path)).collect()
    }
    assert got == want, (got, want)
    con = duckdb.connect()
    con.sql("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    oracle = {
        r[0]: (r[1], r[2]) for r in con.sql(_RAKE_ORACLE).fetchall()
    }
    assert oracle == want, (oracle, want)
    # doc 2's longer candidate is its own phrase — the classic RAKE
    # behavior — and outranks the 2-word phrase via the degree bonus
    assert got["neural network"][0] == 1
    assert (
        got["neural network training"][1] > got["neural network"][1]
    )


# --------------------------------------------------------------------------
# Smoothed target encoding (r12 capability): exact replay + shrinkage.
# --------------------------------------------------------------------------


def test_target_encoding_replay_and_shrinkage(spark, tmp_path):
    """A frequent all-positive brand, a rare all-positive brand, and a
    balanced brand: encodings match the exact replay, and the RARE
    brand shrinks much closer to the prior than the frequent one."""
    from etl_pipeline_with_alpha_vantage_spark.operators.text import (
        _TENC_M,
        encode_target_smoothed,
    )

    li = (
        [(1, "R")] * 200            # brand A: frequent, all positive
        + [(2, "R")] * 2            # brand B: rare, all positive
        + [(3, "R")] * 50 + [(3, "N")] * 50  # brand C: balanced
    )
    rows = [(i, pk, fl) for i, (pk, fl) in enumerate(li)]
    spark.createDataFrame(
        rows, "l_linenumber long, l_partkey long, l_returnflag string"
    ).coalesce(1).write.parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "C")], "p_partkey long, p_brand string"
    ).coalesce(1).write.parquet(str(tmp_path / "part.parquet"))

    n = {"A": (200, 200), "B": (2, 2), "C": (100, 50)}
    g_n = sum(v[0] for v in n.values())
    g_pos = sum(v[1] for v in n.values())
    prior = g_pos / g_n
    want = {
        b: int(round((pos + _TENC_M * prior) / (cnt + _TENC_M) * 1e6))
        for b, (cnt, pos) in n.items()
    }
    got = {
        r["brand"]: r["enc_micro"]
        for r in encode_target_smoothed(spark, str(tmp_path)).collect()
    }
    assert got == want, (got, want)
    prior_micro = int(round(prior * 1e6))
    assert abs(got["B"] - prior_micro) < abs(got["A"] - prior_micro) / 3


# --------------------------------------------------------------------------
# Friedman test (r12 capability): textbook replay with ties and an
# incomplete block that must drop, in both engines.
# --------------------------------------------------------------------------


def _friedman_replay(blocks):
    """Exact replay over {block: {treat: cents}} complete blocks."""
    treats = sorted({t for d in blocks.values() for t in d})
    k = len(treats)
    complete = {b: d for b, d in blocks.items() if len(d) == k}
    b = len(complete)
    r2 = {t: 0 for t in treats}
    s2sum = 0
    for d in complete.values():
        vals = sorted(d.values())
        # doubled average rank per distinct value within the block
        rank2, before = {}, 0
        from collections import Counter

        cnt = Counter(vals)
        for v in sorted(cnt):
            rank2[v] = 2 * before + cnt[v] + 1
            before += cnt[v]
        for t, v in d.items():
            r2[t] += rank2[v]
            s2sum += rank2[v] * rank2[v]
    s1 = sum((r2[t] - b * (k + 1)) ** 2 for t in treats)
    s2 = s2sum - b * k * (k + 1) * (k + 1)
    chi2 = (
        None
        if b == 0 or s2 <= 0
        else int(round((k - 1) * float(s1) / s2 * 1_000_000))
    )
    return b, k, s1, s2, chi2


def test_friedman_matches_replay_with_ties_and_incomplete_block(
    spark, tmp_path
):
    """3 treatments; block 1 strictly ordered, block 2 with a within-
    block tie, block 3 reversed, block 4 INCOMPLETE (must drop). The
    kernel and the oracle must both match the exact replay."""
    from etl_pipeline_with_alpha_vantage_spark.operators.stats import (
        _FR_ORACLE,
        stats_friedman_test,
    )

    blocks = {
        0: {"A": 100, "B": 200, "C": 300},
        1: {"A": 500, "B": 500, "C": 700},   # tie within block
        2: {"A": 900, "B": 800, "C": 100},
        3: {"A": 400, "B": 600},             # incomplete: drops
    }
    orders, custs = [], []
    okey = 0
    for blk, d in blocks.items():
        custs.append((blk * 10, blk))
        for t, cents in d.items():
            orders.append((okey, blk * 10, t, cents / 100.0))
            okey += 1
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderpriority string,"
        " o_totalprice double",
    ).coalesce(1).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        custs, "c_custkey long, c_nationkey long"
    ).coalesce(1).write.parquet(str(tmp_path / "customer.parquet"))
    want = _friedman_replay(blocks)
    r = stats_friedman_test(spark, str(tmp_path)).collect()[0]
    got = (r["b"], r["k"], r["s1"], r["s2"], r["chi2_micro"])
    assert got == want, (got, want)
    assert got[0] == 3  # the incomplete block dropped
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE orders (o_orderkey BIGINT, o_custkey BIGINT,"
        " o_orderpriority VARCHAR, o_totalprice DOUBLE)"
    )
    con.sql("CREATE TABLE customer (c_custkey BIGINT, c_nationkey BIGINT)")
    con.executemany("INSERT INTO orders VALUES (?, ?, ?, ?)", orders)
    con.executemany("INSERT INTO customer VALUES (?, ?)", custs)
    o = con.sql(_FR_ORACLE).fetchall()[0]
    assert tuple(o) == want, (o, want)


# --------------------------------------------------------------------------
# Page's trend test (r12 capability): closed-form monotone pole + mixed
# design replay, in both engines.
# --------------------------------------------------------------------------


def _page_replay(blocks):
    """Exact replay over {block: {treat: cents}} complete blocks."""
    import math
    from collections import Counter

    treats = sorted({t for d in blocks.values() for t in d})
    k = len(treats)
    complete = [d for d in blocks.values() if len(d) == k]
    b = len(complete)
    c = {t: i + 1 for i, t in enumerate(treats)}
    l2 = 0
    for d in complete:
        cnt = Counter(d.values())
        rank2, before = {}, 0
        for v in sorted(cnt):
            rank2[v] = 2 * before + cnt[v] + 1
            before += cnt[v]
        for t, v in d.items():
            l2 += c[t] * rank2[v]
    if b == 0 or k <= 1:
        return b, k, l2, None
    e2 = float(b) * k * (k + 1) * (k + 1) / 2.0
    var2 = float(b) * k * k * (k + 1) * (k + 1) * (k - 1) / 36.0
    z = (l2 - e2) / math.sqrt(var2)
    return b, k, l2, int(
        math.floor(z * 1_000_000 + 0.5)
        if z >= 0
        else -math.floor(-z * 1_000_000 + 0.5)
    )


def test_page_trend_monotone_pole_and_replay(spark, tmp_path):
    """Two perfectly increasing blocks (k=3): L2 = 2b·Σj² = 56, E = 48,
    sd = 4 → z exactly +2e6; a third reversed block pulls z down —
    both cases via the exact replay against kernel and oracle."""
    from etl_pipeline_with_alpha_vantage_spark.operators.stats import (
        _PAGE_ORACLE,
        stats_page_trend,
    )

    def run(blocks):
        import shutil

        d = tmp_path / f"pg{len(blocks)}"
        orders, custs = [], []
        okey = 0
        for blk, dd in blocks.items():
            custs.append((blk * 10, blk))
            for t, cents in dd.items():
                orders.append((okey, blk * 10, t, cents / 100.0))
                okey += 1
        d.mkdir(exist_ok=True)
        spark.createDataFrame(
            orders,
            "o_orderkey long, o_custkey long, o_orderpriority string,"
            " o_totalprice double",
        ).coalesce(1).write.mode("overwrite").parquet(
            str(d / "orders.parquet")
        )
        spark.createDataFrame(
            custs, "c_custkey long, c_nationkey long"
        ).coalesce(1).write.mode("overwrite").parquet(
            str(d / "customer.parquet")
        )
        r = stats_page_trend(spark, str(d)).collect()[0]
        con = duckdb.connect()
        con.sql(
            "CREATE TABLE orders (o_orderkey BIGINT, o_custkey BIGINT,"
            " o_orderpriority VARCHAR, o_totalprice DOUBLE)"
        )
        con.sql(
            "CREATE TABLE customer (c_custkey BIGINT, c_nationkey BIGINT)"
        )
        con.executemany("INSERT INTO orders VALUES (?, ?, ?, ?)", orders)
        con.executemany("INSERT INTO customer VALUES (?, ?)", custs)
        o = con.sql(_PAGE_ORACLE).fetchall()[0]
        return (r["b"], r["k"], r["l2"], r["z_micro"]), tuple(o)

    inc = {
        0: {"A": 100, "B": 200, "C": 300},
        1: {"A": 10, "B": 20, "C": 30},
    }
    got, oracle = run(inc)
    want = _page_replay(inc)
    assert got == want == oracle, (got, want, oracle)
    assert got[3] == 2_000_000  # closed-form monotone pole

    mixed = dict(inc)
    mixed[2] = {"A": 900, "B": 500, "C": 100}  # reversed block
    got2, oracle2 = run(mixed)
    want2 = _page_replay(mixed)
    assert got2 == want2 == oracle2, (got2, want2, oracle2)
    assert got2[3] < got[3]


# --------------------------------------------------------------------------
# r12 optimization round: the memoized Mann-Kendall monthly fixture must
# survive (a) a foreign rebind of the shared "monthly" view name (the fuzz
# suites bind synthetic series to it) and (b) sf_dir switches in-session.
# --------------------------------------------------------------------------


def test_mk_monthly_fixture_rebinds_after_foreign_view(spark, sf_dir):
    from etl_pipeline_with_alpha_vantage_spark import registry
    from etl_pipeline_with_alpha_vantage_spark.registry import QUERIES

    registry.load_all()
    before = QUERIES["trend_mann_kendall"](spark, sf_dir).collect()
    assert before, "trend query returned no rows"
    # A foreign test (or user) binds its own table over the shared name.
    spark.range(3).selectExpr(
        "0 AS nation", "CAST(id AS BIGINT) + 202201 AS ym",
        "id * 100 AS rev_cents"
    ).createOrReplaceTempView("monthly")
    after = QUERIES["trend_mann_kendall"](spark, sf_dir).collect()
    assert after == before, "memoized fixture served the foreign view"


def test_mk_monthly_fixture_tracks_sf_dir_switch(spark, sf_dir):
    import os

    import pytest

    from etl_pipeline_with_alpha_vantage_spark import registry
    from etl_pipeline_with_alpha_vantage_spark.registry import QUERIES

    registry.load_all()
    other = "/root/testdata/sf0.01"
    if os.path.normpath(other) == os.path.normpath(sf_dir):
        other = "/root/testdata/sf0.001"
    if not os.path.isdir(other):
        pytest.skip(f"alternate scale dir {other} not present")
    q = QUERIES["trend_mann_kendall_seasonal"]
    a1 = q(spark, sf_dir).collect()
    b = q(spark, other).collect()
    a2 = q(spark, sf_dir).collect()
    assert a1 == a2, "fixture did not re-bind on return to first sf_dir"
    assert a1 != b, "two scale factors produced identical seasonal stats"
