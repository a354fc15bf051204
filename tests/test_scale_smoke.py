"""Volume smoke (SURVEY.md §4.3): the core operator shapes on 5M
synthetic rows — 50× the sf0.1 events table — generated distributed
(spark.range, no driver materialization). Verifies the plans that claim
"one shuffle, partial aggregation, no blow-up" actually complete fast and
exactly at millions of rows, not just on the small parquet fixtures.
Invariants are exact integer identities, so this is a correctness check
too, not just a liveness probe.
"""

from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

N = 5_000_000
USERS = 50_000
BASE_US = 1_704_067_200_000_000  # 2024-01-01 UTC, microseconds


@pytest.fixture(scope="module")
def big_events(spark):
    return spark.range(N).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(BASE_US) + F.col("id") * F.lit(7_000_000)
        ).alias("ts"),
        F.pmod(F.xxhash64("id"), F.lit(USERS)).alias("user_id"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)) / 100.0).alias(
            "value"
        ),
    )


def test_aggregation_exact_at_volume(big_events):
    cents = F.round(F.col("value") * 100).cast("long")
    agg = big_events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum(cents).alias("cents")
    )
    total = agg.agg(
        F.sum("n").alias("rows"),
        F.count(F.lit(1)).alias("groups"),
        F.sum("cents").alias("cents"),
    ).collect()[0]
    assert total.rows == N
    assert total.groups == USERS
    # every value is pmod(hash,10000)/100 → cents == pmod(hash,10000);
    # recompute the exact global sum independently of the groupBy path
    direct = big_events.agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
    ).collect()[0][0]
    assert total.cents == direct


def test_sessionize_preserves_rows_at_volume(spark, big_events):
    from etl_pipeline_with_alpha_vantage_spark.operators.timeseries import (
        assign_sessions,
    )

    sess = assign_sessions(big_events)
    out = sess.agg(
        F.count(F.lit(1)).alias("rows"),
        F.countDistinct("user_id").alias("users"),
    ).collect()[0]
    assert out.rows == N
    assert out.users == USERS


def test_window_topk_per_key_at_volume(big_events):
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), "event_id"
    )
    top3 = (
        big_events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )
    assert top3.count() == USERS * 3  # every user has ≥3 events at N/USERS=100


def test_exact_dedup_at_volume(big_events):
    # duplicate the whole input, dedup on event_id → original count
    doubled = big_events.unionAll(big_events)
    assert doubled.dropDuplicates(["event_id"]).count() == N


def test_q21_rewrite_equals_selfjoins_at_volume(spark):
    """The Q21 agg+window rewrite (one fact exchange) must produce
    exactly the classic EXISTS + NOT-EXISTS double-self-join result on
    2M synthetic lineitems — the rewrite's equivalence argument checked
    at volume, independent of the parquet fixtures."""
    M = 2_000_000
    li = spark.range(M).select(
        (F.col("id") / 4).cast("long").alias("ok"),
        F.pmod(F.xxhash64("id"), F.lit(500)).alias("sk"),
        (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(10)) < 2).alias("late"),
    )

    # rewrite path: per-(order,supplier) agg + per-order window
    per = (
        li.repartition("ok")
        .groupBy("ok", "sk")
        .agg(F.sum(F.col("late").cast("int")).alias("nl"))
    )
    w = Window.partitionBy("ok")
    got = (
        per.select(
            "ok",
            "sk",
            "nl",
            F.count(F.lit(1)).over(w).alias("ns"),
            F.sum((F.col("nl") > 0).cast("int")).over(w).alias("nls"),
        )
        .filter((F.col("nl") > 0) & (F.col("ns") >= 2) & (F.col("nls") == 1))
        .groupBy("sk")
        .agg(F.sum("nl").cast("long").alias("numwait"))
    )

    # classic form: late items, EXISTS another supplier, NOT EXISTS other
    # late supplier
    late_items = li.filter("late")
    pairs = li.select("ok", "sk").distinct()
    late_pairs = late_items.select("ok", "sk").distinct()
    l1, l2, l3 = late_items.alias("l1"), pairs.alias("l2"), late_pairs.alias("l3")
    surviving = (
        l1.join(
            l2,
            (F.col("l1.ok") == F.col("l2.ok"))
            & (F.col("l1.sk") != F.col("l2.sk")),
            "left_semi",
        )
        .alias("l1")
        .join(
            l3,
            (F.col("l1.ok") == F.col("l3.ok"))
            & (F.col("l1.sk") != F.col("l3.sk")),
            "left_anti",
        )
    )
    want = surviving.groupBy("sk").agg(F.count(F.lit(1)).alias("numwait"))

    got_rows = sorted(map(tuple, got.collect()))
    want_rows = sorted(map(tuple, want.collect()))
    assert got_rows == want_rows
    assert len(got_rows) == 500  # every supplier appears at this density


def test_kmv_bottom_k_merge_property_at_volume(spark, big_events):
    """The KMV sketch's merge property at 5M rows: the bottom-k of
    per-salt bottom-ks equals the global bottom-k EXACTLY — the identity
    agg_kmv_set_ops' two-stage prune relies on — and the resulting
    distinct estimate lands within the k=128 error envelope."""
    k = 128
    h = F.pmod(F.xxhash64("user_id", F.lit(7)), F.lit(2**52)).alias("h")
    hs = big_events.select(h).distinct()
    pre = Window.partitionBy(F.col("h") % 8).orderBy("h")
    pruned = (
        hs.withColumn("prn", F.row_number().over(pre))
        .filter(F.col("prn") <= k)
        .drop("prn")
    )
    glob = Window.orderBy("h")
    two_stage = [
        r.h
        for r in pruned.withColumn("rn", F.row_number().over(glob))
        .filter(F.col("rn") <= k)
        .select("h")
        .collect()
    ]
    single = [r.h for r in hs.orderBy("h").limit(k).collect()]
    assert two_stage == single
    exact = hs.count()
    est = (k - 1) * float(2**52) / max(single)
    assert abs(est - exact) <= 0.35 * exact, (est, exact)


# ---------------------------------------------------------------------------
# LLM-pipeline flagships at volume (round-8): the scale claims for the
# MinHash-LSH / star-CC / IVF / PageRank tiers rest on these measured
# invariants, not on plan shape alone.
# ---------------------------------------------------------------------------


def test_minhash_lsh_candidate_volume_bound_at_volume(spark):
    """The LSH bucket self-join's candidate-pair volume must equal
    EXACTLY Σ_buckets C(c, 2) — linear in bucket mass, never a cross
    product — on 5M banded rows with a deliberately SKEWED bucket
    distribution (1% of rows land in 100 hot buckets, the rest spread
    over 500k cold ones; the worst shape for a pair-join blow-up)."""
    import time

    DOCS, BANDS = 1_250_000, 4  # 5M banded rows, dedup_minhash_lsh's shape
    banded = (
        spark.range(DOCS * BANDS)
        .select(
            (F.col("id") % DOCS).alias("doc_id"),
            (F.col("id") / DOCS).cast("int").alias("band_idx"),
        )
        .withColumn("h", F.xxhash64("doc_id", "band_idx"))
        .withColumn(
            "band_hash",
            F.when(
                F.pmod(F.xxhash64("doc_id", "band_idx", F.lit(1)), F.lit(100))
                == 0,
                F.pmod("h", F.lit(100)),  # hot head
            ).otherwise(F.lit(100) + F.pmod("h", F.lit(500_000))),
        )
        .drop("h")
    )
    expected = (
        banded.groupBy("band_idx", "band_hash")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) DIV 2")).cast("long"))
        .collect()[0][0]
    )
    # Run the REAL kernel (dedup_minhash_lsh's lsh_candidate_pairs) with
    # an Observation on its bucket-join stage (round 11): the candidate
    # mass is measured on the executed plan, PRE-threshold, where an
    # output count could not see an expand-then-discard regression. The
    # constant 7-element signature makes est ≡ 7/32 ≥ 0.2, so the
    # threshold keeps everything and the post-dedup output only shrinks.
    from pyspark.sql import Observation

    from etl_pipeline_with_alpha_vantage_spark.operators.dedup import (
        lsh_candidate_pairs,
    )

    obs = Observation()
    t0 = time.perf_counter()
    got = lsh_candidate_pairs(
        banded.withColumn("sig", F.array(*[F.lit(0)] * 7)),
        candidate_observation=obs,
    ).count()
    elapsed = time.perf_counter() - t0
    assert obs.get["candidates"] == expected, obs.get
    assert got <= expected  # multi-band dedup only shrinks
    assert expected > 1_000_000  # the skew genuinely produces volume
    assert elapsed < 150, f"LSH bucket join took {elapsed:.0f}s at 5M rows"


def test_star_cc_path_graph_converges_logarithmically_at_volume(spark):
    """Star contraction on the ADVERSARIAL topology (a 1M-edge path —
    the chain-shaped dup graph that forces O(n) sweeps out of min-label
    propagation) must converge in O(log n) rounds and label every node
    with the component minimum, exactly."""
    from etl_pipeline_with_alpha_vantage_spark.operators.dedup import (
        connected_components_star,
    )

    V = 1_000_001  # path 0-1-2-…-1M: one component, 1M edges
    nodes = spark.range(V).select(F.col("id").alias("doc_id"))
    pairs = spark.range(V - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    stats: dict = {}
    out = connected_components_star(nodes, pairs, max_iter=30, stats=stats)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("cluster_id") == 0).cast("long")).alias("zeros"),
    ).collect()[0]
    assert agg.n == V and agg.zeros == V  # every node labeled min(component)
    # Kiveris et al. bound is O(log² n); measured behavior on paths is
    # ~log₂(n) (the 10k path converges in ~12). 25 rounds of headroom
    # at n=1M means a regression to linear sweeps fails immediately.
    assert stats["rounds"] <= 25, stats


def test_ivf_probe_volume_exact_at_volume(spark):
    """The IVF probe join must scan EXACTLY the rows of the probed
    cells — Σ_q Σ_{cell ∈ probes(q)} |cell| minus the self matches —
    on a 5M-vector assignment table with skewed cell sizes. This is
    the identity that makes nprobe/nlist the scan-fraction dial at
    100 TB (probing 4 of 16 cells reads ~25% of the corpus, never a
    full scan per query)."""
    N_VEC, CELLS, NPROBE, NQ = 5_000_000, 16, 4, 1_000
    # skewed cells: squaring a uniform in [0,1) biases mass to cell 0
    assign = spark.range(N_VEC).select(
        F.col("id").alias("vec_id"),
        F.floor(
            F.pow(F.pmod(F.xxhash64("id"), F.lit(1000)) / 1000.0, F.lit(2))
            * CELLS
        )
        .cast("int")
        .alias("cell"),
    )
    probes = (
        spark.range(NQ)
        .select(F.col("id").alias("query_id"))
        .crossJoin(spark.range(NPROBE).select(F.col("id").alias("j")))
        .select(
            "query_id",
            F.pmod(F.col("query_id") + F.col("j") * 5, F.lit(CELLS))
            .cast("int")
            .alias("cell"),
        )
    )
    cell_counts = {
        r.cell: r.c
        for r in assign.groupBy("cell").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    probe_rows = probes.collect()
    expected = sum(cell_counts.get(p.cell, 0) for p in probe_rows)
    # subtract queries whose own vector sits in one of their probed cells
    own = {
        r.vec_id: r.cell
        for r in assign.filter(F.col("vec_id") < NQ).collect()
    }
    probed_by_q: dict = {}
    for p in probe_rows:
        probed_by_q.setdefault(p.query_id, set()).add(p.cell)
    expected -= sum(
        1 for q, cells in probed_by_q.items() if own[q] in cells
    )
    got = (
        probes.join(assign, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .count()
    )
    assert got == expected
    assert expected < N_VEC * NQ  # sanity: nowhere near the cross product


def test_pagerank_sweep_exact_on_regular_graph_at_volume(spark):
    """3 integer-PageRank sweeps over a 4.9M-edge 7-regular ring must
    give EVERY node the closed-form rank: on a d-regular graph all
    ranks stay equal, so the distributed join→agg recurrence must
    reproduce r' = 150000 + (850·d·(r DIV d)) DIV 1000 bit-for-bit at
    every node — any lost or doubled edge message breaks the identity.
    Also a wall-clock ceiling on the sweep cost at volume."""
    import time

    from etl_pipeline_with_alpha_vantage_spark.operators.graph import (
        pagerank_sweeps,
    )

    V, D = 700_000, 7
    edges = spark.range(V * D).select(
        F.expr("id DIV 7").alias("src"),
        F.expr("(id DIV 7 + 1 + id % 7) % 700000").alias("dst"),
        F.lit(D).alias("outdeg"),
    ).localCheckpoint(eager=True)
    r = 1_000_000
    for _ in range(3):
        r = 150_000 + (850 * (D * (r // D))) // 1000
    t0 = time.perf_counter()
    agg = (
        pagerank_sweeps(edges, 3)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("rank_units").alias("vals"),
            F.min("rank_units").alias("rank"),
        )
        .collect()[0]
    )
    elapsed = time.perf_counter() - t0
    assert agg.n == V
    assert agg.vals == 1 and agg.rank == r
    assert elapsed < 120, f"3 sweeps over {V*D} edges took {elapsed:.0f}s"


def test_asof_union_window_exact_at_volume(spark):
    """The as-of join's union-window device (asof_join's shape: tag
    sides, one shuffle on key, last(ignorenulls) carry-forward) proven
    exact at 5.5M rows via a closed form: quotes sit on every 100-tick
    grid point per key, so the latest quote at-or-before ANY trade ts
    is exactly (ts DIV 100)*100 — each of 500k trades must match it,
    and no trade may go unmatched or be duplicated."""
    KEYS, TICKS, TRADES = 10_000, 500, 500_000  # 5M quotes + 500k trades
    quotes = spark.range(KEYS * TICKS).select(
        F.pmod("id", F.lit(KEYS)).alias("k"),
        (F.expr(f"id DIV {KEYS}") * 100).alias("ts"),
        F.lit(0).alias("kind"),
        (F.expr(f"id DIV {KEYS}") * 100).alias("quote_ts"),
    )
    trades = spark.range(TRADES).select(
        F.pmod(F.xxhash64("id"), F.lit(KEYS)).alias("k"),
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(TICKS * 100)).alias("ts"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("quote_ts"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        quotes.unionByName(trades)
        .withColumn("m", F.last("quote_ts", ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
    )
    agg = matched.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("m") != F.expr("(ts DIV 100) * 100")).cast("long")
        ).alias("wrong"),
        F.sum(F.col("m").isNull().cast("long")).alias("unmatched"),
    ).collect()[0]
    assert agg.n == TRADES
    assert agg.wrong == 0 and agg.unmatched == 0


def test_streaming_dedup_rollup_equals_batch_at_volume(spark, tmp_path):
    """X18/X19 state at volume: 1M events (every event_id duplicated —
    500k distinct keys of dedup state) streamed as 4 file-batches
    through watermark → dropDuplicates → hourly rollup must equal the
    batch recompute over the same files, exactly. This is the
    drained-equality proof at 200× the fixture's event count."""
    import pyspark.sql.types as T

    from etl_pipeline_with_alpha_vantage_spark.streaming.runner import (
        dedup_hourly_counts,
        run_available_now,
    )

    N = 1_000_000
    src = str(tmp_path / "feed")
    # Four event-time-ordered file batches (a real feed's contract: the
    # watermark only ever advances). Each quarter holds BOTH copies of
    # its event_ids, so the dedup state sees every duplicate in-window.
    quarter = N // 8  # distinct ids per quarter (each written twice)
    for q in range(4):
        spark.range(quarter * 2).select(
            (F.lit(q * quarter) + F.pmod("id", F.lit(quarter))).alias(
                "event_id"
            ),
            F.timestamp_micros(
                F.lit(BASE_US)
                + (F.lit(q * quarter) + F.pmod("id", F.lit(quarter)))
                * F.lit(3_000_000)
            ).alias("ts"),
            F.element_at(
                F.array(F.lit("click"), F.lit("view"), F.lit("purchase")),
                (F.pmod("id", F.lit(3)) + 1).cast("int"),
            ).alias("event_type"),
        ).coalesce(1).write.mode("append").parquet(src)

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    run_available_now(
        dedup_hourly_counts(stream), "vol_hourly", str(tmp_path / "ck")
    )
    got = {
        (r.event_type, r.window_start, r.n_events)
        for r in spark.table("vol_hourly").collect()
    }
    want = {
        (r.event_type, r.window_start, r.n_events)
        for r in spark.read.parquet(src)
        .dropDuplicates(["event_id"])
        .groupBy("event_type", F.window("ts", "1 hour").alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "event_type", F.col("win.start").alias("window_start"), "n_events"
        )
        .collect()
    }
    assert got == want and len(got) > 100
    assert sum(n for _, _, n in got) == N // 2  # dedup halved the feed


def test_ks_statistic_closed_form_at_volume(spark):
    """The exact-integer KS kernel (drift_ks_two_sample's actual
    segmented prefix-sum device, ks_statistic) at 10M rows with both
    analytic extremes in one call: a group whose arms share an
    identical value multiset (D must be exactly 0 — every cumulative
    cut balances) and a group whose arms have disjoint supports (D
    must be exactly 1, numerator na·nb). Any lost or doubled count in
    the in-bucket windows or the per-bucket running totals breaks one
    of the two identities."""
    from etl_pipeline_with_alpha_vantage_spark.operators.stats import (
        ks_statistic,
    )

    N = 5_000_000  # per group
    # cents derives from id DIV 2 so consecutive (even, odd) id pairs
    # land the SAME value in BOTH arms — identical multisets exactly.
    ident = spark.range(N).select(
        F.lit("identical").alias("grp"),
        F.pmod("id", F.lit(2)).alias("arm"),
        F.pmod(F.expr("id DIV 2"), F.lit(100_000)).alias("cents"),
    )
    disj = spark.range(N).select(
        F.lit("disjoint").alias("grp"),
        F.pmod("id", F.lit(2)).alias("arm"),
        (
            F.pmod(F.expr("id DIV 2"), F.lit(100_000))
            + F.pmod("id", F.lit(2)) * 200_000
        ).alias("cents"),
    )
    rows = {
        r.grp: r
        for r in ks_statistic(ident.unionAll(disj)).collect()
    }
    na, nb = N // 2, N // 2
    assert rows["identical"].na == na and rows["identical"].nb == nb
    assert rows["identical"].d_num == 0
    assert rows["identical"].d_micro == 0
    assert rows["disjoint"].d_num == na * nb
    assert rows["disjoint"].d_micro == 1_000_000


def test_cms_heavy_hitters_closed_form_at_volume(spark):
    """The count-min kernel (agg_cms_heavy_hitters' actual grid/probe/
    min path, cms_audit_heavy_hitters) at 5M events with closed-form
    key frequencies: key 0 owns every 10th event (500k), keys 1..K are
    uniform (~562 each), so the top-10 exact counts are known and the
    heavy key dominates by 3 orders of magnitude. Audits the sketch's
    deterministic contract at volume — the estimate NEVER underestimates
    (min over depth rows of over-counted cells), the exact side matches
    the closed form, and the heavy hitter's estimate stays within the
    additive N/width bound that makes a 4×256 grid usable at any corpus
    size."""
    N, K = 5_000_000, 8_000
    from etl_pipeline_with_alpha_vantage_spark.operators.curation import (
        _CMS_WIDTH,
        cms_audit_heavy_hitters,
    )

    ev = spark.range(N).select(
        F.when(F.pmod("id", F.lit(10)) == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(K)) + 1)
        .alias("user_id")
    )
    rows = cms_audit_heavy_hitters(ev, "user_id", 10).collect()
    assert len(rows) == 10
    assert rows[0].user_id == 0 and rows[0].exact_cnt == N // 10
    assert all(r.never_underestimates for r in rows)
    # CMS additive error bound with certainty for the min over rows is
    # only probabilistic in general, but the total over-count in any
    # single row is ≤ N − exact, and with 4 independent rows at width
    # 256 the observed min stays within the classical e·N/w envelope —
    # assert the engineering bound the width was sized for.
    assert rows[0].cms_est - rows[0].exact_cnt <= 3 * N // _CMS_WIDTH
    for r in rows[1:]:
        assert r.exact_cnt < 2 * (N - N // 10) // K  # uniform tail


def test_streaming_session_windows_closed_form_at_volume(spark, tmp_path):
    """True-stream session windows (X18's F.session_window path) at 1M
    events with a closed form: every user emits bursts of exactly 4
    events 1 minute apart, bursts 2 hours apart, so with a 30-minute gap
    every burst IS one session — 2,500 users × 100 bursts = 250,000
    sessions, each with exactly 4 events and a 3-minute event span. The
    4 file-batches deliberately cut MID-BURST (boundary at j % 4 == 2),
    so sessions span micro-batches and the state-store merge is what's
    being proven; the drained result must also equal the batch
    recompute exactly."""
    import pyspark.sql.types as T

    from etl_pipeline_with_alpha_vantage_spark.streaming.runner import (
        run_available_now,
    )

    USERS, BURSTS, G = 2_500, 100, 4
    N = USERS * BURSTS * G  # 1M
    src = str(tmp_path / "feed")
    # Global event index i: user = i % USERS, k = i DIV USERS (per-user
    # sequence), burst = k DIV G, j = k % G. Event time depends only on
    # k, so slicing by k ranges keeps event time monotone across files.
    per_user = BURSTS * G
    cut = per_user // 4 + 2  # NOT a multiple of G: every file cuts mid-burst
    bounds = [0, cut, 2 * cut, 3 * cut, per_user]
    for b in range(4):
        lo, hi = bounds[b], bounds[b + 1]
        spark.range(USERS * (hi - lo)).select(
            F.pmod("id", F.lit(USERS)).alias("user_id"),
            (F.expr(f"id DIV {USERS}") + lo).alias("k"),
        ).select(
            "user_id",
            F.timestamp_micros(
                F.lit(BASE_US)
                + F.expr(f"k DIV {G}") * F.lit(7_200_000_000)
                + F.pmod("k", F.lit(G)) * F.lit(60_000_000)
            ).alias("ts"),
        ).coalesce(1).write.mode("append").parquet(src)

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    sess = (
        stream.withWatermark("ts", "1 hour")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("s"),
            F.col("w.end").alias("e"),
            "n_events",
        )
    )
    # Complete mode: append would withhold the final bursts behind the
    # watermark at end-of-stream; complete emits the full merged state,
    # which is what the closed form audits.
    run_available_now(
        sess, "vol_sessions", str(tmp_path / "ck"), timeout_sec=300
    )
    got = spark.table("vol_sessions")
    agg = got.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum((F.col("n_events") != G).cast("long")).alias("bad_size"),
        F.sum(
            (
                F.col("e").cast("long") - F.col("s").cast("long")
                != (G - 1) * 60 + 30 * 60  # span + gap-extension
            ).cast("long")
        ).alias("bad_span"),
        F.sum("n_events").alias("total_events"),
    ).collect()[0]
    assert agg.n_sessions == USERS * BURSTS
    assert agg.bad_size == 0
    assert agg.bad_span == 0
    assert agg.total_events == N

    # Drained stream == batch recompute, exactly.
    batch = (
        spark.read.parquet(src)
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("s"),
            F.col("w.end").alias("e"),
            "n_events",
        )
    )
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_oriented_triangles_closed_form_at_volume(spark):
    """The degree-ordered triangle kernel (graph_triangles' actual
    enumeration, oriented_triangles) proven exact at 4.6M edges with a
    closed-form answer: 1.5M DISJOINT triangles (nodes 3i, 3i+1, 3i+2 —
    exactly one canonical triple each) plus a 100k-leaf star whose hub
    is in no triangle. The star is the adversarial part: a naive wedge
    join fans out quadratically on the hub; the orientation points
    every leaf edge AT the hub (leaves have lower degree), giving the
    hub out-degree 0, so the hub contributes zero wedges — the bound
    this kernel exists to provide. Asserts the exact triple set shape
    (count == T, every triple is its generator's (3i, 3i+1, 3i+2)) and
    a wall-clock ceiling."""
    import time

    from etl_pipeline_with_alpha_vantage_spark.operators.graph import (
        oriented_triangles,
    )

    T, STAR = 1_500_000, 100_000
    hub = 3 * T
    tri_edges = spark.range(3 * T).select(
        (F.expr("id DIV 3") * 3 + F.pmod("id", F.lit(3))).alias("doc_a"),
        (
            F.expr("id DIV 3") * 3
            + F.when(F.pmod("id", F.lit(3)) == 2, F.lit(0)).otherwise(
                F.pmod("id", F.lit(3)) + 1
            )
        ).alias("doc_b"),
    )
    star_edges = spark.range(STAR).select(
        (F.col("id") + hub + 1).alias("doc_a"),
        F.lit(hub).cast("long").alias("doc_b"),
    )
    edges = tri_edges.select(
        F.least("doc_a", "doc_b").alias("doc_a"),
        F.greatest("doc_a", "doc_b").alias("doc_b"),
    ).unionAll(star_edges.select(
        F.least("doc_a", "doc_b").alias("doc_a"),
        F.greatest("doc_a", "doc_b").alias("doc_b"),
    ))

    t0 = time.perf_counter()
    got = oriented_triangles(edges).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (
                (F.pmod("doc_a", F.lit(3)) == 0)
                & (F.col("doc_b") == F.col("doc_a") + 1)
                & (F.col("doc_c") == F.col("doc_a") + 2)
            ).cast("long")
        ).alias("canonical"),
        F.sum((F.col("doc_c") >= hub).cast("long")).alias("star_involved"),
    ).collect()[0]
    elapsed = time.perf_counter() - t0
    assert got.n == T
    assert got.canonical == T
    assert got.star_involved == 0
    assert elapsed < 240, f"triangles at 4.6M edges took {elapsed:.0f}s"


def test_pack_greedy_closed_form_at_volume(spark):
    """The sequence-packing kernel (pack_sequences' actual grouped
    applyInPandas, pack_greedy) proven exact at 4M docs across 64
    groups with analytically known bin assignments under budget 256:

      even groups: constant length 50  → 5 docs/bin, bin_id = rank DIV 5
      odd groups:  lengths 100,60,…    → each bin holds exactly one
                   (100,60) pair (160+100 overflows), bin_id = rank DIV 2

    The odd-group case pins the overflow boundary (a bin closes only
    when the NEXT doc would overflow); both cases pin that bins never
    cross groups. Checks are per-row equality against the closed form
    (0 mismatches over 4M rows) plus exact bin counts per group."""
    from etl_pipeline_with_alpha_vantage_spark.operators.packing import (
        pack_greedy,
    )

    N_DOCS, GROUPS, BUDGET = 4_000_000, 64, 256
    per_group = N_DOCS // GROUPS
    docs = spark.range(N_DOCS).select(
        F.pmod("id", F.lit(GROUPS)).alias("grp"),
        F.expr(f"id DIV {GROUPS}").alias("rank"),
        F.when(F.pmod("id", F.lit(GROUPS)) % 2 == 0, F.lit(50))
        .otherwise(
            F.when(F.expr(f"(id DIV {GROUPS}) % 2") == 0, F.lit(100)).otherwise(
                F.lit(60)
            )
        )
        .cast("long")
        .alias("toks"),
    )
    packed = pack_greedy(docs, ["grp"], "rank", "toks", budget=BUDGET)
    expected_bin = F.when(
        F.col("grp") % 2 == 0, F.expr("rank DIV 5")
    ).otherwise(F.expr("rank DIV 2"))
    row = packed.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("bin_id") != expected_bin).cast("long")).alias("bad"),
    ).collect()[0]
    assert row.n == N_DOCS and row.bad == 0

    fills = packed.groupBy("grp", "bin_id").agg(
        F.sum("toks").alias("fill")
    )
    audit = fills.agg(
        F.max("fill").alias("max_fill"),
        F.sum((F.col("grp") % 2 == 0).cast("long")).alias("even_bins"),
        F.sum((F.col("grp") % 2 == 1).cast("long")).alias("odd_bins"),
    ).collect()[0]
    assert audit.max_fill <= BUDGET
    assert audit.even_bins == (GROUPS // 2) * ((per_group + 4) // 5)
    assert audit.odd_bins == (GROUPS // 2) * ((per_group + 1) // 2)


def test_bpe_trainer_closed_form_at_volume(spark):
    """The BPE merge-learning loop (bpe_train_merges' actual kernel,
    learn_merges_from) proven exact on a 2M-document corpus with an
    analytically known trajectory. Every doc is 'abab cd cd ef ef ef'
    plus one pair-free single-char filler, so with N = 2M:

      iter 1: 'e f' wins at 3N; ef collapses   → corpus 12N tokens
      iter 2: 'a b' wins the 2N tie vs 'c d' (pair ASC); canonical
              merging MUST turn ' a b a b ' into ' ab ab ' (2 tokens,
              back-to-back occurrences both merge) → corpus 10N — this
              row is the volume pin for the fold semantics; the old
              delimiter-consuming replace device gave 11N here
      iter 3: 'c d' wins at 2N                 → corpus 8N

    The corpus is scanned once into a 23-row vocabulary (the trainer's
    scale contract: iterations run on the vocab, corpus-size-
    independent), so this also proves the one-scan shape at volume."""
    from etl_pipeline_with_alpha_vantage_spark.operators.tokenizer import (
        learn_merges_from,
    )

    N_DOCS = 2_000_000
    filler = F.element_at(
        F.array(*[F.lit(chr(ord("g") + i)) for i in range(20)]),
        (F.pmod(F.xxhash64("id"), F.lit(20)) + 1).cast("int"),
    )
    docs = spark.range(N_DOCS).select(
        F.concat(F.lit("abab cd cd ef ef ef "), filler).alias("text")
    )
    n = N_DOCS
    got = []
    for pair, cnt, vocab in learn_merges_from(docs):
        tokens_after = (
            vocab.agg(
                F.sum(
                    F.col("freq") * F.size(F.split(F.trim(F.col("sym")), " "))
                ).alias("t")
            ).collect()[0].t
        )
        got.append((pair, cnt, int(tokens_after)))
    assert got == [
        ("e f", 3 * n, 12 * n),
        ("a b", 2 * n, 10 * n),
        ("c d", 2 * n, 8 * n),
    ]


def test_semdedup_closed_form_at_volume(spark):
    """The SemDeDup kernel (dedup_semantic's actual per-cell BLAS
    matmul, _semdedup_cell_pairs) proven exact at 1M vectors: one-hot
    embeddings make every within-group cosine exactly 1 and every
    cross-group cosine exactly 0, so the keep-the-first prune decision
    has a closed form — a vector is pruned iff a lower vec_id shares
    its (cell, group), survivors == COUNT(DISTINCT (cell, group)), and
    the total closer-duplicate count == Σ s·(s−1)/2 over group sizes.
    Both expectations come from plain exact groupBy counts, a fully
    independent code path from the Arrow/BLAS kernel under test. Also
    pins the scale contract: candidate work is blocked per cell
    (Σ cell², 2000 cells of ~500), never corpus²."""
    import time

    from etl_pipeline_with_alpha_vantage_spark.operators.similarity import (
        _PAIR_SCHEMA,
        _SEMDEDUP_TAU,
        _semdedup_cell_pairs,
    )

    N_VEC, CELLS, GROUPS, DIM = 1_000_000, 2_000, 32, 64
    assert 0 < _SEMDEDUP_TAU <= 1.0  # one-hot cosines are exactly 0 or 1
    base = spark.range(N_VEC).select(
        F.col("id").alias("vec_id"),
        F.pmod(F.xxhash64("id"), F.lit(CELLS)).alias("label"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(GROUPS)).alias("grp"),
    )
    onehot = F.array(
        *[
            F.when(F.col("grp") == g, F.lit(1.0)).otherwise(F.lit(0.0))
            for g in range(GROUPS)
        ]
        + [F.lit(0.0)] * (DIM - GROUPS)
    )
    emb = base.select("vec_id", "label", "grp", onehot.alias("emb"))

    # Independent expectations from exact relational counts.
    sizes = emb.groupBy("label", "grp").agg(F.count(F.lit(1)).alias("s"))
    exp = sizes.agg(
        F.count(F.lit(1)).alias("survivors"),
        F.sum(F.expr("s * (s - 1) / 2")).cast("long").alias("closer_total"),
    ).collect()[0]

    t0 = time.perf_counter()
    pairs = emb.select("vec_id", "label", "emb").groupBy("label").applyInPandas(
        _semdedup_cell_pairs, _PAIR_SCHEMA
    )
    close = (
        pairs.filter(F.round("cos", 6) >= _SEMDEDUP_TAU)
        .groupBy(F.col("vec_b").alias("vec_id"))
        .agg(F.count(F.lit(1)).alias("n_closer"))
    )
    got = (
        emb.select("vec_id")
        .join(close, "vec_id", "left")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("n_closer").isNull()).cast("long")).alias("kept"),
            F.sum(F.coalesce("n_closer", F.lit(0))).alias("closer_total"),
        )
        .collect()[0]
    )
    elapsed = time.perf_counter() - t0
    assert got.n == N_VEC
    assert got.kept == exp.survivors
    assert got.closer_total == exp.closer_total
    assert elapsed < 240, f"SemDeDup at {N_VEC} rows took {elapsed:.0f}s"


def test_pq_encode_adc_lossless_at_volume(spark):
    """The PQ tier (similarity_pq_adc_topk's actual encode kernel +
    the ADC lookup-sum shape) proven exact at 5M vectors via a closed
    form: every vector is built as an EXACT concatenation of sub-
    codebook centroids, so (a) the Arrow-batched encoder must recover
    the generating code at every one of the 20M (vector, subspace)
    cells — quantization is lossless on codebook points — and (b) the
    ADC score (4 table lookups + adds) must equal the true 64-dim dot
    product on every (query, vector) pair, because ADC's only error
    term IS the quantization residual, which is zero here. Integer
    centroid values keep both sides exactly representable, so the
    comparison is == on 10M pairs, not a tolerance. Also a wall-clock
    ceiling on encoding 5M × 64 dims through Arrow."""
    import time

    import numpy as np

    from etl_pipeline_with_alpha_vantage_spark.operators.similarity import (
        pq_encode_udf,
    )

    N_VEC, M, SUBDIM, K, NQ = 5_000_000, 4, 16, 16, 2
    # Integer sub-codebooks, pairwise-distinct within each subspace:
    # (7·c + 3·d + m) mod 17 — distinct because 7(c1−c2) ≢ 0 (mod 17)
    # for c1 ≠ c2 in 0..15, so the nearest centroid of a codebook point
    # is itself, uniquely.
    cb = [
        np.array(
            [[(7 * c + 3 * d + m) % 17 for d in range(SUBDIM)] for c in range(K)],
            dtype=np.float64,
        )
        for m in range(M)
    ]
    cb_lit = [
        F.array(
            *[
                F.array(*[F.lit(float(cb[m][c][d])) for d in range(SUBDIM)])
                for c in range(K)
            ]
        )
        for m in range(M)
    ]
    gen_code = [
        F.pmod(F.xxhash64("id", F.lit(m)), F.lit(K)).alias(f"g{m}")
        for m in range(M)
    ]
    vecs = spark.range(N_VEC).select(
        F.col("id").alias("vec_id"),
        *gen_code,
    ).select(
        "vec_id",
        F.array(*[F.col(f"g{m}") for m in range(M)]).alias("gen"),
        F.flatten(
            F.array(
                *[
                    F.element_at(cb_lit[m], (F.col(f"g{m}") + 1).cast("int"))
                    for m in range(M)
                ]
            )
        ).alias("emb"),
    )

    # Two codebook-exact queries with fixed codes.
    qcodes = [[(3 * q + m) % K for m in range(M)] for q in range(NQ)]
    qvecs = [
        np.concatenate([cb[m][qcodes[q][m]] for m in range(M)])
        for q in range(NQ)
    ]
    # LUT[q][m][code] = dot(query subvector, sub-centroid) — integers.
    lut = [
        [
            [float(qvecs[q][m * SUBDIM : (m + 1) * SUBDIM] @ cb[m][c]) for c in range(K)]
            for m in range(M)
        ]
        for q in range(NQ)
    ]

    t0 = time.perf_counter()
    coded = vecs.select(
        "vec_id", "gen", "emb", pq_encode_udf(cb)("emb").alias("codes")
    )
    checks = [
        F.sum((F.col("codes") != F.col("gen")).cast("long")).alias("enc_bad")
    ]
    for q in range(NQ):
        adc = sum(
            (
                F.element_at(
                    F.array(*[F.lit(lut[q][m][c]) for c in range(K)]),
                    (F.element_at("codes", m + 1) + 1).cast("int"),
                )
                for m in range(M)
            ),
            F.lit(0.0),
        )
        exact = F.aggregate(
            F.zip_with(
                "emb",
                F.array(*[F.lit(float(x)) for x in qvecs[q]]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        checks.append(
            F.sum((adc != exact).cast("long")).alias(f"adc_bad_{q}")
        )
    checks.append(F.count(F.lit(1)).alias("n"))
    row = coded.agg(*checks).collect()[0]
    elapsed = time.perf_counter() - t0
    assert row.n == N_VEC
    assert row.enc_bad == 0, f"{row.enc_bad} of {N_VEC} vectors misencoded"
    for q in range(NQ):
        assert row[f"adc_bad_{q}"] == 0
    assert elapsed < 240, f"PQ encode+ADC at {N_VEC} rows took {elapsed:.0f}s"


def test_semdedup_blocked_skew_split_exact_at_volume(spark):
    """The blocked SemDeDup kernel (semdedup_prune — dedup_semantic_ivf's
    actual execution path) proven exact AND bounded under deliberate
    skew at 1M vectors: one mega-cell holds ~5% of the corpus (~50k
    rows, 400× the uniform tail's cell size) — the case the plain
    per-cell kernel cannot schedule, since one worker would own a
    50k×50k matmul. With max_rows=4096 the mega-cell splits into
    C(13,2)+13 = 91 bounded block-pair tasks.

    Three independent invariants close the contract:
    - replicated task-frame volume == Σ_cell s·nb exactly (the documented
      shuffle cost of the escape hatch — linear in pairwise work);
    - no task ever holds more than ~2·max_rows rows (boundedness — the
      actual point of the split);
    - the prune output equals the one-hot closed form (survivors =
      COUNT(DISTINCT (cell, grp)), Σ n_closer_dups = Σ s·(s−1)/2 over
      (cell, grp) sizes) — exactness, via plain relational counts that
      never touch the Arrow/BLAS path.
    """
    import time

    from etl_pipeline_with_alpha_vantage_spark.operators.similarity import (
        _SEMDEDUP_TAU,
        _semdedup_block_frame,
        semdedup_prune,
    )

    N_VEC, TAIL_CELLS, GROUPS, DIM, MAX_ROWS = 1_000_000, 8_000, 32, 64, 4096
    assert 0 < _SEMDEDUP_TAU <= 1.0  # one-hot cosines are exactly 0 or 1
    MEGA = TAIL_CELLS  # a cell id the uniform tail can't produce
    base = spark.range(N_VEC).select(
        F.col("id").alias("vec_id"),
        F.when(F.pmod(F.xxhash64("id", F.lit(7)), F.lit(20)) == 0, F.lit(MEGA))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(TAIL_CELLS)))
        .alias("cell"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(GROUPS)).alias("grp"),
    )
    onehot = F.array(
        *[
            F.when(F.col("grp") == g, F.lit(1.0)).otherwise(F.lit(0.0))
            for g in range(GROUPS)
        ]
        + [F.lit(0.0)] * (DIM - GROUPS)
    )
    emb = base.select("vec_id", "cell", "grp", onehot.alias("emb"))

    # Independent expectations from exact relational counts.
    cell_sizes = emb.groupBy("cell").agg(F.count(F.lit(1)).alias("s"))
    exp_rep = cell_sizes.agg(
        F.sum(
            F.col("s") * F.greatest(F.lit(1), F.ceil(F.col("s") / MAX_ROWS))
        ).alias("rep"),
        F.max("s").alias("mega"),
    ).collect()[0]
    assert exp_rep.mega > 40_000  # the skew is real: ~5% of 1M in one cell
    grp_sizes = emb.groupBy("cell", "grp").agg(F.count(F.lit(1)).alias("s"))
    exp = grp_sizes.agg(
        F.count(F.lit(1)).alias("survivors"),
        F.sum(F.expr("s * (s - 1) / 2")).cast("long").alias("closer_total"),
    ).collect()[0]

    rep = _semdedup_block_frame(emb.select("vec_id", "cell", "emb"), MAX_ROWS)
    # boundedness invariant: every block-pair task ≤ ~2·max_rows rows
    # (hash-bucket imbalance gives a small epsilon over 2·max_rows)
    max_task = (
        rep.groupBy("cell", "bi", "bj")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("m"))
        .collect()[0]
        .m
    )
    assert max_task <= int(2.2 * MAX_ROWS), max_task

    from pyspark.sql import Observation

    obs = Observation()
    t0 = time.perf_counter()
    got = (
        semdedup_prune(
            emb.select("vec_id", "cell", "emb"),
            MAX_ROWS,
            block_observation=obs,
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("kept").cast("long")).alias("kept"),
            F.sum("n_closer_dups").alias("closer_total"),
        )
        .collect()[0]
    )
    elapsed = time.perf_counter() - t0
    # shuffle-volume invariant measured ON the executed prune (round 11:
    # a separately built twin frame can't prove what the kernel's own
    # plan materializes): exactly Σ s·nb replicated rows.
    assert obs.get["replicated"] == exp_rep.rep, obs.get
    assert got.n == N_VEC
    assert got.kept == exp.survivors
    assert got.closer_total == exp.closer_total
    assert elapsed < 300, f"blocked SemDeDup at {N_VEC} rows took {elapsed:.0f}s"


def test_pack_blocked_scan_equals_sequential_at_volume(spark):
    """pack_greedy_blocked (the two-pass function-composition scan —
    pack_sequences_blocked's execution path) proven exact at 600k docs
    under deliberate skew: one mega-source holds ~50% of the corpus
    (~300k docs — the group the sequential kernel must own whole), the
    rest spread over 1000 sources. Tokens are hash-random in [1, 300]
    with ~1% oversized (> budget), exercising the overflow, fresh-start,
    and oversized-document transitions across ~122 block boundaries.

    Differential: the blocked result must equal pack_greedy (the
    sequential kernel, itself recursive-CTE-oracled at the fixtures) on
    every row — compared via a join on (source, doc_id) asserting
    bin_id equality, plus two independent invariants: no bin exceeds
    the budget unless it is a single oversized doc, and per-source bin
    ids are dense 0..max."""
    import time

    from etl_pipeline_with_alpha_vantage_spark.operators.packing import (
        TOKEN_BUDGET,
        pack_greedy,
        pack_greedy_blocked,
    )

    N_DOCS, SOURCES = 600_000, 1_000
    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.when(F.pmod(F.xxhash64("id", F.lit(3)), F.lit(2)) == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(SOURCES)))
        .cast("long")
        .alias("source"),
        F.when(
            F.pmod(F.xxhash64("id", F.lit(5)), F.lit(100)) == 0,
            F.lit(TOKEN_BUDGET) + F.pmod(F.xxhash64("id", F.lit(6)), F.lit(200)) + 1,
        )
        .otherwise(F.pmod(F.xxhash64("id", F.lit(7)), F.lit(300)) + 1)
        .cast("long")
        .alias("est_tokens"),
    )
    mega = docs.groupBy("source").count().agg(F.max("count")).collect()[0][0]
    assert mega > 250_000  # the skew is real

    t0 = time.perf_counter()
    blocked = pack_greedy_blocked(
        docs, ["source"], "doc_id", "est_tokens", block_span=8192
    ).persist()
    seq = pack_greedy(docs, ["source"], "doc_id", "est_tokens")
    diff = (
        blocked.alias("b")
        .join(seq.alias("s"), ["source", "doc_id"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("b.bin_id") != F.col("s.bin_id")).cast("long")
            ).alias("mismatches"),
        )
        .collect()[0]
    )
    elapsed = time.perf_counter() - t0
    assert diff.n == N_DOCS
    assert diff.mismatches == 0
    assert elapsed < 300, f"blocked-vs-seq at {N_DOCS} took {elapsed:.0f}s"

    # independent invariants on the blocked output alone
    bins = blocked.groupBy("source", "bin_id").agg(
        F.sum("est_tokens").alias("fill"), F.count(F.lit(1)).alias("n_docs")
    )
    bad = bins.filter(
        (F.col("fill") > TOKEN_BUDGET) & (F.col("n_docs") > 1)
    ).count()
    assert bad == 0  # only single oversized docs may exceed the budget
    dense = bins.groupBy("source").agg(
        (F.max("bin_id") + 1 == F.count(F.lit(1))).alias("ok")
    )
    assert dense.filter(~F.col("ok")).count() == 0
    blocked.unpersist()


def test_symdel_match_closed_form_at_volume(spark):
    """The SymSpell entity-resolution kernel (fuzzy_join_symdel's actual
    symdel_match) proven exact AND volume-bounded at ~600k dirty rows
    against a 20k-name vocabulary, via a vocabulary built so every
    invariant is closed-form:

    - clean names are 4-digit base-12 codes with each digit TRIPLED and
      adjacent digit positions drawn from disjoint alphabets — any two
      distinct names are at levenshtein >= 3 (one differing digit costs
      3 substitutions; disjoint alphabets stop runs merging), so a
      one-deletion corruption of name i can never sit within edit 2 of
      name j != i;
    - every dirty row therefore matches EXACTLY its source name at
      edit_dist exactly 1 (lengths differ, so never 0) — result rows ==
      n_dirty, each joined back to its arithmetically-known source;
    - the block join's PRE-dedup volume is exactly 3 * n_dirty: the
      only shared key between a dirty row and its source is the dirty
      string itself, which appears once on the dirty side (the self
      entry) and exactly 3 times in del1(clean) (deleting any char of
      the corrupted run yields it) — the O(n*L) candidate-volume claim
      as an equality, the LSH-sigma-bucket-squared discipline applied
      to SymSpell blocking.
    """
    import time

    from etl_pipeline_with_alpha_vantage_spark.operators.dedup import (
        symdel_match,
    )

    DIGITS, BASE, R = 4, 12, 30
    N_CLEAN = BASE ** DIGITS  # 20736
    N_DIRTY = N_CLEAN * R     # 622080
    alpha_even = [chr(ord("a") + i) for i in range(BASE)]
    alpha_odd = [chr(ord("n") + i) for i in range(BASE)]

    def code_col(idcol):
        parts = []
        for d in range(DIGITS):
            digit = (idcol / (BASE ** d)).cast("long") % BASE
            al = alpha_even if d % 2 == 0 else alpha_odd
            ch = F.element_at(F.lit(al), (digit + 1).cast("int"))
            parts += [ch, ch, ch]
        return F.concat(*parts)

    clean = spark.range(N_CLEAN).select(
        F.col("id").alias("clean_id"), code_col(F.col("id")).alias("clean_name")
    )
    L = 3 * DIGITS
    dirty = spark.range(N_DIRTY).select(
        F.col("id").alias("dirty_key"),
        (F.col("id") % N_CLEAN).alias("src_id"),
        (F.pmod(F.xxhash64("id"), F.lit(L)) + 1).alias("delpos"),
    ).select(
        "dirty_key",
        "src_id",
        F.concat(
            F.substring(code_col(F.col("src_id")), F.lit(1), F.col("delpos") - 1),
            F.substring(code_col(F.col("src_id")), F.col("delpos") + 1, F.lit(1000)),
        ).alias("dirty_name"),
    )

    # candidate-volume equality, measured ON the executed kernel via an
    # Observation on its raw block-join stage (round 11: a separately
    # built twin of the frame can't prove what the kernel's own plan
    # materializes): pre-dedup block join == 3 * n_dirty.
    from pyspark.sql import Observation

    obs = Observation()
    t0 = time.perf_counter()
    got = symdel_match(
        dirty.select("dirty_key", "dirty_name"),
        clean.select("clean_name"),
        candidate_observation=obs,
    )
    # every dirty row resolves to exactly its source, at distance exactly 1
    check = got.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("edit_dist") != 1).cast("long")).alias("bad_dist"),
    ).collect()[0]
    elapsed = time.perf_counter() - t0
    assert obs.get["candidates"] == 3 * N_DIRTY, obs.get
    assert check.n == N_DIRTY
    assert check.bad_dist == 0
    # correct source: the matched clean_name equals the source's name
    wrong = (
        got.join(dirty.select("dirty_key", "src_id"), "dirty_key")
        .join(
            clean.select(
                F.col("clean_id").alias("src_id"),
                F.col("clean_name").alias("src_name"),
            ),
            "src_id",
        )
        .filter(F.col("clean_name") != F.col("src_name"))
        .count()
    )
    assert wrong == 0
    assert elapsed < 240, f"symdel at {N_DIRTY} rows took {elapsed:.0f}s"


def test_fellegi_sunter_closed_form_at_volume(spark):
    """The blocked Fellegi–Sunter kernel (linkage_fellegi_sunter's
    actual fs_link) proven exact AND volume-bounded at 1M records over
    62 500 (nation, band) blocks of exactly 16 records a side:

    - block-join volume == blocks · 16² == 16M EXACTLY (the Σ block²
      scale claim as an equality, not an upper bound);
    - names within a block are tripled base-4 codes (levenshtein >= 3
      apart), each dirty name one deletion of its source, every block
      member shares the same acctbal — so the self-pair scores
      24+12+seg strictly above any rival's -8+12+4, and every record
      must resolve to ITSELF;
    - decisions are closed-form: id % 7 == 0 records lose their segment
      (24+12-3 = 33 → 'possible'), everyone else scores 40 → 'match' —
      counts checked against independent arithmetic filters.
    """
    import time

    from etl_pipeline_with_alpha_vantage_spark.operators.linkage import (
        fs_link,
    )

    N, NATIONS, BANDS = 1_000_000, 250, 250
    BLOCKS = NATIONS * BANDS
    PER_BLOCK = N // BLOCKS  # 16, exact
    assert N % BLOCKS == 0
    alpha_even = ["a", "b", "c", "d"]
    alpha_odd = ["n", "o", "p", "q"]

    def code_col(idcol):
        # 2 base-4 digits of (id // BLOCKS), tripled, disjoint alphabets
        parts = []
        for d in range(2):
            digit = (idcol / (BLOCKS * (4 ** d))).cast("long") % 4
            al = alpha_even if d % 2 == 0 else alpha_odd
            ch = F.element_at(F.lit(al), (digit + 1).cast("int"))
            parts += [ch, ch, ch]
        return F.concat(*parts)

    ids = spark.range(N)
    nation = F.col("id") % NATIONS
    band_idx = (F.col("id") / NATIONS).cast("long") % BANDS
    seg = F.concat(F.lit("SEG"), (F.col("id") % 5).cast("string"))
    clean = ids.select(
        F.col("id").alias("c_custkey"),
        code_col(F.col("id")).alias("c_name"),
        nation.alias("c_nationkey"),
        (band_idx * 1000 + 500).cast("double").alias("c_acctbal"),
        seg.alias("c_mktsegment"),
        band_idx.alias("band"),
    )
    delpos = F.pmod(F.xxhash64("id"), F.lit(6)) + 1
    dirty = ids.select(
        F.col("id").alias("dirty_key"),
        F.concat(
            F.substring(code_col(F.col("id")), F.lit(1), delpos - 1),
            F.substring(code_col(F.col("id")), delpos + 1, F.lit(100)),
        ).alias("d_name"),
        nation.alias("d_nation"),
        (band_idx * 1000 + 500).cast("double").alias("d_bal"),
        F.when(F.col("id") % 7 == 0, F.lit("NONE")).otherwise(seg).alias(
            "d_seg"
        ),
        band_idx.alias("d_band"),
    )

    t0 = time.perf_counter()
    join_volume = dirty.join(
        clean,
        (F.col("c_nationkey") == F.col("d_nation"))
        & (F.col("band") == F.col("d_band")),
    ).count()
    assert join_volume == BLOCKS * PER_BLOCK * PER_BLOCK, join_volume

    got = fs_link(dirty, clean)
    agg = got.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("matched_key") != F.col("dirty_key")).cast("long")).alias(
            "wrong"
        ),
        F.sum((F.col("decision") == "match").cast("long")).alias("matches"),
        F.sum((F.col("decision") == "possible").cast("long")).alias(
            "possibles"
        ),
    ).collect()[0]
    elapsed = time.perf_counter() - t0
    exp_possible = ids.filter(F.col("id") % 7 == 0).count()
    assert agg.n == N
    assert agg.wrong == 0  # every record resolves to itself
    assert agg.possibles == exp_possible
    assert agg.matches == N - exp_possible
    assert elapsed < 240, f"F-S at {N} rows took {elapsed:.0f}s"


def test_grouped_scale_salted_skew_exact_and_bounded_at_volume(spark):
    """The udf_grouped_scale mega-group escape hatch: one group 40×
    larger than the rest must (a) produce bit-identical output to the
    relational window formulation, and (b) never hand any Python
    callback more than ceil(group/n_salt)+1 rows — the contract that
    makes the salted plan safe when a grouped key is skewed.
    """
    from etl_pipeline_with_alpha_vantage_spark.operators.udf import (
        _SCALE_SALT,
        grouped_minmax_scale_salted,
    )

    n = 220_000
    # event_ids are 0..n-1; ~95% of rows land in the mega group, the
    # rest spread over 9 small groups — a worst-case key skew.
    ev = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.when(F.pmod(F.col("id"), F.lit(20)) < 19, F.lit("mega"))
        .otherwise(
            F.concat(F.lit("t"), F.pmod(F.col("id"), F.lit(9)).cast("string"))
        )
        .alias("event_type"),
        (F.pmod(F.xxhash64("id"), F.lit(10_000)) / 100.0).alias("value"),
    )

    got = grouped_minmax_scale_salted(ev)

    w = Window.partitionBy("event_type")
    want = ev.select(
        "event_id",
        "event_type",
        "value",
        F.when(
            F.max("value").over(w) == F.min("value").over(w), F.lit(0.5)
        )
        .otherwise(
            (F.col("value") - F.min("value").over(w))
            / (F.max("value").over(w) - F.min("value").over(w))
        )
        .alias("scaled"),
    )
    # Bit-exact: the anti-join in BOTH directions is empty.
    assert got.exceptAll(want).isEmpty()
    assert want.exceptAll(got).isEmpty()

    # Callback bound: each phase-2 callback receives exactly one
    # (event_type, salt) partition. The hash salt splits even this
    # patterned id assignment near-uniformly (a modulo salt would NOT:
    # id%20 group membership and id%8 share factor 4 — the original
    # formulation collapsed salt classes and this assertion caught it).
    sizes = (
        ev.withColumn(
            "salt",
            F.pmod(F.xxhash64("event_id"), F.lit(_SCALE_SALT)).cast("long"),
        )
        .groupBy("event_type", "salt")
        .count()
    )
    biggest_group = (
        ev.groupBy("event_type").count().agg(F.max("count")).collect()[0][0]
    )
    max_callback = sizes.agg(F.max("count")).collect()[0][0]
    ideal = biggest_group // _SCALE_SALT
    assert max_callback <= ideal + ideal // 20 + 1  # within 5% of ideal
    # And the split is a real split: no callback saw a whole group.
    assert max_callback < biggest_group


def test_ra_linkpred_closed_form_at_volume(spark):
    """RA link prediction on a 1M-edge bipartite graph with controlled
    part degrees: wedge volume and the total score mass have closed
    forms — wedges == Σ C(d,2) and Σ ra_micro == Σ C(d,2)·round(1e6/d)
    over kept degrees — so both the hub cap's economics and the exact
    integer scoring are verified at volume, not asserted.
    """
    from etl_pipeline_with_alpha_vantage_spark.operators.graph import (
        ra_scored_pairs,
    )

    # Part p gets degree (p % 97) + 1: suppliers p*1000 .. p*1000+d-1
    # (distinct per part, so every (supp, part) row is unique).
    n_parts = 12_000
    sp = (
        spark.range(n_parts)
        .select(
            F.col("id").alias("part"),
            F.explode(
                F.sequence(F.lit(0), F.pmod(F.col("id"), F.lit(97)))
            ).alias("k"),
        )
        .select((F.col("part") * 1000 + F.col("k")).alias("supp"), "part")
    )
    cap = 50
    scored = ra_scored_pairs(sp, hub_cap=cap)
    got_pairs, got_mass, got_wedges = (
        scored.agg(
            F.count(F.lit(1)),
            F.sum("ra_micro"),
            F.sum("n_common"),
        ).collect()[0]
    )

    def c2(d):
        return d * (d - 1) // 2

    # Degrees are (p % 97) + 1 over 12000 parts; each residue r in 0..96
    # appears at least 12000 // 97 times (+1 for r < 12000 % 97).
    reps = {r: n_parts // 97 + (1 if r < n_parts % 97 else 0) for r in range(97)}
    kept = {r: d for r, d in ((r, r + 1) for r in reps) if 2 <= d <= cap}
    want_wedges = sum(reps[r] * c2(d) for r, d in kept.items())
    want_mass = sum(
        reps[r] * c2(d) * round(1_000_000 / d) for r, d in kept.items()
    )
    assert got_wedges == want_wedges
    assert got_mass == want_mass
    # Suppliers are disjoint across parts, so every wedge is a distinct
    # pair: pair count == wedge count (no pair aggregates two parts).
    assert got_pairs == want_wedges


def test_phrase_match_overlapping_closed_form_at_volume(spark):
    """Phrase counting at 400k docs with a same-term phrase ("a a") —
    the overlap case replace()-counting gets wrong. Doc i holds
    (i % 7) + 2 copies of token 'a' (plus noise), so occurrences per
    doc are (i % 7) + 1 exactly and the corpus total is closed-form.
    """
    from etl_pipeline_with_alpha_vantage_spark.operators.search import (
        phrase_occurrences,
    )

    n = 400_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("x y "),
            F.array_join(
                F.array_repeat(
                    F.lit("a"), (F.pmod(F.col("id"), F.lit(7)) + 2).cast("int")
                ),
                " ",
            ),
            F.lit(" z"),
        ).alias("text"),
    )
    got = phrase_occurrences(docs, "a", "a")
    total, ndocs = got.agg(F.sum("n_occurrences"), F.count(F.lit(1))).collect()[0]
    reps = {r: n // 7 + (1 if r < n % 7 else 0) for r in range(7)}
    assert ndocs == n  # every doc has >= 2 a's, so >= 1 occurrence
    assert total == sum(cnt * (r + 1) for r, cnt in reps.items())


def test_decision_stump_separable_closed_form_at_volume(spark):
    """Stump training at 5M rows on a perfectly separable synthetic
    (y = [feature <= 30], feature uniform-ish over 1..100): the kernel
    must return split 30 with gini_micro == 0 and the exact class
    counts — an end-to-end integer identity for the histogram + prefix
    sum + argmin pipeline at volume.
    """
    from etl_pipeline_with_alpha_vantage_spark.operators.ml import (
        stump_best_split,
    )

    n = 5_000_000
    ex = spark.range(n).select(
        (F.pmod(F.xxhash64("id"), F.lit(100)) + 1).alias("q"),
    ).withColumn("y", F.when(F.col("q") <= 30, 1).otherwise(0))
    row = stump_best_split(ex).collect()[0]
    assert row["split_q"] == 30
    assert row["gini_micro"] == 0
    assert row["pos_left"] == row["n_left"]  # pure left side
    assert row["pos_right"] == 0             # pure right side
    assert row["n_left"] + row["n_right"] == n


def test_pca_gram_and_power_closed_form_at_volume(spark):
    """PCA at 1M one-hot vectors: the integer Gram must be EXACTLY
    diagonal with diag == count·micro(value²) (closed form), and the
    power sweeps must match an independent numpy replay of the exact
    integer recurrence micro-for-micro, with the known dominant
    dimension winning.
    """
    import math

    from etl_pipeline_with_alpha_vantage_spark.operators.similarity import (
        _PCA_D,
        _PCA_ITERS,
        pca_gram_from,
        pca_power_sweeps,
    )

    n = 1_000_000
    # One-hot on dim (id % 64); dim 7 carries value 2.0 (others 1.0), so
    # G is diagonal with G[7,7] = 4e6·count_7 dominating.
    emb = spark.range(n).select(
        F.expr(
            f"""transform(sequence(0, {_PCA_D - 1}), j ->
                CASE WHEN j = CAST(id % {_PCA_D} AS INT)
                     THEN CASE WHEN id % {_PCA_D} = 7
                               THEN CAST(2.0 AS DOUBLE)
                               ELSE CAST(1.0 AS DOUBLE) END
                     ELSE CAST(0.0 AS DOUBLE) END)"""
        ).alias("embedding")
    )
    cells = pca_gram_from(emb)
    grid = {(r["gi"], r["gj"]): r["g"] for r in cells.collect()}
    counts = {
        k: n // _PCA_D + (1 if k < n % _PCA_D else 0) for k in range(_PCA_D)
    }
    for i in range(_PCA_D):
        for j in range(_PCA_D):
            want = 0
            if i == j:
                want = counts[i] * (4_000_000 if i == 7 else 1_000_000)
            assert grid[(i, j)] == want, (i, j, grid[(i, j)], want)

    got = {
        r["component"]: r["loading_micro"]
        for r in pca_power_sweeps(spark, cells)
        .selectExpr(
            "idx AS component",
            "CAST(floor(v * 1000000 + 0.5) AS BIGINT) AS loading_micro",
        )
        .collect()
    }

    def half_away(x):
        t = math.trunc(x)
        frac = x - t
        if abs(frac) >= 0.5:
            return t + math.copysign(1.0, x)
        return float(t)

    v = [1.0 / math.sqrt(_PCA_D)] * _PCA_D
    for _ in range(_PCA_ITERS):
        u = [half_away(grid[(i, i)] * v[i]) for i in range(_PCA_D)]
        dd = [ui / 1e6 for ui in u]
        n2 = sum(int(half_away(x * x * 1e6)) for x in dd)
        v = [x / math.sqrt(n2 / 1e6) for x in dd]
    want_load = {i: int(math.floor(v[i] * 1e6 + 0.5)) for i in range(_PCA_D)}
    assert got == want_load
    assert max(got, key=got.get) == 7


def test_ols_exact_recovery_at_volume(spark):
    """OLS at 5M rows on a noiseless plane yc = 700 + 300·q − 2·dc:
    the normal-equation solve must return the generating coefficients
    EXACTLY in micro units (7.0, 3.0, −2.0 natural)."""
    from etl_pipeline_with_alpha_vantage_spark.operators.ml import ols_fit

    n = 5_000_000
    ex = spark.range(n).select(
        (F.col("id") % 50 + 1).cast("long").alias("q"),
        (F.col("id") % 11).cast("long").alias("dc"),
    ).withColumn(
        "yc", (F.lit(700) + 300 * F.col("q") - 2 * F.col("dc")).cast("long")
    )
    row = ols_fit(ex).collect()[0]
    assert row["n"] == n
    assert row["beta0_micro"] == 7_000_000
    assert row["beta1_micro"] == 3_000_000
    assert row["beta2_micro"] == -2_000_000


def test_anova_closed_form_at_volume(spark):
    """ANOVA at ~5M rows on a balanced synthetic with analytically
    known sums of squares: 5 groups with means (g·10 + 0.5) and an
    identical within-group residual multiset {−0.5, 0, +0.5} per
    group, so SS_between == n·2e6 cents² / SS_within == n·5000/3
    cents² exactly, and F follows in closed form."""
    from etl_pipeline_with_alpha_vantage_spark.operators.stats import (
        anova_oneway,
    )

    n = 4_999_995  # divisible by 15: every (group, residual) cell equal
    ev = spark.range(n).select(
        F.concat(F.lit("g"), (F.col("id") % 5).cast("string")).alias(
            "event_type"
        ),
        (
            (F.col("id") % 5) * 10.0
            + ((F.col("id") / 5).cast("long") % 3) * 0.5
        ).alias("value"),
    )
    row = anova_oneway(ev).collect()[0]
    assert row["n_total"] == n
    assert row["k_groups"] == 5
    ssb_c2 = n * 2_000_000
    ssw_c2 = n * 5000 // 3
    assert row["ss_between"] == ssb_c2 / 10000.0
    assert row["ss_within"] == ssw_c2 / 10000.0
    import math

    f = (ssb_c2 / 4) / (ssw_c2 / (n - 5))
    assert row["f_micro"] == int(math.floor(f * 1e6 + 0.5))


def test_jaccard_block_design_closed_form_at_volume(spark):
    """Jaccard link prediction at ~1M edges on a block design: every
    within-block supplier pair shares exactly the block's g common
    parts plus two private parts, so J == g/(g+2) for EVERY pair,
    cross-block pairs are impossible, and pair volume == B·C(m,2) —
    intersections, unions, and the lossless degree-1 prune all have
    closed forms.
    """
    from etl_pipeline_with_alpha_vantage_spark.operators.graph import (
        jaccard_scored_pairs,
    )

    blocks, m, g = 5_000, 20, 6
    # Block b: suppliers b*m..b*m+m-1, shared parts b*g..b*g+g-1 (ids
    # offset by 10^9 to stay disjoint from private parts), plus one
    # private part per supplier.
    sup = spark.range(blocks * m).select(
        F.col("id").alias("supp"), (F.col("id") / m).cast("long").alias("b")
    )
    shared = sup.select(
        "supp",
        F.explode(
            F.sequence(F.col("b") * g, F.col("b") * g + (g - 1))
        ).alias("part"),
    ).select("supp", (F.col("part") + 1_000_000_000).alias("part"))
    private = sup.select("supp", F.col("supp").alias("part"))
    sp = shared.unionAll(private)

    scored = jaccard_scored_pairs(sp)
    n_pairs, n_distinct_j, jmin, jmax, ncmin, ncmax = scored.agg(
        F.count(F.lit(1)),
        F.countDistinct("jaccard_micro"),
        F.min("jaccard_micro"),
        F.max("jaccard_micro"),
        F.min("n_common"),
        F.max("n_common"),
    ).collect()[0]
    assert n_pairs == blocks * m * (m - 1) // 2
    assert n_distinct_j == 1
    assert jmin == jmax == round(1_000_000 * g / (g + 2))
    assert ncmin == ncmax == g


def test_capm_identical_series_closed_form_at_volume(spark):
    """CAPM at 2M events where every type carries the IDENTICAL bar
    series: the market aggregate equals each series, so beta == 1 and
    alpha == 0 exactly for all types — the regression identity that
    only holds if every moment, guard, and division is exact.
    """
    from etl_pipeline_with_alpha_vantage_spark.operators.quant import (
        capm_beta,
    )

    n = 2_000_000
    ev = spark.range(n).select(
        F.concat(F.lit("t"), (F.col("id") % 5).cast("string")).alias(
            "event_type"
        ),
        F.timestamp_micros(
            F.lit(BASE_US) + (F.col("id") / 5).cast("long") * 2_000_000
        ).alias("ts"),
        # same value pattern for every type: varies by bar, not by type
        (
            100.0
            + (F.pmod((F.col("id") / 5).cast("long"), F.lit(97))).cast(
                "double"
            )
        ).alias("value"),
    )
    rows = capm_beta(ev).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["beta_micro"] == 1_000_000, r
        assert r["alpha_micro"] == 0, r


def test_hampel_spikes_closed_form_at_volume(spark):
    """Hampel at 2M events: constant series with an isolated spike every
    50th event — each 11-window holds at most one spike, so the median
    is the constant, the MAD is identically zero, and the outlier flags
    are EXACTLY the spike positions past warm-up.
    """
    from etl_pipeline_with_alpha_vantage_spark.operators.timeseries import (
        _HAMPEL_K,
        hampel_flags,
    )

    n, users = 2_000_000, 1_000
    per_user = n // users
    ev = spark.range(n).select(
        (F.col("id") % users).alias("user_id"),
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(BASE_US) + (F.col("id") / users).cast("long") * 1_000_000
        ).alias("ts"),
        F.when((F.col("id") / users).cast("long") % 50 == 17, 99.0)
        .otherwise(50.0)
        .alias("value"),
    )
    got = hampel_flags(ev)
    tot, n_out, med_lo, med_hi, mad_hi = got.agg(
        F.count(F.lit(1)),
        F.sum("is_outlier"),
        F.min("rolling_med"),
        F.max("rolling_med"),
        F.max("rolling_mad"),
    ).collect()[0]
    assert tot == users * (per_user - (_HAMPEL_K - 1))
    # spike positions are seq % 50 == 17; count those with a full window
    spikes_emitted = sum(
        1
        for s in range(_HAMPEL_K - 1, per_user)
        if s % 50 == 17
    ) * users
    assert n_out == spikes_emitted
    assert med_lo == med_hi == 50.0
    assert mad_hi == 0.0


def test_neyman_allocation_closed_form_at_volume(spark):
    """Neyman sampling at 1.5M rows with DESIGNED per-stratum variances
    (balanced ±h around a common mean → σ_h == h exactly): equal-size
    strata make w_h ∝ h, so the largest-remainder allocation of a
    1000-row budget over h ∈ {{1..5}} is exactly (67, 133, 200, 267,
    333) — allocation math, integerization, and the md5-rank pick all
    verified at volume.
    """
    from etl_pipeline_with_alpha_vantage_spark.operators.curation import (
        neyman_sample,
    )

    per = 300_000  # even: the ± pattern balances exactly
    ev = spark.range(5 * per).select(
        F.col("id").alias("event_id"),
        F.concat(F.lit("s"), (F.col("id") % 5).cast("string")).alias(
            "event_type"
        ),
        (
            100.0
            + ((F.col("id") % 5) + 1).cast("double")
            * F.when((F.col("id") / 5).cast("long") % 2 == 0, 1.0).otherwise(
                -1.0
            )
        ).alias("value"),
    )
    got = {
        r["event_type"]: r["count"]
        for r in neyman_sample(ev, budget=1000)
        .groupBy("event_type")
        .count()
        .collect()
    }
    # w_h ∝ h: shares 1000·h/15 → floors (66,133,200,266,333), rem 2
    # goes to the two largest fractions (.667 at h=1 and h=4).
    assert got == {"s0": 67, "s1": 133, "s2": 200, "s3": 267, "s4": 333}


def test_holt_linear_series_zero_error_at_volume(spark):
    """Holt at 1M (series, day) points on perfectly linear series
    x_t = a + c·t: the 2-point init captures the trend exactly and the
    integer floor updates preserve it, so EVERY forecast is exact
    (holt_abs_err == 0) while the persistence baseline pays the slope
    c·1000 per step — the invariant that separates a real trend state
    from a lagging smoother, held across 1000 series at volume.
    """
    from etl_pipeline_with_alpha_vantage_spark.operators.timeseries import (
        holt_backtest,
    )

    series, days = 1_000, 1_000
    sid = F.col("id") % series
    day = (F.col("id") / series).cast("long")
    daily = spark.range(series * days).select(
        F.concat(F.lit("s"), sid.cast("string")).alias("event_type"),
        day.alias("epoch_day"),
        (10 + sid + (sid % 7 + 1) * day).cast("long").alias("x"),
    )
    got = holt_backtest(daily)
    n_series, err_hi, beats = got.agg(
        F.count(F.lit(1)),
        F.max("holt_abs_err_milli"),
        F.min(F.col("holt_beats_naive").cast("int")),
    ).collect()[0]
    assert n_series == series
    assert err_hi == 0
    assert beats == 1  # persistence pays c*1000*(days-2) > 0 everywhere


def test_cep_pattern_closed_form_at_volume(spark):
    """CEP regex matching at 2M events: every user's stream is 500
    repetitions of the block view→click→purchase→signup, so 'vc*p'
    matches exactly once per block — per-user counts and the corpus
    total are closed-form, and the signup separator proves the
    contiguity constraint (a between-anything funnel would count
    cross-block phantom conversions).
    """
    from etl_pipeline_with_alpha_vantage_spark.operators.relational_ext import (
        cep_conversions,
    )

    users, blocks = 1_000, 500
    per_user = blocks * 4
    n = users * per_user
    seq = (F.col("id") / users).cast("long")
    ev = spark.range(n).select(
        (F.col("id") % users).alias("user_id"),
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(BASE_US) + seq * 1_000_000
        ).alias("ts"),
        F.element_at(
            F.array(
                F.lit("view"), F.lit("click"),
                F.lit("purchase"), F.lit("signup"),
            ),
            (F.pmod(seq, F.lit(4)) + 1).cast("int"),
        ).alias("event_type"),
    )
    got = cep_conversions(ev)
    n_users, m_lo, m_hi, ev_lo = got.agg(
        F.count(F.lit(1)),
        F.min("n_matches"),
        F.max("n_matches"),
        F.min("n_events"),
    ).collect()[0]
    assert n_users == users
    assert m_lo == m_hi == blocks
    assert ev_lo == per_user


def test_kruskal_wallis_block_design_replay_at_volume(spark):
    """KW at 2M rows on a fully separated block design (every row of
    group g carries value g): doubled average ranks and the tie term
    are closed-form (massive within-group ties, zero cross-group
    ties), and h_micro matches a double-for-double python replay of
    the kernel's exact micro-pinned expression.
    """
    import math

    from etl_pipeline_with_alpha_vantage_spark.operators.stats import (
        kruskal_wallis,
    )

    k, per = 5, 400_000
    n = k * per
    base = spark.range(n).select(
        F.concat(F.lit("g"), (F.col("id") % k).cast("string")).alias("grp"),
        (F.col("id") % k).cast("long").alias("cents"),
    )
    row = kruskal_wallis(base).collect()[0]
    assert row["n_total"] == n
    assert row["k_groups"] == k
    assert row["tie"] == k * (per**3 - per)

    # python replay with the kernel's exact arithmetic; rounding must be
    # half-away-from-zero (engine round()), NOT python's banker's round
    def half_away(x):
        t = math.trunc(x)
        frac = x - t
        return t + (1 if frac >= 0.5 else (-1 if frac <= -0.5 else 0))

    hterm_sum = 0
    for g in range(k):
        rank2 = 2 * (g * per) + per + 1   # doubled average rank of value g
        r2_g = per * rank2                # Σ doubled ranks in group g
        hterm_sum += half_away(
            12.0 * (float(r2_g) / per) * r2_g / (4.0 * n * (n + 1.0))
            * 1_000_000
        )
    h = (hterm_sum / 1_000_000.0 - 3.0 * (n + 1)) / (
        1.0 - float(row["tie"]) / (float(n) * n * n - n)
    )
    assert row["h_micro"] == half_away(h * 1_000_000)


def test_welch_heteroscedastic_closed_form_at_volume(spark):
    """Welch's ANOVA at 4.8M rows on a DESIGNED heteroscedastic
    balanced layout: group g has mean (g+1)·10 dollars and residual
    multiset {+h, −h, 0} with h = (g+1)·3 cents, so the per-group
    moments are closed-form (s = n·M_g, ss_c2 = 2n·h_g²/3 exactly) and
    f_micro/df2 match a double-for-double moment-level replay of the
    kernel's pinned expressions."""
    import math

    from etl_pipeline_with_alpha_vantage_spark.operators.stats import (
        welch_anova,
    )

    k, per = 4, 1_200_000  # per divisible by 3: residuals balance
    resid_sign = (
        F.when((F.col("id") / k).cast("long") % 3 == 0, 1.0)
        .when((F.col("id") / k).cast("long") % 3 == 1, -1.0)
        .otherwise(0.0)
    )
    g = (F.col("id") % k).cast("long")
    ev = spark.range(k * per).select(
        F.concat(F.lit("g"), g.cast("string")).alias("event_type"),
        (((g + 1) * 1000 + (g + 1) * 3 * resid_sign) / 100.0).alias(
            "value"
        ),
    )
    row = welch_anova(ev).collect()[0]
    assert row["n_total"] == k * per and row["k_groups"] == k

    def half_away(x):
        t = math.trunc(x)
        return t + (1 if x - t >= 0.5 else (-1 if x - t <= -0.5 else 0))

    # closed-form moments: (n, Σcents, ss_c2) per group
    st = {}
    for gi in range(k):
        m, h = (gi + 1) * 1000, (gi + 1) * 3
        st[gi] = (per, per * m, 2 * per * h * h // 3)
    w_raw = {
        gi: float(n) * (n - 1) / float(ss) for gi, (n, s, ss) in st.items()
    }
    wmax = max(w_raw.values())
    s_pin = {
        gi: half_away(1_000_000_000_000.0 * w / wmax)
        for gi, w in w_raw.items()
    }
    ssum = sum(s_pin.values())
    wmsum = sum(
        half_away(float(s_pin[gi]) * s / n)
        for gi, (n, s, _) in st.items()
    )
    asum = usum = 0
    for gi, (n, s, _) in st.items():
        dm = float(s) / n - float(wmsum) / ssum
        asum += half_away(float(s_pin[gi]) * dm * dm / 1_000_000.0)
        t = 1.0 - float(s_pin[gi]) / ssum
        usum += half_away(1_000_000_000_000.0 * t * t / (n - 1))
    f = half_away(
        wmax * float(asum) / 1_000_000.0 / (k - 1)
        / (1.0 + 2.0 * (k - 2) * (float(usum) / 1_000_000_000_000.0)
           / (float(k) * k - 1))
        * 1_000_000
    )
    df2 = (float(k) * k - 1) / (3.0 * (float(usum) / 1_000_000_000_000.0))
    assert row["f_micro"] == f
    assert row["df2"] == df2


def test_dunn_block_design_replay_at_volume(spark):
    """Dunn post-hoc at 2M rows on the KW smoke's fully separated block
    design: per-group doubled rank sums and the tie term are closed
    form, and every pairwise z matches a double-for-double replay of
    the kernel's pinned expression."""
    import math

    from etl_pipeline_with_alpha_vantage_spark.operators.stats import (
        dunn_test,
    )

    k, per = 5, 400_000
    n = k * per
    base = spark.range(n).select(
        F.concat(F.lit("g"), (F.col("id") % k).cast("string")).alias("grp"),
        (F.col("id") % k).cast("long").alias("cents"),
    )
    out = {
        (r["grp_a"], r["grp_b"]): r
        for r in dunn_test(base).collect()
    }
    assert len(out) == k * (k - 1) // 2
    tie = k * (per**3 - per)
    sig_base = float(n) * (n + 1.0) / 12.0 - float(tie) / (12.0 * (n - 1.0))
    for ga in range(k):
        for gb in range(ga + 1, k):
            r = out[(f"g{ga}", f"g{gb}")]
            r2 = lambda g: per * (2 * (g * per) + per + 1)
            diff = r2(ga) / (2.0 * per) - r2(gb) / (2.0 * per)
            z = diff / math.sqrt(sig_base * (1.0 / per + 1.0 / per))
            assert r["n_a"] == per and r["n_b"] == per
            assert r["z_micro"] == int(
                math.floor(z * 1_000_000 + 0.5)
                if z >= 0
                else -math.floor(-z * 1_000_000 + 0.5)
            ), (r, z)


def test_spearman_monotone_exact_at_volume(spark, tmp_path_factory):
    """Spearman at 2M rows: a strictly monotone pair must give rho
    EXACTLY 1e6 (the closed-form pole survives the wide-integer sums
    at volume: Σrank2² ≈ 4N³/3 ≈ 1.1e19 wraps int64 — the
    DECIMAL(38,0) path is what this exercises)."""
    from etl_pipeline_with_alpha_vantage_spark.operators.stats import (
        stats_spearman_rank,
    )

    n = 2_000_000
    d = tmp_path_factory.mktemp("spearman_vol")
    spark.range(n).select(
        (F.col("id") + 1).alias("l_quantity"),
        ((F.col("id") + 1) * 3 / 100.0).alias("l_extendedprice"),
    ).write.parquet(str(d / "lineitem.parquet"))
    r = stats_spearman_rank(spark, str(d)).collect()[0]
    assert r["n"] == n
    assert r["distinct_x"] == n and r["distinct_y"] == n
    # int64 would have wrapped: sum of rank2^2 over distinct ranks
    assert sum_rank2_sq_lower_bound(n) > 2**63
    assert r["rho_micro"] == 1_000_000


def sum_rank2_sq_lower_bound(n):
    # Σ (2i-1)² for i=1..n = n(2n-1)(2n+1)/3 — the no-ties Σrank2²
    return n * (2 * n - 1) * (2 * n + 1) // 3
