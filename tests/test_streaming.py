"""Structured Streaming equivalence tests (SURVEY.md X18-X19, §5.2):
the streamed result must equal its batch twin on the same data.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_pipeline_with_alpha_vantage_spark.registry import QUERIES, load_all
from etl_pipeline_with_alpha_vantage_spark.streaming.runner import (
    dedup_hourly_counts,
    read_events_stream,
    run_available_now,
)

load_all()


def test_stream_equals_batch(spark, sf_dir, tmp_path):
    stream = read_events_stream(spark, sf_dir)
    assert stream.isStreaming
    transformed = dedup_hourly_counts(stream)
    run_available_now(transformed, "stream_out", checkpoint_dir=str(tmp_path))

    streamed = {
        (r.event_type, r.window_start, r.n_events)
        for r in spark.table("stream_out").collect()
    }
    batch = {
        (r.event_type, r.window_start, r.n_events)
        for r in QUERIES["stream_dedup_window"](spark, sf_dir).collect()
    }
    assert streamed == batch
    assert len(streamed) > 0


def test_available_now_incremental_dedup(spark, sf_dir, tmp_path):
    """A re-delivered (duplicate) file in a later availableNow run must
    not change the counts: the file-source checkpoint + event-id dedup
    state give exactly-once across runs — the streaming version of the
    reference's file-cache + INSERT IGNORE idempotency."""
    import shutil

    indir = tmp_path / "in"
    indir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", indir / "events.parquet")

    stream = read_events_stream(spark, str(indir))
    transformed = dedup_hourly_counts(stream)
    ckpt = str(tmp_path / "ckpt")
    run_available_now(transformed, "inc_out", checkpoint_dir=ckpt)
    first = {tuple(r) for r in spark.table("inc_out").collect()}
    assert first

    # deliver the SAME events again under a new filename → new micro-batch,
    # but every event_id is already in dedup state → counts unchanged
    shutil.copy(f"{sf_dir}/events.parquet", indir / "events_dup.parquet")
    stream2 = read_events_stream(spark, str(indir))
    run_available_now(
        dedup_hourly_counts(stream2), "inc_out", checkpoint_dir=ckpt
    )
    second = {tuple(r) for r in spark.table("inc_out").collect()}
    assert second == first


def test_approx_distinct_close_to_exact(spark, sf_dir):
    """HLL estimate within tolerance of exact — checked two ways: the
    raw estimate recomputed here vs an independent exact count, and the
    query's own in-plan accuracy booleans (round-3 oracle upgrade)."""
    import pyspark.sql.functions as F

    from etl_pipeline_with_alpha_vantage_spark.catalog import table

    raw = {
        r.event_type: (r.approx, r.exact)
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    }
    for k, (est, exact) in raw.items():
        assert est == pytest.approx(exact, rel=0.05)
    for r in QUERIES["agg_approx_distinct"](spark, sf_dir).collect():
        assert r.approx_within_2pct, r
        assert r.exact_users == raw[r.event_type][1]


def test_lsh_recall_vs_brute_force(spark, sf_dir):
    """Hyperplane-LSH top-k must be a meaningful subset of the exact
    brute-force top-k for the same queries (recall sanity, not exactness)."""
    brute = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["similarity_topk_brute"](spark, sf_dir).collect()
    }
    lsh = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["similarity_lsh_topk"](spark, sf_dir).collect()
    }
    assert lsh, "LSH produced no candidates"
    # deterministic pipeline → recall is a fixed number per sf
    # (measured: 0.52 @ sf0.001, 0.34 @ sf0.01); floor with margin
    recall = len(lsh & brute) / len(brute)
    assert recall >= 0.25, f"LSH recall {recall:.3f} below floor"


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    """IVF probe (nprobe=4 of 16 cells) must recover a meaningful part of
    the exact top-k, and every reported cosine must be a real pair score."""
    brute = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["similarity_topk_brute"](spark, sf_dir).collect()
    }
    ivf_rows = QUERIES["similarity_ivf_topk"](spark, sf_dir).collect()
    ivf = {(r.query_id, r.neighbor_id) for r in ivf_rows}
    assert ivf, "IVF produced no candidates"
    assert all(-1.0 <= r.cosine <= 1.0 for r in ivf_rows)
    # measured: 0.68 @ sf0.001, 0.56 @ sf0.01; floor with margin
    recall = len(ivf & brute) / len(brute)
    assert recall >= 0.40, f"IVF recall {recall:.3f} below floor"


def test_pq_adc_recall_vs_brute_force(spark, sf_dir):
    """PQ-ADC top-k (4×4-bit codes) must recover a meaningful part of the
    exact top-k, and every ADC score must be a plausible unit-dot value."""
    brute = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["similarity_topk_brute"](spark, sf_dir).collect()
    }
    pq_rows = QUERIES["similarity_pq_adc_topk"](spark, sf_dir).collect()
    pq = {(r.query_id, r.neighbor_id) for r in pq_rows}
    assert pq, "PQ produced no candidates"
    assert all(-1.5 <= r.adc_score <= 1.5 for r in pq_rows)
    # deterministic pipeline → fixed recall per sf
    # (measured: 0.38 @ sf0.001, 0.34 @ sf0.01); floor with margin
    recall = len(pq & brute) / len(brute)
    assert recall >= 0.25, f"PQ-ADC recall {recall:.3f} below floor"


def test_pq_rerank_improves_or_matches_adc_recall(spark, sf_dir):
    """The exact re-rank stage must produce recall >= the raw ADC top-k
    (the whole point of the refine pass), every rerank hit must come
    from the ADC shortlist universe, and its cosines must be exact-pair
    scores in [-1, 1]."""
    brute = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["similarity_topk_brute"](spark, sf_dir).collect()
    }
    pq = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["similarity_pq_adc_topk"](spark, sf_dir).collect()
    }
    rr_rows = QUERIES["similarity_pq_rerank_topk"](spark, sf_dir).collect()
    rr = {(r.query_id, r.neighbor_id) for r in rr_rows}
    assert rr, "rerank produced no results"
    assert all(-1.0 <= r.cosine <= 1.0 for r in rr_rows)
    recall_rr = len(rr & brute) / len(brute)
    recall_pq = len(pq & brute) / len(brute)
    assert recall_rr >= recall_pq, (recall_rr, recall_pq)


def test_stream_stream_join_equals_batch(spark, sf_dir, tmp_path):
    """The watermarked stream-stream interval join must emit exactly the
    batch join's pairs (inner join ⇒ no watermark-dropped emissions on
    this bounded replay)."""
    from etl_pipeline_with_alpha_vantage_spark.streaming.runner import (
        attribution_join_stream,
    )

    joined = attribution_join_stream(spark, sf_dir)
    assert joined.isStreaming
    run_available_now(
        joined, "join_out", checkpoint_dir=str(tmp_path), output_mode="append"
    )
    streamed = {
        (r.purchase_id, r.click_id, r.lag_us)
        for r in spark.table("join_out").collect()
    }
    batch = {
        (r.purchase_id, r.click_id, r.lag_us)
        for r in QUERIES["stream_join_attribution"](spark, sf_dir).collect()
    }
    assert streamed == batch
    assert len(streamed) > 0


def test_stream_stream_outer_join_equals_batch(spark, sf_dir, tmp_path):
    """LEFT OUTER stream-stream join, drained with AvailableNow:

    - the matched half must equal the batch twin's matched pairs exactly;
    - NULL-click rows emit only once the click-side watermark passes the
      purchase timestamp, so every batch-NULL purchase OLDER than the
      final watermark (max click ts − 1 h) must have emitted, and any
      younger tail purchase must be held back (documented engine
      semantics for outer stream-stream joins on bounded replays).
    """
    import datetime

    from pyspark.sql import functions as F

    from etl_pipeline_with_alpha_vantage_spark.streaming.runner import (
        attribution_join_stream_outer,
    )

    joined = attribution_join_stream_outer(spark, sf_dir)
    assert joined.isStreaming
    run_available_now(
        joined,
        "join_outer_out",
        checkpoint_dir=str(tmp_path),
        output_mode="append",
    )
    streamed = spark.table("join_outer_out").collect()
    s_matched = {
        (r.purchase_id, r.click_id, r.lag_us)
        for r in streamed
        if r.click_id is not None
    }
    s_null = {r.purchase_id for r in streamed if r.click_id is None}

    batch = QUERIES["stream_join_attribution_outer"](spark, sf_dir).collect()
    b_matched = {
        (r.purchase_id, r.click_id, r.lag_us)
        for r in batch
        if r.click_id is not None
    }
    b_null = {(r.purchase_id, r.purchase_ts) for r in batch if r.click_id is None}

    assert s_matched == b_matched
    assert len(s_matched) > 0

    final_wm = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("event_type") == "click"
    ).agg(F.max("ts")).collect()[0][0] - datetime.timedelta(hours=1)
    flushed = {pid for pid, ts in b_null if ts < final_wm}
    assert flushed <= s_null, "watermark-passed purchases must emit NULL rows"
    assert s_null <= {pid for pid, _ in b_null}, (
        "streamed NULL rows must be a subset of the batch anti-join"
    )
    assert len(flushed) > 0


def test_stream_stream_full_outer_join_equals_batch(spark, sf_dir, tmp_path):
    """FULL OUTER stream-stream join, drained with AvailableNow:

    - matched pairs must equal the batch twin's matched pairs exactly;
    - NULL-click purchase rows follow the left-join rule (emit once the
      click watermark passes purchase_ts);
    - NULL-purchase click rows emit once the watermark passes
      click_ts + 6 h (only then is the click provably unmatchable).
      Spark keeps ONE global watermark per query — the MIN across both
      inputs' event-time columns — so the flush bound is
      min(max click ts, max purchase ts) − 1 h.
    """
    import datetime

    from pyspark.sql import functions as F

    from etl_pipeline_with_alpha_vantage_spark.streaming.runner import (
        attribution_join_stream_full,
    )

    joined = attribution_join_stream_full(spark, sf_dir)
    assert joined.isStreaming
    run_available_now(
        joined,
        "join_full_out",
        checkpoint_dir=str(tmp_path),
        output_mode="append",
    )
    streamed = spark.table("join_full_out").collect()
    s_matched = {
        (r.purchase_id, r.click_id, r.lag_us)
        for r in streamed
        if r.click_id is not None and r.purchase_id is not None
    }
    s_null_click = {
        r.purchase_id for r in streamed if r.click_id is None
    }
    s_null_purchase = {
        r.click_id for r in streamed if r.purchase_id is None
    }

    batch = QUERIES["stream_join_attribution_full"](spark, sf_dir).collect()
    b_matched = {
        (r.purchase_id, r.click_id, r.lag_us)
        for r in batch
        if r.click_id is not None and r.purchase_id is not None
    }
    b_null_click = {
        (r.purchase_id, r.purchase_ts)
        for r in batch
        if r.click_id is None
    }
    b_null_purchase = {
        (r.click_id, r.click_ts) for r in batch if r.purchase_id is None
    }

    assert s_matched == b_matched
    assert len(s_matched) > 0

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    click_max = events.filter(F.col("event_type") == "click").agg(
        F.max("ts")
    ).collect()[0][0]
    purchase_max = events.filter(F.col("event_type") == "purchase").agg(
        F.max("ts")
    ).collect()[0][0]
    # One global watermark per query: min over both inputs, minus delay.
    global_wm = min(click_max, purchase_max) - datetime.timedelta(hours=1)

    flushed_p = {pid for pid, ts in b_null_click if ts < global_wm}
    assert flushed_p <= s_null_click
    assert s_null_click <= {pid for pid, _ in b_null_click}

    flushed_c = {
        cid
        for cid, ts in b_null_purchase
        if ts + datetime.timedelta(hours=6) < global_wm
    }
    assert flushed_c <= s_null_purchase
    assert s_null_purchase <= {cid for cid, _ in b_null_purchase}
    assert len(flushed_p) > 0 and len(flushed_c) > 0


def test_approx_percentile_rank_accuracy(spark, sf_dir):
    """approx_percentile returns an actual data point, so the right
    accuracy measure is RANK error, not value error: the empirical
    quantile of the returned point must be within 2 points of the target
    for every event_type."""
    from etl_pipeline_with_alpha_vantage_spark.catalog import table

    import pyspark.sql.functions as F

    values: dict[str, list] = {}
    for r in table(spark, sf_dir, "events").select("event_type", "value").collect():
        values.setdefault(r.event_type, []).append(r.value)
    sketch = {
        r.event_type: (r.p50, r.p95)
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.percentile_approx("value", 0.5, 10000).alias("p50"),
            F.percentile_approx("value", 0.95, 10000).alias("p95"),
        )
        .collect()
    }
    for etype, (p50, p95) in sketch.items():
        vs = sorted(values[etype])
        n = len(vs)
        for approx, q in ((p50, 0.50), (p95, 0.95)):
            assert approx in values[etype]  # a real data point
            rank = sum(1 for v in vs if v <= approx) / n
            assert abs(rank - q) <= 0.02, (etype, q, rank)
    # The query's own in-plan rank-accuracy booleans (round-3 oracle
    # upgrade) must all hold.
    for r in QUERIES["percentile_approx_stats"](spark, sf_dir).collect():
        assert r.p50_rank_ok and r.p95_rank_ok, r
        assert r.n == len(values[r.event_type])


def test_stream_foreachbatch_upsert_idempotent(spark, sf_dir, tmp_path):
    """Streaming ingest through the INSERT IGNORE sink: the warehouse
    ends with exactly one row per event_id, and replaying the same data
    (duplicate file, fresh checkpoint — so the file-source dedup can't
    help) still changes nothing because the sink itself is idempotent."""
    import shutil

    from etl_pipeline_with_alpha_vantage_spark.catalog import table
    from etl_pipeline_with_alpha_vantage_spark.streaming.runner import (
        run_stream_upsert,
    )

    indir = tmp_path / "in"
    indir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", indir / "events.parquet")
    wh = str(tmp_path / "wh")

    run_stream_upsert(spark, str(indir), wh, str(tmp_path / "ckpt1"))
    n_expected = table(spark, sf_dir, "events").count()
    assert spark.read.parquet(wh).count() == n_expected

    # same data re-delivered under a NEW checkpoint: only the sink's
    # anti-join stands between us and duplicates
    shutil.copy(f"{sf_dir}/events.parquet", indir / "events_dup.parquet")
    run_stream_upsert(spark, str(indir), wh, str(tmp_path / "ckpt2"))
    assert spark.read.parquet(wh).count() == n_expected
    assert (
        spark.read.parquet(wh).select("event_id").distinct().count()
        == n_expected
    )


def test_stream_static_join_equals_batch(spark, sf_dir, tmp_path):
    """Stream-static enrichment: the broadcast dim join applied to a real
    file-source stream (append mode — the join is stateless) must produce
    exactly the rows the batch twin aggregates over."""
    from etl_pipeline_with_alpha_vantage_spark.catalog import table
    from etl_pipeline_with_alpha_vantage_spark.streaming.windows import (
        enrich_events_with_segment,
    )

    stream = read_events_stream(spark, sf_dir)
    enriched = enrich_events_with_segment(stream, table(spark, sf_dir, "customer"))
    assert enriched.isStreaming
    run_available_now(
        enriched, "enrich_out", checkpoint_dir=str(tmp_path), output_mode="append"
    )

    from pyspark.sql import functions as F

    streamed = {
        tuple(r)
        for r in spark.table("enrich_out")
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0)
            .cast("double")
            .alias("total_value"),
        )
        .collect()
    }
    batch = {
        tuple(r) for r in QUERIES["stream_static_enrich"](spark, sf_dir).collect()
    }
    assert streamed == batch
    assert len(streamed) > 0


def test_run_log_listener_appends_audit_lines(spark, sf_dir, tmp_path):
    """O2 parity: an AvailableNow run with the listener attached must
    leave start + per-batch + termination lines in the run log
    (reference: one 'ETL run at {now}' line per scheduled job)."""
    import time

    from etl_pipeline_with_alpha_vantage_spark.streaming.runner import (
        dedup_hourly_counts,
        run_with_log,
    )

    log = tmp_path / "etl_log.txt"
    stream = read_events_stream(spark, sf_dir)
    run_with_log(
        spark,
        dedup_hourly_counts(stream),
        "runlog_out",
        str(log),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    # the completion line is synchronous; listener lines (start/batch)
    # are delivered on a background thread — poll briefly for them
    deadline = time.time() + 30
    content = ""
    while time.time() < deadline:
        content = log.read_text() if log.exists() else ""
        if "started at" in content and "rows at" in content:
            break
        time.sleep(0.5)
    assert "started at" in content, content
    assert "rows at" in content, content
    assert "completed at" in content, content
    assert spark.table("runlog_out").count() > 0


def test_processing_time_trigger_resident_loop(spark, sf_dir, tmp_path):
    """O1 resident form: a ProcessingTime-trigger query stays up across
    firings and picks up files that arrive AFTER it starts — the Spark
    twin of the reference's daily schedule loop (etl.py:227-235), scaled
    from daily to sub-second so the test observes multiple firings."""
    import shutil
    import threading
    import time

    from etl_pipeline_with_alpha_vantage_spark.streaming.runner import (
        dedup_hourly_counts,
        read_events_stream,
        run_processing_time,
    )

    indir = tmp_path / "arrivals"
    indir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", indir / "events_a.parquet")

    # second file lands while the resident query is already running
    def late_arrival():
        time.sleep(1.0)
        shutil.copy(f"{sf_dir}/events.parquet", indir / "events_b.parquet")

    t = threading.Thread(target=late_arrival)
    t.start()
    stream = read_events_stream(spark, str(indir))
    n_batches = run_processing_time(
        dedup_hourly_counts(stream),
        "pt_out",
        interval="500 milliseconds",
        checkpoint_dir=str(tmp_path / "ckpt"),
        min_batches=3,
        timeout_sec=60,
    )
    t.join()
    assert n_batches >= 2  # the loop actually re-fired
    # event_id dedup: the duplicate late file adds no new keys, so counts
    # equal the single-file batch answer
    got = {tuple(r) for r in spark.table("pt_out").collect()}
    batch = {
        tuple(r)
        for r in QUERIES["stream_dedup_window"](spark, sf_dir).collect()
    }
    assert got == batch


def test_stream_rollup_incremental_equals_batch(spark, sf_dir, tmp_path):
    """run_stream_rollup: stream → bronze → partition-scoped rollup
    refresh converges to the batch aggregate, and a second catch-up run
    (no new files) leaves both layers untouched."""
    import os

    from pyspark.sql import functions as F

    from etl_pipeline_with_alpha_vantage_spark.catalog import table
    from etl_pipeline_with_alpha_vantage_spark.streaming.runner import (
        run_stream_rollup,
    )

    bronze = str(tmp_path / "bronze")
    rollup = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    run_stream_rollup(spark, sf_dir, bronze, rollup, checkpoint_dir=ckpt)

    expected = (
        table(spark, sf_dir, "events")
        .withColumn("day", F.to_date("ts"))
        .groupBy("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )
    cols = ["event_type", "day", "n_events", "value_cents", "n_users"]
    got = spark.read.parquet(rollup)
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, expected.select(*cols).collect())
    )

    def snapshot(root):
        out = {}
        for dirpath, _, files in os.walk(root):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(dirpath, f)
                    st = os.stat(p)
                    out[p] = (st.st_mtime_ns, st.st_size)
        return out

    b0, r0 = snapshot(bronze), snapshot(rollup)
    run_stream_rollup(spark, sf_dir, bronze, rollup, checkpoint_dir=ckpt)
    assert snapshot(bronze) == b0, "idempotent catch-up rewrote bronze"
    assert snapshot(rollup) == r0, "idempotent catch-up rewrote rollup"


def test_stream_rollup_survives_null_ts(spark, tmp_path):
    """A micro-batch containing null-ts rows must not kill the streaming
    query (day=None previously raised in the refresh-day collection);
    null-day rows stay in bronze's default partition and the rollup only
    carries real days."""
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "src"
    src.mkdir()
    rows = [
        (1, dt.datetime(2024, 3, 1, 10), 7, "click", 1.5, "{}"),
        (2, None, 7, "click", 2.5, "{}"),  # the poison row
        (3, dt.datetime(2024, 3, 2, 11), 8, "view", 3.5, "{}"),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, str(src / "events1.parquet"))

    from etl_pipeline_with_alpha_vantage_spark.streaming.runner import (
        run_stream_rollup,
    )

    bronze = str(tmp_path / "bronze")
    rollup = str(tmp_path / "rollup")
    run_stream_rollup(
        spark, str(src), bronze, rollup, checkpoint_dir=str(tmp_path / "ckpt")
    )

    # bronze keeps all three rows (null day in the Hive default partition)
    assert spark.read.parquet(bronze).count() == 3
    assert any(
        "__HIVE_DEFAULT_PARTITION__" in d
        for d, _, _ in os.walk(bronze)
    )
    # rollup exists, has only the two real days, and excludes the null row
    roll = spark.read.parquet(rollup).collect()
    days = {str(r.day) for r in roll}
    assert days == {"2024-03-01", "2024-03-02"}
    assert sum(r.n_events for r in roll) == 2


def test_stream_trending_equals_batch(spark, sf_dir, tmp_path):
    """Trending top-k: the windowed COUNT streams (complete mode to a
    memory sink); the non-streamable rank stage applies identically over
    the drained sink — and must reproduce the batch query exactly."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window as W

    from etl_pipeline_with_alpha_vantage_spark.streaming.windows import (
        _TRENDING_K,
    )

    stream = read_events_stream(spark, sf_dir)
    counts = stream.groupBy(
        F.window("ts", "15 minutes").alias("win"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    run_available_now(counts, "trend_counts", checkpoint_dir=str(tmp_path))

    rnk = F.dense_rank().over(
        W.partitionBy("win").orderBy(F.desc("n_events"), "event_type")
    )
    streamed = {
        (r.window_start, r.event_type, r.n_events, r.rnk)
        for r in spark.table("trend_counts")
        .withColumn("rnk", rnk.cast("long"))
        .filter(F.col("rnk") <= _TRENDING_K)
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "rnk",
        )
        .collect()
    }
    batch = {
        (r.window_start, r.event_type, r.n_events, r.rnk)
        for r in QUERIES["stream_topk_trending"](spark, sf_dir).collect()
    }
    assert streamed == batch
    assert len(streamed) > 0


def test_python_datasource_stream_equals_batch(spark, tmp_path):
    """The custom Python DataSource's streaming tail must deliver exactly
    the batch relation: drain the seeded feed through micro-batches into
    a memory sink and compare aggregates bit-for-bit with the batch
    read. Offsets are row indices, so this also exercises the
    exactly-once replay contract (readBetweenOffsets re-derivation)."""
    import pyspark.sql.functions as F

    from etl_pipeline_with_alpha_vantage_spark.sources.python_datasource import (
        _register,
    )

    _register(spark)
    n = 20_000
    batch = (
        spark.read.format("seeded_feed").option("n", n).load()
    )
    stream = (
        spark.readStream.format("seeded_feed")
        .option("n", n)
        .option("batch_rows", 3_000)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pyds_stream")
        .option(
            "checkpointLocation", str(tmp_path / "pyds_ckpt")
        )
        .start()
    )
    # Simple stream readers advance one prefetched range per micro-batch
    # (availableNow would stop after the first), so drain with the
    # default continuous trigger and poll until the tail is reached.
    import time

    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.sql("SELECT COUNT(*) c FROM pyds_stream").collect()[0].c >= n:
            break
        time.sleep(0.5)
    try:
        got = spark.sql(
            "SELECT COUNT(*) AS c, SUM(i) AS si, "
            "SUM(CAST(round(score * 100) AS BIGINT)) AS sc "
            "FROM pyds_stream"
        ).collect()[0]
        want = batch.agg(
            F.count(F.lit(1)).alias("c"),
            F.sum("i").alias("si"),
            F.sum(F.round(F.col("score") * 100).cast("long")).alias("sc"),
        ).collect()[0]
        assert (got.c, got.si, got.sc) == (want.c, want.si, want.sc)
        assert got.c == n
    finally:
        if q.isActive:
            q.stop()


def test_stream_ohlc_candles_equals_batch(spark, sf_dir, tmp_path):
    """min_by/max_by must merge correctly as incremental streaming
    state: the drained candle stream equals the batch twin exactly."""
    from etl_pipeline_with_alpha_vantage_spark.streaming.windows import (
        ohlc_candles,
    )

    stream = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    run_available_now(
        ohlc_candles(stream), "ohlc_out", checkpoint_dir=str(tmp_path)
    )
    streamed = {
        (r.event_type, r.window_start, r.n_ticks, r.open, r.high, r.low, r.close)
        for r in spark.table("ohlc_out").collect()
    }
    batch = {
        (r.event_type, r.window_start, r.n_ticks, r.open, r.high, r.low, r.close)
        for r in QUERIES["stream_ohlc_candles"](spark, sf_dir).collect()
    }
    assert streamed == batch
    assert len(streamed) > 0


def test_watermark_actually_drops_late_rows(spark, tmp_path):
    """Direct evidence for the watermark contract: a row older than
    (max event time − watermark) arriving in a later micro-batch must
    be DROPPED by the stateful operator, visible both in the
    numRowsDroppedByWatermark metric and in the unchanged aggregate.
    This is the mechanism watermark_lateness_profile sizes."""
    import datetime as dt

    import pyspark.sql.functions as F

    schema = "event_id long, ts timestamp, user_id long, value double"
    src = tmp_path / "wmk_src"
    src.mkdir()
    fresh = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1, 12, 0, i), 1, 1.0) for i in range(10)],
        schema,
    )
    fresh.write.parquet(str(src / "a"))

    def start():
        stream = spark.readStream.schema(schema).parquet(str(src) + "/*")
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "5 minutes").alias("win"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        return (
            agg.writeStream.format("memory")
            .queryName("wmk_out")
            .outputMode("update")
            .option(
                "checkpointLocation", str(tmp_path / "wmk_ckpt")
            )
            .start()
        )

    import time

    q = start()
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            rows = spark.table("wmk_out").collect()
            if sum(r.n for r in rows) == 10:
                break
            time.sleep(0.5)
        before = {(r.win.start, r.n) for r in spark.table("wmk_out").collect()}
        assert sum(n for _, n in before) == 10

        # A row 2 hours older than the advanced watermark (11:50:09),
        # delivered mid-stream in a later micro-batch.
        late = spark.createDataFrame(
            [(100, dt.datetime(2024, 1, 1, 10, 0, 0), 1, 1.0)], schema
        )
        late.write.parquet(str(src / "b"))

        dropped = 0
        deadline = time.time() + 120
        while time.time() < deadline and dropped == 0:
            dropped = sum(
                op.get("numRowsDroppedByWatermark", 0)
                for p in q.recentProgress
                for op in p.get("stateOperators", [])
            )
            time.sleep(0.5)
    finally:
        q.stop()
    assert dropped >= 1
    after = {(r.win.start, r.n) for r in spark.table("wmk_out").collect()}
    # The late row contributed to NO window update.
    assert sum(n for _, n in after) == sum(n for _, n in before)


def test_statestore_reader_exposes_operator_state(spark, sf_dir, tmp_path):
    """Spark 4 state-store READER surface (X19 ops): after a drained
    run, `spark.read.format("state-metadata")` must list both stateful
    operators (window save + dedupe), and `format("statestore")` must
    expose the dedupe operator's keys — every event younger than the
    final watermark must still be in state (eviction only drops keys
    older than the watermark), and no key may be unknown."""
    import datetime
    import os

    from pyspark.sql import functions as F

    from etl_pipeline_with_alpha_vantage_spark.streaming.runner import (
        dedup_hourly_counts,
    )

    out = dedup_hourly_counts(read_events_stream(spark, sf_dir))
    run_available_now(out, "ss_read_probe", checkpoint_dir=str(tmp_path))
    ckpt = os.path.join(str(tmp_path), "ss_read_probe")

    meta = spark.read.format("state-metadata").load(ckpt)
    ops = {r.operatorName for r in meta.collect()}
    assert ops == {"stateStoreSave", "dedupe"}

    dedupe_id = next(
        r.operatorId for r in meta.collect() if r.operatorName == "dedupe"
    )
    state = (
        spark.read.format("statestore")
        .option("operatorId", dedupe_id)
        .load(ckpt)
    )
    state_ids = {r.key.event_id for r in state.collect()}

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    all_ids = {r.event_id for r in ev.select("event_id").collect()}
    assert state_ids <= all_ids
    wm = ev.agg(F.max("ts")).collect()[0][0] - datetime.timedelta(hours=1)
    young = {
        r.event_id
        for r in ev.filter(F.col("ts") > wm).select("event_id").collect()
    }
    assert young <= state_ids, "watermark-young keys must survive in state"
    assert len(state_ids) > 0


def test_stream_snapshot_sink_exactly_once(spark, sf_dir, tmp_path):
    """Streaming into the versioned snapshot log must be exactly-once
    under every replay mode: a second AvailableNow run on the same
    checkpoint adds nothing (input dedupe), and a run with a FRESH
    checkpoint over the same input also adds nothing (the txn token in
    each manifest dedupes output commits). Final content must equal the
    batch read of the source."""
    from etl_pipeline_with_alpha_vantage_spark.sinks.snapshots import (
        read_snapshot,
        snapshot_history,
    )
    from etl_pipeline_with_alpha_vantage_spark.streaming.runner import (
        run_stream_snapshot_sink,
    )

    table_path = str(tmp_path / "snaptbl")
    ckpt1 = str(tmp_path / "ckpt1")
    run_stream_snapshot_sink(
        spark, sf_dir, table_path, ckpt1, app_id="exactly-once-test"
    )
    hist = snapshot_history(table_path)
    assert len(hist) >= 1

    got = {
        (r.event_id, r.user_id, r.event_type)
        for r in read_snapshot(spark, table_path).collect()
    }
    want = {
        (r.event_id, r.user_id, r.event_type)
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "user_id", "event_type")
        .collect()
    }
    assert got == want and len(got) > 0

    # Same checkpoint: the file source has nothing pending.
    run_stream_snapshot_sink(
        spark, sf_dir, table_path, ckpt1, app_id="exactly-once-test"
    )
    assert snapshot_history(table_path) == hist

    # Fresh checkpoint: every batch replays, every commit is skipped by
    # its txn token.
    ckpt2 = str(tmp_path / "ckpt2")
    run_stream_snapshot_sink(
        spark, sf_dir, table_path, ckpt2, app_id="exactly-once-test"
    )
    assert snapshot_history(table_path) == hist
    assert {
        (r.event_id, r.user_id, r.event_type)
        for r in read_snapshot(spark, table_path).collect()
    } == want


def test_stream_snapshot_sink_app_id_discriminates_queries(
    spark, sf_dir, tmp_path
):
    """Two DIFFERENT logical streaming queries writing the same snapshot
    table must not collide on batch ids: their txn tokens carry distinct
    app_ids (Delta txnAppId analogue), so query B's batch 0 commits even
    though query A already committed a batch 0 — while a replay of
    query A itself (fresh checkpoint, same app_id) is still skipped."""
    from etl_pipeline_with_alpha_vantage_spark.sinks.snapshots import (
        read_snapshot,
        snapshot_history,
    )
    from etl_pipeline_with_alpha_vantage_spark.streaming.runner import (
        run_stream_snapshot_sink,
    )

    table_path = str(tmp_path / "snaptbl")
    run_stream_snapshot_sink(
        spark, sf_dir, table_path, str(tmp_path / "ckA"), app_id="query-A"
    )
    hist_a = snapshot_history(table_path)
    n_a = read_snapshot(spark, table_path).count()
    assert n_a > 0

    # A distinct query (different app_id) over the same source doubles
    # the rows — its batch 0 must NOT be swallowed by query A's token.
    run_stream_snapshot_sink(
        spark, sf_dir, table_path, str(tmp_path / "ckB"), app_id="query-B"
    )
    assert len(snapshot_history(table_path)) == 2 * len(hist_a)
    assert read_snapshot(spark, table_path).count() == 2 * n_a

    # Replaying query A on a fresh checkpoint is still idempotent.
    run_stream_snapshot_sink(
        spark, sf_dir, table_path, str(tmp_path / "ckA2"), app_id="query-A"
    )
    assert read_snapshot(spark, table_path).count() == 2 * n_a


def _expected_cdc_state(spark, sf_dir):
    """Batch recompute of the CDC collapse: per-user latest change by
    (ts, event_id); latest op 'error' => key absent from current state."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    latest = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .filter(F.col("event_type") != "error")
    )
    return {
        (r.user_id, r.event_id) for r in latest.select(
            "user_id", "event_id"
        ).collect()
    }


def test_stream_cdc_merge_matches_batch_latest_state(spark, sf_dir, tmp_path):
    """The streaming CDC MERGE must converge to exactly the batch CDC
    collapse (cdc_latest_state semantics): current state = per-key
    latest non-delete change; delete-latest keys are tombstoned out;
    replays (same or fresh checkpoint) change nothing."""
    from etl_pipeline_with_alpha_vantage_spark.streaming.runner import (
        read_cdc_state,
        run_stream_cdc_merge,
    )

    target = str(tmp_path / "cdc_state")
    ck1 = str(tmp_path / "ck1")
    run_stream_cdc_merge(spark, sf_dir, target, ck1)
    want = _expected_cdc_state(spark, sf_dir)
    got = {
        (r.user_id, r.event_id)
        for r in read_cdc_state(spark, target)
        .select("user_id", "event_id")
        .collect()
    }
    assert got == want and len(got) > 0
    # Tombstones exist for keys whose latest change is a delete.
    all_rows = spark.read.parquet(target)
    n_tomb = all_rows.filter(F.col("deleted")).count()
    n_deleted_latest = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.col("ts").desc(), F.col("event_id").desc()
                )
            ),
        )
        .filter((F.col("rn") == 1) & (F.col("event_type") == "error"))
        .count()
    )
    assert n_tomb == n_deleted_latest

    # Same checkpoint: nothing pending. Fresh checkpoint: same winners
    # re-merge to identical content.
    run_stream_cdc_merge(spark, sf_dir, target, ck1)
    run_stream_cdc_merge(spark, sf_dir, target, str(tmp_path / "ck2"))
    got2 = {
        (r.user_id, r.event_id)
        for r in read_cdc_state(spark, target)
        .select("user_id", "event_id")
        .collect()
    }
    assert got2 == want


def test_cdc_apply_batch_is_order_independent(spark, sf_dir, tmp_path):
    """Applying the change feed as two batches must converge to the
    same state REGARDLESS of batch order — the tombstone + (ts,
    event_id) arbitration makes the apply associative/commutative,
    which is what protects state when file-source batches arrive out
    of event-time order."""
    from etl_pipeline_with_alpha_vantage_spark.streaming.runner import (
        cdc_apply_batch,
        read_cdc_state,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "ts", "event_id", "value", "event_type"
    )
    half_a = ev.filter(F.col("event_id") % 2 == 0)
    half_b = ev.filter(F.col("event_id") % 2 == 1)

    t_ab = str(tmp_path / "ab")
    cdc_apply_batch(spark, t_ab, half_a)
    cdc_apply_batch(spark, t_ab, half_b)
    t_ba = str(tmp_path / "ba")
    cdc_apply_batch(spark, t_ba, half_b)
    cdc_apply_batch(spark, t_ba, half_a)

    def snap(path):
        return {
            (r.user_id, r.event_id, r.deleted)
            for r in spark.read.parquet(path)
            .select("user_id", "event_id", "deleted")
            .collect()
        }

    assert snap(t_ab) == snap(t_ba)
    assert snap(t_ab) and {
        (r.user_id, r.event_id)
        for r in read_cdc_state(spark, t_ab)
        .select("user_id", "event_id")
        .collect()
    } == _expected_cdc_state(spark, sf_dir)


def test_cdc_vacuum_tombstones_retention_contract(spark, sf_dir, tmp_path):
    """Tombstone GC drops only expired tombstones (live rows and young
    tombstones survive), and documents the contract's edge: after GC, a
    sufficiently late out-of-order change CAN resurrect the key — which
    is exactly why the horizon must exceed max event lateness."""
    from etl_pipeline_with_alpha_vantage_spark.streaming.runner import (
        cdc_apply_batch,
        cdc_vacuum_tombstones,
        read_cdc_state,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "ts", "event_id", "value", "event_type"
    )
    target = str(tmp_path / "cdc_state")
    cdc_apply_batch(spark, target, ev)
    all_rows = spark.read.parquet(target)
    n_live = all_rows.filter(~F.col("deleted")).count()
    tombs = all_rows.filter(F.col("deleted"))
    n_tomb = tombs.count()
    assert n_tomb > 0, "fixture needs delete-latest keys"

    # Horizon at the median tombstone ts: only the older half expires.
    cut = tombs.selectExpr(
        "percentile_approx(ts, 0.5) AS c"
    ).collect()[0]["c"]
    expired = tombs.filter(F.col("ts") < F.lit(cut)).count()
    # Capture the resurrection victim BEFORE vacuum rewrites the files
    # this DataFrame's plan points at.
    victim = (
        tombs.filter(F.col("ts") < F.lit(cut))
        .orderBy("user_id")
        .limit(1)
        .collect()
    )
    removed = cdc_vacuum_tombstones(spark, target, cut)
    assert removed == expired
    after = spark.read.parquet(target)
    assert after.filter(~F.col("deleted")).count() == n_live
    assert after.filter(F.col("deleted")).count() == n_tomb - expired
    assert read_cdc_state(spark, target).count() == n_live

    # The documented edge: a GC'd key resurrects on an out-of-order
    # change OLDER than its (now gone) tombstone.
    if victim:
        v = victim[0]
        stale = spark.createDataFrame(
            [
                (
                    v.user_id,
                    v.ts,  # same ts as the vanished tombstone
                    v.event_id - 1,  # older event id -> would have LOST
                    1.0,
                    "purchase",
                )
            ],
            "user_id long, ts timestamp, event_id long, value double, "
            "event_type string",
        )
        cdc_apply_batch(spark, target, stale)
        assert (
            read_cdc_state(spark, target)
            .filter(F.col("user_id") == v.user_id)
            .count()
            == 1
        ), "post-GC resurrection is the documented retention tradeoff"


def test_stream_cdc_merge_survives_mid_stream_crash(spark, sf_dir, tmp_path):
    """Kill-and-restart fault injection for the CDC merge loop: the
    events feed is split into 3 files streamed one-per-batch; the first
    run CRASHES in foreachBatch after batch 1's MERGE completes but
    BEFORE the checkpoint commits it — exactly the window where a
    non-idempotent sink double-applies. The restart from the same
    checkpoint must replay batch 1 (we assert the replay genuinely
    happened), re-merge it idempotently, finish batch 2, and land on
    the identical state a batch recompute gives. Contract (documented
    at run_stream_cdc_merge): per-batch MERGE exactly-once comes from
    arbitration idempotence — re-merging identical winners rewrites
    identical logical content — so foreachBatch's at-least-once replay
    converges; the snapshot sink's txn-token discipline is the
    complementary device for sinks whose commits are NOT idempotent."""
    import pyarrow.parquet as pq

    from etl_pipeline_with_alpha_vantage_spark.streaming.runner import (
        cdc_apply_batch,
        read_cdc_state,
        read_events_stream,
    )

    # Split the events table into 3 single-file chunks (pyarrow keeps
    # the TIMESTAMP(NANOS) physical type the real table has).
    src = str(tmp_path / "feed")
    os.makedirs(src)
    t = pq.read_table(f"{sf_dir}/events.parquet")
    third = (t.num_rows + 2) // 3
    for i in range(3):
        pq.write_table(
            t.slice(i * third, third), f"{src}/events_{i}.parquet"
        )

    target = str(tmp_path / "cdc_state")
    ckpt = str(tmp_path / "ckpt")
    applied: list[int] = []

    def run(crash_on: int | None) -> None:
        stream = read_events_stream(
            spark, src, max_files_per_trigger=1
        ).select("user_id", "ts", "event_id", "value", "event_type")

        def load(batch_df, batch_id: int) -> None:
            cdc_apply_batch(spark, target, batch_df)
            applied.append(batch_id)
            if batch_id == crash_on:
                raise RuntimeError("injected crash after merge, pre-commit")

        q = (
            stream.writeStream.foreachBatch(load)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(120)
        except Exception:
            pass  # the injected crash surfaces here
        finally:
            if q.isActive:
                q.stop()

    run(crash_on=1)
    assert applied == [0, 1]  # crashed after batch 1's merge ran
    run(crash_on=None)
    # Batch 1 was REPLAYED (its checkpoint commit never landed), then
    # batch 2 completed: the dangerous double-apply window was exercised.
    assert applied == [0, 1, 1, 2]

    want = _expected_cdc_state(spark, sf_dir)
    got = {
        (r.user_id, r.event_id)
        for r in read_cdc_state(spark, target)
        .select("user_id", "event_id")
        .collect()
    }
    assert got == want and len(got) > 0


def test_multiprobe_recall_dominates_single_probe(spark, sf_dir):
    """Multiprobe LSH's candidate set is a strict superset of
    single-probe's (same signatures + wider probe set), so its recall
    vs brute force must be >= single-probe's — the whole point of the
    probe expansion — and comfortably above the single-probe floor."""
    brute = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["similarity_topk_brute"](spark, sf_dir).collect()
    }
    single = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["similarity_lsh_topk"](spark, sf_dir).collect()
    }
    multi = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["similarity_lsh_multiprobe_topk"](
            spark, sf_dir
        ).collect()
    }
    assert multi, "multiprobe produced no candidates"
    r_single = len(single & brute) / len(brute)
    r_multi = len(multi & brute) / len(brute)
    assert r_multi >= r_single, (r_multi, r_single)
    assert r_multi >= 0.40, f"multiprobe recall {r_multi:.3f} below floor"
