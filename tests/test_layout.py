"""Warehouse-layout tests (SURVEY.md §4.3): partition pruning reaches the
scan, and small-file compaction preserves data while collapsing files.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_with_alpha_vantage_spark.catalog import table
from etl_pipeline_with_alpha_vantage_spark.sinks.maintenance import (
    compact,
    merge_into,
    write_partitioned,
)


def test_partition_pruning_reaches_scan(spark, sf_dir, tmp_path):
    """A day-partitioned layout + a day predicate must prune at planning
    time: PartitionFilters populated AND only the touched partition's
    files read."""
    path = str(tmp_path / "events_by_day")
    ev = table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    write_partitioned(ev, path, ["day"])

    all_days = spark.read.parquet(path)
    one_day = all_days.filter(F.col("day") == "2024-01-05")

    plan = one_day._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PartitionFilters: [" in plan
    assert "day" in plan.split("PartitionFilters:")[1][:200]

    # pruning must be physical: the pruned scan plans fewer input splits
    # (inputFiles() is relation-level and ignores pruning; the planned
    # RDD partitioning reflects the actual post-pruning file set)
    assert one_day.rdd.getNumPartitions() < all_days.rdd.getNumPartitions()
    # and the data itself round-trips
    expected = ev.filter(F.col("day") == "2024-01-05").count()
    assert one_day.count() == expected > 0


def test_compaction_preserves_data(spark, sf_dir, tmp_path):
    """Compacting a many-small-files directory must keep every row and
    leave the configured number of larger files."""
    path = str(tmp_path / "shattered")
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    ev.repartition(40).write.parquet(path)

    before_rows = spark.read.parquet(path).count()
    files_before, files_after = compact(spark, path, target_file_bytes=1 << 30)

    assert files_before >= 40
    assert files_after == 1  # everything fits one target-size file
    assert spark.read.parquet(path).count() == before_rows
    # event_id multiset preserved
    s = spark.read.parquet(path).agg(
        F.sum("event_id").alias("s"), F.count("*").alias("n")
    ).collect()[0]
    assert s.n == before_rows


def test_sorted_shard_export_is_range_partitioned(spark, sf_dir, tmp_path):
    """export_sorted_shards must produce the requested shard count, each
    file internally sorted on the key, with disjoint key ranges across
    files (range partitioning, not hash)."""
    import pyarrow.parquet as pq

    from etl_pipeline_with_alpha_vantage_spark.sinks.maintenance import (
        export_sorted_shards,
    )

    path = str(tmp_path / "shards")
    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    export_sorted_shards(docs, path, "doc_id", n_shards=4)

    import os

    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    assert len(files) == 4
    ranges = []
    total = 0
    for f in files:
        ids = pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()
        assert ids == sorted(ids), f"{f} not sorted"
        ranges.append((min(ids), max(ids)))
        total += len(ids)
    ranges.sort()
    for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
        assert hi_a < lo_b, "shard key ranges overlap"
    assert total == docs.count()


def test_zorder_export_clusters_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order layout: per-file bounding boxes must be tight in BOTH
    columns — quantified as the mean per-file fraction of each column's
    global range. A single-column sort leaves the other column's
    per-file span ≈ the full range (fraction ~1); the Morton layout
    must land well below that in both dimensions simultaneously."""
    from etl_pipeline_with_alpha_vantage_spark.sinks.maintenance import (
        export_zorder,
    )

    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    n_files = 16
    path = str(tmp_path / "zorder")
    export_zorder(orders, path, "o_custkey", "o_totalprice", n_files, bits=8)

    import glob

    import pyarrow.parquet as pq

    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    assert len(files) >= n_files // 2  # range partitioner may merge a few

    spans_x, spans_y = [], []
    gx_min = gx_max = gy_min = gy_max = None
    per_file = []
    for f in files:
        t = pq.read_table(f, columns=["o_custkey", "o_totalprice"])
        xs, ys = t.column(0).to_pylist(), t.column(1).to_pylist()
        per_file.append((min(xs), max(xs), min(ys), max(ys)))
    gx_min = min(b[0] for b in per_file)
    gx_max = max(b[1] for b in per_file)
    gy_min = min(b[2] for b in per_file)
    gy_max = max(b[3] for b in per_file)
    for bx0, bx1, by0, by1 in per_file:
        spans_x.append((bx1 - bx0) / max(1, gx_max - gx_min))
        spans_y.append((by1 - by0) / max(1.0, gy_max - gy_min))

    mean_x = sum(spans_x) / len(spans_x)
    mean_y = sum(spans_y) / len(spans_y)
    # both dimensions clustered: each file covers a minority of each
    # column's range (a 1-D sort would give ~1.0 on the unsorted column)
    assert mean_x < 0.6, (mean_x, mean_y)
    assert mean_y < 0.6, (mean_x, mean_y)
    # round-trip integrity
    assert (
        spark.read.parquet(path).count() == orders.count()
    )


def test_incremental_rollup_refresh(spark, sf_dir, tmp_path):
    """refresh_daily_rollup: the initial build equals a direct aggregate;
    a scoped refresh rewrites ONLY the named day-partitions (other
    partition files stay byte-identical on disk) and folds source
    changes for those days into the table."""
    import os

    from pyspark.sql import functions as F

    from etl_pipeline_with_alpha_vantage_spark.catalog import table
    from etl_pipeline_with_alpha_vantage_spark.sinks.maintenance import (
        refresh_daily_rollup,
    )

    events = table(spark, sf_dir, "events")
    path = str(tmp_path / "rollup")

    n_full = refresh_daily_rollup(spark, events, path, None)
    assert n_full > 2

    def snapshot(root):
        out = {}
        for dirpath, _, files in os.walk(root):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(dirpath, f)
                    st = os.stat(p)
                    out[p] = (st.st_mtime_ns, st.st_size)
        return out

    before = snapshot(path)
    days = sorted(
        r.day.isoformat()
        for r in spark.read.parquet(path).select("day").distinct().collect()
    )[:2]

    # refresh two days from a CHANGED source (drop one event type)
    changed = events.filter(F.col("event_type") != "error")
    n_ref = refresh_daily_rollup(spark, changed, path, days)
    assert n_ref == 2

    after = snapshot(path)
    touched_prefixes = tuple(os.path.join(path, f"day={d}") for d in days)
    for p, sig in before.items():
        if not p.startswith(touched_prefixes):
            assert after.get(p) == sig, f"untouched partition rewritten: {p}"

    # table content == old rollup outside the refresh set, new agg inside
    expected_inside = (
        changed.withColumn("day", F.to_date("ts"))
        .filter(F.col("day").isin(days))
        .groupBy("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )
    got_inside = spark.read.parquet(path).filter(
        F.col("day").cast("string").isin(days)
    )
    cols = ["event_type", "day", "n_events", "value_cents", "n_users"]
    assert sorted(map(tuple, got_inside.select(*cols).collect())) == sorted(
        map(tuple, expected_inside.select(*cols).collect())
    )
    assert "error" not in {
        r.event_type for r in got_inside.select("event_type").distinct().collect()
    }


def test_rollup_refresh_deletes_vanished_day(spark, sf_dir, tmp_path):
    """A refreshed day whose recomputed aggregate is EMPTY must disappear
    from disk, not silently stay stale (dynamic overwrite alone only
    rewrites partitions present in the written frame)."""
    import os

    from pyspark.sql import functions as F

    from etl_pipeline_with_alpha_vantage_spark.catalog import table
    from etl_pipeline_with_alpha_vantage_spark.sinks.maintenance import (
        refresh_daily_rollup,
    )

    events = table(spark, sf_dir, "events")
    path = str(tmp_path / "rollup")
    refresh_daily_rollup(spark, events, path, None)

    days = sorted(
        r.day.isoformat()
        for r in spark.read.parquet(path).select("day").distinct().collect()
    )[:2]
    gone, kept = days[0], days[1]
    assert os.path.isdir(os.path.join(path, f"day={gone}"))

    # Source where every row of `gone` was deleted; `kept` still has rows.
    changed = events.filter(F.to_date("ts") != F.lit(gone).cast("date"))
    n_ref = refresh_daily_rollup(spark, changed, path, days)
    assert n_ref == 2  # one rewritten + one deleted

    assert not os.path.exists(os.path.join(path, f"day={gone}"))
    remaining = {
        r.day.isoformat()
        for r in spark.read.parquet(path).select("day").distinct().collect()
    }
    assert gone not in remaining and kept in remaining


def test_rollup_refresh_prunes_day_partitioned_source(spark, sf_dir, tmp_path):
    """When the source is day-partitioned (the bronze layer), the
    refresh's day filter must land on the partition column and prune at
    planning time — the property the O(changed days) claim rests on."""
    from pyspark.sql import functions as F

    from etl_pipeline_with_alpha_vantage_spark.catalog import table

    src_dir = str(tmp_path / "bronze")
    events = table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    events.write.partitionBy("day").parquet(src_dir)

    bronze = spark.read.parquet(src_dir)
    days = sorted(
        r.day.isoformat()
        for r in bronze.select("day").distinct().limit(2).collect()
    )
    filtered = bronze.filter(F.col("day").isin(days))
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the pushed partition filter must mention the day column, and the
    # pruned scan must read only the selected partitions' rows
    expected = events.filter(F.col("day").cast("string").isin(days)).count()
    assert filtered.count() == expected


def test_dynamic_partition_pruning_on_fact_join(spark, sf_dir, tmp_path):
    """Joining a day-partitioned fact against a filtered dim must inject
    a dynamic-partition-pruning subquery into the fact scan: at 100 TB
    the fact's untouched day directories are never read even though the
    day set is only known at run time (it comes from the dim filter)."""
    from pyspark.sql import functions as F

    from etl_pipeline_with_alpha_vantage_spark.catalog import table

    fact_dir = str(tmp_path / "fact")
    events = table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    events.write.partitionBy("day").parquet(fact_dir)

    days = sorted(
        r.day
        for r in events.select("day").distinct().collect()
        if r.day is not None
    )
    # NOTE: the dim filter must be a COMPARISON for Spark's
    # isLikelySelective heuristic to consider pruning — a bare boolean
    # attribute filter does not qualify and silently skips DPP.
    dim = spark.createDataFrame(
        [(d, i) for i, d in enumerate(days)], "day date, rank int"
    )

    fact = spark.read.parquet(fact_dir)
    joined = fact.join(
        F.broadcast(dim.filter(F.col("rank") < 4)), "day"
    ).groupBy("day").agg(F.count(F.lit(1)).alias("n"))
    opt = joined._jdf.queryExecution().optimizedPlan().toString()
    assert "dynamicpruning" in opt.lower(), opt[:2000]
    # the executed scan carries the runtime IN-subquery partition filter
    got = {r.day for r in joined.collect()}
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan.lower()
    # and the result is correct (only the four filtered days survive)
    assert got == set(days[:4])


def test_runtime_bloom_filter_prunes_shuffle_join(spark, sf_dir):
    """Row-level runtime filtering (the shuffle-join sibling of DPP):
    when a selective dim filter feeds a non-broadcast equi-join, Spark
    must inject a bloom_filter_agg subquery and a might_contain guard on
    the fact side, pruning rows BEFORE the shuffle. At 100 TB this is
    the difference between shuffling the whole fact and shuffling the
    ~matching fraction.

    Conditions (each silently disables the rule if unmet, documented
    here so plan changes are debuggable): creation side below
    creationSideThreshold, application-side scan above
    applicationSideScanSizeThreshold (10 GB default — hence lowered
    here; at real scale it passes naturally), creation side NOT
    broadcastable (a broadcast join needs no bloom), and a
    comparison-shaped (isLikelySelective) dim filter."""
    from pyspark.sql import functions as F

    from etl_pipeline_with_alpha_vantage_spark.catalog import table

    overrides = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in overrides.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        li = table(spark, sf_dir, "lineitem")
        o = table(spark, sf_dir, "orders").filter(
            F.col("o_totalprice") > 350000
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey).agg(
            F.count(F.lit(1)).alias("n")
        )
        opt = j._jdf.queryExecution().optimizedPlan().toString().lower()
        assert "bloom_filter_agg" in opt, opt[:1500]
        assert "might_contain" in opt
        # and the filtered join is still exact
        expected = (
            li.join(o, li.l_orderkey == o.o_orderkey).count()
        )
        assert j.collect()[0].n == expected > 0
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# --------------------------------------------------------------------------
# Copy-on-write MERGE INTO (sinks.maintenance.merge_into)
# --------------------------------------------------------------------------


def _file_state(path: str) -> dict[str, tuple[int, bytes]]:
    """(size, content) per parquet file, keyed by relative path."""
    import os

    state = {}
    for root, _d, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                full = os.path.join(root, f)
                with open(full, "rb") as fh:
                    state[os.path.relpath(full, path)] = (
                        os.path.getsize(full),
                        fh.read(),
                    )
    return state


def _merge_target(spark, sf_dir, path) -> None:
    tgt = table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("acctbal_cents"),
        "c_mktsegment",
    )
    tgt.write.mode("overwrite").partitionBy("c_mktsegment").parquet(path)


def test_merge_into_upsert_delete_semantics(spark, sf_dir, tmp_path):
    """WHEN MATCHED UPDATE / WHEN MATCHED AND is_del DELETE / WHEN NOT
    MATCHED INSERT — row-level results match the set-algebra spec."""
    path = str(tmp_path / "merge_tbl")
    _merge_target(spark, sf_dir, path)
    before = {
        r.c_custkey: r.acctbal_cents
        for r in spark.read.parquet(path)
        .filter(F.col("c_mktsegment") == "BUILDING")
        .collect()
    }
    keys = sorted(before)
    upd_key, del_key = keys[0], keys[1]
    src = spark.createDataFrame(
        [
            (upd_key, 999_999, "BUILDING", False),
            (del_key, 0, "BUILDING", True),
            (9_999_999, 777, "BUILDING", False),
        ],
        "c_custkey long, acctbal_cents long, c_mktsegment string, is_del boolean",
    )
    stats = merge_into(
        spark, path, src, ["c_custkey"], "c_mktsegment", delete_col="is_del"
    )
    assert stats["partitions_touched"] == 1
    assert stats["partitions_rewritten"] == 1
    assert stats["n_deletes"] == 1
    after = {
        r.c_custkey: r.acctbal_cents
        for r in spark.read.parquet(path)
        .filter(F.col("c_mktsegment") == "BUILDING")
        .collect()
    }
    expected = dict(before)
    expected[upd_key] = 999_999
    del expected[del_key]
    expected[9_999_999] = 777
    assert after == expected


def test_merge_into_untouched_partitions_byte_identical(
    spark, sf_dir, tmp_path
):
    """A merge whose source names only BUILDING must leave every other
    partition's files untouched — same names, sizes, and bytes."""
    path = str(tmp_path / "merge_tbl")
    _merge_target(spark, sf_dir, path)
    pre = _file_state(path)
    src = spark.createDataFrame(
        [(8_888_888, 42, "BUILDING", False)],
        "c_custkey long, acctbal_cents long, c_mktsegment string, is_del boolean",
    )
    merge_into(
        spark, path, src, ["c_custkey"], "c_mktsegment", delete_col="is_del"
    )
    post = _file_state(path)
    pre_untouched = {
        k: v for k, v in pre.items() if "c_mktsegment=BUILDING" not in k
    }
    post_untouched = {
        k: v for k, v in post.items() if "c_mktsegment=BUILDING" not in k
    }
    assert pre_untouched == post_untouched
    assert pre_untouched  # the check is vacuous if nothing was untouched


def test_merge_into_idempotent(spark, sf_dir, tmp_path):
    """Re-running the SAME merge must be a logical no-op: every
    partition it rewrites gets identical content, and partitions the
    source does not name are not opened at all."""
    path = str(tmp_path / "merge_tbl")
    _merge_target(spark, sf_dir, path)
    some_key = (
        spark.read.parquet(path)
        .filter(F.col("c_mktsegment") == "AUTOMOBILE")
        .agg(F.min("c_custkey"))
        .collect()[0][0]
    )
    src = spark.createDataFrame(
        [
            (some_key, 111, "AUTOMOBILE", False),
            (7_777_777, 222, "AUTOMOBILE", False),
        ],
        "c_custkey long, acctbal_cents long, c_mktsegment string, is_del boolean",
    )
    merge_into(
        spark, path, src, ["c_custkey"], "c_mktsegment", delete_col="is_del"
    )
    first = sorted(
        tuple(r) for r in spark.read.parquet(path).collect()
    )
    stats = merge_into(
        spark, path, src, ["c_custkey"], "c_mktsegment", delete_col="is_del"
    )
    second = sorted(
        tuple(r) for r in spark.read.parquet(path).collect()
    )
    assert first == second
    assert stats["rows_before"] == stats["rows_after"]


def test_merge_into_vanished_partition_deleted(spark, sf_dir, tmp_path):
    """Deleting EVERY row of a partition leaves nothing for dynamic
    overwrite to replace — merge_into must remove the directory
    explicitly so the table does not serve ghost rows."""
    import os

    path = str(tmp_path / "merge_tbl")
    _merge_target(spark, sf_dir, path)
    doomed = (
        spark.read.parquet(path)
        .filter(F.col("c_mktsegment") == "MACHINERY")
        .select("c_custkey", "acctbal_cents")
        .collect()
    )
    src = spark.createDataFrame(
        [(r.c_custkey, r.acctbal_cents, "MACHINERY", True) for r in doomed],
        "c_custkey long, acctbal_cents long, c_mktsegment string, is_del boolean",
    )
    stats = merge_into(
        spark, path, src, ["c_custkey"], "c_mktsegment", delete_col="is_del"
    )
    assert stats["partitions_deleted"] == 1
    assert not os.path.exists(os.path.join(path, "c_mktsegment=MACHINERY"))
    remaining = (
        spark.read.parquet(path).select("c_mktsegment").distinct().collect()
    )
    assert "MACHINERY" not in {r.c_mktsegment for r in remaining}


# --------------------------------------------------------------------------
# Snapshot log: time travel / rollback / vacuum (sinks.snapshots)
# --------------------------------------------------------------------------


def test_snapshot_time_travel_reads_are_stable(spark, tmp_path):
    """A version's content must never change, no matter what is
    committed after it — append includes the parent, overwrite resets."""
    from etl_pipeline_with_alpha_vantage_spark.sinks.snapshots import (
        read_snapshot,
        snapshot_commit,
        snapshot_history,
    )

    path = str(tmp_path / "snap")
    d1 = spark.range(0, 10).withColumnRenamed("id", "k")
    d2 = spark.range(10, 15).withColumnRenamed("id", "k")
    d3 = spark.range(100, 103).withColumnRenamed("id", "k")
    assert snapshot_commit(spark, path, d1, mode="append") == 1
    assert snapshot_commit(spark, path, d2, mode="append") == 2
    assert snapshot_commit(spark, path, d3, mode="overwrite") == 3

    v1 = {r.k for r in read_snapshot(spark, path, 1).collect()}
    v2 = {r.k for r in read_snapshot(spark, path, 2).collect()}
    v3 = {r.k for r in read_snapshot(spark, path, 3).collect()}
    latest = {r.k for r in read_snapshot(spark, path).collect()}
    assert v1 == set(range(10))
    assert v2 == set(range(15))
    assert v3 == {100, 101, 102}
    assert latest == v3
    hist = snapshot_history(path)
    assert [h["version"] for h in hist] == [1, 2, 3]
    assert hist[2]["mode"] == "overwrite"


def test_snapshot_rollback_restores_without_rewrites(spark, tmp_path):
    """Rollback commits a NEW version pointing at the old file list —
    the restored read equals the old version and history is preserved."""
    import os

    from etl_pipeline_with_alpha_vantage_spark.sinks.snapshots import (
        read_snapshot,
        rollback,
        snapshot_commit,
        snapshot_history,
    )

    path = str(tmp_path / "snap")
    snapshot_commit(
        spark, path, spark.range(0, 5).withColumnRenamed("id", "k")
    )
    snapshot_commit(
        spark, path, spark.range(5, 9).withColumnRenamed("id", "k")
    )
    files_before = {
        os.path.join(r, f)
        for r, _d, fs in os.walk(os.path.join(path, "data"))
        for f in fs
    }
    new_v = rollback(spark, path, 1)
    assert new_v == 3
    files_after = {
        os.path.join(r, f)
        for r, _d, fs in os.walk(os.path.join(path, "data"))
        for f in fs
    }
    assert files_before == files_after  # no data file written or removed
    assert {r.k for r in read_snapshot(spark, path).collect()} == set(range(5))
    assert {r.k for r in read_snapshot(spark, path, 2).collect()} == set(
        range(9)
    )  # bad version still readable (audit trail)
    assert len(snapshot_history(path)) == 3


def test_snapshot_vacuum_drops_only_unreferenced(spark, tmp_path):
    """Vacuum with keep_last=1 removes files only older manifests
    reference; the retained version stays fully readable."""
    import pytest as _pytest

    from etl_pipeline_with_alpha_vantage_spark.sinks.snapshots import (
        read_snapshot,
        snapshot_commit,
        vacuum,
    )

    path = str(tmp_path / "snap")
    snapshot_commit(
        spark, path, spark.range(0, 6).withColumnRenamed("id", "k")
    )
    snapshot_commit(
        spark, path, spark.range(6, 8).withColumnRenamed("id", "k"),
        mode="overwrite",
    )
    removed = vacuum(spark, path, keep_last=1)
    assert removed >= 1  # v1's files are unreferenced after the overwrite
    assert {r.k for r in read_snapshot(spark, path).collect()} == {6, 7}
    with _pytest.raises(FileNotFoundError):
        read_snapshot(spark, path, 1)


def test_snapshot_concurrent_appends_both_commit(spark, tmp_path):
    """Two writers racing to append must BOTH land (blind appends
    commute): exactly one wins each put-if-absent, the loser rebases on
    the winner's manifest and retries, and the final version contains
    both writers' rows plus the base."""
    import threading

    from etl_pipeline_with_alpha_vantage_spark.sinks.snapshots import (
        read_snapshot,
        snapshot_commit,
        snapshot_history,
    )

    path = str(tmp_path / "snap")
    snapshot_commit(
        spark, path, spark.range(0, 4).withColumnRenamed("id", "k")
    )

    barrier = threading.Barrier(2)
    results: dict[str, int | Exception] = {}

    def writer(tag: str, lo: int, hi: int) -> None:
        df = spark.range(lo, hi).withColumnRenamed("id", "k")
        try:
            barrier.wait(timeout=60)
            results[tag] = snapshot_commit(spark, path, df, mode="append")
        except Exception as exc:  # pragma: no cover - surfaced below
            results[tag] = exc

    threads = [
        threading.Thread(target=writer, args=("a", 10, 14)),
        threading.Thread(target=writer, args=("b", 20, 23)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)

    assert all(isinstance(v, int) for v in results.values()), results
    assert sorted(results.values()) == [2, 3]  # distinct versions, no gap
    latest = {r.k for r in read_snapshot(spark, path).collect()}
    assert latest == set(range(4)) | set(range(10, 14)) | set(range(20, 23))
    hist = snapshot_history(path)
    assert [h["version"] for h in hist] == [1, 2, 3]
    assert [h["parent"] for h in hist] == [None, 1, 2]  # linear log
    # The intermediate version holds base + exactly the v2 winner's rows.
    v2 = {r.k for r in read_snapshot(spark, path, 2).collect()}
    winner = min(results, key=results.__getitem__)
    expected_v2 = set(range(4)) | (
        set(range(10, 14)) if winner == "a" else set(range(20, 23))
    )
    assert v2 == expected_v2


def test_snapshot_expected_parent_conflict_loses_cleanly(spark, tmp_path):
    """A read-modify-write pinned to ``expected_parent`` must FAIL when
    any other writer commits first (its staged result is stale), and
    succeed after re-deriving against the new latest."""
    import pytest as _pytest

    from etl_pipeline_with_alpha_vantage_spark.sinks.snapshots import (
        SnapshotConflictError,
        read_snapshot,
        snapshot_commit,
    )

    path = str(tmp_path / "snap")
    snapshot_commit(
        spark, path, spark.range(0, 4).withColumnRenamed("id", "k")
    )

    # Writer B derives an overwrite from version 1 (e.g. a MERGE)...
    derived = read_snapshot(spark, path, 1).withColumn("k", F.col("k") + 100)
    # ...but writer A commits first, moving the latest to version 2.
    snapshot_commit(
        spark, path, spark.range(50, 52).withColumnRenamed("id", "k")
    )
    with _pytest.raises(SnapshotConflictError, match="expected parent"):
        snapshot_commit(
            spark, path, derived, mode="overwrite", expected_parent=1
        )
    # Version 2 (A's append) is intact — the loser published nothing.
    assert {r.k for r in read_snapshot(spark, path).collect()} == set(
        range(4)
    ) | {50, 51}
    # B re-derives from the new latest and wins cleanly.
    rederived = read_snapshot(spark, path, 2).withColumn(
        "k", F.col("k") + 100
    )
    v = snapshot_commit(
        spark, path, rederived, mode="overwrite", expected_parent=2
    )
    assert v == 3
    assert {r.k for r in read_snapshot(spark, path).collect()} == {
        100, 101, 102, 103, 150, 151,
    }


def test_mor_read_equals_cow_merge_and_never_rewrites_base(spark, sf_dir):
    """The merge-on-read path (deletion vector + delta) must produce
    row-for-row the COW-merged table from the identical change set,
    and reading it must leave every base file byte-untouched."""
    import os

    from etl_pipeline_with_alpha_vantage_spark.operators.lakehouse import (
        _merge_fixture,
        _mor_fixture,
        mor_read,
    )

    cow = spark.read.parquet(_merge_fixture(spark, sf_dir))
    base, dv, delta = _mor_fixture(spark, sf_dir)

    def fingerprint(root):
        out = {}
        for r, _d, fs in os.walk(root):
            for f in fs:
                p = os.path.join(r, f)
                st = os.stat(p)
                out[p] = (st.st_size, st.st_mtime_ns)
        return out

    before = fingerprint(base)
    mor = mor_read(spark, base, dv, delta)
    cols = sorted(cow.columns)
    assert sorted(mor.columns) == cols
    cow_rows = sorted(tuple(r[c] for c in cols) for r in cow.collect())
    mor_rows = sorted(tuple(r[c] for c in cols) for r in mor.collect())
    assert mor_rows == cow_rows
    assert len(mor_rows) > 0
    assert fingerprint(base) == before  # zero-rewrite ingest


def test_snapshot_txn_token_commit_is_idempotent(spark, tmp_path):
    """A commit carrying a txn token already present in the log must be
    a no-op returning the existing version — even when handed different
    data (the retry-after-partial-failure contract); a fresh token
    commits normally."""
    from etl_pipeline_with_alpha_vantage_spark.sinks.snapshots import (
        read_snapshot,
        snapshot_commit,
        snapshot_history,
    )

    path = str(tmp_path / "snap")
    v1 = snapshot_commit(
        spark,
        path,
        spark.range(0, 5).withColumnRenamed("id", "k"),
        txn="batch:0",
    )
    assert v1 == 1
    # Same token, different data: must not publish anything.
    v_again = snapshot_commit(
        spark,
        path,
        spark.range(100, 200).withColumnRenamed("id", "k"),
        txn="batch:0",
    )
    assert v_again == 1
    assert len(snapshot_history(path)) == 1
    assert {r.k for r in read_snapshot(spark, path).collect()} == set(
        range(5)
    )
    # Fresh token: normal append.
    v2 = snapshot_commit(
        spark,
        path,
        spark.range(5, 8).withColumnRenamed("id", "k"),
        txn="batch:1",
    )
    assert v2 == 2
    assert {r.k for r in read_snapshot(spark, path).collect()} == set(
        range(8)
    )


def test_snapshot_four_writer_race_is_linear_and_lossless(spark, tmp_path):
    """Four concurrent appends: every writer must land exactly once,
    versions form a gap-free linear chain, and the final read holds all
    four writers' rows plus the base."""
    import threading

    from etl_pipeline_with_alpha_vantage_spark.sinks.snapshots import (
        read_snapshot,
        snapshot_commit,
        snapshot_history,
    )

    path = str(tmp_path / "snap")
    snapshot_commit(
        spark, path, spark.range(0, 3).withColumnRenamed("id", "k")
    )
    barrier = threading.Barrier(4)
    results: dict[int, int | Exception] = {}

    def writer(i: int) -> None:
        df = spark.range(100 * (i + 1), 100 * (i + 1) + 3).withColumnRenamed(
            "id", "k"
        )
        try:
            barrier.wait(timeout=60)
            results[i] = snapshot_commit(spark, path, df, mode="append")
        except Exception as exc:  # pragma: no cover - surfaced below
            results[i] = exc

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)

    assert all(isinstance(v, int) for v in results.values()), results
    assert sorted(results.values()) == [2, 3, 4, 5]
    hist = snapshot_history(path)
    assert [h["version"] for h in hist] == [1, 2, 3, 4, 5]
    assert [h["parent"] for h in hist] == [None, 1, 2, 3, 4]
    want = set(range(3))
    for i in range(4):
        want |= set(range(100 * (i + 1), 100 * (i + 1) + 3))
    assert {r.k for r in read_snapshot(spark, path).collect()} == want


def test_snapshot_last_pointer_resolves_and_degrades_safely(spark, tmp_path):
    """The _last pointer must (a) track the latest version, (b) survive
    a STALE hint via the dense forward probe, and (c) degrade to the
    full listing when corrupt or pointing past the log — never a wrong
    answer, only a slower one."""
    import json
    import os

    from etl_pipeline_with_alpha_vantage_spark.sinks.snapshots import (
        _read_last_ptr,
        read_snapshot,
        snapshot_commit,
    )

    path = str(tmp_path / "snap")
    for lo in (0, 10, 20):
        snapshot_commit(
            spark, path, spark.range(lo, lo + 5).withColumnRenamed("id", "k")
        )
    _ptr_want = {k for lo in (0, 10, 20) for k in range(lo, lo + 5)}
    ptr = os.path.join(path, "_snapshots", "_last")
    assert _read_last_ptr(path) == 3
    assert {r.k for r in read_snapshot(spark, path).collect()} == _ptr_want

    # Stale (regressed) pointer: forward probe still finds version 3.
    with open(ptr, "w") as f:
        json.dump({"version": 1}, f)
    assert {r.k for r in read_snapshot(spark, path).collect()} == _ptr_want

    # Pointer past the log (no such manifest): fallback listing wins.
    with open(ptr, "w") as f:
        json.dump({"version": 99}, f)
    assert {r.k for r in read_snapshot(spark, path).collect()} == _ptr_want

    # Corrupt pointer: same.
    with open(ptr, "w") as f:
        f.write("not json{")
    assert {r.k for r in read_snapshot(spark, path).collect()} == _ptr_want

    # Missing pointer: same, and the next commit restores it.
    os.remove(ptr)
    assert snapshot_commit(
        spark, path, spark.range(30, 31).withColumnRenamed("id", "k")
    ) == 4
    assert _read_last_ptr(path) == 4


def test_snapshot_vacuum_pinned_reader_retention_contract(spark, tmp_path):
    """A reader pinned to an old version succeeds IFF vacuum retained
    that version's manifest (the documented Delta-style retention
    contract), and idempotence tokens survive vacuum via the cumulative
    txns map in retained manifests."""
    import pytest as _pytest

    from etl_pipeline_with_alpha_vantage_spark.sinks.snapshots import (
        read_snapshot,
        snapshot_commit,
        snapshot_history,
        vacuum,
    )

    path = str(tmp_path / "snap")
    v1 = snapshot_commit(
        spark,
        path,
        spark.range(0, 6).withColumnRenamed("id", "k"),
        txn="app:0",
    )
    snapshot_commit(
        spark,
        path,
        spark.range(6, 9).withColumnRenamed("id", "k"),
        mode="overwrite",
        txn="app:1",
    )
    pinned = read_snapshot(spark, path, v1)  # lazy plan over v1's files

    # keep_last=2 retains v1: the pinned reader still succeeds.
    vacuum(spark, path, keep_last=2)
    assert {r.k for r in pinned.collect()} == set(range(6))

    # keep_last=1 drops v1: a new pin fails cleanly.
    vacuum(spark, path, keep_last=1)
    with _pytest.raises(FileNotFoundError, match="not retained"):
        read_snapshot(spark, path, v1)

    # The already-committed token is still honored after vacuum: a
    # replay carrying app:0 is a no-op even though v1's manifest is gone.
    before = len(snapshot_history(path))
    v_replay = snapshot_commit(
        spark,
        path,
        spark.range(100, 200).withColumnRenamed("id", "k"),
        txn="app:0",
    )
    assert v_replay == v1
    assert len(snapshot_history(path)) == before
    assert {r.k for r in read_snapshot(spark, path).collect()} == {6, 7, 8}


def test_snapshot_vacuum_age_gates_inflight_writer_files(spark, tmp_path):
    """Vacuum must NOT unlink a live writer's staged (not yet
    manifested) data files or fresh .tmp manifests — they are only
    reclaimed past min_age_sec; min_age_sec=0 restores aggressive
    cleanup for exclusive maintenance windows."""
    import os

    from etl_pipeline_with_alpha_vantage_spark.sinks.snapshots import (
        read_snapshot,
        snapshot_commit,
        vacuum,
    )

    path = str(tmp_path / "snap")
    snapshot_commit(
        spark, path, spark.range(0, 4).withColumnRenamed("id", "k")
    )
    # Simulate an in-flight writer: staged parquet with no manifest yet,
    # and a manifest .tmp between mkstemp and os.link.
    staged_dir = os.path.join(path, "data", "w-inflight000000")
    os.makedirs(staged_dir)
    staged = os.path.join(staged_dir, "part-00000.parquet")
    with open(staged, "wb") as f:
        f.write(b"PAR1fake")
    tmp_manifest = os.path.join(path, "_snapshots", "wip123.tmp")
    with open(tmp_manifest, "w") as f:
        f.write("{}")

    vacuum(spark, path, keep_last=1)  # default 1h age gate
    assert os.path.exists(staged), "fresh staged file must survive vacuum"
    assert os.path.exists(tmp_manifest), "fresh .tmp manifest must survive"
    assert {r.k for r in read_snapshot(spark, path).collect()} == set(
        range(4)
    )

    # Exclusive-mode cleanup reclaims both.
    removed = vacuum(spark, path, keep_last=1, min_age_sec=0.0)
    assert removed >= 1
    assert not os.path.exists(staged)
    assert not os.path.exists(tmp_manifest)
    assert {r.k for r in read_snapshot(spark, path).collect()} == set(
        range(4)
    )


def test_snapshot_reads_and_commits_never_list_log_with_pointer(
    spark, tmp_path, monkeypatch
):
    """With a live _last pointer, resolving latest (reads AND the txn
    dedupe check in commits) must never list the _snapshots directory —
    the O(1) contract that keeps the log usable at a million commits.
    Only the fallback path may list."""
    from etl_pipeline_with_alpha_vantage_spark.sinks import snapshots as S

    path = str(tmp_path / "snap")
    S.snapshot_commit(
        spark, path, spark.range(0, 4).withColumnRenamed("id", "k"),
        txn="t:0",
    )
    S.snapshot_commit(
        spark, path, spark.range(4, 6).withColumnRenamed("id", "k"),
        txn="t:1",
    )

    real_listdir = S.os.listdir

    def guarded(p):
        if str(p).rstrip("/").endswith("_snapshots"):
            raise AssertionError(f"log directory listed: {p}")
        return real_listdir(p)

    monkeypatch.setattr(S.os, "listdir", guarded)

    # Latest read: pointer + probe only.
    assert {
        r.k for r in S.read_snapshot(spark, path).collect()
    } == set(range(6))
    # Explicit-version read: single manifest stat.
    assert {
        r.k for r in S.read_snapshot(spark, path, 1).collect()
    } == set(range(4))
    # Idempotent replay: token found via the latest manifest's txns map.
    assert (
        S.snapshot_commit(
            spark,
            path,
            spark.range(99, 100).withColumnRenamed("id", "k"),
            txn="t:0",
        )
        == 1
    )
    # A fresh commit publishes without listing the log either.
    assert (
        S.snapshot_commit(
            spark,
            path,
            spark.range(6, 8).withColumnRenamed("id", "k"),
            txn="t:2",
        )
        == 3
    )
    monkeypatch.setattr(S.os, "listdir", real_listdir)
    assert {
        r.k for r in S.read_snapshot(spark, path).collect()
    } == set(range(8))


def test_snapshot_racing_writers_same_txn_token_commit_exactly_once(
    spark, tmp_path
):
    """Four writers race the SAME txn token (a replayed micro-batch
    retried concurrently) while four more race unique tokens: the
    shared token must commit EXACTLY once — every carrier returns the
    same version — and each unique token exactly once, with a gap-free
    linear history."""
    import threading

    from etl_pipeline_with_alpha_vantage_spark.sinks.snapshots import (
        read_snapshot,
        snapshot_commit,
        snapshot_history,
    )

    path = str(tmp_path / "snap")
    snapshot_commit(
        spark, path, spark.range(0, 2).withColumnRenamed("id", "k")
    )
    barrier = threading.Barrier(8)
    results: dict[str, int | Exception] = {}

    def writer(tag: str, lo: int, txn: str) -> None:
        df = spark.range(lo, lo + 2).withColumnRenamed("id", "k")
        try:
            barrier.wait(timeout=60)
            results[tag] = snapshot_commit(
                spark, path, df, mode="append", txn=txn
            )
        except Exception as exc:  # pragma: no cover - surfaced below
            results[tag] = exc

    threads = [
        threading.Thread(target=writer, args=(f"dup{i}", 100 + 10 * i, "tok:dup"))
        for i in range(4)
    ] + [
        threading.Thread(
            target=writer, args=(f"uniq{i}", 500 + 10 * i, f"tok:{i}")
        )
        for i in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)

    assert all(isinstance(v, int) for v in results.values()), results
    dup_versions = {results[f"dup{i}"] for i in range(4)}
    assert len(dup_versions) == 1, "shared token must resolve to ONE version"
    # 1 base + exactly one dup commit + 4 unique commits = 6 versions,
    # gap-free and linear.
    hist = snapshot_history(path)
    assert [h["version"] for h in hist] == list(range(1, 7))
    assert [h["parent"] for h in hist] == [None, 1, 2, 3, 4, 5]
    rows = {r.k for r in read_snapshot(spark, path).collect()}
    # Exactly one dup payload present...
    dup_payloads = [set(range(100 + 10 * i, 100 + 10 * i + 2)) for i in range(4)]
    present = [p for p in dup_payloads if p <= rows]
    assert len(present) == 1, (rows, dup_payloads)
    # ...and every unique-token payload present.
    for i in range(4):
        assert set(range(500 + 10 * i, 500 + 10 * i + 2)) <= rows


def test_offgrid_twin_builders_preserve_invariants(tmp_path, capsys):
    """The off-grid twin generators are load-bearing gates (the halved
    twin caught the r9 IVF seed-label bug), so their own invariants get
    pinned here, built from the sf0.001 fixture:

    halved twin: only even keys survive; lineitem keeps exactly the rows
    of surviving orders (FK-safe); dimensions copied byte-identically.

    up twin: originals byte-identical as a prefix; clones are ~70% with
    keys strictly beyond the original range; lineitem clones FK-match
    cloned orders; events stay id-monotone in ts (min cloned ts > max
    original ts); parquet PHYSICAL types unchanged everywhere (a Spark
    rewrite would silently retype — the reason the builders are
    pyarrow-only).
    """
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from tools.offgrid_twin import build, build_up

    src = "/root/testdata/sf0.001"
    half = str(tmp_path / "half")
    up = str(tmp_path / "up")
    build(half, src=src)
    build_up(up, src=src)
    capsys.readouterr()

    for name, key in [
        ("orders", "o_orderkey"), ("events", "event_id"),
        ("documents", "doc_id"), ("embeddings", "vec_id"),
    ]:
        orig = pq.read_table(f"{src}/{name}.parquet")
        n = orig.num_rows

        h = pq.read_table(f"{half}/{name}.parquet")
        assert pc.all(pc.equal(pc.bit_wise_and(h[key], 1), 0)).as_py()
        assert h.num_rows == pc.sum(
            pc.cast(pc.equal(pc.bit_wise_and(orig[key], 1), 0), "int64")
        ).as_py()

        u = pq.read_table(f"{up}/{name}.parquet")
        assert u.slice(0, n).equals(orig)  # originals are a byte prefix
        clones = u.slice(n)
        off = pc.max(orig[key]).as_py() + 1
        assert pc.min(clones[key]).as_py() >= off  # new ids beyond range
        assert 0.6 < clones.num_rows / n < 0.8  # ~70% clone fraction
        # physical parquet types preserved bit-for-bit (drop the repr
        # header line — it embeds the object address)
        def _phys(p):
            return str(pq.ParquetFile(p).schema).split("\n", 1)[1]

        assert _phys(f"{up}/{name}.parquet") == _phys(f"{src}/{name}.parquet")

    # FK safety both directions
    ho = pq.read_table(f"{half}/orders.parquet")["o_orderkey"]
    hl = pq.read_table(f"{half}/lineitem.parquet")["l_orderkey"]
    assert pc.all(pc.is_in(hl, ho)).as_py()
    uo = pq.read_table(f"{up}/orders.parquet")["o_orderkey"]
    ul = pq.read_table(f"{up}/lineitem.parquet")["l_orderkey"]
    assert pc.all(pc.is_in(ul, uo)).as_py()

    # events id-monotone-in-ts survives cloning
    ev = pq.read_table(f"{up}/events.parquet").sort_by("event_id")
    ts = ev["ts"].to_pylist()
    assert all(a <= b for a, b in zip(ts, ts[1:]))

    # dimensions copied identically in both twins
    for d in ("nation", "region", "customer", "supplier", "part"):
        orig = pq.read_table(f"{src}/{d}.parquet")
        assert pq.read_table(f"{half}/{d}.parquet").equals(orig)
        assert pq.read_table(f"{up}/{d}.parquet").equals(orig)
