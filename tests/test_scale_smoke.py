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
