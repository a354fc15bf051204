"""Batched differential fuzz for the round-9 blocked (skew-split) kernels.

Same discipline as tests/test_ks_fuzz.py: hundreds of random cases ride
ONE Spark action per side, and the blocked execution path is compared
against the plain sequential/per-cell kernel it must reproduce
bit-for-bit. The packing fuzz deliberately includes ZERO-token documents
— the case that forced the explicit (started, fill) state encoding: a
0-token doc placed right after an overflow yields (started, fill=0),
which a fill-only table encoding would confuse with a fresh group start.
"""

from __future__ import annotations

import random

import pandas as pd

from pyspark.sql import functions as F

from etl_pipeline_with_alpha_vantage_spark.operators.packing import (
    TOKEN_BUDGET,
    pack_greedy,
    pack_greedy_blocked,
)
from etl_pipeline_with_alpha_vantage_spark.operators.similarity import (
    _PAIR_SCHEMA,
    _SEMDEDUP_TAU,
    _semdedup_cell_pairs,
    semdedup_prune,
)


def test_pack_blocked_fuzz_equals_sequential(spark):
    """300 random groups × (sparse ids, zero/oversized/budget-exact
    tokens) through pack_greedy_blocked(block_span=8) — tiny blocks, so
    nearly every group crosses several block boundaries — must equal
    pack_greedy row-for-row."""
    rng = random.Random(0xB10C)
    rows = []
    for g in range(300):
        n = rng.randint(1, 40)
        ids = rng.sample(range(0, 200), n)  # sparse → empty blocks exist
        for i in sorted(ids):
            roll = rng.random()
            if roll < 0.08:
                t = 0  # the state-encoding trap
            elif roll < 0.16:
                t = TOKEN_BUDGET + rng.randint(1, 300)  # oversized
            elif roll < 0.24:
                t = TOKEN_BUDGET  # budget-exact fill
            else:
                t = rng.randint(1, TOKEN_BUDGET // 2)
            rows.append((g, i, t))
    docs = spark.createDataFrame(
        rows, "grp long, doc_id long, est_tokens long"
    )
    blocked = pack_greedy_blocked(
        docs, ["grp"], "doc_id", "est_tokens", block_span=8
    )
    seq = pack_greedy(docs, ["grp"], "doc_id", "est_tokens")
    diff = (
        blocked.alias("b")
        .join(seq.alias("s"), ["grp", "doc_id"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("b.bin_id") != F.col("s.bin_id")).cast("long")
            ).alias("bad"),
        )
        .collect()[0]
    )
    assert diff.n == len(rows)
    assert diff.bad == 0


def test_semdedup_blocked_fuzz_equals_percell(spark):
    """200 random cells of random-real embeddings (not the one-hot
    closed-form corpus) through the blocked pair kernel at max_rows=3 —
    every cell of >3 vectors splits into cross-bucket BLAS blocks — must
    reproduce the plain per-cell kernel's prune verdicts exactly,
    including the near-threshold rounding path both share."""
    rng = random.Random(0x5EED)
    rows = []
    vec_id = 0
    for cell in range(200):
        for _ in range(rng.randint(1, 12)):
            emb = [rng.uniform(-1.0, 1.0) for _ in range(8)]
            rows.append((vec_id, cell, emb))
            vec_id += 1
    emb = spark.createDataFrame(
        rows, "vec_id long, cell long, emb array<double>"
    )
    blocked = semdedup_prune(emb, max_rows=3)

    pairs = emb.groupBy("cell").applyInPandas(
        lambda pdf: _semdedup_cell_pairs(pdf), _PAIR_SCHEMA
    )
    close = (
        pairs.filter(F.round("cos", 6) >= _SEMDEDUP_TAU)
        .groupBy(F.col("vec_b").alias("vec_id"))
        .agg(F.count(F.lit(1)).alias("n_closer"))
    )
    plain = (
        emb.select("vec_id", F.col("cell").cast("long").alias("cell"))
        .join(close, "vec_id", "left")
        .select(
            "vec_id",
            "cell",
            F.coalesce("n_closer", F.lit(0)).cast("long").alias("n_closer_dups"),
        )
    )
    diff = (
        blocked.alias("b")
        .join(plain.alias("p"), ["vec_id", "cell"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (
                    F.col("b.n_closer_dups") != F.col("p.n_closer_dups")
                ).cast("long")
            ).alias("bad"),
        )
        .collect()[0]
    )
    assert diff.n == vec_id
    assert diff.bad == 0
