"""Sequence packing for training-data preparation.

The last step of a pre-training corpus pipeline: concatenate documents
into fixed token-budget bins ("packing") so every training sample is a
full context window. The packing rule here is the standard greedy
first-fit-in-order: within a source, walk documents in doc_id order and
start a new bin whenever the running token count would overflow the
budget (an oversized document opens its own bin).

Spark shape: the recurrence is sequential PER SOURCE but embarrassingly
parallel ACROSS sources, so it runs as one grouped ``applyInPandas`` —
one shuffle on the group key, bounded per-group state (a counter and a
running fill), no driver-side work. At 100 TB the group key must be
finer than a whole corpus source (packing runs per (source, shard) —
any sub-key works since bins never cross groups by construction); the
operator takes the group columns as a parameter for exactly that reason.
Reference scope: the reference has no packing (SURVEY.md §2.B); this is
a driver-mandated training-data extension (SURVEY.md §2.C).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

TOKEN_BUDGET = 256


def pack_greedy(
    docs: DataFrame,
    group_cols: list[str],
    order_col: str,
    tokens_col: str,
    budget: int = TOKEN_BUDGET,
) -> DataFrame:
    """Assign each row a ``bin_id`` by greedy first-fit in ``order_col``
    order within each group. Output adds ``bin_id`` to the input columns.
    """
    schema_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields
    )
    out_schema = f"{schema_fields}, bin_id bigint"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        bins, fill, bin_id = [], 0, 0
        first = True
        for toks in pdf[tokens_col]:
            if not first and fill + toks > budget:
                bin_id += 1
                fill = int(toks)
            else:
                fill += int(toks)
                first = False
            bins.append(bin_id)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        return pdf

    return docs.groupBy(*group_cols).applyInPandas(pack, out_schema)


def pack_greedy_blocked(
    docs: DataFrame,
    group_cols: list[str],
    order_col: str,
    tokens_col: str,
    budget: int = TOKEN_BUDGET,
    block_span: int = 4096,
) -> DataFrame:
    """EXACT greedy packing for groups too large for one worker — the
    skew-split escape hatch for ``pack_greedy``'s group-fits-one-worker
    contract, as a two-pass function-composition scan.

    The greedy recurrence's state is just ``(open-bin fill, started)``,
    and every fill above ``budget`` behaves identically (the next doc
    always overflows, since tokens >= 0), so the state domain is the
    FINITE set {fresh, 1..budget+1}. That makes the classic parallel
    prefix-scan over blocks exact and cheap:

    - blocks are order-preserving ``order_col // block_span`` ranges (no
      per-group global sort — a window over the mega-group would be the
      hot partition all over again);
    - pass 1 (distributed): each block simulates ALL budget+2 incoming
      states at once (one numpy-vectorized walk) and emits a single
      summary row: its transition table fill_in -> (new bins, fill_out);
    - driver fold: compose the tables in block order per group — O(#blocks)
      rows collected, a documented-bounded collect like the codebook
      trainers, NEVER the data;
    - pass 2 (distributed): each block replays once from its now-known
      exact incoming state; global bin_id = incoming bin base + local
      overflow count.

    Output and semantics are bit-identical to ``pack_greedy`` (the
    differential + closed-form volume test pins this at 1M rows with a
    ~500k-doc mega-source); per-task memory is bounded by the block, not
    the group.
    """
    import numpy as np  # noqa: PLC0415

    spark = docs.sparkSession
    sentinel = budget + 1  # all fills > budget are equivalent
    # State encoding (table index): 0 = FRESH (group start, nothing
    # placed); i in 1..budget+2 = started with fill = i-1. ``started``
    # must be explicit, NOT inferred from fill > 0: a zero-token document
    # placed right after an overflow yields the legitimate state
    # (started, fill=0), which a fill-only encoding would confuse with
    # fresh — fresh never overflows on its first doc, started-at-0 does
    # when the doc is oversized.
    n_states = budget + 3

    blocked = docs.withColumn(
        "_blk", (F.col(order_col) / F.lit(int(block_span))).cast("long")
    )
    key_cols = [*group_cols, "_blk"]

    summary_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in blocked.select(*key_cols).schema.fields
    ) + ", tbl_bins array<long>, tbl_state array<long>"

    def block_table(pdf: pd.DataFrame) -> pd.DataFrame:
        toks = (
            pdf.sort_values(order_col)[tokens_col]
            .to_numpy()
            .astype(np.int64)
        )
        fill = np.arange(-1, n_states - 1, dtype=np.int64)  # state i: i-1
        bins = np.zeros(n_states, dtype=np.int64)
        started = np.ones(n_states, dtype=bool)
        started[0] = False  # state 0: fresh group start
        fill[0] = 0
        for t in toks:
            over = started & (fill + t > budget)
            bins += over
            fill = np.where(over, t, fill + t)
            started[:] = True
        out_state = np.minimum(fill, sentinel) + 1  # re-encode as index
        out = pdf.iloc[:1][key_cols].copy()
        out["tbl_bins"] = [bins.tolist()]
        out["tbl_state"] = [out_state.tolist()]
        return out

    summaries = (
        blocked.groupBy(*key_cols)
        .applyInPandas(block_table, summary_schema)
        .collect()
    )  # bounded: one row per (group, block), never per document

    by_group: dict = {}
    for r in summaries:
        gkey = tuple(r[c] for c in group_cols)
        by_group.setdefault(gkey, []).append(r)
    incoming = []  # (group..., blk, bin_base, state index)
    for gkey, rows in by_group.items():
        rows.sort(key=lambda r: r["_blk"])
        bin_base, s = 0, 0  # state 0 == fresh
        for r in rows:
            incoming.append((*gkey, r["_blk"], bin_base, s))
            bin_base += r["tbl_bins"][s]
            s = r["tbl_state"][s]
    inc_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in blocked.select(*key_cols).schema.fields
    ) + ", _bin_base long, _state_in long"
    inc_df = spark.createDataFrame(incoming, inc_schema)

    schema_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields
    )
    out_schema = f"{schema_fields}, bin_id bigint"

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        bin_base = int(pdf["_bin_base"].iloc[0])
        state = int(pdf["_state_in"].iloc[0])
        started = state > 0
        fill = max(state - 1, 0)
        bins, bin_id = [], bin_base
        for t in pdf[tokens_col]:
            t = int(t)
            if started and fill + t > budget:
                bin_id += 1
                fill = t
            else:
                fill = fill + t
                started = True
            bins.append(bin_id)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        return pdf.drop(columns=["_blk", "_bin_base", "_state_in"])

    return (
        blocked.join(F.broadcast(inc_df), key_cols)  # bounded: per-block offsets: corpus/BLOCK rows (~1e-4 of docs)
        .groupBy(*key_cols)
        .applyInPandas(replay, out_schema)
    )


_PACK_ORACLE = f"""
WITH RECURSIVE d AS (
    SELECT source, doc_id,
           len(string_split(text, ' ')) AS est_tokens,
           row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
    FROM documents
),
packed AS (
    SELECT source, doc_id, est_tokens, rn,
           0 AS bin_id, est_tokens AS fill
    FROM d WHERE rn = 1
    UNION ALL
    SELECT d.source, d.doc_id, d.est_tokens, d.rn,
           CASE WHEN p.fill + d.est_tokens > {TOKEN_BUDGET}
                THEN p.bin_id + 1 ELSE p.bin_id END,
           CASE WHEN p.fill + d.est_tokens > {TOKEN_BUDGET}
                THEN d.est_tokens ELSE p.fill + d.est_tokens END
    FROM d JOIN packed p ON d.source = p.source AND d.rn = p.rn + 1
)
SELECT doc_id, source, CAST(est_tokens AS BIGINT) AS est_tokens,
       CAST(bin_id AS BIGINT) AS bin_id
FROM packed
"""


@query("pack_sequences", oracle=_PACK_ORACLE)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing of documents into {TOKEN_BUDGET}-token bins
    per source (whitespace token estimate). The per-group recurrence is
    inherently sequential, so it runs in one grouped applyInPandas; the
    DuckDB oracle replays it as a recursive CTE — the sequential-state
    operator is still exactly checkable.
    """
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("est_tokens"),
    )
    return pack_greedy(docs, ["source"], "doc_id", "est_tokens")


@query("pack_sequences_blocked", oracle=_PACK_ORACLE)
def pack_sequences_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pack_sequences through the BLOCKED two-pass scan
    (pack_greedy_blocked) — same greedy semantics, same oracle text,
    different execution path.

    The span derives from the id range so every corpus size yields ~8
    blocks per source: enough that the hash gate exercises real
    multi-block transition-table composition at EVERY SF (and both
    off-grid twins), few enough that grouped-UDF per-callback overhead
    stays bounded (the _cogroup_buckets lesson: 1568 tiny groups cost
    ~4 s of pure framework time per pass at sf0.1, 160 cost ~0.5 s).
    The span provably never changes the OUTPUT — only task shapes — so
    a data-derived value is oracle- and twin-safe.
    """
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("est_tokens"),
    )
    max_id = docs.agg(F.max("doc_id")).collect()[0][0] or 0
    span = max(64, (int(max_id) + 1) // 8)
    return pack_greedy_blocked(
        docs, ["source"], "doc_id", "est_tokens", block_span=span
    )


# --------------------------------------------------------------------------
# Contrastive training batches — two-view positives, in-batch negatives
# --------------------------------------------------------------------------

_CONTRASTIVE_BATCH = 8

_CONTRASTIVE_ORACLE = f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split(text, ' '), x -> x <> '') AS t
    FROM documents WHERE length(text) > 0
),
views AS (
    SELECT doc_id,
           CAST(len(t) // 2 AS BIGINT) AS a_tokens,
           CAST(len(t) - len(t) // 2 AS BIGINT) AS b_tokens
    FROM toks WHERE len(t) >= 2
),
batched AS (
    SELECT *,
           CAST((row_number() OVER (
                     ORDER BY md5('cbatch:' || CAST(doc_id AS VARCHAR)),
                              doc_id) - 1)
                // {_CONTRASTIVE_BATCH} AS BIGINT) AS batch_id
    FROM views
),
full_b AS (
    SELECT batch_id FROM batched GROUP BY 1
    HAVING COUNT(*) = {_CONTRASTIVE_BATCH}
)
SELECT a.batch_id,
       a.doc_id AS anchor_id,
       b.doc_id AS cand_id,
       a.doc_id = b.doc_id AS is_positive,
       a.a_tokens AS anchor_tokens,
       b.b_tokens AS cand_tokens
FROM batched a
JOIN batched b USING (batch_id)
JOIN full_b USING (batch_id)
ORDER BY a.batch_id, anchor_id, cand_id
"""


@query("pack_contrastive_batches", oracle=_CONTRASTIVE_ORACLE)
def pack_contrastive_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training batch construction with IN-BATCH NEGATIVES —
    the standard data layout for retriever/embedding training (SimCSE,
    DPR; public): each document yields two views (front half / back
    half of its token stream — the augmentation seam), documents are
    dealt into batches of {b} by a reproducible md5 shuffle, and within
    a batch every anchor view pairs against every candidate view: its
    own back half as the positive, the other {bm1} back halves as
    negatives. Ragged tail batches are dropped (training wants fixed
    shapes). Emits one row per (anchor, candidate) pair with the
    positive flag and both views' token counts.

    Scale shape: the batch deal is the salted-md5 shuffle-order device
    (reproducible, partitioning-independent); the pair fan-out is an
    equi-join ON batch_id, so each batch's {b}×{b} expansion happens
    where the batch lives — candidate volume is rows×{b}, NEVER rows².
    The full-batch filter is a {b}-row-group aggregate riding the same
    batch_id clustering. At 100 TB batch assembly is one shuffle plus a
    bounded in-batch join, the same shape the distributed trainer's
    data loader needs the pairs in.

    The global row_number over the md5 ordering is the one
    scale caveat — at real scale the deal becomes (shard, md5-rank
    within shard) exactly like shuffle_training_order's documented
    segmented form; semantics per batch are unchanged.
    """
    docs = table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    toks = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    views = docs.select(
        "doc_id",
        (F.size(toks) / 2).cast("long").alias("a_tokens"),
        (F.size(toks) - (F.size(toks) / 2).cast("long"))
        .cast("long")
        .alias("b_tokens"),
    ).filter(F.size(toks) >= 2)
    rn = F.row_number().over(
        Window.orderBy(
            F.md5(F.concat(F.lit("cbatch:"), F.col("doc_id").cast("string"))),
            "doc_id",
        )
    )
    batched = views.select(
        "*", ((rn - 1) / _CONTRASTIVE_BATCH).cast("long").alias("batch_id")
    )
    full_b = (
        batched.groupBy("batch_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") == _CONTRASTIVE_BATCH)
        .select("batch_id")
    )
    a = batched.select(
        "batch_id",
        F.col("doc_id").alias("anchor_id"),
        F.col("a_tokens").alias("anchor_tokens"),
    )
    b = batched.select(
        "batch_id",
        F.col("doc_id").alias("cand_id"),
        F.col("b_tokens").alias("cand_tokens"),
    )
    return (
        a.join(b, "batch_id")
        .join(full_b, "batch_id")
        .select(
            "batch_id",
            "anchor_id",
            "cand_id",
            (F.col("anchor_id") == F.col("cand_id")).alias("is_positive"),
            "anchor_tokens",
            "cand_tokens",
        )
        .orderBy("batch_id", "anchor_id", "cand_id")
    )


pack_contrastive_batches.__doc__ = pack_contrastive_batches.__doc__.format(
    b=_CONTRASTIVE_BATCH, bm1=_CONTRASTIVE_BATCH - 1
)
