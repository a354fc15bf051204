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

from pyspark.sql import DataFrame, SparkSession
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
