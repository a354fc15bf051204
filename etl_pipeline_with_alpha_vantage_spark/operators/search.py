"""Keyword-search serving over the document corpus.

The query-side counterpart of the text-analysis indexing passes: a
conjunctive (AND) keyword query answered from term postings with a
tf-based ranking — the minimal shape of a search/retrieval serving path
run against the same corpus the curation operators produce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

_TERMS = ["window", "merge"]
_SEARCH_K = 10

_TERMS_SQL = ", ".join(f"'{t}'" for t in _TERMS)

_SEARCH_ORACLE = f"""
WITH postings AS (
    SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents)
    WHERE tok IN ({_TERMS_SQL})
    GROUP BY 1, 2
),
matched AS (
    SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS score
    FROM postings
    GROUP BY doc_id
    HAVING COUNT(DISTINCT tok) = {len(_TERMS)}
)
SELECT doc_id, score
FROM matched
ORDER BY score DESC, doc_id
LIMIT {_SEARCH_K}
"""


@query("search_keyword_topk", oracle=_SEARCH_ORACLE)
def search_keyword_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive keyword search: documents containing ALL of {terms},
    ranked by total term frequency (deterministic doc_id tie-break),
    top {k} — a boolean-retrieval query answered from postings.

    Scale shape: the term filter applies BEFORE any shuffle (narrow
    explode + filter, so only postings for the query's terms ever leave
    an executor — at 100 TB that is the decisive reduction, same
    blocking idea as the dedup inverted indexes). One doc_id shuffle
    aggregates tf and enforces the AND via a distinct-term count;
    the top-k compiles to TakeOrderedAndProject (per-partition heaps,
    no global sort). A standing index would precompute the postings
    table once and serve many queries from it — this operator is
    exactly the query-time half of that split.
    """
    docs = table(spark, sf_dir, "documents")
    postings = (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("tok")
        )
        .filter(F.col("tok").isin(_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    matched = (
        postings.groupBy("doc_id")
        .agg(
            F.sum("tf").alias("score"),
            F.count_distinct("tok").alias("n_terms"),
        )
        .filter(F.col("n_terms") == len(_TERMS))
        .select("doc_id", "score")
    )
    return matched.orderBy(F.col("score").desc(), "doc_id").limit(_SEARCH_K)


search_keyword_topk.__doc__ = search_keyword_topk.__doc__.format(
    terms=_TERMS, k=_SEARCH_K
)


# --------------------------------------------------------------------------
# Diversity-capped top-k — at most N results per source
# --------------------------------------------------------------------------

_DIVERSE_PER_SOURCE = 2
_DIVERSE_K = 10

_DIVERSE_ORACLE = f"""
WITH scored AS (
    SELECT d.doc_id, d.source, CAST(COUNT(*) AS BIGINT) AS score
    FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
          FROM documents) d
    WHERE d.tok = 'window'
    GROUP BY 1, 2
),
capped AS (
    SELECT *, row_number() OVER (PARTITION BY source
                                 ORDER BY score DESC, doc_id) AS src_rank
    FROM scored
)
SELECT doc_id, source, score, CAST(src_rank AS INT) AS src_rank
FROM capped
WHERE src_rank <= {_DIVERSE_PER_SOURCE}
ORDER BY score DESC, doc_id
LIMIT {_DIVERSE_K}
"""


@query("search_diverse_topk", oracle=_DIVERSE_ORACLE)
def search_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-capped retrieval: the top {k} documents for a term by
    tf score, with AT MOST {c} results per source — the constraint
    every search/retrieval layer applies so one domain cannot fill the
    page. Two-stage shape: a per-source window rank prunes each source
    to its best {c} candidates FIRST (the cap commutes with the global
    ordering because ranks follow the same (score, doc_id) order), and
    only the pruned sources×{c} survivors enter the global top-k —
    which therefore compiles to TakeOrderedAndProject over a bounded
    set rather than ranking the full corpus.
    """
    docs = table(spark, sf_dir, "documents")
    scored = (
        docs.select(
            "doc_id", "source", F.explode(F.split("text", " ")).alias("tok")
        )
        .filter(F.col("tok") == "window")
        .groupBy("doc_id", "source")
        .agg(F.count(F.lit(1)).alias("score"))
    )
    src_rank = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.col("score").desc(), F.col("doc_id")
        )
    )
    return (
        scored.withColumn("src_rank", src_rank)
        .filter(F.col("src_rank") <= _DIVERSE_PER_SOURCE)
        .select("doc_id", "source", "score", F.col("src_rank").cast("int").alias("src_rank"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(_DIVERSE_K)
    )


search_diverse_topk.__doc__ = search_diverse_topk.__doc__.format(
    k=_DIVERSE_K, c=_DIVERSE_PER_SOURCE
)
