"""Tokenizer training: iterative BPE merge learning over the corpus.

The one tokenizer-side step a training-data engine needs beyond token
*counting* (text_bpe_token_estimate): learning the merge table itself.
Classic BPE (Sennrich et al. 2016, public domain algorithm): count
adjacent symbol pairs weighted by word frequency, merge the most
frequent pair, repeat.

Cross-engine exactness is the design problem: the merge step must apply
IDENTICALLY in Spark and DuckDB. Device: symbol sequences live as
space-delimited strings (`' h e l l o '`) and a merge is one
`replace(sym, ' a b ', ' ab ')` — both engines' replace() scans left to
right, non-overlapping, continuing after each replacement, which IS
BPE's greedy merge application. Pair counts are exact integer sums, and
the winning pair tie-breaks (count DESC, pair ASC), so every iteration
picks the same pair on both engines.

Scale shape: iterations run on the VOCABULARY (distinct words × freq),
which is dimension-sized and corpus-size-independent — the corpus is
scanned exactly once to build it. Each iteration is one tiny
aggregation + a 1-row argmax; the per-iteration driver sync (the chosen
pair) is O(1), the same device as the IVF codebook and CC convergence
counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

_BPE_MERGES = 3


def _bpe_oracle() -> str:
    """Chained-CTE replay of the merge iterations."""
    levels = []
    rows = []
    prev = "v0"
    for k in range(1, _BPE_MERGES + 1):
        levels.append(
            f"""p{k} AS (
    SELECT arr[i.i] || ' ' || arr[i.i + 1] AS pair, SUM(freq) AS cnt
    FROM (SELECT freq, string_split(trim(sym), ' ') AS arr FROM {prev}),
         unnest(generate_series(1, len(arr) - 1)) AS i(i)
    GROUP BY 1
),
b{k} AS (SELECT pair, cnt FROM p{k} ORDER BY cnt DESC, pair LIMIT 1),
v{k} AS (
    SELECT word, freq,
           replace(sym, ' ' || b{k}.pair || ' ',
                   ' ' || replace(b{k}.pair, ' ', '') || ' ') AS sym
    FROM {prev}, b{k}
)"""
        )
        rows.append(
            f"SELECT {k} AS iter, b{k}.pair AS pair,"
            f" CAST(b{k}.cnt AS BIGINT) AS n_occurrences,"
            f" (SELECT CAST(SUM(freq * len(string_split(trim(sym), ' ')))"
            f" AS BIGINT) FROM v{k}) AS corpus_tokens_after"
            f" FROM b{k}"
        )
        prev = f"v{k}"
    chained = ",\n".join(levels)
    unioned = "\nUNION ALL\n".join(rows)
    return f"""
WITH vocab AS (
    SELECT tok AS word, COUNT(*) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY 1
),
v0 AS (
    SELECT word, freq,
           ' ' || array_to_string(string_split(word, ''), ' ') || ' ' AS sym
    FROM vocab
),
{chained}
{unioned}
"""


def _adjacent_pairs(arr: F.Column) -> F.Column:
    """Adjacent symbol pairs as 'a b' strings — zip_with over the two
    shifted slices (single evaluation per element; see the minhash
    signature rework for why element_at-style rebinding would not be)."""
    n = F.size(arr)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(arr, 1, n - 1),
            F.slice(arr, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))


@query("bpe_train_merges", oracle=_bpe_oracle())
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first {k} BPE merges from the corpus: per iteration, the
    most frequent adjacent symbol pair (weighted by word frequency)
    merges into one symbol, and the corpus re-tokenizes under the grown
    vocabulary. Returns one row per merge: the learned pair, its count
    at selection time, and the corpus token count after applying it —
    the exact trajectory a tokenizer trainer logs.
    """
    docs = table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            "word",
            "freq",
            F.concat(
                F.lit(" "),
                F.array_join(F.split("word", ""), " "),
                F.lit(" "),
            ).alias("sym"),
        )
    )
    records = []
    for it in range(1, _BPE_MERGES + 1):
        arr = F.split(F.trim(F.col("sym")), " ")
        best = (
            vocab.select("freq", F.explode(_adjacent_pairs(arr)).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pair"))
            .limit(1)
            .collect()[0]
        )
        merged = best.pair.replace(" ", "")
        vocab = vocab.withColumn(
            "sym",
            F.expr(
                "replace(sym, ' {p} ', ' {m} ')".format(
                    p=best.pair, m=merged
                )
            ),
        )
        tokens_after = vocab.agg(
            F.sum(
                F.col("freq") * F.size(F.split(F.trim(F.col("sym")), " "))
            ).alias("t")
        ).collect()[0].t
        records.append((it, best.pair, int(best.cnt), int(tokens_after)))
    return spark.createDataFrame(
        records, "iter int, pair string, n_occurrences bigint, corpus_tokens_after bigint"
    )


bpe_train_merges.__doc__ = bpe_train_merges.__doc__.format(k=_BPE_MERGES)
