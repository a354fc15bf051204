"""Tokenizer training: iterative BPE merge learning over the corpus.

The one tokenizer-side step a training-data engine needs beyond token
*counting* (text_bpe_token_estimate): learning the merge table itself.
Classic BPE (Sennrich et al. 2016, public domain algorithm): count
adjacent symbol pairs weighted by word frequency, merge the most
frequent pair, repeat.

Cross-engine exactness is the design problem: the merge step must apply
IDENTICALLY in Spark and DuckDB. Device: symbol sequences live as
space-delimited strings (`' h e l l o '`) and a merge is a LEFT FOLD
over the token array — pop-and-merge when the accumulator's last token
is p1 and the next token is p2, else append. The fold is exactly BPE's
greedy left-to-right non-overlapping pass: the merged token p1p2 can
never equal p1 (p2 is nonempty), so a token merged this pass can't
immediately re-merge, which is the non-overlap rule with no extra
state. (Round-8 rework: the previous `replace(sym, ' a b ', ' ab ')`
device consumed the shared delimiter, silently skipping BACK-TO-BACK
occurrences — canonical BPE turns ` a b a b ` into ` ab ab `, replace
left ` ab a b `.) Spark runs it as F.aggregate over the split array;
DuckDB as list_reduce with a padded-string accumulator. Pair counts are
exact integer sums, and the winning pair tie-breaks (count DESC, pair
ASC), so every iteration picks the same pair on both engines.

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

from ..catalog import register_derived_cache, table
from ..registry import query

_BPE_MERGES = 3


def _sql_fold(sym_expr: str, pair_expr: str) -> str:
    """DuckDB twin of _apply_merge: the canonical BPE merge fold as a
    list_reduce with a padded-string accumulator (' tok1 tok2 '). The
    prepended ' ' seeds the accumulator (list_reduce folds from the
    first element), and ends_with/substr pop the last token when it is
    p1 and the incoming token is p2."""
    p1 = f"string_split({pair_expr}, ' ')[1]"
    p2 = f"string_split({pair_expr}, ' ')[2]"
    return (
        f"list_reduce(list_prepend(' ', string_split(trim({sym_expr}), ' ')),"
        f" (acc, x) -> CASE"
        f" WHEN x = {p2} AND ends_with(acc, ' ' || {p1} || ' ')"
        f" THEN substr(acc, 1, len(acc) - len({p1}) - 1)"
        f" || replace({pair_expr}, ' ', '') || ' '"
        f" ELSE acc || x || ' ' END)"
    )


def _merge_chain_ctes() -> str:
    """The shared vocab→v0→(p_k, b_k, v_k)* CTE chain that replays merge
    learning in DuckDB — used by both the trainer oracle (which reads the
    per-iteration b_k rows) and the encoder oracle (which reads only the
    final learned pairs b_1..b_K)."""
    levels = []
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
    SELECT word, freq, {_sql_fold('sym', f'b{k}.pair')} AS sym
    FROM {prev}, b{k}
)"""
        )
        prev = f"v{k}"
    chained = ",\n".join(levels)
    return f"""vocab AS (
    SELECT tok AS word, COUNT(*) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY 1
),
v0 AS (
    SELECT word, freq,
           ' ' || array_to_string(string_split(word, ''), ' ') || ' ' AS sym
    FROM vocab
),
{chained}"""


def _bpe_oracle() -> str:
    """Chained-CTE replay of the merge iterations."""
    rows = []
    for k in range(1, _BPE_MERGES + 1):
        rows.append(
            f"SELECT {k} AS iter, b{k}.pair AS pair,"
            f" CAST(b{k}.cnt AS BIGINT) AS n_occurrences,"
            f" (SELECT CAST(SUM(freq * len(string_split(trim(sym), ' ')))"
            f" AS BIGINT) FROM v{k}) AS corpus_tokens_after"
            f" FROM b{k}"
        )
    unioned = "\nUNION ALL\n".join(rows)
    return f"""
WITH {_merge_chain_ctes()}
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


def _learn_merges(spark: SparkSession, sf_dir: str):
    """Merge-learning over the warehouse documents table."""
    return learn_merges_from(table(spark, sf_dir, "documents"))


def learn_merges_from(docs: DataFrame):
    """Run the merge-learning loop; yields (pair, count, vocab_after) per
    iteration. The vocabulary is dimension-sized (distinct words), so each
    iteration is one tiny aggregation plus a 1-row argmax collect — the
    same O(1)-per-sweep driver sync as the IVF codebook and CC
    convergence counts. Takes any DataFrame with a ``text`` column so the
    volume suite can drive the identical kernel on generated corpora.

    The base vocabulary is EAGERLY checkpointed: each iteration fires at
    least one action (the argmax collect, plus any caller aggregation
    over the yielded vocab), and without lineage truncation every one of
    those re-scans the corpus — ~7 full scans for 3 merges. With the
    checkpoint the corpus is scanned exactly once (the documented scale
    contract) and iterations recompute only vocabulary-sized folds."""
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
        .localCheckpoint(eager=True)
    )
    for _ in range(_BPE_MERGES):
        arr = F.split(F.trim(F.col("sym")), " ")
        best = (
            vocab.select("freq", F.explode(_adjacent_pairs(arr)).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pair"))
            .limit(1)
            .collect()[0]
        )
        vocab = vocab.withColumn(
            "sym", _apply_merge(F.col("sym"), best.pair)
        )
        yield best.pair, int(best.cnt), vocab


def _apply_merge(sym: F.Column, pair: str) -> F.Column:
    """One greedy BPE merge application as the canonical left fold (see
    module note): pop-and-merge when (last(acc), x) == (p1, p2), else
    append. Exactly Sennrich's non-overlapping left-to-right pass —
    ` a b a b ` → ` ab ab `, ` c c c c c c ` → ` cc cc cc ` — because
    the merged token p1p2 ≠ p1 can never chain within the pass. The
    per-word cost is O(tokens²) array copying, bounded by word length;
    the fold stays whole-stage-codegen (no Python)."""
    p1, p2 = pair.split(" ")
    merged = pair.replace(" ", "")
    folded = F.aggregate(
        F.split(F.trim(sym), " "),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(p1))
            & (x == F.lit(p2)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return F.concat(F.lit(" "), F.array_join(folded, " "), F.lit(" "))


@query("bpe_train_merges", oracle=_bpe_oracle())
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first {k} BPE merges from the corpus: per iteration, the
    most frequent adjacent symbol pair (weighted by word frequency)
    merges into one symbol, and the corpus re-tokenizes under the grown
    vocabulary. Returns one row per merge: the learned pair, its count
    at selection time, and the corpus token count after applying it —
    the exact trajectory a tokenizer trainer logs.
    """
    records = []
    for it, (pair, cnt, vocab) in enumerate(
        _learn_merges(spark, sf_dir), start=1
    ):
        tokens_after = vocab.agg(
            F.sum(
                F.col("freq") * F.size(F.split(F.trim(F.col("sym")), " "))
            ).alias("t")
        ).collect()[0].t
        records.append((it, pair, cnt, int(tokens_after)))
    return spark.createDataFrame(
        records, "iter int, pair string, n_occurrences bigint, corpus_tokens_after bigint"
    )


bpe_train_merges.__doc__ = bpe_train_merges.__doc__.format(k=_BPE_MERGES)


# Learned merge tables are deterministic functions of the corpus file, so
# the encoder memoizes them on (sf_dir, mtime_ns, size) — the IVF-codebook
# cache-key device (similarity.py): a same-second in-place rewrite still
# changes size or mtime_ns, so a stale merge table is never served.
_MERGES_CACHE: dict[tuple[str, int, int], list[str]] = register_derived_cache({})


def _learned_pairs_cached(spark: SparkSession, sf_dir: str) -> list[str]:
    import os

    st = os.stat(os.path.join(sf_dir, "documents.parquet"))
    key = (sf_dir, st.st_mtime_ns, st.st_size)
    if key not in _MERGES_CACHE:
        _MERGES_CACHE[key] = [p for p, _, _ in _learn_merges(spark, sf_dir)]
    return _MERGES_CACHE[key]


def _bpe_encode_oracle() -> str:
    """Learned pairs replayed via the shared CTE chain, then applied to
    every word occurrence in the corpus with the same chained merge
    fold the trainer uses."""
    sym = "' ' || array_to_string(string_split(word, ''), ' ') || ' '"
    enc = sym
    for k in range(1, _BPE_MERGES + 1):
        enc = _sql_fold(enc, f"b{k}.pair")
    froms = ", ".join(f"b{k}" for k in range(1, _BPE_MERGES + 1))
    return f"""
WITH {_merge_chain_ctes()},
words AS (
    SELECT d.source, d.doc_id,
           unnest(string_split(d.text, ' ')) AS word
    FROM documents d
),
enc AS (
    SELECT source, doc_id,
           len(string_split(trim({sym}), ' ')) AS chars,
           len(string_split(trim({enc}), ' ')) AS toks
    FROM words, {froms}
)
SELECT source,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(chars) AS BIGINT) AS tokens_char,
       CAST(SUM(toks) AS BIGINT) AS tokens_bpe,
       CAST(SUM(chars) - SUM(toks) AS BIGINT) AS tokens_saved
FROM enc
GROUP BY source
ORDER BY source
"""


@query("bpe_apply_encode", oracle=_bpe_encode_oracle())
def bpe_apply_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned BPE merge table to the whole corpus — the
    encode half of the tokenizer loop (bpe_train_merges is the train
    half). Per source: documents, word occurrences, token counts before
    (pure characters) and after the merges, and the tokens saved.

    Scale shape: the merge table is a tiny driver-side list compiled
    into a chained column expression, and the merge fold (O(len²) per
    word since round-8's canonical rework) runs ONCE PER DISTINCT WORD,
    never per occurrence — the dictionary-encode pattern: occurrences
    collapse to (source, word, n_occ) in one partial-aggregated
    shuffle, the vocabulary (distinct words — bounded and tiny relative
    to the corpus) is encoded and broadcast back, and per-source totals
    weight the per-word counts by n_occ. At 100 TB the corpus-sized
    stream crosses exactly one combine-reduced exchange; the fold cost
    scales with vocabulary, not corpus. Both token counts derive from
    the same symbol-string device (split(trim(sym))) proven
    cross-engine exact by the trainer's parity, so empty words from
    double spaces can't skew one engine only.
    """
    pairs = _learned_pairs_cached(spark, sf_dir)
    docs = table(spark, sf_dir, "documents")
    words = docs.select(
        "source",
        "doc_id",
        F.explode(F.split("text", " ")).alias("word"),
    )
    occ = words.groupBy("source", "word").agg(
        F.count(F.lit(1)).alias("n_occ")
    )
    # n_docs per source: every doc yields >= 1 word (split('') -> ['']),
    # so distinct doc_id over words == docs — counted once here, cheap.
    ndocs = words.groupBy("source").agg(
        F.count_distinct("doc_id").alias("n_docs")
    )
    sym = F.concat(
        F.lit(" "), F.array_join(F.split("word", ""), " "), F.lit(" ")
    )
    enc = sym
    for p in pairs:
        enc = _apply_merge(enc, p)
    toks = lambda c: F.size(F.split(F.trim(c), " "))  # noqa: E731
    vocab = (
        occ.select("word")
        .distinct()
        .select("word", toks(sym).alias("chars"), toks(enc).alias("toks"))
    )
    return (
        occ.join(F.broadcast(vocab), "word")  # bounded: BPE vocab: alphabet + n_merges (config-capped)
        .groupBy("source")
        .agg(
            F.sum("n_occ").alias("n_words"),
            F.sum(F.col("chars") * F.col("n_occ"))
            .cast("long")
            .alias("tokens_char"),
            F.sum(F.col("toks") * F.col("n_occ"))
            .cast("long")
            .alias("tokens_bpe"),
            F.sum((F.col("chars") - F.col("toks")) * F.col("n_occ"))
            .cast("long")
            .alias("tokens_saved"),
        )
        .join(ndocs, "source")
        .select(
            "source",
            "n_docs",
            "n_words",
            "tokens_char",
            "tokens_bpe",
            "tokens_saved",
        )
        .orderBy("source")
    )
