"""User-defined function surface (SURVEY.md X20).

The engine's position: UDFs are the escape hatch, not the default — every
other operator module is pure built-in expressions. When Python is
genuinely needed, it enters through Arrow-vectorized forms only:

- scalar ``@pandas_udf``      — columnar batches, zero per-row overhead
- grouped ``applyInPandas``   — per-group pandas frames (UDAF/UDTF-ish)
- ``mapInPandas``             — whole-partition streaming batches
  (see operators.multimodal for the decode pipeline)

Both queries here have exact SQL oracles, proving UDF results can hold
the same cross-engine determinism bar as built-ins (min/max arithmetic
only — no order-dependent float accumulation inside the UDF).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..catalog import table
from ..registry import query

# --------------------------------------------------------------------------
# X20a — scalar pandas UDF (vectorized token statistics)
# --------------------------------------------------------------------------

_SCALAR_UDF_ORACLE = """
SELECT
    doc_id,
    CAST(len(string_split(text, ' ')) AS BIGINT)       AS n_tokens,
    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
                                                       AS n_unique,
    CAST(list_max([length(t) for t in string_split(text, ' ')]) AS BIGINT)
                                                       AS longest_token
FROM documents
WHERE doc_id % 5 = 0
"""


@pandas_udf(LongType())
def _tokens_count(texts: pd.Series) -> pd.Series:
    return texts.str.split(" ").map(len).astype("int64")


@pandas_udf(LongType())
def _unique_tokens(texts: pd.Series) -> pd.Series:
    return texts.str.split(" ").map(lambda t: len(set(t))).astype("int64")


@pandas_udf(LongType())
def _longest_token(texts: pd.Series) -> pd.Series:
    return (
        texts.str.split(" ").map(lambda t: max(len(w) for w in t)).astype("int64")
    )


@query("udf_scalar_tokens", oracle=_SCALAR_UDF_ORACLE)
def udf_scalar_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X20: scalar pandas UDFs (Arrow batches) computing token stats —
    integer outputs, so exact against the SQL oracle. The same stats are
    also expressible as built-ins (operators.text); this query exists to
    exercise the vectorized-Python path itself."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return docs.select(
        "doc_id",
        _tokens_count("text").alias("n_tokens"),
        _unique_tokens("text").alias("n_unique"),
        _longest_token("text").alias("longest_token"),
    )


# --------------------------------------------------------------------------
# X20b — grouped applyInPandas (per-group min-max scaling)
# --------------------------------------------------------------------------

_GROUPED_UDF_ORACLE = """
SELECT
    event_id,
    event_type,
    value,
    CASE WHEN MAX(value) OVER w = MIN(value) OVER w THEN 0.5
         ELSE (value - MIN(value) OVER w)
              / (MAX(value) OVER w - MIN(value) OVER w)
    END AS scaled
FROM events
WINDOW w AS (PARTITION BY event_type)
"""

_SCALE_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("scaled", DoubleType()),
    ]
)


def _minmax_scale(pdf: pd.DataFrame) -> pd.DataFrame:
    vmin = pdf["value"].min()
    vmax = pdf["value"].max()
    # min/max are exact (no accumulation); one subtract + divide per row
    # is bit-reproducible against the SQL window formulation.
    scaled = (
        pd.Series(0.5, index=pdf.index)
        if vmax == vmin
        else (pdf["value"] - vmin) / (vmax - vmin)
    )
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "event_type": pdf["event_type"],
            "value": pdf["value"],
            "scaled": scaled,
        }
    )


@query("udf_grouped_scale", oracle=_GROUPED_UDF_ORACLE)
def udf_grouped_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X20: applyInPandas per event_type — min-max scaling where the whole
    group must be seen before any row is emitted (a UDAF+UDTF hybrid no
    scalar UDF can express). One shuffle on the group key; each group
    becomes one Arrow batch in one Python worker.

    Scale contract: a GROUP must fit one worker's memory — fine for
    bounded groups (per-symbol series, per-day partitions), the
    anti-pattern for per-event_type groups at 100 TB. There the
    production form is two-phase relational: the per-group min/max is a
    broadcast-sized aggregate and the scale itself a narrow projection
    (exactly this query's oracle window). This operator exists for the
    cases where the per-group pass genuinely isn't relational (model
    scoring over a whole aligned group, order-dependent imputation);
    when it is, prefer the window — and when groups are fine-grained
    and numerous, hash-bucket the key first (udf_cogrouped_asof's
    _cogroup_buckets discipline) so callbacks amortize."""
    ev = table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return ev.groupBy("event_type").applyInPandas(_minmax_scale, _SCALE_SCHEMA)


# --------------------------------------------------------------------------
# X20c — mapInPandas partition-wise transform with state threading
# --------------------------------------------------------------------------

_MAPINPANDAS_ORACLE = """
SELECT
    o_orderkey,
    o_totalprice,
    CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
    CASE WHEN o_totalprice >= 150000 THEN 'big' ELSE 'small' END AS size_class
FROM orders
WHERE o_orderkey % 11 = 0
"""

_ENRICH_SCHEMA = StructType(
    [
        StructField("o_orderkey", LongType()),
        StructField("o_totalprice", DoubleType()),
        StructField("price_cents", LongType()),
        StructField("size_class", StringType()),
    ]
)


def _enrich(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = pd.DataFrame(
            {
                "o_orderkey": pdf["o_orderkey"],
                "o_totalprice": pdf["o_totalprice"],
                "price_cents": (pdf["o_totalprice"] * 100).round().astype("int64"),
                "size_class": pd.Series(
                    ["big" if v >= 150000 else "small" for v in pdf["o_totalprice"]],
                    index=pdf.index,
                ),
            }
        )
        yield out


@query("udf_mapinpandas_enrich", oracle=_MAPINPANDAS_ORACLE)
def udf_mapinpandas_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X20: mapInPandas — partition-local batch transform (no shuffle at
    all); the iterator form lets an implementation hold per-partition
    state (model handles, connection pools) across batches."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 0)
    return o.select("o_orderkey", "o_totalprice").mapInPandas(
        _enrich, _ENRICH_SCHEMA
    )


# --------------------------------------------------------------------------
# X20d — cogrouped applyInPandas (per-key as-of alignment)
# --------------------------------------------------------------------------

_COGROUP_SCHEMA = (
    "user_id long, purchase_id long, purchase_ts timestamp, "
    "asof_click_id long, asof_click_ts timestamp"
)


# Cogroup key is a HASHED USER BUCKET, not the raw user: one pandas
# callback per user means per-group Python overhead dominates when users
# are numerous and small (measured 10 s at sf0.1 vs 1 s bucketed).
# merge_asof(by=user) inside each bucket keeps the per-user semantics.
#
# Bucket COUNT (round-8 retune): per-callback overhead (Arrow transfer +
# pandas setup) dominates until batches are large, so fewer, fatter
# buckets win as long as every core stays busy — measured at sf0.1:
# 32 buckets 0.73 s, 64 0.93 s, 128 1.47 s, 256 2.19 s, 512 3.86 s.
# Default to the session's parallelism (full cores, minimum callbacks);
# at 100 TB size it UP to ~rows/target_batch so a bucket's two sides fit
# executor memory — the count changes results not at all (any hash
# split preserves per-user as-of exactness via merge_asof's by=).
# NOTE: defaultParallelism makes the PLAN (and bench floors) vary with
# host core count — results are provably invariant, but readings from
# different machines aren't comparable (BENCH_BASELINE documents the
# 32-core reference). sparkContext is also absent under Spark Connect,
# so fall back to the session's shuffle-partition conf there.
def _cogroup_buckets(spark: SparkSession) -> int:
    try:
        n = spark.sparkContext.defaultParallelism
    except Exception:  # Spark Connect: no sparkContext on the client
        n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    return max(n, 8)

_COGROUP_COLS = [
    "user_id", "purchase_id", "purchase_ts", "asof_click_id", "asof_click_ts"
]


def _asof_per_bucket(
    purchases: pd.DataFrame, clicks: pd.DataFrame
) -> pd.DataFrame:
    """merge_asof within one user-bucket's cogroup: latest click ≤ each
    purchase, aligned per user via merge_asof's `by=` grouping."""
    p = purchases.sort_values("purchase_ts", kind="mergesort")
    if clicks.empty:
        out = p.copy()
        out["asof_click_id"] = pd.array([None] * len(p), dtype="Int64")
        out["asof_click_ts"] = pd.NaT
        return out[_COGROUP_COLS]
    c = clicks.sort_values("click_ts", kind="mergesort").rename(
        columns={"c_user_id": "user_id"}
    )
    merged = pd.merge_asof(
        p,
        c[["user_id", "click_ts", "click_id"]],
        left_on="purchase_ts",
        right_on="click_ts",
        by="user_id",
        direction="backward",
    )
    merged = merged.rename(
        columns={"click_id": "asof_click_id", "click_ts": "asof_click_ts"}
    )
    merged["asof_click_id"] = merged["asof_click_id"].astype("Int64")
    return merged[_COGROUP_COLS]


_COGROUP_ORACLE = """
SELECT
    p.user_id,
    p.event_id  AS purchase_id,
    p.ts        AS purchase_ts,
    c.event_id  AS asof_click_id,
    c.ts        AS asof_click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND c.ts <= p.ts
"""


@query("udf_cogrouped_asof", oracle=_COGROUP_ORACLE)
def udf_cogrouped_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X20/X5: cogrouped applyInPandas — both sides shuffle once on a
    hashed user bucket, then each bucket's (purchases, clicks) pair
    lands in ONE pandas callback running merge_asof with per-user
    alignment (`by="user_id"`; latest click ≤ each purchase). This is
    the escape hatch for per-key logic Spark can't express relationally
    (model scoring over aligned series, custom imputation, …); for the
    plain as-of itself the pure-DataFrame form in operators/asof.py is
    preferred (no Python boundary). Oracle: DuckDB's native ASOF LEFT
    JOIN.

    Scale shape: cogrouping on the raw user key would cross the Python
    boundary once PER USER — measured 10× slower at sf0.1 and worse at
    scale. Bucketing to parallelism-many hash groups (see
    _cogroup_buckets) amortizes the Arrow transfer and pandas setup
    over ~users/buckets users per callback while the `by=` grouping
    keeps per-user as-of exactness; bucket count is the
    parallelism/batch-size knob at 100 TB (size UP so a bucket fits
    executor memory — any count gives identical results).
    """
    ev = table(spark, sf_dir, "events")
    bucket = F.pmod(F.xxhash64("user_id"), F.lit(_cogroup_buckets(spark)))
    p = ev.filter(F.col("event_type") == "purchase").select(
        bucket.alias("bucket"),
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        bucket.alias("c_bucket"),
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    return (
        p.groupBy("bucket")
        .cogroup(c.groupBy("c_bucket"))
        .applyInPandas(_asof_per_bucket, _COGROUP_SCHEMA)
    )


# --------------------------------------------------------------------------
# X20e — Python UDTF (table function) driven through a LATERAL join
# --------------------------------------------------------------------------

_UDTF_ORACLE = """
WITH grams AS (
    SELECT d.source,
           arr[i.i] || ' ' || arr[i.i + 1] || ' ' || arr[i.i + 2] AS trigram
    FROM (SELECT source, string_split(text, ' ') AS arr FROM documents) d,
         unnest(generate_series(1, len(arr) - 2)) AS i(i)
)
SELECT source,
       CAST(COUNT(*) AS BIGINT)                 AS n_trigrams,
       CAST(COUNT(DISTINCT trigram) AS BIGINT)  AS n_unique_trigrams
FROM grams
GROUP BY source
ORDER BY source
"""


@query("udtf_lateral_ngrams", oracle=_UDTF_ORACLE)
def udtf_lateral_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 `@udtf`) correlated through a SQL LATERAL
    join: each document row fans out to its word trigrams via a
    user-defined TABLE function — the row-to-rows shape (one input, a
    data-dependent number of outputs) that scalar UDFs cannot express
    and that predates-Spark-3.4 code faked with explode-over-udf-array.
    Per source: trigram occurrences and distinct trigrams.

    Scale shape: the UDTF evaluates per-partition (no shuffle to reach
    it; the LATERAL correlation is row-local), then one partial-
    aggregated shuffle lands the per-source counts. The plan carries a
    Python evaluation node by DESIGN — this is the one query whose
    point is the Python table-function surface; every narrow transform
    around it stays codegen. The oracle replays the fan-out with pure
    SQL unnest, proving the UDTF's row multiplication is exact.
    """
    from pyspark.sql.functions import udtf

    from ..catalog import _session_cache

    docs = table(spark, sf_dir, "documents")
    # Memoize the function registration and the view binding per session
    # (same id-keyed discipline as register_views — r12 optimization
    # round, guide §5 driver work): re-registering the UDTF pickles the
    # class and round-trips py4j on EVERY build, and the catalog WARNs
    # `trigrams_udtf replaced a previously registered function` each
    # time. The view key is the memoized table frame's identity, so a
    # switched sf_dir or rewritten fixture re-binds automatically.
    cache = _session_cache(spark)
    if "_udtf_trigrams" not in cache:

        @udtf(returnType="trigram: string")
        class Trigrams:
            def eval(self, text: str):
                toks = text.split(" ")
                for j in range(len(toks) - 2):
                    yield (" ".join(toks[j : j + 3]),)

        spark.udtf.register("trigrams_udtf", Trigrams)
        cache["_udtf_trigrams"] = True
    # ALWAYS re-bind the view (one cheap RPC — the `monthly` lesson from
    # _mk_monthly_view): an id-keyed binding memo does not self-heal if a
    # foreign caller rebinds the shared name between builds. The
    # expensive part (pickling + registering the UDTF class) stays
    # memoized above.
    docs.createOrReplaceTempView("udtf_docs_v")
    return spark.sql(
        """
        SELECT source,
               COUNT(*)               AS n_trigrams,
               COUNT(DISTINCT trigram) AS n_unique_trigrams
        FROM udtf_docs_v, LATERAL trigrams_udtf(text)
        GROUP BY source
        ORDER BY source
        """
    )


# --------------------------------------------------------------------------
# X20b' — salted two-phase grouped UDF (the mega-group escape hatch)
# --------------------------------------------------------------------------

_SCALE_SALT = 8

_PARTIAL_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("salt", LongType()),
        StructField("pmin", DoubleType()),
        StructField("pmax", DoubleType()),
    ]
)


def _minmax_partial(pdf: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "salt": [int(pdf["salt"].iloc[0])],
            "pmin": [pdf["value"].min()],
            "pmax": [pdf["value"].max()],
        }
    )


def _apply_scale_merged(pdf: pd.DataFrame) -> pd.DataFrame:
    vmin = pdf["vmin"].iloc[0]
    vmax = pdf["vmax"].iloc[0]
    scaled = (
        pd.Series(0.5, index=pdf.index)
        if vmax == vmin
        else (pdf["value"] - vmin) / (vmax - vmin)
    )
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "event_type": pdf["event_type"],
            "value": pdf["value"],
            "scaled": scaled,
        }
    )


def grouped_minmax_scale_salted(
    ev: DataFrame, n_salt: int = _SCALE_SALT
) -> DataFrame:
    """Salt-and-merge twin of udf_grouped_scale: the escape hatch for the
    group-fits-one-worker contract every applyInPandas kernel carries.

    Phase 1 computes per-(group, salt) partial min/max through bounded
    Python callbacks (each sees ~1/n_salt of a group, never the whole
    group); the partials merge relationally (min of mins / max of
    maxes — the state is a monoid, which is WHY this kernel splits);
    phase 2 re-applies the per-row transform under the same salted key
    with the merged stats joined in as columns. No callback anywhere
    holds a full group, so one mega-group (the 100 TB skew case) can
    never OOM a worker — it just becomes n_salt bounded callbacks.

    Exactness: min/max merging is exact, and the scale arithmetic is
    the identical single subtract+divide per row, so the salted plan is
    bit-identical to the single-pass kernel and to the SQL window
    oracle on any partitioning.
    """
    # Hash salt, not modulo: a modulo salt correlates with any periodic
    # id pattern (gcd(period, n_salt) collapses classes — caught by the
    # volume test), while xxhash64 splits every group near-uniformly
    # regardless of how ids were assigned.
    salted = ev.withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(n_salt)).cast("long")
    )
    partials = salted.groupBy("event_type", "salt").applyInPandas(
        _minmax_partial, _PARTIAL_SCHEMA
    )
    stats = partials.groupBy("event_type").agg(
        F.min("pmin").alias("vmin"), F.max("pmax").alias("vmax")
    )
    return (
        salted.join(F.broadcast(stats), "event_type")  # bounded: enum/bucket-keyed rollup (bounded group count)
        .groupBy("event_type", "salt")
        .applyInPandas(_apply_scale_merged, _SCALE_SCHEMA)
    )


@query("udf_grouped_scale_salted", oracle=_GROUPED_UDF_ORACLE)
def udf_grouped_scale_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X20: the salted two-phase form of udf_grouped_scale — same oracle,
    same result, but no Python callback ever sees a whole group (see
    grouped_minmax_scale_salted). This is the plan to reach for when a
    grouped kernel's key is skewed or its groups outgrow one worker."""
    ev = table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    return grouped_minmax_scale_salted(ev)
