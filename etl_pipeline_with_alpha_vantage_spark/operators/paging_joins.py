"""Right-outer join, keyset/offset pagination, and outer lateral
flattening (SURVEY.md X2/X11/X13 completion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

_RIGHT_ORACLE = """
SELECT
    c.c_custkey,
    c.c_name,
    o.o_orderkey,
    o.o_totalprice
FROM orders o
RIGHT JOIN customer c ON o.o_custkey = c.c_custkey AND o.o_totalprice > 280000
"""


@query("join_right_outer", oracle=_RIGHT_ORACLE)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: right-outer join with an extra join-side predicate — every
    customer survives; only orders above the threshold attach. The
    non-key condition lives in the join (not a post-filter), which is the
    semantic that trips up naive outer-join rewrites; Catalyst still
    plans a plain hash join on o_custkey."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return o.join(
        c,
        (o.o_custkey == c.c_custkey) & (o.o_totalprice > 280000),
        "right",
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


_PAGE_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20 OFFSET 40
"""


@query("limit_offset_page", oracle=_PAGE_ORACLE)
def limit_offset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X11: page 3 of a deterministic ranking (total order includes the
    unique key, so pagination is stable). Spark still plans a single
    TakeOrderedAndProject of offset+limit rows — at scale prefer keyset
    pagination (WHERE (price, key) < last_seen) so page N doesn't buffer
    the first N-1 pages."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .offset(40)
        .limit(20)
    )


_LATERAL_ORACLE = """
SELECT d.doc_id, u.x AS long_token
FROM documents d
LEFT JOIN LATERAL (
    SELECT unnest(list_filter(string_split(d.text, ' '),
                              t -> length(t) >= 8)) AS x
) u ON true
WHERE d.doc_id % 5 = 0
"""


@query("explode_outer_lateral", oracle=_LATERAL_ORACLE)
def explode_outer_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13: explode_outer ≡ LEFT JOIN LATERAL unnest — documents with no
    qualifying token keep one NULL row instead of vanishing (the
    difference between explode and explode_outer that silently drops
    corpus rows in cleaning pipelines)."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    longs = F.filter(
        F.split("text", " "), lambda t: F.length(t) >= 8
    )
    return d.select(
        "doc_id", F.explode_outer(longs).alias("long_token")
    )


_BITWISE_ORACLE = """
SELECT
    event_id,
    CAST(event_id & user_id AS BIGINT)        AS b_and,
    CAST(event_id | user_id AS BIGINT)        AS b_or,
    CAST(xor(event_id, user_id) AS BIGINT)    AS b_xor,
    CAST(user_id << 3 AS BIGINT)              AS b_shl,
    CAST(event_id >> 2 AS BIGINT)             AS b_shr,
    CAST(bit_count(event_id) AS INTEGER)      AS b_pop,
    hex(user_id)                              AS u_hex
FROM events
WHERE event_id % 31 = 0
"""


@query("scalar_bitwise_funcs", oracle=_BITWISE_ORACLE)
def scalar_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13: bitwise scalar surface (&, |, xor, shifts, popcount, hex) —
    the primitives the engine's own signature operators (simhash bands,
    LSH buckets) are built from, exposed as query-level functions."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") % 31 == 0)
    e, u = F.col("event_id"), F.col("user_id")
    return ev.select(
        "event_id",
        e.bitwiseAND(u).alias("b_and"),
        e.bitwiseOR(u).alias("b_or"),
        e.bitwiseXOR(u).alias("b_xor"),
        F.shiftleft(u, 3).cast("long").alias("b_shl"),
        F.shiftright(e, 2).cast("long").alias("b_shr"),
        F.bit_count(e).alias("b_pop"),
        F.hex(u).alias("u_hex"),
    )
