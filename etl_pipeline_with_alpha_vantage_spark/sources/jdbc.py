"""JDBC source (SURVEY.md §2.A Q2 — the reference's ``pd.read_sql`` path).

The reference reads back from MySQL exactly once: ``SELECT * FROM
stock_daily_data ORDER BY id DESC LIMIT 5`` through pandas
(/root/reference/etl.py:174). The Spark twin is ``spark.read.jdbc`` with
the sort+limit PUSHED INTO the database — for a single-row-returning
inspection query a full-table parallel scan would be absurd, so the
query ships as a dbtable subquery the server plans (its index on ``id``
makes it O(k)), and only k rows cross the wire.

For LARGE reads the same assembler emits a partitioned read spec
(partitionColumn/lowerBound/upperBound/numPartitions) so every executor
pulls a disjoint key range in parallel — the 100 TB-aware shape of a
JDBC scan. Assembly (pure, unit-tested) is separated from execution;
both shapes also EXECUTE end-to-end against embedded Derby — the one
JDBC engine in pyspark's jars — in tests/test_jdbc_sink.py (write
through the upsert sink, read back via spark.read.jdbc, server-side
sort+limit visible in the executed plan). MySQL itself is absent from
the sandbox, so its LIMIT spelling stays spec-level.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..sinks.jdbc import _ident


@dataclass
class JdbcReadSpec:
    """An assembled spark.read.jdbc invocation, as inspectable data."""

    options: dict[str, str] = field(default_factory=dict)

    def load(self, spark: SparkSession) -> DataFrame:
        return spark.read.format("jdbc").options(**self.options).load()


def plan_jdbc_topk(
    url: str,
    table: str,
    order_col: str,
    k: int,
    descending: bool = True,
    properties: dict[str, str] | None = None,
    dialect: str = "mysql",
) -> JdbcReadSpec:
    """The reference's inspection read (etl.py:174): top-k by a key,
    executed SERVER-SIDE via a pushdown subquery — Spark sees a k-row
    relation, the database does the sort+limit against its own index.

    ``dialect`` picks the server's row-limit syntax: ``mysql`` (the
    reference's target) emits ``LIMIT k``; ``derby`` (the engine the
    executed e2e tests run against) emits the ANSI
    ``FETCH FIRST k ROWS ONLY``.
    """
    table = _ident(table)
    order_col = _ident(order_col)
    if k <= 0:
        raise ValueError("k must be positive")
    if dialect not in ("mysql", "derby"):
        raise ValueError(f"unknown JDBC dialect {dialect!r}")
    direction = "DESC" if descending else "ASC"
    limit = (
        f"LIMIT {int(k)}"
        if dialect == "mysql"
        else f"FETCH FIRST {int(k)} ROWS ONLY"
    )
    sub = (
        f"(SELECT * FROM {table} ORDER BY {order_col} {direction} "
        f"{limit}) AS topk"
    )
    return JdbcReadSpec(
        options={"url": url, "dbtable": sub, **(properties or {})}
    )


def plan_jdbc_partitioned(
    url: str,
    table: str,
    partition_col: str,
    lower: int,
    upper: int,
    num_partitions: int,
    fetchsize: int = 10_000,
    properties: dict[str, str] | None = None,
) -> JdbcReadSpec:
    """Parallel range-partitioned JDBC scan: each of ``num_partitions``
    tasks reads a disjoint ``partition_col`` range, ``fetchsize`` rows
    per round trip. This is the only JDBC read shape that scales — an
    unpartitioned read funnels the whole table through one task."""
    table = _ident(table)
    partition_col = _ident(partition_col)
    if num_partitions <= 0:
        raise ValueError("num_partitions must be positive")
    if upper <= lower:
        raise ValueError("upper bound must exceed lower bound")
    return JdbcReadSpec(
        options={
            "url": url,
            "dbtable": table,
            "partitionColumn": partition_col,
            "lowerBound": str(int(lower)),
            "upperBound": str(int(upper)),
            "numPartitions": str(int(num_partitions)),
            "fetchsize": str(int(fetchsize)),
            **(properties or {}),
        }
    )
