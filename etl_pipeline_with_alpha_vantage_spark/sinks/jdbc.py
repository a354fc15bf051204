"""JDBC upsert-ignore writer (SURVEY.md §2.A L1/L2 — the MySQL load path).

The reference loads into MySQL with ``CREATE TABLE IF NOT EXISTS`` +
row-at-a-time ``INSERT IGNORE`` inside one transaction
(/root/reference/etl.py:115-156). The distributed shape of that semantic
is the classic staging-table pattern:

1. ``df.write.jdbc`` appends the batch into a session-scoped STAGING
   table — executor-parallel, ``batchsize``-batched prepared statements,
   i.e. each partition streams thousands of rows per round trip instead
   of the reference's one statement per row (etl.py:140-145).
2. ONE server-side ``INSERT IGNORE INTO target ... SELECT ... FROM
   staging`` resolves duplicates against the target's
   ``UNIQUE (symbol, date)`` key atomically — identical conflict
   semantics to the reference (first writer wins, duplicates silently
   skipped), but the dedup happens once in the database, not per row.
3. The staging table is dropped.

No MySQL exists in the test sandbox, so the class separates PLAN
ASSEMBLY (pure, unit-tested: options dict + exact SQL statements) from
EXECUTION (``run``, which needs a live ``java.sql``/JDBC endpoint).
"""

from __future__ import annotations

import re
from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

# Spark type → MySQL column type, mirroring the reference DDL's choices
# (etl.py:117-127): DECIMAL at the storage layer, DATE/TIMESTAMP native.
_MYSQL_TYPES = {
    "string": "VARCHAR(255)",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
    "int": "INT",
    "bigint": "BIGINT",
    "double": "DOUBLE",
    "float": "FLOAT",
    "boolean": "BOOLEAN",
}

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

# Server-populated target-only columns per dialect (surrogate id + audit
# timestamp, reference etl.py:117,126). Derby spells auto-increment as
# GENERATED ... AS IDENTITY and has no INSERT IGNORE — its dedup-insert
# twin is SELECT DISTINCT ... WHERE NOT EXISTS (same first-writer-wins
# outcome for whole-row duplicates and re-runs; a single batch carrying
# the SAME key with DIFFERENT values is order-dependent in MySQL and an
# error in Derby — resolve those upstream, e.g. dropDuplicates(keys)).
_EXTRA_COLUMNS = {
    "mysql": (
        "id INT PRIMARY KEY AUTO_INCREMENT",
        "extraction_timestamp TIMESTAMP DEFAULT CURRENT_TIMESTAMP",
    ),
    "derby": (
        "id INT GENERATED ALWAYS AS IDENTITY PRIMARY KEY",
        "extraction_timestamp TIMESTAMP DEFAULT CURRENT_TIMESTAMP",
    ),
}


def _ident(name: str) -> str:
    """Validate an SQL identifier (defense against injection via column
    or table names — values never enter the SQL, only identifiers)."""
    if not _IDENT.match(name):
        raise ValueError(f"unsafe SQL identifier: {name!r}")
    return name


def _mysql_type(spark_type: str) -> str:
    spark_type = spark_type.lower()
    if spark_type.startswith("decimal"):
        return spark_type.upper()  # DECIMAL(15,4) spells the same
    try:
        return _MYSQL_TYPES[spark_type]
    except KeyError:
        raise ValueError(f"no MySQL mapping for Spark type {spark_type!r}")


@dataclass
class JdbcUpsertPlan:
    """Everything the upsert will do, as inspectable data."""

    url: str
    table: str
    staging_table: str
    create_target_sql: str
    create_staging_sql: str
    insert_ignore_sql: str
    drop_staging_sql: str
    write_options: dict[str, str] = field(default_factory=dict)


def plan_jdbc_upsert(
    df: DataFrame,
    url: str,
    table: str,
    keys: Sequence[str],
    batchsize: int = 1000,
    extra_columns: Sequence[str] | None = None,
    isolation_level: str = "READ_COMMITTED",
    properties: dict[str, str] | None = None,
    staging_suffix: str | None = None,
    dialect: str = "mysql",
) -> JdbcUpsertPlan:
    """Assemble the INSERT IGNORE upsert plan for ``df`` → ``table``.

    ``extra_columns`` are server-populated columns that exist in the
    target but NOT in ``df`` (and therefore not in the staging table or
    the INSERT column list) — defaults reproduce the reference's
    surrogate id + audit timestamp (etl.py:117,126), which the row
    INSERT likewise omits (etl.py:143-144).

    ``staging_suffix`` defaults to a fresh per-invocation token so two
    concurrent upserts into the same target stage into DIFFERENT tables
    — a fixed staging name would let one job's DROP/CREATE destroy the
    other's in-flight rows. Pass an explicit suffix only to pin names in
    tests or to resume a crashed load.

    ``dialect``: "mysql" (default, the reference's target) or "derby"
    (embedded — the offline integration tests run the REAL execute path
    against it). Derby differences: IDENTITY spelling, NOT NULL key
    columns (Derby UNIQUE requires it), the NOT-EXISTS dedup insert,
    and no IF NOT EXISTS — a Derby ``run_sql`` should treat SQLState
    X0Y32 (table exists) on the CREATE as success.
    """
    if dialect not in _EXTRA_COLUMNS:
        raise ValueError(f"unknown JDBC dialect {dialect!r}")
    if extra_columns is None:
        extra_columns = _EXTRA_COLUMNS[dialect]
    if staging_suffix is None:
        import uuid

        staging_suffix = f"stage_{uuid.uuid4().hex[:12]}"
    table = _ident(table)
    staging = _ident(f"{table}__{staging_suffix}")
    cols = [_ident(f.name) for f in df.schema.fields]
    if not set(keys) <= set(cols):
        raise ValueError(f"keys {keys!r} not all present in df columns {cols}")
    col_defs = [
        f"{name} {_mysql_type(f.dataType.simpleString())}"
        for name, f in zip(cols, df.schema.fields)
    ]
    key_list = ", ".join(_ident(k) for k in keys)
    if dialect == "derby":
        col_defs = [
            d + " NOT NULL" if d.split(" ")[0] in keys else d
            for d in col_defs
        ]
    target_defs = [*extra_columns, *col_defs, f"UNIQUE ({key_list})"]
    create_prefix = (
        "CREATE TABLE" if dialect == "derby" else "CREATE TABLE IF NOT EXISTS"
    )
    create_target = (
        f"{create_prefix} {table} (\n  "
        + ",\n  ".join(target_defs)
        + "\n)"
    )
    # Staging: same data columns, NO unique key (the whole point: the
    # parallel bulk append must never conflict; conflicts resolve in
    # the single INSERT IGNORE below).
    create_staging = (
        f"CREATE TABLE {staging} (\n  " + ",\n  ".join(col_defs) + "\n)"
    )
    col_list = ", ".join(cols)
    if dialect == "derby":
        qual = ", ".join(f"s.{c}" for c in cols)
        match = " AND ".join(f"t.{k} = s.{k}" for k in keys)
        insert_ignore = (
            f"INSERT INTO {table} ({col_list})\n"
            f"SELECT DISTINCT {qual} FROM {staging} s\n"
            f"WHERE NOT EXISTS (SELECT 1 FROM {table} t WHERE {match})"
        )
    else:
        insert_ignore = (
            f"INSERT IGNORE INTO {table} ({col_list})\n"
            f"SELECT {col_list} FROM {staging}"
        )
    opts = {
        "url": url,
        "dbtable": staging,
        "batchsize": str(batchsize),
        "isolationLevel": isolation_level,
        # staging is created by us, spark must append into it, not replace
        "truncate": "false",
        **(properties or {}),
    }
    return JdbcUpsertPlan(
        url=url,
        table=table,
        staging_table=staging,
        create_target_sql=create_target,
        create_staging_sql=create_staging,
        insert_ignore_sql=insert_ignore,
        # Derby has no IF EXISTS: its run_sql treats SQLState 42Y55
        # (no such table) on the DROP as success, mirroring X0Y32 on
        # the CREATE.
        drop_staging_sql=(
            f"DROP TABLE {staging}"
            if dialect == "derby"
            else f"DROP TABLE IF EXISTS {staging}"
        ),
        write_options=opts,
    )


def write_jdbc_upsert(
    df: DataFrame,
    url: str,
    table: str,
    keys: Sequence[str],
    batchsize: int = 1000,
    run_sql=None,
    **plan_kwargs,
) -> JdbcUpsertPlan:
    """Execute the staging-table INSERT IGNORE upsert.

    ``run_sql(statement)`` executes server-side DDL/DML (e.g. a
    mysql-connector cursor wrapper); it is a parameter because Spark's
    JDBC writer cannot issue arbitrary statements. When ``run_sql`` is
    None the assembled plan is returned WITHOUT executing — the
    sandbox-testable path (no MySQL available here).
    """
    plan = plan_jdbc_upsert(df, url, table, keys, batchsize, **plan_kwargs)
    if run_sql is None:
        return plan
    run_sql(plan.create_target_sql)
    run_sql(plan.drop_staging_sql)  # crash-leftover hygiene
    run_sql(plan.create_staging_sql)
    try:
        (
            df.write.format("jdbc")
            .options(**plan.write_options)
            .mode("append")
            .save()
        )
        run_sql(plan.insert_ignore_sql)
    finally:
        run_sql(plan.drop_staging_sql)
    return plan
