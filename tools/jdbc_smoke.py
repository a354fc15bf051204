"""Live-DSN smoke test for the JDBC upsert path (sandbox has no MySQL).

The staging-table INSERT IGNORE write (`sinks/jdbc.py`) and the parallel
JDBC read (`sources/jdbc.py`) are plan/DDL-assembly-tested in tests/, but
the sandbox has no database server, so the actual wire path never
executes there. A user with a real MySQL can run this end-to-end check:

    export SPARK_GRAFT_JDBC_URL='jdbc:mysql://host:3306/db?user=u&password=p'
    # optional, for the server-side DDL (mysql-connector-python):
    export SPARK_GRAFT_MYSQL_DSN='host=...;user=...;password=...;database=...'
    python tools/jdbc_smoke.py

What it does (all against a throwaway table `spark_graft_smoke`):
  1. builds a 5-row DataFrame with a (symbol, date) unique key;
  2. runs write_jdbc_upsert — target DDL, staging create, bulk JDBC
     append, INSERT IGNORE merge, staging drop;
  3. re-runs the SAME upsert and asserts the row count is unchanged
     (idempotence — the reference's INSERT IGNORE semantics);
  4. reads the table back through plan_jdbc_partitioned (range-split
     parallel read) and prints the result.

Requires the MySQL JDBC driver jar on the Spark classpath:
    spark-submit --packages com.mysql:mysql-connector-j:8.4.0 ...
or set spark.jars.packages before starting the session.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    url = os.environ.get("SPARK_GRAFT_JDBC_URL")
    if not url:
        print(
            "SPARK_GRAFT_JDBC_URL not set — nothing to do.\n"
            "This smoke test needs a live MySQL DSN; see the module "
            "docstring for setup."
        )
        return 0

    from etl_pipeline_with_alpha_vantage_spark.session import get_spark
    from etl_pipeline_with_alpha_vantage_spark.sinks.jdbc import (
        write_jdbc_upsert,
    )
    from etl_pipeline_with_alpha_vantage_spark.sources.jdbc import (
        plan_jdbc_partitioned,
    )

    run_sql = None
    dsn = os.environ.get("SPARK_GRAFT_MYSQL_DSN")
    if dsn:
        try:
            import mysql.connector  # type: ignore[import-not-found]
        except ImportError:
            print("mysql-connector-python not installed; DDL will be skipped")
        else:
            conn = mysql.connector.connect(
                **dict(kv.split("=", 1) for kv in dsn.split(";"))
            )
            conn.autocommit = True
            cursor = conn.cursor()

            def run_sql(statement: str) -> None:  # noqa: F811
                print(f"  sql> {statement.splitlines()[0]} ...")
                cursor.execute(statement)

    spark = get_spark(app_name="jdbc-smoke")
    rows = [
        ("IBM", "2024-01-02", 170.10, 171.25, 1_000_000),
        ("IBM", "2024-01-03", 171.30, 172.00, 900_000),
        ("AAPL", "2024-01-02", 185.50, 186.10, 5_000_000),
        ("AAPL", "2024-01-03", 186.20, 185.90, 4_800_000),
        ("MSFT", "2024-01-02", 370.00, 372.40, 2_100_000),
    ]
    df = spark.createDataFrame(
        rows, "symbol string, date string, open double, close double, volume bigint"
    )
    table = "spark_graft_smoke"
    keys = ["symbol", "date"]

    print(f"upsert #1 -> {table}")
    plan = write_jdbc_upsert(df, url, table, keys, run_sql=run_sql)
    if run_sql is None:
        print(
            "no SPARK_GRAFT_MYSQL_DSN: assembled plan only (no execution).\n"
            f"  target DDL : {plan.create_target_sql.splitlines()[0]} ...\n"
            f"  merge      : {plan.insert_ignore_sql.splitlines()[0]} ..."
        )
        return 0

    print("upsert #2 (idempotence check)")
    write_jdbc_upsert(df, url, table, keys, run_sql=run_sql)

    read = plan_jdbc_partitioned(
        url,
        table,
        partition_col="volume",
        lower=0,
        upper=10_000_000,
        num_partitions=2,
    ).load(spark)
    got = read.collect()
    n = len(got)
    print(f"read back {n} rows via {read.rdd.getNumPartitions()} partitions")
    assert n == len(rows), f"expected {len(rows)} rows after re-upsert, got {n}"
    for r in sorted(got, key=lambda r: (r.symbol, r.date)):
        print(" ", r.symbol, r.date, r.close)
    print("OK: upsert is idempotent and parallel read round-trips")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
