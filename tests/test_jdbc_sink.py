"""Unit tests for the JDBC INSERT IGNORE upsert writer (L1/L2 parity).

No MySQL exists in the sandbox, so these tests pin the ASSEMBLY: the
emitted DDL/DML must reproduce the reference's load semantics
(/root/reference/etl.py:115-156) and the Spark write options must form
the batched staging append that replaces its row-at-a-time loop.
"""

from __future__ import annotations

import pytest

from etl_pipeline_with_alpha_vantage_spark.sinks.jdbc import (
    plan_jdbc_upsert,
    write_jdbc_upsert,
)

URL = "jdbc:mysql://localhost:3306/etl"


@pytest.fixture()
def stock_df(spark):
    """A frame shaped like the reference's final load frame (etl.py:96-99
    after the sink-side renames of SURVEY.md §2.D.6)."""
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        [("AAPL", "2025-10-03", 254.665, 258.02, 253.95, 258.02, 49155614, 1.317417)],
        "symbol string, date string, open_price double, high_price double, "
        "low_price double, close_price double, volume long, "
        "daily_change_percentage double",
    ).select(
        "symbol",
        F.to_date("date").alias("date"),
        F.col("open_price").cast("decimal(15,4)").alias("open_price"),
        F.col("high_price").cast("decimal(15,4)").alias("high_price"),
        F.col("low_price").cast("decimal(15,4)").alias("low_price"),
        F.col("close_price").cast("decimal(15,4)").alias("close_price"),
        F.col("volume").cast("int").alias("volume"),
        F.col("daily_change_percentage")
        .cast("decimal(10,4)")
        .alias("daily_change_percentage"),
    )


def test_target_ddl_matches_reference_schema(stock_df):
    plan = plan_jdbc_upsert(
        stock_df, URL, "stock_daily_data", keys=("symbol", "date"), staging_suffix="stage"
    )
    ddl = plan.create_target_sql
    # Reference DDL semantics, item by item (etl.py:115-129):
    assert ddl.startswith("CREATE TABLE IF NOT EXISTS stock_daily_data")
    assert "id INT PRIMARY KEY AUTO_INCREMENT" in ddl
    assert "extraction_timestamp TIMESTAMP DEFAULT CURRENT_TIMESTAMP" in ddl
    assert "UNIQUE (symbol, date)" in ddl
    assert "open_price DECIMAL(15,4)" in ddl
    assert "daily_change_percentage DECIMAL(10,4)" in ddl
    assert "volume INT" in ddl
    assert "date DATE" in ddl


def test_insert_ignore_omits_server_populated_columns(stock_df):
    plan = plan_jdbc_upsert(
        stock_df, URL, "stock_daily_data", keys=("symbol", "date"), staging_suffix="stage"
    )
    # The reference's INSERT lists only the 8 data columns — never id or
    # extraction_timestamp (etl.py:143-144); ditto here.
    assert plan.insert_ignore_sql.startswith(
        "INSERT IGNORE INTO stock_daily_data "
        "(symbol, date, open_price, high_price, low_price, close_price, "
        "volume, daily_change_percentage)"
    )
    assert "id" not in plan.insert_ignore_sql.split("(")[1].split(")")[0].split(
        ", "
    )
    assert "extraction_timestamp" not in plan.insert_ignore_sql
    assert plan.insert_ignore_sql.endswith(
        f"SELECT symbol, date, open_price, high_price, low_price, "
        f"close_price, volume, daily_change_percentage FROM "
        f"{plan.staging_table}"
    )


def test_staging_table_has_no_unique_key(stock_df):
    plan = plan_jdbc_upsert(
        stock_df, URL, "stock_daily_data", keys=("symbol", "date"), staging_suffix="stage"
    )
    assert "UNIQUE" not in plan.create_staging_sql
    assert "AUTO_INCREMENT" not in plan.create_staging_sql
    assert plan.staging_table == "stock_daily_data__stage"


def test_write_options_batch_into_staging(stock_df):
    plan = plan_jdbc_upsert(
        stock_df, URL, "stock_daily_data", keys=("symbol", "date"),
        batchsize=5000, staging_suffix="stage",
    )
    assert plan.write_options["url"] == URL
    assert plan.write_options["dbtable"] == "stock_daily_data__stage"
    assert plan.write_options["batchsize"] == "5000"
    assert plan.write_options["truncate"] == "false"


def test_bad_identifiers_and_keys_rejected(stock_df):
    with pytest.raises(ValueError, match="unsafe SQL identifier"):
        plan_jdbc_upsert(stock_df, URL, "t; DROP TABLE x", keys=("symbol",))
    with pytest.raises(ValueError, match="keys"):
        plan_jdbc_upsert(stock_df, URL, "t", keys=("nope",))


def test_run_path_statement_order_and_crash_hygiene(stock_df):
    """With a recording run_sql, the statement sequence must be: ensure
    target, drop stale staging, create staging, (bulk write — fails here,
    no MySQL driver), and the finally-drop must still run."""
    ran: list[str] = []
    with pytest.raises(Exception):
        write_jdbc_upsert(
            stock_df,
            URL,
            "stock_daily_data",
            keys=("symbol", "date"),
            run_sql=ran.append, staging_suffix="stage",
        )
    assert [s.split()[0:3] for s in ran[:3]] == [
        ["CREATE", "TABLE", "IF"],
        ["DROP", "TABLE", "IF"],
        ["CREATE", "TABLE", "stock_daily_data__stage"],
    ]
    # crash hygiene: the last statement is the staging drop even though
    # the bulk write raised
    assert ran[-1] == "DROP TABLE IF EXISTS stock_daily_data__stage"


def test_plan_only_mode_executes_nothing(stock_df):
    plan = write_jdbc_upsert(
        stock_df, URL, "stock_daily_data", keys=("symbol", "date"), staging_suffix="stage"
    )
    assert plan.insert_ignore_sql  # assembled


def test_jdbc_topk_read_pushes_sort_limit_serverside():
    from etl_pipeline_with_alpha_vantage_spark.sources.jdbc import (
        plan_jdbc_topk,
    )

    spec = plan_jdbc_topk(URL, "stock_daily_data", "id", 5)
    # reference etl.py:174 — the exact query, as a pushdown subquery
    assert spec.options["dbtable"] == (
        "(SELECT * FROM stock_daily_data ORDER BY id DESC LIMIT 5) AS topk"
    )
    assert spec.options["url"] == URL
    with pytest.raises(ValueError):
        plan_jdbc_topk(URL, "t; DROP", "id", 5)
    with pytest.raises(ValueError):
        plan_jdbc_topk(URL, "t", "id", 0)


def test_jdbc_partitioned_read_spec():
    from etl_pipeline_with_alpha_vantage_spark.sources.jdbc import (
        plan_jdbc_partitioned,
    )

    spec = plan_jdbc_partitioned(
        URL, "stock_daily_data", "id", lower=1, upper=1_000_000,
        num_partitions=32,
    )
    o = spec.options
    assert (o["partitionColumn"], o["lowerBound"], o["upperBound"]) == (
        "id", "1", "1000000"
    )
    assert o["numPartitions"] == "32"
    assert o["fetchsize"] == "10000"
    with pytest.raises(ValueError):
        plan_jdbc_partitioned(URL, "t", "id", 10, 10, 4)


def test_default_staging_names_are_per_invocation_unique(stock_df):
    """Concurrent upserts into the same target must stage into different
    tables — a fixed staging name lets one job's DROP/CREATE destroy the
    other's in-flight rows."""
    a = plan_jdbc_upsert(stock_df, URL, "stock_daily_data", keys=("symbol", "date"))
    b = plan_jdbc_upsert(stock_df, URL, "stock_daily_data", keys=("symbol", "date"))
    assert a.staging_table != b.staging_table
    assert a.staging_table.startswith("stock_daily_data__stage_")


# ---------------------------------------------------------------------------
# Round-8: the EXECUTE path, end-to-end against embedded Derby (the one
# JDBC engine shipped in pyspark's jars). Real staging create, real bulk
# append through Spark's JDBC writer, real dedup-insert under a real
# UNIQUE constraint, idempotent re-run — the full etl.py:138-156 loop
# with only the SQL dialect swapped.
# ---------------------------------------------------------------------------


@pytest.fixture()
def derby(spark, tmp_path):
    """An embedded-Derby database plus a run_sql bridge over py4j's
    java.sql.DriverManager (same JVM as the Spark executors). CREATE on
    an existing table (SQLState X0Y32) is treated as create-if-not-
    exists, per the derby-dialect contract in plan_jdbc_upsert."""
    url = f"jdbc:derby:{tmp_path}/upsertdb;create=true"
    jvm = spark._jvm
    executed: list[str] = []

    def run_sql(sql: str):
        executed.append(sql)
        conn = jvm.java.sql.DriverManager.getConnection(url)
        try:
            st = conn.createStatement()
            try:
                st.execute(sql)
            finally:
                st.close()
        except Exception as e:
            # X0Y32: table exists (CREATE), 42Y55: no such table (DROP)
            # — the if-not-exists / if-exists semantics Derby lacks.
            if "X0Y32" not in str(e) and "42Y55" not in str(e):
                raise
        finally:
            conn.close()

    def fetch(sql: str) -> list[tuple]:
        conn = jvm.java.sql.DriverManager.getConnection(url)
        try:
            rs = conn.createStatement().executeQuery(sql)
            ncol = rs.getMetaData().getColumnCount()
            out = []
            while rs.next():
                out.append(
                    tuple(rs.getString(i + 1) for i in range(ncol))
                )
            return out
        finally:
            conn.close()

    yield url, run_sql, fetch, executed


def _trades_df(spark, rows):
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        rows,
        "symbol string, trade_date string, close_price double, volume int",
    ).select(
        "symbol",
        F.to_date("trade_date").alias("trade_date"),
        "close_price",
        "volume",
    )


def test_derby_upsert_end_to_end_idempotent(spark, derby):
    url, run_sql, fetch, executed = derby
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    df = _trades_df(
        spark,
        [
            ("AAPL", "2025-10-03", 254.66, 49155614),
            ("AAPL", "2025-10-06", 256.69, 48766052),
            ("GOOG", "2025-10-03", 245.35, 27000000),
        ],
    )

    plan = write_jdbc_upsert(
        df,
        url,
        "stock_daily",
        keys=("symbol", "trade_date"),
        run_sql=run_sql,
        properties=props,
        dialect="derby",
        staging_suffix="t1",
    )
    # statement sequence: create target, hygiene drop, create staging,
    # dedup insert, final drop — a quoting/type break anywhere fails loud
    assert [s.split()[0] for s in executed] == [
        "CREATE", "DROP", "CREATE", "INSERT", "DROP",
    ]
    assert fetch("SELECT COUNT(*) FROM stock_daily")[0][0] == "3"

    # UNIQUE (symbol, trade_date) is REAL: a direct duplicate insert fails
    with pytest.raises(Exception, match="23505"):
        conn = spark._jvm.java.sql.DriverManager.getConnection(url)
        try:
            conn.createStatement().execute(
                "INSERT INTO stock_daily (symbol, trade_date, close_price,"
                " volume) VALUES ('AAPL', '2025-10-03', 1.0, 1)"
            )
        finally:
            conn.close()

    # Idempotent re-run of the SAME batch: nothing new lands.
    write_jdbc_upsert(
        df, url, "stock_daily", keys=("symbol", "trade_date"),
        run_sql=run_sql, properties=props, dialect="derby",
        staging_suffix="t2",
    )
    assert fetch("SELECT COUNT(*) FROM stock_daily")[0][0] == "3"

    # Overlapping batch (2 dupes + 1 new + an in-batch exact duplicate
    # pair): only the new row lands, the in-batch dup collapses.
    df2 = _trades_df(
        spark,
        [
            ("AAPL", "2025-10-03", 254.66, 49155614),   # dup of run 1
            ("GOOG", "2025-10-03", 245.35, 27000000),   # dup of run 1
            ("MSFT", "2025-10-03", 517.35, 20186400),   # new
            ("MSFT", "2025-10-03", 517.35, 20186400),   # exact in-batch dup
        ],
    )
    write_jdbc_upsert(
        df2, url, "stock_daily", keys=("symbol", "trade_date"),
        run_sql=run_sql, properties=props, dialect="derby",
        staging_suffix="t3",
    )
    assert fetch("SELECT COUNT(*) FROM stock_daily")[0][0] == "4"
    # first-writer-wins: AAPL 2025-10-03 keeps run-1's close_price
    assert fetch(
        "SELECT close_price FROM stock_daily WHERE symbol='AAPL'"
        " AND trade_date='2025-10-03'"
    )[0][0].startswith("254.66")
    # server-populated columns exist and filled: surrogate id + audit ts
    ids = fetch("SELECT id, extraction_timestamp FROM stock_daily")
    assert len(ids) == 4 and all(i and ts for i, ts in ids)
    # staging dropped
    assert fetch(
        "SELECT COUNT(*) FROM SYS.SYSTABLES WHERE TABLENAME LIKE"
        " 'STOCK_DAILY__%'"
    )[0][0] == "0"


# ---------------------------------------------------------------------------
# Round-9: the READ path executed end-to-end against embedded Derby —
# the reference's ``pd.read_sql('SELECT * FROM stock_daily_data ORDER BY
# id DESC LIMIT 5')`` inspection (etl.py:174), previously asserted only
# on the assembled spec. Rows land via the real upsert sink, then come
# back through spark.read.jdbc with the sort+limit executed SERVER-SIDE
# (the relation Spark scans is already k rows), and the partitioned spec
# executes as a genuinely parallel ranged scan.
# ---------------------------------------------------------------------------


def test_derby_topk_read_executes_serverside_sort_limit(spark, derby):
    from etl_pipeline_with_alpha_vantage_spark.sources.jdbc import (
        plan_jdbc_topk,
    )
    from etl_pipeline_with_alpha_vantage_spark.sinks.jdbc import (
        write_jdbc_upsert,
    )

    url, run_sql, fetch, executed = derby
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    rows = [
        ("AAPL", f"2025-10-{d:02d}", 250.0 + d, 1000 + d) for d in range(1, 9)
    ]
    write_jdbc_upsert(
        _trades_df(spark, rows), url, "stock_read", keys=("symbol", "trade_date"),
        run_sql=run_sql, properties=props, dialect="derby", staging_suffix="r1",
    )

    spec = plan_jdbc_topk(url, "stock_read", "id", 5, properties=props,
                          dialect="derby")
    df = spec.load(spark)
    got = df.collect()
    # the relation itself is 5 rows — no Spark-side limit exists to hide
    # an oversized transfer, and the scanned relation in the executed
    # plan is the pushdown subquery, not the raw table
    assert len(got) == 5
    plan_text = df._jdf.queryExecution().executedPlan().toString()
    assert "FETCH FIRST 5 ROWS ONLY" in plan_text
    # id is Derby's GENERATED ALWAYS identity: insertion order = id order,
    # so top-5 DESC = the 5 most recently inserted trade dates
    got_dates = sorted(str(r["TRADE_DATE"]) for r in got)
    assert got_dates == [f"2025-10-{d:02d}" for d in range(4, 9)]
    ids = [int(r["ID"]) for r in got]
    assert ids == sorted(ids, reverse=True)  # server ORDER BY id DESC held

    # ascending variant: the other end of the table
    asc = plan_jdbc_topk(url, "stock_read", "id", 3, descending=False,
                         properties=props, dialect="derby").load(spark)
    assert sorted(str(r["TRADE_DATE"]) for r in asc.collect()) == [
        "2025-10-01", "2025-10-02", "2025-10-03"
    ]


def test_derby_partitioned_read_executes_parallel_ranges(spark, derby):
    from etl_pipeline_with_alpha_vantage_spark.sources.jdbc import (
        plan_jdbc_partitioned,
    )
    from etl_pipeline_with_alpha_vantage_spark.sinks.jdbc import (
        write_jdbc_upsert,
    )

    url, run_sql, fetch, executed = derby
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    rows = [
        ("SYM%d" % i, "2025-10-01", float(i), i) for i in range(40)
    ]
    write_jdbc_upsert(
        _trades_df(spark, rows), url, "stock_part", keys=("symbol", "trade_date"),
        run_sql=run_sql, properties=props, dialect="derby", staging_suffix="p1",
    )
    ids = sorted(int(r[0]) for r in fetch("SELECT id FROM stock_part"))
    lo, hi = ids[0], ids[-1]

    spec = plan_jdbc_partitioned(
        url, "stock_part", "id", lower=lo, upper=hi + 1, num_partitions=4,
        properties=props,
    )
    df = spec.load(spark)
    # genuinely parallel: 4 tasks, disjoint ranges, zero loss/duplication
    assert df.rdd.getNumPartitions() == 4
    per_part = df.rdd.glom().map(len).collect()
    assert sum(per_part) == 40 and sum(1 for n in per_part if n) >= 2
    assert sorted(int(r["ID"]) for r in df.collect()) == ids
