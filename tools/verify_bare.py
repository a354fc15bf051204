"""Local replica of the driver's correctness gate, on a BARE SparkSession.

The driver's verify harness builds its own SparkSession (no get_spark()
defaults: ANSI on, 200 shuffle partitions, host timezone, no legacy parquet
confs). Round-1 lost 16/50 sampled queries to exactly that gap, so this
tool re-runs EVERY registered query on such a session at sf0.01 and
compares against its DuckDB oracle: row count, column names, and
order-insensitive full-precision values — the same checks
CORRECTNESS_r{N}.json records.

Usage:
    python tools/verify_bare.py [sf_dir]            # default /root/testdata/sf0.01
    python tools/verify_bare.py sf_dir name1 name2  # subset of queries
    python tools/verify_bare.py sf_dir --names a,b,c
    python tools/verify_bare.py sf_dir --never-sampled   # registry minus every
                                        # name any CORRECTNESS_r*.json sampled
    ... --json OUT.json   # also write driver-format per-query records
                          # ({rows,schema,hash}_match, spark/oracle_rows, err)
"""

from __future__ import annotations

import math
import os
import sys
import traceback
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v + 0.0)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _driver_sampled_names() -> set[str]:
    """Every query name any driver CORRECTNESS_r*.json has ever sampled."""
    import glob
    import json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out: set[str] = set()
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        try:
            out.update(json.load(open(path)))
        except (OSError, ValueError):
            continue
    return out


def main() -> int:
    args = sys.argv[1:]
    json_out: str | None = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    never_sampled = "--never-sampled" in args
    if never_sampled:
        args.remove("--never-sampled")
    names_arg: set[str] = set()
    if "--names" in args:
        i = args.index("--names")
        names_arg = {n for n in args[i + 1].split(",") if n}
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = names_arg | set(args[1:])

    from pyspark.sql import SparkSession

    # Deliberately NOT get_spark(): mimic the driver's own session — the
    # bareness that matters is SQL semantics (ANSI, timezone, shuffle
    # partitions, parquet confs), which stay at their defaults. Driver
    # HEAP is process capacity, not semantics: a 200-query sweep
    # accumulates localCheckpoint blocks faster than the ContextCleaner
    # reclaims them, and the 1g default OOMs mid-sweep at sf0.1
    # (observed at graph_triangles, query #74 of 201). Size it like any
    # real driver would be.
    # Heap is env-tunable (VERIFY_DRIVER_MEM) so small hosts can dial it
    # down; note spark.driver.memory only takes effect when THIS call
    # launches the JVM — an already-running session keeps its heap.
    driver_mem = os.environ.get("VERIFY_DRIVER_MEM", "16g")
    existing = SparkSession.getActiveSession()
    if existing is not None:
        print(
            "verify_bare: reusing existing SparkSession "
            f"(spark.driver.memory={driver_mem} request is a no-op)",
            file=sys.stderr,
        )
    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .appName("verify-bare")
        .config("spark.driver.memory", driver_mem)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.sql(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM '{os.path.join(sf_dir, name + '.parquet')}'"
        )

    import __spark_entry__ as e

    queries, oracles = e.queries(), e.oracle_sql()
    if never_sampled:
        only = (set(queries) - _driver_sampled_names()) | only
    names = sorted(only or queries)
    n_pass = n_rows_only = 0
    failures: list[tuple[str, str]] = []
    records: dict[str, dict] = {}

    def record(
        name,
        rows_match=False,
        schema_match=False,
        hash_match=False,
        spark_rows=None,
        oracle_rows=None,
        err=None,
    ):
        records[name] = {
            "rows_match": rows_match,
            "schema_match": schema_match,
            "hash_match": hash_match,
            "spark_rows": spark_rows,
            "oracle_rows": oracle_rows,
            "err": err,
        }

    for qi, name in enumerate(names):
        if qi and qi % 25 == 0:
            # Nudge the ContextCleaner: drop dangling cached/checkpointed
            # blocks from earlier queries so heap use stays flat across
            # the sweep instead of compounding.
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        try:
            sdf = queries[name](spark, sf_dir)
            spark_cols = [c.lower() for c in sdf.columns]
            srows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                n_rows_only += 1
                record(name, rows_match=len(srows) > 0, spark_rows=len(srows))
                print(f"  rows-only  {name}: {len(srows)} rows")
                continue
            rel = con.sql(oracles[name])
            duck_cols = [c.lower() for c in rel.columns]
            drows = rel.fetchall()
            if sorted(spark_cols) != sorted(duck_cols):
                failures.append(
                    (name, f"columns spark={spark_cols} duck={duck_cols}")
                )
                record(
                    name,
                    rows_match=len(srows) == len(drows),
                    spark_rows=len(srows),
                    oracle_rows=len(drows),
                    err="schema mismatch",
                )
                continue
            if len(srows) != len(drows):
                failures.append(
                    (name, f"rowcount spark={len(srows)} duck={len(drows)}")
                )
                record(
                    name,
                    schema_match=True,
                    spark_rows=len(srows),
                    oracle_rows=len(drows),
                    err="rowcount mismatch",
                )
                continue
            s_ord = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
            d_ord = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
            s_set = sorted(tuple(canon(r[i]) for i in s_ord) for r in srows)
            d_set = sorted(tuple(canon(r[i]) for i in d_ord) for r in drows)
            if s_set != d_set:
                diff = next((a, b) for a, b in zip(s_set, d_set) if a != b)
                failures.append((name, f"values first-diff {diff}"))
                record(
                    name,
                    rows_match=True,
                    schema_match=True,
                    spark_rows=len(srows),
                    oracle_rows=len(drows),
                    err="value hash mismatch",
                )
                continue
            n_pass += 1
            record(
                name,
                rows_match=True,
                schema_match=True,
                hash_match=True,
                spark_rows=len(srows),
                oracle_rows=len(drows),
            )
        except Exception:
            tb = traceback.format_exc(limit=3)
            failures.append((name, tb))
            record(name, err=tb.strip().splitlines()[-1])

    print(
        f"\n{n_pass} hash-match, {n_rows_only} rows-only, "
        f"{len(failures)} FAILED of {len(names)}"
    )
    for name, why in failures:
        print(f"FAIL {name}: {why}")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(dict(sorted(records.items())), f, indent=1)
            f.write("\n")
        print(f"wrote {json_out}: {len(records)} records")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
