"""Fold newly-registered queries into the round's standing artifacts.

Adding a query late in a round invalidates four committed records —
CORRECTNESS_LOCAL_r{N}.json, OFFGRID_FULL_r{N}.json,
OFFGRID_UP_FULL_r{N}.json, SWEEP_r{N}.json — without re-running their
full (hour-scale) sweeps. This tool re-verifies ONLY the named queries
at every surface and merges the records in place, keeping summaries
consistent:

    python tools/artifact_refresh.py name1 [name2 ...] \
        [--round 9] [--halved DIR] [--up DIR]

Off-grid twin directories are rebuilt via tools/offgrid_twin.py when
the given paths don't exist (they live in /tmp and evaporate between
sessions).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _verify(names: list[str], sf_dir: str, out: str) -> dict:
    cmd = [
        sys.executable,
        os.path.join(REPO, "tools", "verify_bare.py"),
        sf_dir,
        "--names",
        ",".join(names),
        "--json",
        out,
    ]
    subprocess.run(cmd, check=True, stderr=subprocess.DEVNULL)
    return json.load(open(out))


def _merge_flat(path: str, recs: dict) -> None:
    full = json.load(open(path))
    for name, rec in recs.items():
        assert rec.get("hash_match") is True, (path, name, rec)
        full[name] = rec
    json.dump(full, open(path, "w"), indent=1, sort_keys=True)
    print(f"{path}: {len(full)} records")


def _sweep_names(names: list[str], sf_dirs: list[str], path: str) -> None:
    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import types

    import __spark_entry__ as real

    q_all, o_all = real.queries(), real.oracle_sql()
    fake = types.ModuleType("__spark_entry__")
    fake.queries = lambda: {n: q_all[n] for n in names}
    fake.oracle_sql = lambda: {n: o_all[n] for n in names if n in o_all}
    sys.modules["__spark_entry__"] = fake

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "sweeptool", os.path.join(REPO, "tools", "sweep.py")
    )
    sw = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sw)

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .appName("artifact-refresh")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def con_factory(sf_dir: str):
        con = duckdb.connect()
        for t in TABLES:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{os.path.join(sf_dir, t + '.parquet')}'"
            )
        return con

    full = json.load(open(path))
    for sf_dir in sf_dirs:
        verdicts = sw.sweep_sf(spark, con_factory, sf_dir)
        key = os.path.basename(sf_dir.rstrip("/"))
        sfs = full["sfs"][key]
        for name, rec in verdicts.items():
            assert rec["check"] in ("hash", "rows_only"), (key, name, rec)
            sfs["queries"][name] = rec
        # Recompute the summary from the merged map: a re-refresh whose
        # verdict changed category (hash -> rows_only) must update the
        # counters, not just the record.
        sfs["summary"]["n_queries"] = len(sfs["queries"])
        sfs["summary"]["hash_match"] = sum(
            1 for r in sfs["queries"].values() if r["check"] == "hash"
        )
        sfs["summary"]["rows_only"] = sum(
            1 for r in sfs["queries"].values() if r["check"] == "rows_only"
        )
        print(key, sfs["summary"])
    json.dump(full, open(path, "w"), indent=1, sort_keys=True)
    print(f"{path}: merged {len(names)} queries")


def main() -> int:
    args = sys.argv[1:]

    def opt(flag: str, default: str) -> str:
        if flag in args:
            i = args.index(flag)
            v = args[i + 1]
            del args[i : i + 2]
            return v
        return default

    rnd = opt("--round", "10")
    halved = opt("--halved", "/tmp/offgrid_sf05")
    up = opt("--up", "/tmp/offgrid_up")
    names = args
    assert names, "pass at least one query name"

    twin = os.path.join(REPO, "tools", "offgrid_twin.py")
    if not os.path.isdir(halved):
        subprocess.run([sys.executable, twin, halved], check=True)
    if not os.path.isdir(up):
        subprocess.run([sys.executable, twin, up, "--up"], check=True)

    _merge_flat(
        os.path.join(REPO, f"CORRECTNESS_LOCAL_r{rnd}.json"),
        _verify(names, "/root/testdata/sf0.01", "/tmp/_ar_local.json"),
    )
    _merge_flat(
        os.path.join(REPO, f"OFFGRID_FULL_r{rnd}.json"),
        _verify(names, halved, "/tmp/_ar_half.json"),
    )
    _merge_flat(
        os.path.join(REPO, f"OFFGRID_UP_FULL_r{rnd}.json"),
        _verify(names, up, "/tmp/_ar_up.json"),
    )
    _sweep_names(
        names,
        [
            "/root/testdata/sf0.001",
            "/root/testdata/sf0.01",
            "/root/testdata/sf0.1",
        ],
        os.path.join(REPO, f"SWEEP_r{rnd}.json"),
    )
    # MANDATORY last step: regenerate the per-query bench floors. Round
    # 10 ended with BENCH_FLOOR.json at 309 of 314 because late-round
    # folds landed benches (BENCH_FULL.json) without a final floor
    # regen+commit, redding test_bench_guard on the judged checkout.
    # Folding here makes that sequencing slip structurally impossible —
    # any refresh that touches the standing artifacts also refreshes
    # floors (inputs are committed generations only, so this is
    # idempotent and race-free; see tools/bench_floor.py).
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_floor.py")],
        check=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
