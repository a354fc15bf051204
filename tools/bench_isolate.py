"""Isolated re-bench of specific queries — the confirmation step for
whole-session bench_guard flags (readings >2x floor in a full run are
usually GC/JIT/load pressure; a warm isolated min-of-n is the
authoritative number, per BENCH_BASELINE.md).

Usage:
    python tools/bench_isolate.py q1 q2 ...      # min-of-5 each at sf0.1
    BENCH_ISOLATE_N=10 python tools/bench_isolate.py q1
    python tools/bench_isolate.py --flagged      # everything the guard
                                                 # flags in BENCH_DETAIL/FULL

Prints one line per query: isolated min, floor, and the ratio; exits 1
iff any isolated min still exceeds 2x its floor (a REAL regression).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _flagged_names(floors: dict[str, float]) -> list[str]:
    ratio = float(os.environ.get("BENCH_GUARD_RATIO", "2.0"))
    names = set()
    for fname in ("BENCH_DETAIL.json", "BENCH_FULL.json"):
        path = os.path.join(REPO, fname)
        if not os.path.exists(path):
            continue
        d = json.load(open(path))
        if d.get("sf") != 0.1:
            continue
        for name, sec in d.get("queries", {}).items():
            fl = floors.get(name)
            if fl and isinstance(sec, (int, float)) and sec > ratio * fl:
                names.add(name)
    return sorted(names)


def main() -> int:
    floors = json.load(open(os.path.join(REPO, "BENCH_FLOOR.json")))["floors"]
    args = sys.argv[1:]
    names = _flagged_names(floors) if "--flagged" in args else [
        a for a in args if not a.startswith("--")
    ]
    if not names:
        print("nothing to isolate (no names given / no guard flags)")
        return 0
    n = int(os.environ.get("BENCH_ISOLATE_N", "5"))
    guard_ratio = float(os.environ.get("BENCH_GUARD_RATIO", "2.0"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from etl_pipeline_with_alpha_vantage_spark import registry
    from etl_pipeline_with_alpha_vantage_spark.session import get_spark

    registry.load_all()
    spark = get_spark(app_name="bench-isolate")
    spark.sparkContext.setLogLevel("ERROR")
    bad = 0
    for name in names:
        fn = registry.QUERIES.get(name)
        if fn is None:
            print(f"{name}: NOT REGISTERED")
            bad += 1
            continue
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        fl = floors.get(name)
        if fl:
            ratio = best / fl
            # Same BENCH_GUARD_RATIO for selection (_flagged_names) and
            # the verdict — a hardcoded 2.0 here would fail queries that
            # a raised ratio deliberately tolerated.
            verdict = "REGRESSION" if ratio > guard_ratio else "ok"
            print(f"{name}: isolated_min={best:.3f}s floor={fl:.3f}s "
                  f"ratio={ratio:.2f}x {verdict}")
            bad += ratio > guard_ratio
        else:
            print(f"{name}: isolated_min={best:.3f}s (no floor)")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
