"""Flag bench drift against the committed per-query floors.

Compares a bench result (default: BENCH_DETAIL.json, i.e. the last
`python bench.py` run) against BENCH_FLOOR.json and reports every query
slower than DRIFT_RATIO (default 2.0) times its floor — the same "weak"
threshold the judge applies. Exit code 1 when anything is flagged, so
it can gate CI or diagnose a container/PySpark bump in minutes.

Usage:
    python tools/bench_guard.py                      # check BENCH_DETAIL.json
    python tools/bench_guard.py path/to/bench.json   # any {"queries": {...}} file
    BENCH_GUARD_RATIO=1.5 python tools/bench_guard.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    target = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "BENCH_DETAIL.json"
    )
    ratio = float(os.environ.get("BENCH_GUARD_RATIO", "2.0"))
    floors = json.load(open(os.path.join(REPO, "BENCH_FLOOR.json")))[
        "floors"
    ]
    run = json.load(open(target)).get("queries", {})
    flagged: list[tuple[str, float, float, float]] = []
    unfloored: list[str] = []
    for name, sec in sorted(run.items()):
        if not isinstance(sec, (int, float)):
            continue
        floor = floors.get(name)
        if floor is None:
            unfloored.append(name)
            continue
        if floor > 0 and sec > ratio * floor:
            flagged.append((name, sec, floor, sec / floor))
    if flagged:
        print(f"{len(flagged)} queries > {ratio}x their floor:")
        for name, sec, floor, r in sorted(
            flagged, key=lambda t: -t[3]
        ):
            print(f"  {name}: {sec:.3f}s vs floor {floor:.3f}s ({r:.2f}x)")
    else:
        print(
            f"OK: all {len(run)} benched queries within {ratio}x of their "
            "floors"
        )
    if unfloored:
        print(
            f"note: {len(unfloored)} queries have no floor yet "
            f"(run tools/bench_floor.py after committing the bench): "
            + ", ".join(unfloored[:10])
            + ("..." if len(unfloored) > 10 else "")
        )
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
