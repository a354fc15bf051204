"""Unit tests for the executable bench-floor guard (tools/bench_guard.py,
tools/bench_floor.py) — the round-6 drift gate. Pure-Python: no Spark.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_guard(tmp_path, floors: dict, run: dict, ratio: str | None = None):
    floor_path = tmp_path / "BENCH_FLOOR.json"
    run_path = tmp_path / "run.json"
    floor_path.write_text(json.dumps({"floors": floors}))
    run_path.write_text(json.dumps({"queries": run, "sf": 0.1}))
    # bench_guard resolves BENCH_FLOOR.json relative to the repo root, so
    # run it from a copy pointed at the temp fixture via cwd shim: the
    # script reads REPO/BENCH_FLOOR.json — patch by importing instead.
    env = dict(os.environ)
    if ratio is not None:
        env["BENCH_GUARD_RATIO"] = ratio
    src = open(os.path.join(REPO, "tools", "bench_guard.py")).read()
    src = src.replace(
        "REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))",
        f"REPO = {str(tmp_path)!r}",
    )
    script = tmp_path / "guard_patched.py"
    script.write_text(src)
    proc = subprocess.run(
        [sys.executable, str(script), str(run_path)],
        capture_output=True,
        text=True,
        env=env,
    )
    return proc


def test_guard_passes_within_ratio(tmp_path):
    proc = _run_guard(
        tmp_path,
        floors={"q1": 1.0, "q2": 0.5},
        run={"q1": 1.9, "q2": 0.6},
    )
    assert proc.returncode == 0
    assert "OK" in proc.stdout


def test_guard_flags_and_ranks_drift(tmp_path):
    proc = _run_guard(
        tmp_path,
        floors={"q1": 1.0, "q2": 0.5, "q3": 0.1},
        run={"q1": 2.5, "q2": 0.4, "q3": 0.5},
    )
    assert proc.returncode == 1
    # ranked most-drifted first: q3 at 5x before q1 at 2.5x
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("  ")]
    assert lines[0].startswith("  q3:") and lines[1].startswith("  q1:")
    assert "q2" not in proc.stdout


def test_guard_reports_unfloored_queries(tmp_path):
    proc = _run_guard(
        tmp_path,
        floors={"q1": 1.0},
        run={"q1": 1.0, "brand_new": 0.3},
    )
    assert proc.returncode == 0
    assert "brand_new" in proc.stdout and "no floor" in proc.stdout


def test_guard_ratio_env_override(tmp_path):
    proc = _run_guard(
        tmp_path,
        floors={"q1": 1.0},
        run={"q1": 1.9},
        ratio="1.5",
    )
    assert proc.returncode == 1


def test_committed_floor_file_consistent_with_generator(tmp_path):
    """The committed BENCH_FLOOR.json must regenerate identically from
    the committed bench history (catches a forgotten regen after a
    bench commit). Regenerates to a TEMP path — a failing run must not
    leave the working tree dirty (round-6 judge note)."""
    committed = json.load(open(os.path.join(REPO, "BENCH_FLOOR.json")))
    out = tmp_path / "floor_regen.json"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_floor.py"), str(out)],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr
    regenerated = json.load(open(out))
    assert regenerated == committed
    # And the committed file itself is untouched by the regen.
    assert json.load(open(os.path.join(REPO, "BENCH_FLOOR.json"))) == committed


def test_floor_generator_folds_full_registry_bench():
    """BENCH_FULL.json generations must be floor inputs alongside
    BENCH_DETAIL.json — a headline-only spike must not set a floor the
    full-registry bench contradicts (round-6 verdict task #4)."""
    src = open(os.path.join(REPO, "tools", "bench_floor.py")).read()
    assert "BENCH_FULL.json" in src and "BENCH_DETAIL.json" in src
    # Behavioral check: every sf0.1 full-registry timing >= its floor.
    # Read the COMMITTED generation, not the working tree — floors fold
    # committed history only (see bench_floor.py docstring), so a
    # driver-dirtied working-tree copy must not red this test either.
    floors = json.load(open(os.path.join(REPO, "BENCH_FLOOR.json")))["floors"]
    overrides = set(
        json.load(open(os.path.join(REPO, "BENCH_FLOOR.json")))["overrides"]
    )
    blob = subprocess.run(
        ["git", "show", "HEAD:BENCH_FULL.json"],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    if blob.returncode == 0:
        full = json.loads(blob.stdout)
        if full.get("sf") == 0.1:
            for name, sec in full.get("queries", {}).items():
                if name in overrides or not isinstance(sec, (int, float)):
                    continue
                assert name in floors and sec >= floors[name] - 1e-9, (
                    name,
                    sec,
                    floors.get(name),
                )


def test_floor_regen_ignores_dirty_working_tree(tmp_path):
    """The round-8/round-9 race, pinned: the driver's post-commit bench
    rewrites the working-tree BENCH_DETAIL.json with new minima AFTER
    the floors were last regenerated. The generator must fold committed
    git generations only, so a dirtied working tree cannot change the
    regen output."""
    # Minimal fixture repo: one committed generation, then a dirty
    # working-tree copy with a strictly lower reading.
    fixture = tmp_path / "repo"
    fixture.mkdir()

    def _git(*args):
        subprocess.run(
            ["git", "-c", "user.email=t@t", "-c", "user.name=t", *args],
            cwd=fixture,
            capture_output=True,
            text=True,
            check=True,
        )

    _git("init", "-q")
    (fixture / "BENCH_r03.json").write_text(json.dumps({"parsed": {}}))
    committed = {"sf": 0.1, "queries": {"q1": 1.0, "q2": 2.0}}
    (fixture / "BENCH_DETAIL.json").write_text(json.dumps(committed))
    _git("add", "-A")
    _git("commit", "-q", "-m", "gen1")
    # Driver race: working tree now holds a NEW minimum nobody committed.
    (fixture / "BENCH_DETAIL.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"q1": 0.5, "q2": 2.0}})
    )

    src = open(os.path.join(REPO, "tools", "bench_floor.py")).read()
    src = src.replace(
        "REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))",
        f"REPO = {str(fixture)!r}",
    )
    script = tmp_path / "floor_patched.py"
    script.write_text(src)
    out = tmp_path / "floor.json"
    proc = subprocess.run(
        [sys.executable, str(script), str(out)],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stderr
    floors = json.load(open(out))["floors"]
    # q1's floor is the COMMITTED 1.0, not the dirty working-tree 0.5.
    assert floors["q1"] == 1.0
    assert floors["q2"] == 2.0
