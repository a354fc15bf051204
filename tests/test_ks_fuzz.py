"""Batched differential fuzz of the exact-integer rank-device kernels.

200 random two-sample cases (seeded, sizes 1-60, heavy ties, skewed
arms) are evaluated in ONE Spark action per kernel — each case is a
distinct grp, and both kernels are per-group by construction — then
compared against transparent pure-Python references: KS's
D·na·nb = max over cuts of |cumA·nb − cumB·na|, and Mann–Whitney's
2U = Σ_a (2·#{b < a} + #{b = a}) with tie term Σ(t³−t). The closed-form
volume test pins the KS extremes (D = 0 and D = 1); this pins the
interior: ties, unbalanced arms, singleton arms, and values that
collide across the $1000 segmentation buckets the shared prefix-sum
device splits on.
"""

from __future__ import annotations

import random

from etl_pipeline_with_alpha_vantage_spark.operators.stats import (
    ks_statistic,
    mw_statistic,
)

N_CASES = 200


def _ref_d_num(a: list[int], b: list[int]) -> int:
    """max over value cuts of |cumA·nb − cumB·na| on exact integers."""
    values = sorted(set(a) | set(b))
    na, nb = len(a), len(b)
    ca = cb = best = 0
    for v in values:
        ca += sum(1 for x in a if x == v)
        cb += sum(1 for x in b if x == v)
        best = max(best, abs(ca * nb - cb * na))
    return best


def _ref_mw(a: list[int], b: list[int]) -> tuple[int, int]:
    """(2U_a, tie term) on exact integers."""
    u2 = sum(
        2 * sum(1 for y in b if y < x) + sum(1 for y in b if y == x)
        for x in a
    )
    from collections import Counter

    counts = Counter(a) + Counter(b)
    tie = sum(t**3 - t for t in counts.values())
    return u2, tie


def _random_cases():
    rng = random.Random(1985)
    cases = {}
    rows = []
    for g in range(N_CASES):
        na, nb = rng.randint(1, 60), rng.randint(1, 60)
        # Tight value range forces heavy ties; occasional huge values
        # cross the segmentation-bucket boundary ($1000 = 100k cents).
        lo, hi = 0, rng.choice([5, 40, 99_999, 250_000])
        a = [rng.randint(lo, hi) for _ in range(na)]
        b = [rng.randint(lo, hi) for _ in range(nb)]
        cases[str(g)] = (a, b)
        rows += [(str(g), 0, v) for v in a] + [(str(g), 1, v) for v in b]
    return cases, rows


def test_ks_kernel_matches_reference_on_random_cases(spark):
    cases, rows = _random_cases()
    base = spark.createDataFrame(rows, "grp string, arm int, cents long")
    got = {r.grp: r for r in ks_statistic(base).collect()}
    assert len(got) == N_CASES
    for g, (a, b) in cases.items():
        r = got[g]
        assert (r.na, r.nb) == (len(a), len(b)), g
        assert r.d_num == _ref_d_num(a, b), f"case {g}: {a} vs {b}"
        expect_micro = round(r.d_num * 1_000_000.0 / (len(a) * len(b)))
        assert r.d_micro == expect_micro, g


def test_mw_kernel_matches_reference_on_random_cases(spark):
    cases, rows = _random_cases()
    base = spark.createDataFrame(rows, "grp string, arm int, cents long")
    got = {r.grp: r for r in mw_statistic(base).collect()}
    assert len(got) == N_CASES
    for g, (a, b) in cases.items():
        r = got[g]
        u2, tie = _ref_mw(a, b)
        assert (r.na, r.nb) == (len(a), len(b)), g
        assert r.u2 == u2, f"case {g}: {a} vs {b}"
        assert r.tie == tie, g
