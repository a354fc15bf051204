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


def _random_series():
    """Random monthly series per case (nation = case id): short, heavy
    ties, at least two distinct values so 18·Var > 0."""
    rng = random.Random(77)
    cases, rows = {}, []
    for g in range(150):
        n = rng.randint(3, 40)
        hi = rng.choice([2, 5, 1000])
        xs = [rng.randint(0, hi) for _ in range(n)]
        if len(set(xs)) < 2:
            xs[0] = hi + 1
        cases[str(g)] = xs
        rows += [(str(g), f"2020-{1 + i:03d}", v) for i, v in enumerate(xs)]
    return cases, rows


def _round_half_away(fr):
    """SQL round() semantics (half away from zero) on an exact Fraction."""
    from fractions import Fraction
    import math

    if fr >= 0:
        return math.floor(fr + Fraction(1, 2))
    return -math.floor(-fr + Fraction(1, 2))


def test_mann_kendall_readout_matches_reference(spark):
    from etl_pipeline_with_alpha_vantage_spark.operators.stats import (
        _MK_READOUT_SQL,
    )

    cases, rows = _random_series()
    spark.createDataFrame(
        rows, "nation string, ym string, rev_cents long"
    ).createOrReplaceTempView("monthly")
    got = {r.nation: r for r in spark.sql(_MK_READOUT_SQL).collect()}
    assert len(got) == len(cases)
    from collections import Counter

    for g, xs in cases.items():
        n = len(xs)
        s = sum(
            (xs[j] > xs[i]) - (xs[j] < xs[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        tie_term = sum(
            t * (t - 1) * (2 * t + 5) for t in Counter(xs).values()
        )
        var18 = n * (n - 1) * (2 * n + 5) - tie_term
        r = got[g]
        assert r.n_months == n, g
        assert r.s_stat == s, f"case {g}: {xs}"
        assert r.var18 == var18, g


def test_theil_sen_readout_matches_reference(spark):
    from fractions import Fraction
    import math

    from etl_pipeline_with_alpha_vantage_spark.operators.stats import (
        _TS_READOUT_SQL,
    )

    cases, rows = _random_series()
    spark.createDataFrame(
        rows, "nation string, ym string, rev_cents long"
    ).createOrReplaceTempView("monthly")
    got = {r.nation: r for r in spark.sql(_TS_READOUT_SQL).collect()}
    assert len(got) == len(cases)
    for g, xs in cases.items():
        n = len(xs)
        slopes = sorted(
            _round_half_away(Fraction(xs[j] - xs[i], j - i))
            for i in range(n)
            for j in range(i + 1, n)
        )
        m = len(slopes)
        mids = (
            [slopes[(m - 1) // 2]]
            if m % 2 == 1
            else [slopes[m // 2 - 1], slopes[m // 2]]
        )
        expect = math.floor(Fraction(sum(mids), len(mids)))
        r = got[g]
        assert r.n_pairs == m, g
        assert r.ts_slope_cents == expect, f"case {g}: {xs}"
