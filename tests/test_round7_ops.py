"""Independent-replay and property tests for the round-7 operators —
the same discipline as the logistic-GD numpy replay: recompute the
operator's math OUTSIDE Spark/DuckDB and pin the engine output to it,
plus hypothesis properties for the pure-arithmetic kernels."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_pipeline_with_alpha_vantage_spark.operators.lakehouse import _Z_BITS
from etl_pipeline_with_alpha_vantage_spark.operators.ml import (
    _KM_ITERS,
    _KM_K,
    ml_kmeans_lloyd,
)
from etl_pipeline_with_alpha_vantage_spark.operators.search import (
    _RRF_DEPTH,
    _RRF_K,
    search_rrf_fusion,
)
from etl_pipeline_with_alpha_vantage_spark.operators.stats import (
    trend_mann_kendall,
)


# --------------------------------------------------------------------------
# Morton interleave: pure-arithmetic kernel must be a bijection
# --------------------------------------------------------------------------


def _interleave_py(bx: int, by: int) -> int:
    """Python replica of lakehouse._interleave_sql's div/mod formula."""
    z = 0
    for i in range(_Z_BITS):
        z += ((bx // (1 << i)) % 2) * (1 << (2 * i + 1))
        z += ((by // (1 << i)) % 2) * (1 << (2 * i))
    return z


def test_morton_interleave_is_bijective_and_bit_exact():
    """The div/mod interleave must equal true bit interleaving and be a
    bijection over the full 256x256 bucket grid (a collision would
    merge unrelated rows into one z-run and silently break pruning)."""
    seen = set()
    for bx in range(1 << _Z_BITS):
        for by in range(1 << _Z_BITS):
            z = _interleave_py(bx, by)
            expect = 0
            for i in range(_Z_BITS):
                expect |= ((bx >> i) & 1) << (2 * i + 1)
                expect |= ((by >> i) & 1) << (2 * i)
            assert z == expect
            seen.add(z)
    assert len(seen) == 1 << (2 * _Z_BITS)


# --------------------------------------------------------------------------
# Compaction fill rule: hypothesis properties
# --------------------------------------------------------------------------


def _fill_bins(sizes: list[int], target: int) -> list[int]:
    """Replica of the SQL rule: size-desc order, bin = (cum - size) DIV
    target (non-negative operands, so // == div here)."""
    order = sorted(range(len(sizes)), key=lambda i: (-sizes[i], i))
    bins = [0] * len(sizes)
    cum = 0
    for i in order:
        cum += sizes[i]
        bins[i] = (cum - sizes[i]) // target
    return bins


@settings(max_examples=200, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=10_000), min_size=1, max_size=40),
    target=st.integers(min_value=10, max_value=5_000),
)
def test_compaction_fill_rule_properties(sizes, target):
    """Invariants of the sequential-fill packing: bin ids are contiguous
    from 0 in fill order; bin count never exceeds file count; every bin
    except possibly the one holding an oversized file stays under
    target + its largest member; total rows are conserved."""
    bins = _fill_bins(sizes, target)
    order = sorted(range(len(sizes)), key=lambda i: (-sizes[i], i))
    seq = [bins[i] for i in order]
    assert seq[0] == 0
    assert all(b2 - b1 >= 0 for b1, b2 in zip(seq, seq[1:]))  # monotone
    n_bins = len(set(bins))
    assert n_bins <= len(sizes)
    assert n_bins >= (sum(sizes) + target - 1) // (2 * target) or n_bins >= 1
    per_bin: dict[int, list[int]] = {}
    for i, b in enumerate(bins):
        per_bin.setdefault(b, []).append(sizes[i])
    for members in per_bin.values():
        assert sum(members) < target + max(members)
    assert sum(sum(m) for m in per_bin.values()) == sum(sizes)


# --------------------------------------------------------------------------
# Mann–Kendall: exact pure-python replay per nation
# --------------------------------------------------------------------------


def test_mann_kendall_matches_pure_python_replay(spark, sf_dir):
    rows = {
        int(r.nation): r
        for r in trend_mann_kendall(spark, sf_dir).collect()
    }
    orders = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas()
    cust = pq.read_table(f"{sf_dir}/customer.parquet").to_pandas()
    df = orders.merge(
        cust[["c_custkey", "c_nationkey"]],
        left_on="o_custkey",
        right_on="c_custkey",
    )
    df = df[df.c_nationkey < 5]
    df["ym"] = df.o_orderdate.dt.year * 100 + df.o_orderdate.dt.month
    df["cents"] = np.round(df.o_totalprice * 100).astype(np.int64)
    for nation, grp in df.groupby("c_nationkey"):
        series = (
            grp.groupby("ym").cents.sum().sort_index().to_numpy()
        )
        n = len(series)
        s = 0
        for i in range(n):
            for j in range(i + 1, n):
                s += int(np.sign(series[j] - series[i]))
        _, tie_counts = np.unique(series, return_counts=True)
        tie_term = int(sum(t * (t - 1) * (2 * t + 5) for t in tie_counts))
        var18 = n * (n - 1) * (2 * n + 5) - tie_term
        cc = 1 if s > 0 else (-1 if s < 0 else 0)
        z_micro = round((s - cc) / np.sqrt(var18 / 18.0) * 1_000_000)
        got = rows[int(nation)]
        assert (got.n_months, got.s_stat, got.var18) == (n, s, var18)
        assert got.z_micro == z_micro


# --------------------------------------------------------------------------
# k-means: numpy replay of the exact micro-int recurrence
# --------------------------------------------------------------------------


def test_kmeans_matches_numpy_replay(spark, sf_dir):
    got = {
        int(r.cid): (int(r.n_points), int(r.inertia), int(r.checksum))
        for r in ml_kmeans_lloyd(spark, sf_dir).collect()
    }
    def round_half_away(x):
        # Spark/DuckDB round() is half-away-from-zero; np.round is
        # half-to-even — the one-off centroid coordinate that lands on
        # .5 diverges otherwise (observed at sf0.001).
        return np.sign(x) * np.floor(np.abs(x) + 0.5)

    tab = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    tab = tab.sort_values("vec_id")
    emb = np.stack(tab.embedding.to_numpy()).astype(np.float64)
    e = round_half_away(emb * 1_000_000).astype(np.int64)  # micro-ints
    cent = e[: _KM_K].copy()
    cids = np.arange(_KM_K)

    def assign(c):
        # exact integer squared distances; ties -> lowest centroid id
        d = ((e[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        best = d.argmin(axis=1)  # first (lowest index) min — matches
        return cids[best], d[np.arange(len(e)), best]

    for _ in range(_KM_ITERS):
        a, _ = assign(cent)
        new = []
        keep = []
        for k in range(len(cent)):
            mask = a == k
            if mask.any():
                new.append(
                    round_half_away(
                        e[mask].sum(axis=0) * 1.0 / mask.sum()
                    ).astype(np.int64)
                )
                keep.append(cids[k])
        cent = np.stack(new)
        cids = np.array(keep)
    a, md = assign(cent)
    want = {}
    dims = np.arange(1, e.shape[1] + 1, dtype=np.int64)
    for idx, k in enumerate(cids):
        mask = a == k
        if mask.any():
            want[int(k)] = (
                int(mask.sum()),
                int(md[mask].sum()),
                int((dims * cent[idx]).sum()),
            )
    assert got == want


# --------------------------------------------------------------------------
# RRF fusion: internal consistency of ranks and fused scores
# --------------------------------------------------------------------------


def test_rrf_fusion_scores_consistent(spark, sf_dir):
    rows = search_rrf_fusion(spark, sf_dir).collect()
    assert rows

    def contrib(rank):
        return 0 if rank is None else round(1_000_000.0 / (_RRF_K + rank))

    for r in rows:
        assert r.bm25_rank is None or 1 <= r.bm25_rank <= _RRF_DEPTH
        assert r.vec_rank is None or 1 <= r.vec_rank <= _RRF_DEPTH
        assert r.bm25_rank is not None or r.vec_rank is not None
        assert r.rrf_micro == contrib(r.bm25_rank) + contrib(r.vec_rank)
    # descending fused score with deterministic doc_id ties
    scores = [(r.rrf_micro, -r.doc_id) for r in rows]
    assert scores == sorted(scores, reverse=True)


# --------------------------------------------------------------------------
# as-of join: pandas merge_asof third opinion (Spark ≡ DuckDB ≡ pandas)
# --------------------------------------------------------------------------


def test_asof_join_matches_pandas_merge_asof(spark, sf_dir):
    """The backward as-of join must agree with pandas.merge_asof
    (direction='backward', allow_exact_matches=True) — an independent
    third implementation beside the DuckDB ASOF JOIN oracle. Ties on
    identical click timestamps resolve to the highest event_id in both
    (last row in (ts, event_id) sort order)."""
    import pandas as pd

    from etl_pipeline_with_alpha_vantage_spark.operators.asof import (
        asof_join,
    )

    got = {
        (r.purchase_id, r.click_id)
        for r in asof_join(spark, sf_dir)
        .select("purchase_id", "click_id")
        .collect()
    }

    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    ev["ts"] = pd.to_datetime(ev.ts)
    clicks = (
        ev[ev.event_type == "click"][["user_id", "ts", "event_id"]]
        .rename(columns={"event_id": "click_id"})
        .sort_values(["ts", "click_id"], kind="stable")
        .reset_index(drop=True)
    )
    purchases = (
        ev[ev.event_type == "purchase"][["user_id", "ts", "event_id"]]
        .rename(columns={"event_id": "purchase_id"})
        .sort_values(["ts", "purchase_id"], kind="stable")
        .reset_index(drop=True)
    )
    merged = pd.merge_asof(
        purchases,
        clicks,
        on="ts",
        by="user_id",
        direction="backward",
        allow_exact_matches=True,
    )
    want = {
        (int(r.purchase_id), None if pd.isna(r.click_id) else int(r.click_id))
        for r in merged.itertuples()
    }
    assert got == want
    assert len(got) > 0
