"""Round-13 optimization-round tests: derived-memo accounting.

The r12 verdict's finding: session-scoped memos of *computed* artifacts
(LPA labels, the monthly trend aggregate, landmark BFS state) combined
with bench.py's min-of-3 meant the amortized build landed in no recorded
timing. r13 makes every derived memo registrable and clearable so the
bench charges the build to a reported cold run. These tests pin that
machinery: registration, clearing scope (derived yes, metadata no),
file-identity keying, and recompute-equivalence after a clear.
"""

from __future__ import annotations

from etl_pipeline_with_alpha_vantage_spark import registry
from etl_pipeline_with_alpha_vantage_spark.catalog import (
    _DERIVED_MEMO_NAMES,
    _session_cache,
    clear_derived_memos,
    derived_memo_key,
    table,
)


def test_derived_memo_key_registers_and_carries_file_identity(spark, sf_dir):
    key = derived_memo_key("cosupply_edges", sf_dir, ("lineitem",))
    assert "cosupply_edges" in _DERIVED_MEMO_NAMES
    assert key[0] == "cosupply_edges" and key[1] == sf_dir
    # file identity present: (path, mtime_ns, size) of lineitem.parquet
    ident = key[2]
    assert ident and ident[0][0][0].endswith("lineitem.parquet")


def test_clear_derived_memos_scope(spark, sf_dir):
    registry.load_all()
    from etl_pipeline_with_alpha_vantage_spark.operators.graph import (
        _cosupply_edges,
    )

    # Build a derived artifact and a metadata memo.
    _cosupply_edges(spark, sf_dir)
    table(spark, sf_dir, "lineitem")
    cache = _session_cache(spark)
    derived_keys = [
        k
        for k in cache
        if isinstance(k, tuple) and k and k[0] == "cosupply_edges"
    ]
    assert derived_keys, "fixture memo not present after build"
    meta_keys_before = [
        k for k in cache if isinstance(k, tuple) and k and k[1] == "lineitem"
    ]
    assert meta_keys_before, "table() metadata memo not present"

    clear_derived_memos(spark)
    cache = _session_cache(spark)
    assert not any(
        isinstance(k, tuple) and k and k[0] == "cosupply_edges" for k in cache
    ), "derived memo survived the clear"
    # Metadata memos (loaded table frames) are NOT part of the reset.
    assert any(
        isinstance(k, tuple) and k and k[1] == "lineitem" for k in cache
    ), "table() metadata memo was wrongly cleared"


def test_recompute_after_clear_matches(spark, sf_dir):
    """The cold (post-clear) recompute must produce the identical rows —
    the memo is an amortization, never a semantic input."""
    registry.load_all()
    q = registry.QUERIES["trend_mann_kendall"]
    warm = sorted(map(tuple, q(spark, sf_dir).collect()))
    clear_derived_memos(spark)
    cold = sorted(map(tuple, q(spark, sf_dir).collect()))
    assert warm == cold


def test_module_level_derived_caches_registered():
    """The IVF codebook and learned-BPE-merge caches hold computed
    artifacts and must participate in the bench's memo reset."""
    import etl_pipeline_with_alpha_vantage_spark.operators.similarity as sim
    import etl_pipeline_with_alpha_vantage_spark.operators.tokenizer as tok
    from etl_pipeline_with_alpha_vantage_spark.catalog import (
        _DERIVED_MODULE_CACHES,
    )

    assert any(d is sim._IVF_CODEBOOK_CACHE for d in _DERIVED_MODULE_CACHES)
    assert any(d is tok._MERGES_CACHE for d in _DERIVED_MODULE_CACHES)


def test_bench_charges_memo_builds_source_guard():
    """bench.py must reset derived memos before each query's timing loop
    and report the first (cold) run separately — the r12 verdict's
    honest-accounting requirement."""
    import os

    src = open(
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py")
    ).read()
    assert "clear_derived_memos(spark)" in src
    assert '"cold"' in src and "cold_total" in src


def test_floor_file_annotates_amortized_queries():
    import json
    import os

    floor = json.load(
        open(
            os.path.join(
                os.path.dirname(os.path.dirname(__file__)),
                "BENCH_FLOOR.json",
            )
        )
    )
    am = set(floor.get("amortized", ()))
    assert {
        "graph_label_propagation",
        "graph_modularity",
        "trend_mann_kendall",
        "graph_closeness_landmark",
        "graph_betweenness_sampled",
        "sql_bfs_distances",
    } <= am
