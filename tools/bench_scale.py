"""Scale bench (r13, VERDICT #5): time the claims-bearing query cohort
on a LARGER fixture at two core counts, so "the plan is right at scale"
claims (wedge shuffle-hash, ANN single-pass, GD lineage breaks,
adaptive walk width) become measured evidence instead of sf0.1
readings that the r12 verdict showed are fixed-overhead-bound
(8-core ≈ 32-core on every sampled query).

Methodology matches bench.py exactly — same session confs, same warm-up
discipline, derived memos cleared before each query's loop, min-of-3
noop-sink timings plus the cold first run — so numbers are comparable
to BENCH_DETAIL at a different (sf, cpus) point. This tool does NOT
replace the driver bench; results land in BENCH_SCALE.json via the
committed runner snippet in OPTIMIZATION_r13.md.

Usage:
    python tools/scale_fixture.py 10 /tmp/sgraft_sf1
    SPARK_GRAFT_SF_DIR=/tmp/sgraft_sf1 SPARK_GRAFT_CPUS=32 \
        python tools/bench_scale.py
    SPARK_GRAFT_SF_DIR=/tmp/sgraft_sf1 SPARK_GRAFT_CPUS=8 \
        python tools/bench_scale.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# The cohort whose 100 TB claims the round rests on, plus the heaviest
# headline queries: graph sweeps (shuffle_hash wedge joins, k-core
# peel, adaptive-width recursive walks), the ANN/dedup family
# (single-Arrow-pass index artifacts), iterative ML (lineage breaks),
# the parallelized comparator stages, and two scan-bound controls.
NAMES = [
    "graph_pagerank",
    "graph_kcore_peel",
    "graph_label_propagation",
    "graph_jaccard_minhash",
    "graph_jaccard_neighbors",
    "graph_linkpred_ra",
    "graph_bfs_distances",
    "sql_bfs_distances",
    "sql_recursive_hierarchy",
    "dedup_minhash_lsh",
    "dedup_minhash_verify",
    "similarity_lsh_topk",
    "similarity_ivf_topk",
    "similarity_pq_adc_topk",
    "similarity_pq_rerank_topk",
    "ml_logistic_gd",
    "ml_kmeans_lloyd",
    "linkage_fellegi_sunter",
    "sample_dsir_importance",
    "basket_affinity",
    "agg_kmv_set_ops",
    "text_bigram_lm",
    "filter_predicates",
    "agg_having_large_orders",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR")
    if not sf_dir:
        sys.exit("set SPARK_GRAFT_SF_DIR to the scale fixture dir")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from etl_pipeline_with_alpha_vantage_spark import registry
    from etl_pipeline_with_alpha_vantage_spark.catalog import (
        TABLES,
        clear_derived_memos,
        table,
    )
    from etl_pipeline_with_alpha_vantage_spark.session import get_spark

    registry.load_all()
    spark = get_spark(
        app_name="bench-scale",
        extra_conf={
            "spark.driver.memory": os.environ.get(
                "BENCH_DRIVER_MEM", "24g"
            ),
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "false",
        },
    )

    registry.QUERIES["topk_orders"](spark, sf_dir).collect()
    for t in TABLES:
        table(spark, sf_dir, t).limit(1).collect()
    warm = registry.QUERIES[NAMES[0]]
    for _ in range(4):
        warm(spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for qi, name in enumerate(NAMES):
        if qi and qi % 8 == 0:
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        fn = registry.QUERIES[name]
        clear_derived_memos(spark)
        spark.sparkContext.setJobDescription(f"scale:{name}")
        best = float("inf")
        for ri in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            if ri == 0:
                cold[name] = round(dt, 3)
            best = min(best, dt)
        timings[name] = round(best, 3)
        print(
            f"# {name}: warm {timings[name]} cold {cold[name]}",
            file=sys.stderr,
        )
    spark.stop()

    print(
        json.dumps(
            {
                "metric": "scale_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "sf_dir": sf_dir,
                "cpus": int(cpus),
                "queries": timings,
                "cold": cold,
            }
        )
    )


if __name__ == "__main__":
    main()
