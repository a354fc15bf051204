"""Count py4j round trips (and Python-side build time) for a warm
DataFrame-construction pass over the headline queries — the r12/r13
instrument for guide §5 driver-overhead work. Builds every DataFrame
twice (first pass warms table/view/conf memos) and profiles the second,
so the numbers are the per-bench-run steady state.

Usage:
    python tools/rpc_profile.py            # all headline queries
    python tools/rpc_profile.py q1 q2 ...  # subset
    RPC_TOP=40 python tools/rpc_profile.py # widen the per-query table
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from bench import HEADLINE

    from etl_pipeline_with_alpha_vantage_spark import registry
    from etl_pipeline_with_alpha_vantage_spark.session import get_spark

    registry.load_all()
    names = sys.argv[1:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="rpc-profile")

    fns = {n: registry.QUERIES[n] for n in names}
    for fn in fns.values():  # warm pass: memos, JVM classes
        fn(spark, sf_dir)

    # Per-query RPC counts (send_command calls) on the warm pass.
    import py4j.java_gateway as jg

    counts: dict[str, int] = {}
    times: dict[str, float] = {}
    orig = jg.GatewayClient.send_command
    state = {"n": 0}

    def counting(self, *a, **k):
        state["n"] += 1
        return orig(self, *a, **k)

    jg.GatewayClient.send_command = counting
    try:
        for n, fn in fns.items():
            state["n"] = 0
            t0 = time.perf_counter()
            fn(spark, sf_dir)
            times[n] = time.perf_counter() - t0
            counts[n] = state["n"]
    finally:
        jg.GatewayClient.send_command = orig

    total_rpc = sum(counts.values())
    total_t = sum(times.values())
    print(
        f"build pass: {len(fns)} queries, {total_rpc} RPCs "
        f"({total_rpc / len(fns):.0f}/query), {total_t:.2f}s python-side"
    )
    top = int(os.environ.get("RPC_TOP", "25"))
    for n in sorted(counts, key=lambda x: -counts[x])[:top]:
        print(f"  {n}: {counts[n]} rpcs, {times[n] * 1000:.0f} ms")

    # Where does Python time go? cProfile over one more full pass.
    prof = cProfile.Profile()
    prof.enable()
    for fn in fns.values():
        fn(spark, sf_dir)
    prof.disable()
    st = pstats.Stats(prof)
    st.sort_stats("cumulative")
    print("\n--- cumulative hotspots (top 25) ---")
    st.print_stats(25)
    return 0


if __name__ == "__main__":
    sys.exit(main())
