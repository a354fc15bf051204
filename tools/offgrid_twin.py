"""Off-grid scale-factor twin (round-8 robustness item).

Queries that derive thresholds FROM the data (churn horizons from
MAX(date), RFM medians, balanced-sampling quotas, equi-depth cut
points…) are proven at the three fixed SFs the driver generated
(0.001/0.01/0.1) — a constant accidentally tuned to those grids would
pass all of them. This tool manufactures an SF the queries have never
seen (~0.05) by DETERMINISTIC halving of sf0.1 with pyarrow (physical
parquet types preserved bit-for-bit, including events'
TIMESTAMP(NANOS) — a Spark rewrite would silently change it):

- orders: o_orderkey % 2 == 0; lineitem: rows of kept orders (FK-safe)
- events / documents / embeddings: even event_id / doc_id / vec_id
- customer/supplier/part/nation/region: copied (dimensions don't scale)

Every derived constant therefore changes (different max date, medians,
class counts) while schema and referential shape stay the driver's.
Run the sweep with the standard gate replica:

    python tools/offgrid_twin.py [out_dir]      # build the twin
    python tools/verify_bare.py <out_dir> --names ... --json OFFGRID.json
"""

from __future__ import annotations

import os
import sys

import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# The ~data-derived-constant cohort this twin exists to stress; kept
# here so the sweep command is reproducible verbatim.
TARGET_QUERIES = [
    "churn_rate_by_nation",
    "rfm_segments",
    "sample_balanced_classes",
    "agg_exact_median_2pass",
    "agg_exact_percentiles_2pass",
    "agg_equidepth_buckets",
    "agg_winsorized_mean",
    "agg_robust_mad",
    "abc_pareto_classes",
    "concurrency_peak",
    "sample_domain_cap",
    "data_mix_temperature",
]


def _even(t, col):
    return t.filter(pc.equal(pc.bit_wise_and(t[col], 1), 0))


def build(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    copy = ["customer", "supplier", "part", "nation", "region"]
    for name in copy:
        pq.write_table(
            pq.read_table(f"{SRC}/{name}.parquet"),
            f"{out_dir}/{name}.parquet",
        )
    orders = _even(pq.read_table(f"{SRC}/orders.parquet"), "o_orderkey")
    pq.write_table(orders, f"{out_dir}/orders.parquet")
    li = pq.read_table(f"{SRC}/lineitem.parquet")
    li = li.filter(pc.is_in(li["l_orderkey"], orders["o_orderkey"]))
    pq.write_table(li, f"{out_dir}/lineitem.parquet")
    for name, key in [
        ("events", "event_id"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ]:
        pq.write_table(
            _even(pq.read_table(f"{SRC}/{name}.parquet"), key),
            f"{out_dir}/{name}.parquet",
        )
    for name in [*copy, "orders", "lineitem", "events", "documents",
                 "embeddings"]:
        n = pq.read_metadata(f"{out_dir}/{name}.parquet").num_rows
        print(f"{name}: {n} rows")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf005"
    build(out)
    print(f"twin at {out}; sweep with:\n  python tools/verify_bare.py {out} "
          f"--names {','.join(TARGET_QUERIES)} --json OFFGRID.json")
