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

# Source SF overridable so the twin generators are themselves testable
# against the small fixture (tests/test_layout.py's twin-invariant tests).
SRC = os.environ.get("OFFGRID_SRC", "/root/testdata/sf0.1")

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


# ---------------------------------------------------------------------------
# Round-9: the UP-scaled twin (~1.7 x sf0.1). The halved twin only probes
# constants in the shrinking direction; a bound tuned to "fits sf0.1"
# (id ranges, bucket counts, collect sizes) survives it. This twin grows
# every fact table by cloning a deterministic ~70% of rows to NEW ids
# beyond the original key range:
#   - orders/lineitem: cloned keys + (max key + 1), FK-consistent, all
#     timestamps + 13 days (MAX(date)-derived horizons move UP);
#   - events: cloned event_id + offset AND ts + full span + 1 day, so
#     the generator's id-monotonic-in-ts contract survives cloning;
#   - documents/embeddings: cloned ids + offset with payloads kept —
#     deliberately creating TRUE exact/near duplicates for the dedup
#     tiers at never-trained sizes;
#   - dimensions copied (they don't scale).
# pyarrow-only, physical types preserved; every derived constant
# (max dates, medians, quotas, cut points, id ranges) moves in the
# direction fixed-grid training never exercised.
# ---------------------------------------------------------------------------


def _clone_frac(t, col):
    """Deterministic ~70% clone subset: key % 10 < 7."""
    import pyarrow as pa  # noqa: PLC0415

    sel = pc.less(
        pc.subtract(
            t[col], pc.multiply(pc.divide(t[col], pa.scalar(10)), 10)
        ),
        7,
    )
    return t.filter(sel)


def _shift(t, col, amount):
    """Replace ``col`` with ``col + amount`` (pyarrow scalar arithmetic —
    int64 + int64 or timestamp + duration, type-preserving)."""
    i = t.schema.get_field_index(col)
    return t.set_column(i, t.schema.field(i), pc.add(t[col], amount))


def build_up(out_dir: str, src: str = None) -> None:
    import pyarrow as pa  # noqa: PLC0415

    src = src or SRC

    os.makedirs(out_dir, exist_ok=True)
    copy = ["customer", "supplier", "part", "nation", "region"]
    for name in copy:
        pq.write_table(
            pq.read_table(f"{src}/{name}.parquet"),
            f"{out_dir}/{name}.parquet",
        )
    day_us = 86_400 * 10**6

    orders = pq.read_table(f"{src}/orders.parquet")
    off_o = pc.max(orders["o_orderkey"]).as_py() + 1
    oc = _clone_frac(orders, "o_orderkey")
    cloned_keys = oc["o_orderkey"]
    oc = _shift(oc, "o_orderkey", off_o)
    oc = _shift(oc, "o_orderdate", pa.scalar(13 * day_us, pa.duration("us")))
    pq.write_table(
        pa.concat_tables([orders, oc]), f"{out_dir}/orders.parquet"
    )

    li = pq.read_table(f"{src}/lineitem.parquet")
    lc = li.filter(pc.is_in(li["l_orderkey"], cloned_keys))
    lc = _shift(lc, "l_orderkey", off_o)
    lc = _shift(lc, "l_shipdate", pa.scalar(13 * day_us, pa.duration("us")))
    pq.write_table(pa.concat_tables([li, lc]), f"{out_dir}/lineitem.parquet")

    ev = pq.read_table(f"{src}/events.parquet")
    off_e = pc.max(ev["event_id"]).as_py() + 1
    span_us = (
        pc.max(ev["ts"]).as_py() - pc.min(ev["ts"]).as_py()
    ) // __import__("datetime").timedelta(microseconds=1)
    ec = _clone_frac(ev, "event_id")
    ec = _shift(ec, "event_id", off_e)
    ec = _shift(
        ec, "ts", pa.scalar(span_us + day_us, pa.duration("us"))
    )
    pq.write_table(pa.concat_tables([ev, ec]), f"{out_dir}/events.parquet")

    for name, key in [("documents", "doc_id"), ("embeddings", "vec_id")]:
        t = pq.read_table(f"{src}/{name}.parquet")
        c = _shift(
            _clone_frac(t, key), key, pc.max(t[key]).as_py() + 1
        )
        pq.write_table(
            pa.concat_tables([t, c]), f"{out_dir}/{name}.parquet"
        )

    for name in [*copy, "orders", "lineitem", "events", "documents",
                 "embeddings"]:
        n = pq.read_metadata(f"{out_dir}/{name}.parquet").num_rows
        print(f"{name}: {n} rows")


def build(out_dir: str, src: str = None) -> None:
    src = src or SRC
    os.makedirs(out_dir, exist_ok=True)
    copy = ["customer", "supplier", "part", "nation", "region"]
    for name in copy:
        pq.write_table(
            pq.read_table(f"{src}/{name}.parquet"),
            f"{out_dir}/{name}.parquet",
        )
    orders = _even(pq.read_table(f"{src}/orders.parquet"), "o_orderkey")
    pq.write_table(orders, f"{out_dir}/orders.parquet")
    li = pq.read_table(f"{src}/lineitem.parquet")
    li = li.filter(pc.is_in(li["l_orderkey"], orders["o_orderkey"]))
    pq.write_table(li, f"{out_dir}/lineitem.parquet")
    for name, key in [
        ("events", "event_id"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ]:
        pq.write_table(
            _even(pq.read_table(f"{src}/{name}.parquet"), key),
            f"{out_dir}/{name}.parquet",
        )
    for name in [*copy, "orders", "lineitem", "events", "documents",
                 "embeddings"]:
        n = pq.read_metadata(f"{out_dir}/{name}.parquet").num_rows
        print(f"{name}: {n} rows")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--up"]
    if "--up" in sys.argv:
        out = args[0] if args else "/tmp/spark_graft_sf017"
        build_up(out)
    else:
        out = args[0] if args else "/tmp/spark_graft_sf005"
        build(out)
    print(f"twin at {out}; sweep with:\n  python tools/verify_bare.py {out} "
          f"--names {','.join(TARGET_QUERIES)} --json OFFGRID.json")
