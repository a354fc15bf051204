"""Round-11 physical-plan pins for the wedge-join family.

Round 10's lesson: output-side assertions cannot see a pre-filter
explosion. The wedge kernels' hub caps were LOGICALLY correct (answers
hash-exact) while the optimized plan executed the a⋈b self-join over
the UNFILTERED edge list and applied the cap afterwards — a degree-d
super-hub still materialized ~d²/2 intermediate rows. These tests pin
the fix two independent ways:

* a plan WALK over the ``optimizedPlan()`` TREE (py4j: ``children()``
  traversal, not text-column parsing — ADVICE r11: the textual layout
  shifts across Spark versions/CBO settings even when the physical
  shape is still correct) asserting the degree filter is a descendant
  of BOTH wedge-join children;
* an ``Observation`` row counter ON the wedge stage asserting the
  intermediate volume equals the closed form Σ C(d_kept, 2) — the
  measurement the round-10 skew test lacked. This is the PRIMARY pin;
  the tree walk is the structural cross-check.
"""

from __future__ import annotations

import re
from math import comb

import pytest
from pyspark.sql import Observation

from etl_pipeline_with_alpha_vantage_spark import registry
from etl_pipeline_with_alpha_vantage_spark.operators.graph import (
    jaccard_minhash_scored,
    jaccard_scored_pairs,
    ra_scored_pairs,
)

registry.load_all()


def _optimized(spark, name, sf_dir):
    df = registry.QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().optimizedPlan()


def _jchildren(node):
    """Children of a Catalyst TreeNode via py4j (Scala Seq → list)."""
    seq = node.children()
    return [seq.apply(i) for i in range(seq.length())]


def _wedge_children(plan) -> tuple[str, str]:
    """Walk the logical-plan TREE (not its textual rendering) to the
    wedge self-join — the Join node whose own one-line description
    carries both supp_a and supp_b in a '<' condition — and return each
    child SUBTREE's text for the regex assertions. Tree traversal is
    stable across Spark's plan-string layout changes and join-order
    rewrites; asserting on BOTH children keeps the check order-
    independent even if a reorder swaps them."""
    stack = [plan]
    while stack:
        n = stack.pop()
        head = n.simpleString(200)
        if (
            n.nodeName() == "Join"
            and "supp_a#" in head
            and "supp_b#" in head
            and "<" in head
        ):
            kids = _jchildren(n)
            assert len(kids) == 2, head
            return kids[0].toString(), kids[1].toString()
        # pre-order (parent, then children left→right), matching the
        # rendering order so the hybrid kernel's FIRST candidate — the
        # exact wedge join — wins over the later LSH band-pair join
        stack.extend(reversed(_jchildren(n)))
    raise AssertionError(f"no wedge self-join found in:\n{plan.toString()}")


@pytest.mark.parametrize(
    ("name", "filt"),
    [
        ("graph_linkpred_ra", r"Filter \(\(d#\d+L >= 2\) AND \(d#\d+L <= 50\)\)"),
        ("graph_jaccard_neighbors", r"Filter \(pd#\d+L? >= 2\)"),
        (
            "graph_jaccard_minhash",
            r"Filter \(\(pd#\d+L >= 2\) AND \(pd#\d+L <= 32\)\)",
        ),
    ],
)
def test_degree_cap_below_both_wedge_children(spark, sf_dir, name, filt):
    """The hub/degree cap must sit BELOW the wedge self-join on BOTH
    sides — i.e. each child subtree contains the per-part degree
    aggregate and its cap filter. The round-10 shape (cap joined after
    the expansion) put the Aggregate+Filter ABOVE the self-join, where
    this walk cannot find it."""
    plan = _optimized(spark, name, sf_dir)
    for side, sub in zip(("left", "right"), _wedge_children(plan)):
        assert "Aggregate [part#" in sub, (name, side, plan)
        assert re.search(filt, sub), (name, side, plan)


def test_ra_wedge_intermediate_volume_is_closed_form(spark):
    """A 60-supplier hub (degree 60 > cap 50) must contribute ZERO
    intermediate wedge rows — the observe counter on the wedge stage
    reads exactly Σ C(d_kept, 2), not Σ C(d, 2)."""
    rows = []
    for s in range(60):
        rows.append((s, 1))  # super-hub part: d=60 > cap 50
        rows.append((s, 10 + s // 4))  # kept parts: d=4
        rows.append((s, 1000 + s))  # private parts: d=1
    sp = spark.createDataFrame(rows, "supp long, part long")
    obs = Observation()
    scored = ra_scored_pairs(sp, wedge_observation=obs)
    n_pairs = scored.count()
    expected = 15 * comb(4, 2)  # 15 kept parts x C(4,2)
    assert obs.get["wedges"] == expected, obs.get
    assert n_pairs == 15 * comb(4, 2)  # d=4 block pairs are disjoint


def test_jaccard_wedge_intermediate_volume_is_closed_form(spark):
    """Degree-1 parts must never enter the expansion: intermediate
    wedge rows == Σ over d>=2 parts of C(d, 2)."""
    rows = []
    for s in range(40):
        rows.append((s, 10 + s // 5))  # shared parts: d=5
        rows.append((s, 1000 + s))  # private parts: d=1 (pruned)
    sp = spark.createDataFrame(rows, "supp long, part long")
    obs = Observation()
    scored = jaccard_scored_pairs(sp, wedge_observation=obs)
    n_pairs = scored.count()
    assert obs.get["wedges"] == 8 * comb(5, 2), obs.get
    assert n_pairs == 8 * comb(5, 2)


def test_jmh_superhub_contributes_zero_wedges(spark):
    """The hybrid kernel's exact side: a 200-degree super-hub (cap 32)
    contributes signature rows, never wedges — the counter must read
    exactly the kept-part closed form even with the hub present."""
    rows = []
    for s in range(200):
        rows.append((s, 1))  # super-hub: d=200 >> cap 32
        rows.append((s, 10 + s // 10))  # kept: d=10
        rows.append((s, 5000 + s))  # private: d=1
    sp = spark.createDataFrame(rows, "supp long, part long")
    obs = Observation()
    scored = jaccard_minhash_scored(sp, wedge_observation=obs)
    scored.count()
    assert obs.get["wedges"] == 20 * comb(10, 2), obs.get
