"""Source lint: every forced ``F.broadcast`` must document its bound.

Round 10's graph kernels force-broadcast O(V) degree/signature tables —
correct answers locally, a guaranteed driver OOM on a billion-node
graph. The structural lesson: a forced broadcast hint BYPASSES the
planner's size checks, so it is only ever safe on a frame whose size is
bounded by something other than the data volume (a global aggregate, an
enum-keyed rollup, a fixed dim, a top-k limit, a literal/query set, a
config-capped sketch).

This lint makes that reasoning mandatory and reviewable: every line
containing ``F.broadcast(`` in the package must carry (on the same line
or the line directly above) a ``# bounded:`` comment stating WHAT bounds
the broadcast side. An unbounded input has no honest annotation — the
fix is to drop the hint and let AQE's size-based selection decide, as
the graph kernels and the stream-static enrich join now do.

Pure-Python (no Spark session).
"""

from __future__ import annotations

import os

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "etl_pipeline_with_alpha_vantage_spark",
)


def _broadcast_sites():
    for root, _dirs, files in os.walk(PKG):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            lines = open(path).read().splitlines()
            for i, line in enumerate(lines):
                if "F.broadcast(" not in line:
                    continue
                prev = lines[i - 1] if i else ""
                annotated = "# bounded:" in line or "# bounded:" in prev
                yield (
                    os.path.relpath(path, PKG),
                    i + 1,
                    line.strip(),
                    annotated,
                )


def test_every_forced_broadcast_documents_its_bound():
    missing = [
        f"{f}:{n}: {src}"
        for f, n, src, ok in _broadcast_sites()
        if not ok
    ]
    assert not missing, (
        f"{len(missing)} F.broadcast site(s) without a '# bounded:' "
        "annotation (same line or line above). State what bounds the "
        "broadcast side, or drop the hint and let AQE decide:\n"
        + "\n".join(missing)
    )


def test_annotations_are_not_empty():
    """A '# bounded:' stub with no reason defeats the lint."""
    import re

    bad = []
    for root, _dirs, files in os.walk(PKG):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            for i, line in enumerate(open(path).read().splitlines()):
                m = re.search(r"# bounded:(.*)$", line)
                if m and len(m.group(1).strip()) < 8:
                    bad.append(f"{os.path.relpath(path, PKG)}:{i + 1}")
    assert not bad, f"empty/too-short bounded annotations: {bad}"
