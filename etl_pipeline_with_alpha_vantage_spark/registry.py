"""Query/oracle registry backing the driver contract (``__spark_entry__.py``).

Every operator module registers its named queries here with an optional
DuckDB oracle SQL string. ``__spark_entry__.queries()`` / ``oracle_sql()``
just re-export these dicts, so the Spark program and its differential
oracle always land together.

Registration happens at import time; ``load_all()`` imports every operator
module exactly once.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_LOADED = False


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``.

    ``oracle`` is the equivalent ANSI SQL for DuckDB over the pre-registered
    views. Omit it only for genuinely non-SQL-expressible ops (LSH,
    streaming state) — the driver then records a weaker rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The driver's harness supplies its OWN SparkSession; re-assert
            # the runtime confs the query semantics depend on (ANSI off,
            # UTC, nanos-as-long) before any plan is built.
            from .catalog import ensure_query_confs  # noqa: PLC0415

            ensure_query_confs(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = getattr(fn, "__name__", name)
        wrapped.__doc__ = fn.__doc__
        wrapped.__wrapped__ = fn
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Imports are for their registration side effects.
    from .operators import (  # noqa: F401
        agg_ext,
        asof,
        bloom,
        curation,
        dedup,
        dq,
        graph,
        lakehouse,
        linkage,
        ml,
        multimodal,
        observe,
        packing,
        paging_joins,
        quant,
        relational,
        relational_ext,
        reshape,
        search,
        similarity,
        skew,
        stats,
        survival,
        text,
        timeseries,
        tokenizer,
        tpch_suite,
        udf,
        windows,
    )
    from .pipeline import alpha_vantage  # noqa: F401
    from .sources import files, python_datasource  # noqa: F401
    from .streaming import windows as stream_windows  # noqa: F401

    _LOADED = True
