"""Exhaustive differential test of the canonical BPE merge fold.

Both engines' merge kernels (Spark `_apply_merge` F.aggregate fold;
DuckDB `_sql_fold` list_reduce twin) are compared against a transparent
pure-Python reference of Sennrich's single-pass greedy merge — a
two-pointer scan that merges non-overlapping (p1, p2) occurrences left
to right — over EVERY token list up to length 6 on the alphabet
{a, b, ab} crossed with the pairs {(a,b), (a,a), (b,a)}. The alphabet
includes the token 'ab' on purpose: it equals the (a,b) merge RESULT,
so pre-existing merged tokens adjacent to fresh p2s are covered. 3276
cases per pair set, all in one Spark action / one DuckDB query.

This is the regression fence for the round-8 rework that replaced the
delimiter-consuming replace() device (which skipped back-to-back
occurrences: ' a b a b ' -> ' ab a b ') with the fold.
"""

from __future__ import annotations

import itertools

import duckdb
import pytest

from pyspark.sql import functions as F

from etl_pipeline_with_alpha_vantage_spark.operators.tokenizer import (
    _apply_merge,
    _sql_fold,
)

ALPHABET = ["a", "b", "ab"]
PAIRS = [("a", "b"), ("a", "a"), ("b", "a")]
MAX_LEN = 6


def _ref_merge(toks: list[str], p1: str, p2: str) -> list[str]:
    """Sennrich's greedy pass: scan left to right, merge each
    non-overlapping (p1, p2) occurrence, continue after the merge."""
    out, i = [], 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == p1 and toks[i + 1] == p2:
            out.append(p1 + p2)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def _cases():
    for n in range(1, MAX_LEN + 1):
        for toks in itertools.product(ALPHABET, repeat=n):
            yield list(toks)


@pytest.mark.parametrize("p1,p2", PAIRS)
def test_spark_fold_matches_reference_exhaustively(spark, p1, p2):
    rows = [
        (
            " " + " ".join(toks) + " ",
            " " + " ".join(_ref_merge(toks, p1, p2)) + " ",
        )
        for toks in _cases()
    ]
    df = spark.createDataFrame(rows, "sym string, expected string")
    bad = df.filter(
        _apply_merge(F.col("sym"), f"{p1} {p2}") != F.col("expected")
    ).count()
    assert bad == 0, f"{bad}/{len(rows)} fold results diverge for ({p1},{p2})"


@pytest.mark.parametrize("p1,p2", PAIRS)
def test_duckdb_fold_matches_reference_exhaustively(p1, p2):
    con = duckdb.connect()
    rows = [
        (
            " " + " ".join(toks) + " ",
            " " + " ".join(_ref_merge(toks, p1, p2)) + " ",
        )
        for toks in _cases()
    ]
    con.execute("CREATE TABLE t (sym VARCHAR, expected VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    fold = _sql_fold("sym", f"'{p1} {p2}'")
    bad = con.execute(
        f"SELECT COUNT(*) FROM t WHERE {fold} <> expected"
    ).fetchone()[0]
    con.close()
    assert bad == 0, f"{bad}/{len(rows)} DuckDB folds diverge for ({p1},{p2})"
