"""Shared fixtures: one SparkSession per test run + a DuckDB-oracle
comparator that mirrors the driver's correctness gate (row count +
column names + order-insensitive exact value multiset)."""

from __future__ import annotations

import math
import os
import sys
from datetime import datetime

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kinesis2sse_spark.catalog import TABLES
from kinesis2sse_spark.session import build_session

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="kinesis2sse_spark_tests", shuffle_partitions=8)
    yield s


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    if v is None:
        return "\0null"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, bool):
        return "b:" + str(v)
    return f"{type(v).__name__}:{v}"


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted("|".join(_norm_cell(row[i]) for i in order) for row in rows)


def assert_matches_oracle(spark, name: str, sf_dir: str = SF_CORRECTNESS, max_diff_show: int = 5):
    """Run registry query `name` in Spark and its oracle in DuckDB; assert
    row-count, column-name, and order-insensitive value equality."""
    from kinesis2sse_spark.registry import all_oracles, all_queries

    fn = all_queries()[name]
    sql = all_oracles()[name]
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_connect(sf_dir)
    try:
        cur = con.execute(sql)
        o_cols = [d[0] for d in cur.description]
        o_rows = cur.fetchall()
    finally:
        con.close()

    assert sorted(s_cols) == sorted(o_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count spark={len(s_rows)} oracle={len(o_rows)}"
    )
    s_norm = _normalize(s_rows, s_cols)
    o_norm = _normalize(o_rows, o_cols)
    if s_norm != o_norm:
        diffs = [
            (a, b) for a, b in zip(s_norm, o_norm) if a != b
        ][:max_diff_show]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")


def exact_substring_removal_model(docs: dict, span_len: int) -> dict:
    """Pure-Python ExactSubstr-remove reference shared by the smoke-
    corpus and random-corpus tests: ONE definition of the semantics
    (windows occurring in >1 distinct doc mark their covered
    positions; covered tokens drop; survivors rejoin in order) so the
    two tests can never pin contradictory models. Returns
    {doc_id: (n_tokens, n_removed, text_kept)}."""
    win_docs: dict = {}
    for did, text in docs.items():
        t = text.split(" ")
        for i in range(len(t) - span_len + 1):
            win_docs.setdefault(tuple(t[i : i + span_len]), set()).add(did)
    want = {}
    for did, text in docs.items():
        t = text.split(" ")
        covered: set = set()
        for i in range(len(t) - span_len + 1):
            if len(win_docs[tuple(t[i : i + span_len])]) > 1:
                covered.update(range(i, i + span_len))
        kept = [tok for p, tok in enumerate(t) if p not in covered]
        want[did] = (len(t), len(covered), " ".join(kept))
    return want
