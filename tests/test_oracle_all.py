"""Every registered query with an oracle, compared against DuckDB at
sf0.01 — the same gate the driver applies."""

from __future__ import annotations

import pytest

from kinesis2sse_spark.registry import all_oracles
from tests.conftest import SF_CORRECTNESS, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(all_oracles()))
def test_matches_oracle(spark, name):
    assert_matches_oracle(spark, name, SF_CORRECTNESS)


def test_no_oracle_emits_hugeint():
    """DuckDB sum(BIGINT) returns HUGEINT (int128); pandas-based
    canonicalization renders it float64 ("3.0" vs Spark's "3"), which
    is an automatic hash mismatch in any harness that round-trips
    through fetchdf — the exact root cause of the round-6
    pipeline_shard_assignment red row. Guard: no oracle's output
    schema may contain a decimal128 column; CAST integer sums to
    BIGINT at the top-level select."""
    import duckdb

    from kinesis2sse_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_CORRECTNESS}/{t}.parquet')"
        )
    offenders = {}
    for name, sql in all_oracles().items():
        tb = con.execute(f"SELECT * FROM ({sql}) LIMIT 0").fetch_arrow_table()
        bad = [f.name for f in tb.schema if "decimal" in str(f.type)]
        if bad:
            offenders[name] = bad
    con.close()
    assert not offenders, f"HUGEINT/decimal oracle outputs: {offenders}"
