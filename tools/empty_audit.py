#!/usr/bin/env python
"""Empty-fixture differential audit: run every oracle-backed query on
fully EMPTY tables (schemas copied from sf0.001) and compare row counts
against its DuckDB oracle. Catches the bug class where a Spark global
aggregate emits a zeroed-state row (or throws an ANSI divide-by-zero)
while the oracle's plan produces nothing — found the round-7 Holt,
dataset-card, and empty-lake-read-back defects.

Known accepted divergence: the rollup/cube/grouping-set family, where
DuckDB emits the SQL-standard () grand-total row on empty input and
Spark emits zero rows (documented at agg_rollup).

Usage: python tools/empty_audit.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pyarrow.parquet as pq

from kinesis2sse_spark.registry import all_oracles, all_queries
from kinesis2sse_spark.session import build_session

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()
KNOWN_DIVERGENT = {"agg_rollup", "agg_cube", "agg_grouping_id", "agg_grouping_sets"}


def main() -> None:
    spark = build_session(app_name="empty_audit", shuffle_partitions=4)
    d = tempfile.mkdtemp(prefix="k2s_empty_audit_")
    for t in TABLES:
        tbl = pq.read_table(f"/root/testdata/sf0.001/{t}.parquet").slice(0, 0)
        pq.write_table(tbl, os.path.join(d, f"{t}.parquet"))
    qs, osql = all_queries(), all_oracles()
    mismatch, crash = [], []
    for name in sorted(osql):
        try:
            sn = len(qs[name](spark, d).collect())
        except Exception as ex:  # noqa: BLE001 - audit must survive anything
            crash.append((name, f"SPARK {type(ex).__name__}: {str(ex)[:100]}"))
            continue
        try:
            con = duckdb.connect()
            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
                )
            on = len(con.execute(osql[name]).fetchall())
            con.close()
        except Exception as ex:  # noqa: BLE001
            crash.append((name, f"ORACLE {type(ex).__name__}: {str(ex)[:100]}"))
            continue
        if sn != on and name not in KNOWN_DIVERGENT:
            mismatch.append((name, sn, on))
    print("MISMATCHES (excluding documented grouping-set divergence):")
    for m in mismatch:
        print("  ", m)
    print("CRASHES:")
    for c in crash:
        print("  ", c)
    print(
        f"done: {len(osql)} checked, {len(mismatch)} mismatches, {len(crash)} crashes"
    )
    if mismatch or crash:
        sys.exit(1)


if __name__ == "__main__":
    main()
