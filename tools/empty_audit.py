#!/usr/bin/env python
"""Empty-fixture differential audit: run every oracle-backed query on
fully EMPTY tables (schemas copied from sf0.001) and compare row counts
against its DuckDB oracle. Catches the bug class where a Spark global
aggregate emits a zeroed-state row (or throws an ANSI divide-by-zero)
while the oracle's plan produces nothing — found the round-7 Holt,
dataset-card, and empty-lake-read-back defects.

Known accepted divergence: the rollup/cube/grouping-set family, where
DuckDB emits the SQL-standard () grand-total row on empty input and
Spark emits zero rows (documented at agg_rollup). With 0 < rows < 32,
the PQ/IVF retrieval family is skipped: those operators' documented
input contract requires the corpus to contain the codebook/centroid
seed vectors (vec_id < 32), so a sub-codebook corpus violates their
preconditions rather than exposing a defect.

Usage: python tools/empty_audit.py [rows-per-table] [name-substring ...]
(default 0 rows, all oracle-backed queries)
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
KNOWN_MODEL_INPUT = {
    "sim_recall_pq", "sim_recall_ivf", "sim_recall_ivfpq", "sim_recall_lsh",
    "sim_topk_pq", "sim_topk_ivf", "sim_topk_ivfpq",
}


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    spark = build_session(app_name="empty_audit", shuffle_partitions=4)
    d = tempfile.mkdtemp(prefix="k2s_empty_audit_")
    for t in TABLES:
        tbl = pq.read_table(f"/root/testdata/sf0.001/{t}.parquet").slice(0, rows)
        pq.write_table(tbl, os.path.join(d, f"{t}.parquet"))
    qs, osql = all_queries(), all_oracles()
    subs = sys.argv[2:]
    if subs:
        osql = {n: o for n, o in osql.items() if any(s in n for s in subs)}
    skip = KNOWN_MODEL_INPUT if 0 < rows < 32 else set()
    mismatch, crash = [], []
    for name in sorted(osql):
        if name in skip:
            continue
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
