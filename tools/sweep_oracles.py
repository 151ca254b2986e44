#!/usr/bin/env python
"""Full oracle sweep at an arbitrary scale factor: run every registered
query with an oracle in Spark AND DuckDB and report mismatches.

The driver gate runs at sf0.01 and the pytest spot-checks cover a few
queries at sf0.1; this sweeps EVERYTHING at the requested scale so
scale-dependent divergence (FP summation order, frame boundaries,
percentile interpolation) surfaces before a driver round does.

Usage: python tools/sweep_oracles.py [sf_dir] [name-substring ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from kinesis2sse_spark.catalog import TABLES
from kinesis2sse_spark.registry import all_oracles, all_queries
from kinesis2sse_spark.session import build_session


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(str(r[i]) for i in order) for r in rows)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = sys.argv[2:]
    spark = build_session(app_name="oracle_sweep")
    qs, oracles = all_queries(), all_oracles()
    names = [
        n for n in oracles if not only or any(s in n for s in only)
    ]
    fails: list[str] = []
    for i, name in enumerate(names):
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            con = duckdb.connect()
            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')"
                )
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            con.close()
            ok = (
                sorted(scols) == sorted(ocols)
                and len(srows) == len(orows)
                and canon(srows, scols) == canon(orows, ocols)
            )
            print(
                f"[{i + 1}/{len(names)}] {name}: "
                f"{'PASS' if ok else 'FAIL'} ({len(srows)} rows)",
                flush=True,
            )
            if not ok:
                fails.append(name)
        except Exception as e:  # keep sweeping; report at the end
            print(f"[{i + 1}/{len(names)}] {name}: ERROR {str(e)[:150]}", flush=True)
            fails.append(name)
        finally:
            # queries that persist() intermediates leave them cached;
            # a 150-query sweep would accumulate them for the session
            # lifetime and skew later queries under eviction pressure
            spark.catalog.clearCache()
    print("FAILED:", fails)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
