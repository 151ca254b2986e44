#!/usr/bin/env python
"""Time individual queries with bench.py's exact protocol (noop write,
cold reps via clearCache, best-of + median), bracketed by the same
DuckDB + Spark controls so a loaded box is visible in the record.

Usage: python tools/time_queries.py [-n REPS] <query> [<query> ...]
Prints one JSON line: {query: {best, median, runs}, _controls: {...}}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from kinesis2sse_spark.registry import all_queries
from kinesis2sse_spark.session import build_session


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="time_queries_r13")
    qs = all_queries()
    # warmup on sf0.001: JIT + codegen, exactly like bench.py
    for name in args:
        try:
            bench._run(qs[name], spark, bench.WARMUP_SF_DIR)
        except Exception:
            pass
    spark.catalog.clearCache()
    out = {}
    c0 = bench._control_sec(sf_dir)
    s0 = bench._spark_control_sec(spark, sf_dir)
    for name in args:
        fn = qs[name]
        runs = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"time: {name}")
            runs.append(bench._run(fn, spark, sf_dir))
            spark.catalog.clearCache()
        out[name] = {
            "best": round(min(runs), 4),
            "median": round(statistics.median(runs), 4),
            "runs": [round(r, 4) for r in runs],
        }
    c1 = bench._control_sec(sf_dir)
    s1 = bench._spark_control_sec(spark, sf_dir)
    out["_controls"] = {
        "duckdb": [round(c0, 4), round(c1, 4)],
        "spark": [round(s0, 4), round(s1, 4)],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
