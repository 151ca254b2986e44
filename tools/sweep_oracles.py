#!/usr/bin/env python
"""Full oracle sweep at an arbitrary scale factor: run every registered
query with an oracle in Spark AND DuckDB and report mismatches.

The driver gate runs at sf0.01 and the pytest spot-checks cover a few
queries at sf0.1; this sweeps EVERYTHING at the requested scale so
scale-dependent divergence (FP summation order, frame boundaries,
percentile interpolation) surfaces before a driver round does.

The sweep also FAILS on cache-population races: a persist() consumed by
>=2 independent branches of one action without an eager count() pin gets
computed concurrently by the racing stages — the JVM warns "Block rdd_N_M
already exists on this machine" (PERF.md's connected_components rule;
measured 659->292 s at a 100x curve point when fixed). The JVM writes
that warning to ITS stderr — inherited from this process at JVM launch,
so un-capturable in-process after the fact. The script therefore
re-execs itself as a child with stderr piped: the parent streams the
child's stderr through, attributes any race warning to the query whose
marker preceded it, and fails the sweep. Disable with
K2S_SWEEP_NO_RACE_CHECK=1 (e.g. when a caller already wraps stderr).

Usage: python tools/sweep_oracles.py [sf_dir] [name-substring ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE_RACE_PAT = re.compile(r"Block rdd_\d+_\d+ already exists")
_MARKER = "### SWEEP_QUERY "
_CHILD_ENV = "K2S_SWEEP_CHILD"


def scan_cache_races(stderr_lines) -> list[tuple[str, str]]:
    """(query, warning-line) pairs for every cache-population-race
    warning, attributed to the query whose marker most recently
    preceded it in the stderr stream."""
    current = "<session-setup>"
    hits: list[tuple[str, str]] = []
    for line in stderr_lines:
        if line.startswith(_MARKER):
            current = line[len(_MARKER):].strip()
        elif CACHE_RACE_PAT.search(line):
            hits.append((current, line.strip()))
    return hits


def _parent_reexec() -> None:
    """Re-run this script as a child with stderr piped, stream + scan
    it for cache-race warnings, and fail if any query emits one."""
    import subprocess

    env = dict(os.environ, **{_CHILD_ENV: "1"})
    proc = subprocess.Popen(
        [sys.executable, *sys.argv],
        env=env,
        stderr=subprocess.PIPE,
        # JVM stderr is not guaranteed UTF-8 (native-lib banners, locale
        # messages); strict decoding would abort the whole sweep wrapper
        # on one bad byte, so degrade undecodable output to U+FFFD.
        encoding="utf-8",
        errors="replace",
        text=True,
    )
    lines: list[str] = []
    assert proc.stderr is not None
    for line in proc.stderr:
        lines.append(line)
        if not line.startswith(_MARKER):
            sys.stderr.write(line)
    rc = proc.wait()
    races = scan_cache_races(lines)
    if races:
        print("CACHE RACES (unpinned multi-consumer persist — add an "
              "eager count() after the persist):")
        # Executor WARN lines flush asynchronously, so a warning from
        # query N's still-running stages can land after query N+1's
        # marker — the named query may be off by one (blame it OR its
        # predecessor in sweep order).
        for q, w in races:
            print(f"  {q} (or its sweep predecessor): {w[:160]}")
    sys.exit(rc or (2 if races else 0))


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(str(r[i]) for i in order) for r in rows)


def main() -> None:
    if (
        os.environ.get(_CHILD_ENV) != "1"
        and os.environ.get("K2S_SWEEP_NO_RACE_CHECK") != "1"
    ):
        _parent_reexec()

    import duckdb

    from kinesis2sse_spark.catalog import TABLES
    from kinesis2sse_spark.registry import all_oracles, all_queries
    from kinesis2sse_spark.session import build_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = sys.argv[2:]
    spark = build_session(app_name="oracle_sweep")
    qs, oracles = all_queries(), all_oracles()
    names = [
        n for n in oracles if not only or any(s in n for s in only)
    ]
    fails: list[str] = []
    for i, name in enumerate(names):
        # race-attribution marker for the parent's stderr scan
        print(f"{_MARKER}{name}", file=sys.stderr, flush=True)
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
