"""The cache-population-race audit (PERF.md's connected_components
rule), automated: a persist() consumed by >=2 independent branches of
one action WITHOUT an eager count() pin gets raced by the concurrently
scheduled consumer stages — the JVM warns "Block rdd_N_M already exists
on this machine; not re-registering it" whenever two racing tasks both
cache-miss before either registers the block. tools/sweep_oracles.py
now re-execs itself with stderr piped and FAILS the sweep when any
query emits that warning. These tests (a) demonstrate the failure with
an intentionally unpinned persist, (b) show the eager pin silences it,
and (c) lock the scanner's attribution logic.

Repro notes (measured on this box): the warning needs the racing tasks
to start within the cache-miss window (between a task's get() miss and
the winner's block-info registration — microseconds once the JVM is
warm). A COLD JVM's first job has wide task-launch jitter and hits
~80% of the time; warm iterations hit ~10-15%. The subprocess therefore
runs the UNPINNED case first (cold) and retries a few shapes in-JVM;
the test wraps that in up to 3 fresh-JVM attempts, so a flake needs
~10 consecutive independent misses. The PINNED case is deterministic:
count() populates the cache before the consumers exist, so no consumer
task can ever race it — asserted on every attempt.
"""

from __future__ import annotations

import subprocess
import sys

from tools.sweep_oracles import CACHE_RACE_PAT, scan_cache_races

_SNIPPET = """
import sys
from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)


def run(label, pin, npart, mods):
    print(f"### SWEEP_QUERY {label}", file=sys.stderr, flush=True)
    df = spark.range(0, 200_000, 1, npart).withColumn(
        "k", (F.col("id") * 2654435761 % 1000003) % 50_000
    )
    agg = df.groupBy("k").agg(F.count("*").alias("c")).persist()
    if pin:
        agg.count()  # eager pin: cache populates once, before the fan-out
    branches = [
        agg.groupBy((F.col("k") % p).alias("g")).agg(F.sum("c").alias("s"))
        for p in mods
    ]
    out = branches[0]
    for x in branches[1:]:
        out = out.unionByName(x)
    out.collect()
    agg.unpersist()


# cold-JVM first job races hardest; retry a few warm shapes after it
run("unpinned", pin=False, npart=8, mods=(3, 5, 7, 11))
for _ in range(4):
    run("unpinned", pin=False, npart=16, mods=(3, 7))
run("pinned", pin=True, npart=8, mods=(3, 5, 7, 11))
run("pinned", pin=True, npart=16, mods=(3, 7))
spark.stop()
print("DONE")
"""


def test_unpinned_multiconsumer_persist_warns_and_pin_silences():
    last = ""
    for _attempt in range(3):  # fresh JVM per attempt
        proc = subprocess.run(
            [sys.executable, "-c", _SNIPPET],
            capture_output=True,
            text=True,
            timeout=600,
        )
        assert proc.returncode == 0 and "DONE" in proc.stdout, proc.stderr[-2000:]
        races = scan_cache_races(proc.stderr.splitlines())
        hit = {q for q, _ in races}
        # the pin is deterministic — it must NEVER warn, on any attempt
        assert "pinned" not in hit, f"eager count() pin failed to serialize: {races}"
        if "unpinned" in hit:
            return
        last = proc.stderr[-1500:]
    raise AssertionError(
        "expected the unpinned multi-consumer persist to race in at least "
        f"one of 3 fresh-JVM attempts (last stderr tail: {last})"
    )


def test_scanner_attributes_races_to_preceding_marker():
    lines = [
        "### SWEEP_QUERY alpha",
        "26/08/15 WARN BlockManager: Block rdd_42_3 already exists on this machine; not re-registering it",
        "unrelated line",
        "### SWEEP_QUERY beta",
        "26/08/15 WARN BlockManager: Block rdd_99_0 already exists on this machine; not re-registering it",
        "26/08/15 WARN BlockManager: Block rdd_99_1 already exists on this machine; not re-registering it",
    ]
    races = scan_cache_races(lines)
    assert [q for q, _ in races] == ["alpha", "beta", "beta"]
    assert CACHE_RACE_PAT.search(lines[1])
    # setup-phase warnings (before any marker) still surface
    pre = scan_cache_races(lines[1:2])
    assert pre == [("<session-setup>", lines[1].strip())]


def test_loop_consumed_persists_are_eagerly_pinned():
    """The pagerank class, caught by the r10 full-sweep race gate: a
    lazy persist()/cache() whose relation is consumed inside a loop
    that runs NO intermediate action builds all its loop-iteration
    reads into ONE final action — those reads are independent branches
    and race the unpopulated cache. (Loops that run an action per
    round — the CC/LPA convergence counts — populate the cache on the
    first round's single-reference action, so they are exempt.)

    Static rule over every query module: for each `X = ….persist(…)` /
    `X = ….cache()` assignment, if a later loop in the same function
    references X and the loop body contains no action call, an eager
    `X.count()` must appear between the persist and the loop. The r9
    mechanical audit counted syntactic consumers and missed this; the
    loop IS the multi-consumer."""
    import ast
    import pathlib

    ACTIONS = {"count", "collect", "localCheckpoint", "first", "take", "head"}
    offenders: list[str] = []
    root = pathlib.Path("kinesis2sse_spark")
    for p in sorted(root.rglob("*.py")):
        tree = ast.parse(p.read_text())
        for fn in ast.walk(tree):
            if not isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            body = fn.body
            persisted: dict[str, int] = {}  # name -> statement index
            pinned: set[str] = set()
            for i, stmt in enumerate(body):
                # X = <expr>.persist(...) / X = <expr>.cache()
                if isinstance(stmt, ast.Assign) and len(stmt.targets) == 1:
                    tgt = stmt.targets[0]
                    call = stmt.value
                    if (
                        isinstance(tgt, ast.Name)
                        and isinstance(call, ast.Call)
                        and isinstance(call.func, ast.Attribute)
                        and call.func.attr in ("persist", "cache")
                    ):
                        persisted[tgt.id] = i
                # X.count()  (eager pin)
                if isinstance(stmt, ast.Expr) and isinstance(stmt.value, ast.Call):
                    f = stmt.value.func
                    if (
                        isinstance(f, ast.Attribute)
                        and f.attr == "count"
                        and isinstance(f.value, ast.Name)
                    ):
                        pinned.add(f.value.id)
                if isinstance(stmt, (ast.For, ast.While)):
                    loop_names = {
                        n.id for n in ast.walk(stmt) if isinstance(n, ast.Name)
                    }
                    loop_calls = {
                        n.func.attr
                        for n in ast.walk(stmt)
                        if isinstance(n, ast.Call)
                        and isinstance(n.func, ast.Attribute)
                    }
                    if loop_calls & ACTIONS:
                        continue  # per-round actions populate the cache
                    for name, j in persisted.items():
                        if j < i and name in loop_names and name not in pinned:
                            offenders.append(
                                f"{p}:{fn.name}: lazy persist '{name}' consumed "
                                "by an action-free loop without an eager pin"
                            )
    assert not offenders, "\n".join(offenders)
