#!/usr/bin/env python
"""Regenerate artifacts/BROADCAST_CENSUS.md from the allowlist in
kinesis2sse_spark/broadcast_census.py (the census PERF.md points at)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kinesis2sse_spark.broadcast_census import census_table

out = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts",
    "BROADCAST_CENSUS.md",
)
with open(out, "w") as f:
    f.write(census_table())
print(f"wrote {out}")
