"""``since`` parameter parsing — operator Q1.

Reference semantics (service.go:226-242): try RFC3339 first, then a
Go-style duration subtracted from *now*, else reject. NOTE: the CLI
`start` path of the reference inverts its duration error check
(kinesis2sse.go:123, SURVEY.md §2.2 known defect) — we implement the
*intended* semantics everywhere, matching the correct HTTP path.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

_GO_DURATION_RE = re.compile(r"(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h)")

_UNIT_SECONDS = {
    "ns": 1e-9,
    "us": 1e-6,
    "µs": 1e-6,
    "ms": 1e-3,
    "s": 1.0,
    "m": 60.0,
    "h": 3600.0,
}


def parse_go_duration(s: str) -> timedelta:
    """Parse a Go ``time.ParseDuration`` string like ``"1h30m"``,
    ``"300ms"``, ``"1.5h"``. Raises ValueError on anything else."""
    s = s.strip()
    neg = s.startswith("-")
    if neg or s.startswith("+"):
        s = s[1:]
    if not s:
        raise ValueError("empty duration")
    total = 0.0
    pos = 0
    for m in _GO_DURATION_RE.finditer(s):
        if m.start() != pos:
            raise ValueError(f"invalid duration {s!r}")
        total += float(m.group(1)) * _UNIT_SECONDS[m.group(2)]
        pos = m.end()
    if pos != len(s):
        raise ValueError(f"invalid duration {s!r}")
    return timedelta(seconds=-total if neg else total)


def parse_since(s: str, now: datetime | None = None) -> datetime:
    """Resolve ``?since=`` exactly like service.go:230-240: RFC3339 first,
    then ``now - duration``; else ValueError (the HTTP 400 path)."""
    try:
        # Python 3.11+ fromisoformat accepts RFC3339 incl. trailing Z.
        return datetime.fromisoformat(s.replace("Z", "+00:00"))
    except ValueError:
        pass
    d = parse_go_duration(s)  # raises ValueError on junk → HTTP 400
    now = now or datetime.now(timezone.utc)
    return now - d
