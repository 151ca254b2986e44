"""Event-pipeline semantics of the reference, as batch DataFrame transforms.

Mirrors the reference ingest path (record_processor.go:52-115) and the
serve-path ``since`` resolution (service.go:226-265, timestamp2offset.go:58-80)
— see each submodule's docstring for the file:line parity map.
"""

from kinesis2sse_spark.pipeline.envelope import (
    canonical_json,
    parse_envelope,
    with_offsets,
    retain_last,
)
from kinesis2sse_spark.pipeline.asof import nearest_offset, replay_since
from kinesis2sse_spark.pipeline.since import parse_since

__all__ = [
    "canonical_json",
    "parse_envelope",
    "with_offsets",
    "retain_last",
    "nearest_offset",
    "replay_since",
    "parse_since",
]
