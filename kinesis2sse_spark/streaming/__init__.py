"""Structured Streaming layer: source abstraction (the test seam the
reference exposes as ``disableKCL``, service.go:34-35), event-time
windows, watermarks, streaming dedup, stateful contiguous offsets, and
the SSE serving sink."""
