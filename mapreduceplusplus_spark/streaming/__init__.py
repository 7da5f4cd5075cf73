"""Streaming operators: event-time windows (batch-checkable semantics)
plus Structured Streaming wiring with watermarks."""
