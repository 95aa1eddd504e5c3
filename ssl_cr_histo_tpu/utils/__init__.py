"""Shared utilities: profiling/tracing, misc helpers."""
