"""Cross-cutting utilities: profiling/tracing, granule store."""
