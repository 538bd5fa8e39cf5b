"""Cross-cutting utilities (structured tracing/metrics)."""
