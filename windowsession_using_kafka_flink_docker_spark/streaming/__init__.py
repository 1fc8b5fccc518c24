"""Structured Streaming surface: sources, pipelines, sinks (M2)."""
