"""Streaming pipelines (Structured Streaming)."""
