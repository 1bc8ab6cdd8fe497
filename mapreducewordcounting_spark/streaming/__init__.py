"""Structured Streaming operators (M6)."""
