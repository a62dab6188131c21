"""Streaming runtime: query runner, restart helpers, metrics listener."""
