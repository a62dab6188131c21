"""Sinks: idempotent exactly-once writers with per-partition lineage."""
