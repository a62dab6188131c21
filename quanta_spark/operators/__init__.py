"""Operator library: stages, windows, stateful ops, skew handling,
dedup/similarity/text-analysis pipeline operators."""
