"""Lineage + checkpoint/resume (engine-level job bookkeeping)."""
