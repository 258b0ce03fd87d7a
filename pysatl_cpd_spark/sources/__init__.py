"""Deterministic synthesis sources + IO helpers."""
