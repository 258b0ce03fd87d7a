"""Structured Streaming variants of the online detectors."""
