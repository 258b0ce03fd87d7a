"""Spark DataFrame operators of the engine."""
