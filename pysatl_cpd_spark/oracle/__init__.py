"""Oracle-side helpers: driver-known literal generation and independent
numpy transcriptions used to build DuckDB VALUES oracles for queries whose
Spark path runs sequential kernels (non-closed-form SQL).

Nothing in this package imports pyspark — oracles must build without a JVM.
"""
