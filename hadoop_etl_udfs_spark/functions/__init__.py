"""Scalar/text function library (SURVEY.md §2.6 parity + training-data ops).

All JVM-side ``pyspark.sql.functions`` compositions — no Python UDFs.
"""
