"""Scalar function library (SURVEY.md §2.8).

Everything here is built from JVM-side ``pyspark.sql.functions`` — no
row-at-a-time Python UDFs — so all expressions stay inside whole-stage
codegen.
"""
