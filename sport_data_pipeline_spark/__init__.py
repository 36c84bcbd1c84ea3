"""sport_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query / data-processing capability surface of
the reference sports-data platform (Coding-champ/Sport-Data-Pipeline), expressed
Spark-first: DataFrame/SQL for the relational surface, window functions for the
pandas-loop rewrites, Structured Streaming for the polling loops, and
library-level operators (merge/upsert, as-of join, fuzzy entity resolution,
dedup, similarity search, text analysis) for everything stock Spark lacks.

Design rules (100 TB scale):
- No driver-side collection inside operators: everything stays a DataFrame.
- Dimensions broadcast; facts shuffle on their join/agg keys.
- Built-in ``pyspark.sql.functions`` (JVM, whole-stage codegen) in the hot
  path; Arrow-batched pandas UDFs only where built-ins cannot express the op.
- Deterministic results: every top-K / latest-per-key has a total tie-break
  order, so re-runs and oracle comparisons are stable.
"""

__version__ = "0.1.0"
