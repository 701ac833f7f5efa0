"""us_dot_flights_lakehouse_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-derivation of the query and data-processing
capabilities of the reference lakehouse (huuphuc02/us-dot-flights-lakehouse):
medallion batch pipelines (bronze -> silver -> gold star schema -> marts),
incremental file-stream ingest, data-quality gates, plus large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns).

Everything is expressed declaratively with the DataFrame/SQL API so Catalyst
+ Tungsten pick the physical strategy; Pandas UDFs are used only where
built-in operators cannot express the semantics.
"""

__version__ = "0.1.0"

from us_dot_flights_lakehouse_spark.session import get_spark, stop_spark  # noqa: F401
