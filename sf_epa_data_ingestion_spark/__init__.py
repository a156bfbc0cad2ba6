"""sf_epa_data_ingestion_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query & data-processing capabilities of
the reference pipeline AjjayK/sf-epa-data-ingestion (an EPA pesticide-label
ingestion job whose relational work was delegated to a remote warehouse),
rebuilt Spark-first: DataFrame/SQL logical plans optimized by Catalyst,
Structured Streaming for freshness, Arrow-batched pandas UDFs only where
built-ins can't express the semantics.

Layout
------
- ``session``     SparkSession factory (AQE, Arrow, UTC, tuned shuffle).
- ``schemas``     Explicit StructType contracts for every table.
- ``sources``     Readers: parquet/csv/binaryFile, REST fetcher (mapInPandas).
- ``operators``   Relational ops (join/dedup/anti-join/agg), mutation suite
                  (merge/update/delete as join-rewrites), LLM-pipeline ops
                  (dedup, similarity search, multimodal plumbing).
- ``functions``   Scalar/string/text/vector function library.
- ``plans``       The EPA pipeline's named derived queries + orchestration.
- ``streaming``   Structured Streaming jobs (index freshness, event windows).
"""

__version__ = "0.1.0"
