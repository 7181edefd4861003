"""tepsonic_database_sync_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the data-processing capabilities of the
reference repo ``MayankTripathi123/tepsonic-database-sync`` (a Node.js
vendor-inventory sync pipeline) as an idiomatic Spark DataFrame library,
extended with the operators a large-scale (100 TB) training-data pipeline
needs: deduplication, similarity search, multimodal column plumbing, text
analysis, and streaming window aggregation.

Layout
------
- ``session``    SparkSession factory (AQE on, UTC, sane shuffle partitions)
- ``io``         parquet table loaders / schema registry
- ``fixtures``   reference-shaped tables derived deterministically from the
                 TPC-H-ish test tables (FIXTURES.md §B)
- ``functions``  scalar expression helpers (SURVEY.md §2.2 P1-P8)
- ``operators``  joins / aggregations / upsert (SURVEY.md §2.3-§2.5, §2.9),
                 plus dedup / similarity / text / multimodal extensions
- ``plans``      composed pipelines (the flagship sync, SURVEY.md §3)
- ``sources``    REST / JDBC source & sink helpers (SURVEY.md §2.1)
- ``streaming``  Structured Streaming window operators (SURVEY.md §2.7 ext.)
- ``registry``   the driver-facing query + DuckDB-oracle catalog
"""

__version__ = "0.1.0"
