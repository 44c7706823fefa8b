"""mrf_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference MRF (Machine-Readable Files,
healthcare price-transparency) ETL + query system (chrscato/mrf-etl).

This is NOT a port: the reference executes via pandas/Polars/DuckDB on a
single host; this engine declares every operator with the Spark DataFrame /
SQL API so Catalyst + Tungsten pick distributed physical plans that hold at
100 TB scale.

Layout:
  session     — tuned SparkSession builders (local test / cluster defaults)
  schemas     — explicit StructTypes for the star schema + raw inputs
  io          — tolerant readers, atomic/partitioned/upsert writers
  functions   — expression library (slugify, uids, dates, arrays, categorizer)
  operators   — window dedup, enrichment, benchmarks, LLM-data ops
  plans       — end-to-end pipelines (star ingest, wide enrichment) + the
                query vocabulary of the reference webapp, plus the operator
                parity catalog used by the driver harness
  streaming   — Structured Streaming ingestion (foreachBatch upsert)
"""

__version__ = "0.1.0"
