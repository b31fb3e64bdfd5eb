"""financial_tracker_etl_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the *semantics* of the reference ETL pipeline
(fintrack-project/financial-tracker-etl) as idiomatic Spark DataFrame /
Spark SQL / Structured Streaming, designed for 100 TB scale:

- declarative plans (Catalyst does pushdown/pruning/broadcast),
- anti-join / semi-join incrementality (the reference's core logic),
- calendar-spine gap detection via ``sequence`` + ``explode``,
- keyed last-write-wins upsert materialization,
- streaming request->job->completion loop on Structured Streaming,
- LLM-data-pipeline extensions (dedup, similarity search, text analysis,
  multimodal plumbing).

See SURVEY.md for the operator inventory this package implements.
"""

__version__ = "0.1.0"
