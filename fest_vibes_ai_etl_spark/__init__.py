"""fest_vibes_ai_etl_spark — a PySpark-native analytics engine.

A ground-up re-expression of the query/data-processing capabilities of the
reference ETL pipeline (aaronfeingold/fest-vibes-ai-ETL) as idiomatic Spark
DataFrame / SQL plans, designed for 100 TB scale:

- ``sources``   — parquet/json readers for the lakehouse tables
- ``functions`` — scalar/vector/text column-expression library (SURVEY §2.7)
- ``operators`` — merge/upsert, dedup, similarity, text-analysis, multimodal
- ``plans``     — the declared query catalog (SURVEY §2 inventory) with
                  DuckDB oracle SQL for correctness checking
- ``pipeline``  — bronze EventDTO → silver star schema → gold cache export
- ``streaming`` — incremental ingest (Structured Streaming, foreachBatch merge)

Everything is DataFrame-first: logical plans go to Catalyst; Python only runs
inside Arrow-batched UDFs where built-ins genuinely cannot express an op.
"""

__version__ = "0.1.0"
