"""etl_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch engine with the ingestion-pipeline role of m-lab/etl
(reference at /root/reference, cited by file:line in docstrings), built
Spark-first: DataFrame/SQL plans, Structured Streaming foreachBatch,
bucket-partitioned lake tables with atomic snapshot commits, last-writer-wins
MERGE upserts, exactly-once via idempotent commit manifests, schema
evolution, and salted/skew-aware shuffle strategies.

Layout:
  session.py   — SparkSession builders (parallelism-parameterized)
  schema.py    — canonical StructTypes (transcript row, CDC envelope)
  lake/        — lake table format: manifests, atomic commit, MERGE
  cdc/         — generator, batch apply, streaming driver, oracle, metrics
  operators/   — reference-semantics operators (SURVEY.md §2) and
                 training-data-pipeline ops (dedup, ANN, text analysis)
"""

__version__ = "0.1.0"
