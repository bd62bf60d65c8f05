"""odns_dataimporter_spark — a PySpark-native analytics engine.

A brand-new engine (not a port) with the query and data-processing
capabilities of the reference ODNS data importer (a batch CSV→Postgres
ETL pipeline; see SURVEY.md), rebuilt Spark-first:

- DataFrame/SQL declarative plans; Catalyst handles pushdown/pruning/joins.
- The full relational operator surface (joins, aggregations, windows,
  set ops, scalar functions) verified per-operator against a DuckDB oracle.
- LLM-data-pipeline operators: exact/near dedup, top-k embedding
  similarity, text analysis, multimodal binary columns.
- Structured Streaming variants of the windowed operators.

Every operator is a small pure function ``(spark, sf_dir) -> DataFrame``
registered in :mod:`odns_dataimporter_spark.registry` together with its
oracle SQL, so the whole surface is testable by one harness.
"""

from odns_dataimporter_spark.session import get_spark
from odns_dataimporter_spark.tables import TABLES, load_table

__all__ = ["get_spark", "load_table", "TABLES"]
