"""Driver contract for the spark-graft builder (PySpark target).

Thin view over :mod:`odns_dataimporter_spark.registry` — every operator
from SURVEY.md §2 registers a ``(spark, sf_dir) -> DataFrame`` callable
and (where SQL-expressible) a DuckDB oracle SQL string.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from odns_dataimporter_spark.registry import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    qs = all_queries()
    return qs["agg_hash_group"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    return all_oracles()
