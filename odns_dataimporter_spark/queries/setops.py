"""Set operations and deduplication (SURVEY.md §2.5 — EXT).

The natural reference analog is tcp ∪ udp (the reference reaches union
semantics by inserting both protocols into one table, reference
dataimporter.py:252-296); here the surface is the full UNION /
INTERSECT / EXCEPT / dedup family over the synthetic tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from odns_dataimporter_spark.registry import register
from odns_dataimporter_spark.tables import load_table


def _cust_nations(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )


def _supp_nations(spark, sf_dir):
    return load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )


@register(
    "set_union",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey FROM supplier
""",
    tags=("setop",),
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets."""
    return _cust_nations(spark, sf_dir).union(_supp_nations(spark, sf_dir)).distinct()


@register(
    "set_union_all",
    oracle="""
SELECT nationkey, COUNT(*) AS n FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT s_nationkey FROM supplier
) GROUP BY nationkey
""",
    tags=("setop",),
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics), made hash-stable by counting."""
    u = _cust_nations(spark, sf_dir).unionByName(_supp_nations(spark, sf_dir))
    return u.groupBy("nationkey").agg(F.count("*").alias("n"))


@register(
    "set_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
""",
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: nations with both customers and suppliers."""
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


@register(
    "set_except",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey FROM supplier
""",
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set semantics): nations with customers but no suppliers."""
    return _cust_nations(spark, sf_dir).subtract(_supp_nations(spark, sf_dir))


@register(
    "dedup_exact",
    oracle="""
SELECT o_custkey, o_orderstatus, MIN(o_orderkey) AS keeper_orderkey
FROM orders
GROUP BY o_custkey, o_orderstatus
""",
    tags=("setop", "dedup"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup with a deterministic representative (min key) per
    duplicate group — dropDuplicates keeps an arbitrary row, which is
    fine operationally but untestable; min-per-group is the
    reproducible formulation."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey", "o_orderstatus").agg(
        F.min("o_orderkey").alias("keeper_orderkey")
    )
