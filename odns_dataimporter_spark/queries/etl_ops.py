"""ETL-surface operators beyond the reference: upsert (MERGE
emulation), CDC-style snapshot diffing, and multi-format source/sink
round-trips.

The reference's only mutation primitive is delete-then-reload per
protocol; real pipelines also need keyed upserts and snapshot diffs
(what changed between consecutive scans). Vanilla Spark-on-parquet has
no MERGE INTO, so upsert is the canonical outer-join + coalesce
rewrite, and diff is a full-outer join classification — both
shuffle-on-key once and scale like any equi-join.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from odns_dataimporter_spark.registry import register
from odns_dataimporter_spark.tables import load_table


def upsert(base: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """MERGE-emulation: rows from ``updates`` win on key collision,
    unmatched base rows survive, new update rows are inserted. One
    shuffle on the key; at warehouse scale the same logic rides Delta/
    Iceberg MERGE — this is the engine-neutral formulation."""
    cols = base.columns
    u = updates.select(*[F.col(c).alias(f"_u_{c}") for c in cols])
    joined = base.join(u, base[key] == u[f"_u_{key}"], "full_outer")
    return joined.select(
        *[
            F.coalesce(F.col(f"_u_{c}"), F.col(c)).alias(c)
            for c in cols
        ]
    )


@register(
    "merge_upsert",
    oracle="""
WITH updates AS (
  SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
         floor(o_totalprice * 1.1 * 100) / 100.0 AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT -1, 0, 'NEW', 123.45, TIMESTAMP '2000-01-01 00:00:00', '1-URGENT'
),
merged AS (
  SELECT COALESCE(u.o_orderkey, b.o_orderkey) AS o_orderkey,
         COALESCE(u.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
         COALESCE(u.o_totalprice, b.o_totalprice) AS o_totalprice
  FROM orders b FULL OUTER JOIN updates u ON b.o_orderkey = u.o_orderkey
)
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total
FROM merged
GROUP BY o_orderstatus
""",
    tags=("etl",),
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed upsert: a deterministic change-set (every 10th order
    repriced + status X, plus one brand-new row) merged into the base
    table; verified via post-merge per-status totals."""
    orders = load_table(spark, sf_dir, "orders")
    updates = orders.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("X").alias("o_orderstatus"),
        (F.floor(F.col("o_totalprice") * 1.1 * 100) / 100.0).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    new_row = spark.createDataFrame(
        [(-1, 0, "NEW", 123.45, "2000-01-01 00:00:00", "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
        "o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    merged = upsert(orders, updates.unionByName(new_row), "o_orderkey")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return merged.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        (F.sum(cents) / F.lit(100.0)).alias("total"),
    )


@register(
    "cdc_snapshot_diff",
    oracle="""
WITH prev AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
              WHERE o_orderkey % 7 != 0),
     curr AS (SELECT o_orderkey, o_orderstatus,
                     CASE WHEN o_orderkey % 5 = 0
                          THEN round(o_totalprice + 1, 2) ELSE o_totalprice END AS o_totalprice
              FROM orders WHERE o_orderkey % 3 != 0)
SELECT change, COUNT(*) AS n
FROM (
  SELECT CASE WHEN p.o_orderkey IS NULL THEN 'added'
              WHEN c.o_orderkey IS NULL THEN 'removed'
              WHEN p.o_totalprice != c.o_totalprice
                OR p.o_orderstatus != c.o_orderstatus THEN 'changed'
              ELSE 'unchanged' END AS change
  FROM prev p FULL OUTER JOIN curr c ON p.o_orderkey = c.o_orderkey
)
GROUP BY change
""",
    tags=("etl",),
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (the consecutive-scans question the reference's
    replace-sink erases): full-outer join two deterministic snapshot
    variants and classify added/removed/changed/unchanged."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    prev = orders.filter(F.col("o_orderkey") % 7 != 0)
    curr = orders.filter(F.col("o_orderkey") % 3 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 5 == 0, F.round(F.col("o_totalprice") + 1, 2)
        ).otherwise(F.col("o_totalprice")),
    )
    p = prev.select(*[F.col(c).alias(f"p_{c}") for c in prev.columns])
    c = curr.select(*[F.col(cc).alias(f"c_{cc}") for cc in curr.columns])
    joined = p.join(c, p.p_o_orderkey == c.c_o_orderkey, "full_outer")
    change = (
        F.when(F.col("p_o_orderkey").isNull(), "added")
        .when(F.col("c_o_orderkey").isNull(), "removed")
        .when(
            (F.col("p_o_totalprice") != F.col("c_o_totalprice"))
            | (F.col("p_o_orderstatus") != F.col("c_o_orderstatus")),
            "changed",
        )
        .otherwise("unchanged")
    )
    return joined.select(change.alias("change")).groupBy("change").agg(
        F.count("*").alias("n")
    )


@register(
    "roundtrip_formats",
    oracle="""
SELECT 'parquet' AS fmt, COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum FROM orders
UNION ALL
SELECT 'json', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT) FROM orders
UNION ALL
SELECT 'csv', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT) FROM orders
UNION ALL
SELECT 'orc', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT) FROM orders
""",
    tags=("etl", "scan"),
)
def roundtrip_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source/sink format breadth: write orders to parquet/JSON/CSV/ORC
    and read each back — every row survives every format (count +
    key-checksum proof). The CSV leg re-exercises the reference's
    format family; ORC/JSON are the warehouse/interchange legs."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    base = tempfile.mkdtemp(prefix="fmt_")
    outs = []
    for fmt in ("parquet", "json", "csv", "orc"):
        path = os.path.join(base, fmt)
        w = orders.write.mode("overwrite")
        if fmt == "csv":
            w = w.option("header", True)
        getattr(w, fmt)(path)
        r = spark.read
        if fmt == "csv":
            r = r.options(header=True, inferSchema=False).schema("o_orderkey long")
        back = getattr(r, fmt)(path)
        outs.append(
            back.agg(
                F.lit(fmt).alias("fmt"),
                F.count("*").alias("n_rows"),
                F.sum("o_orderkey").alias("key_sum"),
            ).select("fmt", "n_rows", "key_sum")
        )
    out = outs[0]
    for df in outs[1:]:
        out = out.unionByName(df)
    return out


@register(
    "schema_evolution_merge",
    oracle="""
SELECT o_orderstatus,
       COUNT(*) AS n_rows,
       CAST(COUNT(o_totalprice) AS BIGINT) AS n_with_price,
       CAST(COUNT(priority_rank) AS BIGINT) AS n_with_rank
FROM (
  SELECT o_orderstatus, o_totalprice, NULL AS priority_rank
  FROM orders WHERE o_orderkey % 2 = 0
  UNION ALL BY NAME
  SELECT o_orderstatus, NULL AS o_totalprice,
         CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS priority_rank
  FROM orders WHERE o_orderkey % 2 = 1
)
GROUP BY o_orderstatus
""",
    tags=("etl", "scan"),
)
def schema_evolution_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution at the storage layer: two parquet batches written
    with DIFFERENT schemas (v1 has o_totalprice, v2 drops it and adds
    priority_rank) read back as one table via mergeSchema — old rows
    NULL-fill new columns and vice versa. This is how a long-lived 100 TB
    dataset absorbs schema change without rewrites."""
    orders = load_table(spark, sf_dir, "orders")
    base = os.path.join(tempfile.mkdtemp(prefix="evo_"), "t")
    v1 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    v2 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_orderstatus",
        F.substring("o_orderpriority", 1, 1).cast("long").alias("priority_rank"),
    )
    v1.write.mode("append").parquet(base)
    v2.write.mode("append").parquet(base)
    merged = spark.read.option("mergeSchema", "true").parquet(base)
    return merged.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_rows"),
        F.count("o_totalprice").alias("n_with_price"),
        F.count("priority_rank").alias("n_with_rank"),
    )
