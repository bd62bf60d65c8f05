"""Loaders for the synthetic testdata tables (TESTDATA.md / FIXTURES.md §B).

All tables are plain parquet scans — Catalyst pushes filters and prunes
columns at the scan (verify with ``df.explain``: ``PushedFilters`` /
``ReadSchema``). The one wrinkle is ``events``: its ``ts`` column is
INT64(TIMESTAMP_NANOS), which Spark 4 cannot read natively. With
``spark.sql.legacy.parquet.nanosAsLong=true`` it arrives as a long
nanosecond count which we convert to a microsecond timestamp with exact
integer arithmetic (``DIV 1000`` — float division would lose precision
above 2^53). DuckDB truncates ns→µs the same way, so both engines see
identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame."""
    try:
        # timestamp rendering (date_format / cast-to-date) is session-tz
        # dependent; pin UTC so results match the (naive-timestamp)
        # DuckDB oracle even under a host with a non-UTC default
        if spark.conf.get("spark.sql.session.timeZone") not in ("UTC", "Etc/UTC"):
            spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        try:  # runtime conf; harmless if already set by the session factory
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL API path)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
