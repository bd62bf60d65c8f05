"""Non-parquet sources (SURVEY §2.1 EXT rows).

``scan_jdbc_partitioned`` is the read-back path for the Postgres sink:
partitioned parallel JDBC extraction. Exercised end to end against
embedded Derby (shipped in the Spark distribution) in
tests/test_jdbc_roundtrip.py, including the 4-way range-partitioned
read; the options are the standard public Spark JDBC surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_scan_options(
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetchsize: int = 10_000,
) -> dict[str, str]:
    """Build the option map for a partitioned JDBC scan.

    With a numeric ``partition_column`` and bounds, Spark issues
    ``num_partitions`` range-predicated queries in parallel — the only
    way a JDBC read scales; an unpartitioned read is a single connection
    pulling the whole table through one task.
    """
    opts = {"url": url, "dbtable": table, "fetchsize": str(fetchsize)}
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC scan requires lower/upper bounds")
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def scan_jdbc_partitioned(spark: SparkSession, **kwargs) -> DataFrame:
    """Partitioned JDBC scan (see :func:`jdbc_scan_options`)."""
    reader = spark.read.format("jdbc")
    for k, v in jdbc_scan_options(**kwargs).items():
        reader = reader.option(k, v)
    return reader.load()
