"""The ODNS ingest pipeline, Spark-first (SURVEY §3.1/§3.3).

Reference dataflow (dataimporter.py:131-184): stream CSV rows, apply
per-column typers (strict-%f timestamps → NULL on mismatch, permissive
float, ''→NULL), inject ``protocol`` and ``scan_date``, batch-insert.
Here the whole thing is one declarative plan:

    FileScan csv (native .gz decompression, nullValue='')
      → Project (try_to_timestamp / try_cast / literals)
      → repartition (a .gz file is non-splittable: 1 task otherwise)
      → sink (partition-overwrite parquet or batched JDBC)

No temp-file gunzip (the reference slurped the whole decompressed file
into memory, zipFileUtils.py:20-22 — noted in SURVEY §2.9 as a bug we
do not replicate), no row loop, no mutable shared column lists
(dataimporter.py:132-134 bug likewise dropped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from odns_dataimporter_spark.odns.schema import COLUMNS_BY_PROTOCOL, SINK_COLUMNS, raw_csv_schema

# Strict reference format: datetime.strptime '%Y-%m-%d %H:%M:%S.%f'
# (fieldtypers.py:15). Spark's SSSSSS fraction matches %f's 1-6 digit
# acceptance, and both reject a missing fraction entirely.
TS_FORMAT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def scan_csv_gz(spark: SparkSession, path: str, protocol: str) -> DataFrame:
    """Read a ``;``-delimited headered scan CSV (optionally .gz) as raw
    strings. Spark decompresses gzip natively — no temp file. Empty
    fields arrive as NULL (reference dataimporter.py:152-155)."""
    return (
        spark.read.schema(raw_csv_schema(protocol))
        .options(sep=";", header=True, nullValue="", mode="PERMISSIVE")
        .csv(path)
    )


def typed_projection(df: DataFrame, protocol: str, scan_date: str | None) -> DataFrame:
    """Apply the reference's typer semantics (fieldtypers.py:25-31) and
    derived columns as Catalyst expressions, emitting the 20-column sink
    layout (protocol + 18 TCP columns + scan_date; UDP's missing
    timestamp_response stays NULL)."""
    present = {name for name, _ in COLUMNS_BY_PROTOCOL[protocol]}
    cols: list = []
    for name in SINK_COLUMNS:
        if name == "protocol":
            cols.append(F.lit(protocol).alias("protocol"))
        elif name == "scan_date":
            cols.append(F.lit(scan_date).cast("string").alias("scan_date"))
        elif name not in present:
            cols.append(F.lit(None).cast("timestamp").alias(name))
        elif name.startswith("timestamp_"):
            cols.append(F.try_to_timestamp(F.col(name), F.lit(TS_FORMAT)).alias(name))
        elif name.startswith("asn_"):
            cols.append(F.expr(f"try_cast({name} AS DOUBLE)").alias(name))
        else:
            cols.append(F.col(name))
    return df.select(*cols)


def ingest_file(
    spark: SparkSession,
    path: str,
    protocol: str,
    scan_date: str | None,
    repartition: int | None = None,
) -> DataFrame:
    """Full typed ingest of one scan file. ``repartition`` spreads the
    single non-splittable .gz scan task across the cluster before any
    downstream work (SURVEY §2.1 scan_csv_gz note)."""
    df = typed_projection(scan_csv_gz(spark, path, protocol), protocol, scan_date)
    if repartition:
        df = df.repartition(repartition)
    return df
