"""SparkSession factory with scale-appropriate defaults.

Local mode is the test bed; the config values are chosen so the same
logical plans survive a multi-executor cluster at 100 TB:

- AQE on (runtime re-plan: partition coalescing, skew-join splitting).
- ``shuffle.partitions`` sized to the local core count instead of the
  200 default (on a real cluster this is tuned to ~2-3x total cores or
  left to AQE's coalescing).
- Arrow enabled for the Pandas-UDF slow path.
- Session timezone pinned to UTC so timestamp semantics are
  deterministic and match the DuckDB oracle.
- ``nanosAsLong`` because the driver's ``events`` parquet carries
  INT64(TIMESTAMP_NANOS), which vanilla Spark 4 refuses to read; see
  :mod:`odns_dataimporter_spark.tables` for the µs conversion.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "odns-dataimporter-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession with engine defaults."""
    if cpus is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cpus}]"
    if shuffle_partitions is None:
        n = os.cpu_count() or 8 if cpus in ("*", None) else int(cpus)
        shuffle_partitions = max(int(n), 4)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # planning-time file pruning for the Python DataSource (odns/pyds.py)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
