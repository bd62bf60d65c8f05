"""Observation-based pipeline metrics (the Spark-idiomatic form of the
reference's per-batch row/throughput logging, dataimporter.py:163-167).

The engine's sinks log (rows, sec, rows/sec) when the caller knows the
count; `DataFrame.observe` is the zero-extra-scan way to GET that count
on an arbitrary pipeline — metrics ride the action itself instead of a
second count() job. This test pins the pattern end to end on the real
ODNS ingest path.
"""

from __future__ import annotations

import os

from pyspark.sql import Observation
from pyspark.sql import functions as F

from odns_dataimporter_spark.odns.ingest import ingest_file

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "odns")
TCP_FILE = os.path.join(FIXTURES, "2026", "tcp", "tcp_dns_scan_2026-01-15.csv.gz")


def test_ingest_metrics_ride_the_write(spark, tmp_path):
    df = ingest_file(spark, TCP_FILE, "tcp", "2026-01-15")
    expected = df.count()

    obs = Observation("ingest")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.count("timestamp_request").alias("rows_with_ts"),
    )
    observed.write.mode("overwrite").parquet(str(tmp_path / "sink"))

    # metrics were collected BY the write action — no second scan
    assert obs.get["rows"] == expected
    assert 0 < obs.get["rows_with_ts"] <= expected
