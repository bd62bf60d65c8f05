"""ODNS scan-table schema (SURVEY §1.2, FIXTURES.md §A).

Column lists mirror the reference's CSV_COLUMNS_MAP (reference
dataimporter.py:23-61): TCP has 18 columns, UDP the same minus
``timestamp_response``. The ingested table adds ``protocol`` and
``scan_date`` (dataimporter.py:133-134). Types come from the typer
registry semantics (fieldtypers.py:25-31): strict-%f timestamps,
permissive-double ASNs, everything else string with ''→NULL.
"""

from __future__ import annotations

from pyspark.sql import types as T

# (name, logical type) in reference column order — dataimporter.py:23-42
TCP_COLUMNS: list[tuple[str, str]] = [
    ("ip_request", "string"),
    ("ip_response", "string"),
    ("a_record", "string"),
    ("timestamp_request", "timestamp"),
    ("timestamp_response", "timestamp"),
    ("response_type", "string"),
    ("country_request", "string"),
    ("asn_request", "double"),
    ("prefix_request", "string"),
    ("org_request", "string"),
    ("country_response", "string"),
    ("asn_response", "double"),
    ("prefix_response", "string"),
    ("org_response", "string"),
    ("country_arecord", "string"),
    ("asn_arecord", "double"),
    ("prefix_arecord", "string"),
    ("org_arecord", "string"),
]

# UDP = TCP minus timestamp_response — dataimporter.py:43-61
UDP_COLUMNS: list[tuple[str, str]] = [
    (n, t) for n, t in TCP_COLUMNS if n != "timestamp_response"
]

COLUMNS_BY_PROTOCOL = {"tcp": TCP_COLUMNS, "udp": UDP_COLUMNS}

# Sink column order: protocol first, then the TCP list, then scan_date —
# equivalent to the reference's DATABASE_COLUMNS + scan_date
# (dataimporter.py:64-84,132-134).
SINK_COLUMNS = ["protocol"] + [n for n, _ in TCP_COLUMNS] + ["scan_date"]

# Columns that are (near-)unique per row — addresses, prefixes, ASNs,
# microsecond timestamps. Parquet's dictionary encoder tries to build a
# dictionary per page for these, overflows it, and falls back — pure
# CPU burn on the write's hot path. The snapshot sink disables the
# dictionary for exactly these columns (parquet.enable.dictionary#col
# per-column override), keeping it ON for the genuinely low-cardinality
# org/country/response_type strings: measured on the 1M-row bench
# fixture, write time 1.32 s → 1.05 s AND output 98 MB → 96 MB.
HIGH_CARDINALITY_COLUMNS = [
    "ip_request",
    "ip_response",
    "a_record",
    "prefix_request",
    "prefix_response",
    "prefix_arecord",
    "asn_request",
    "asn_response",
    "asn_arecord",
    "timestamp_request",
    "timestamp_response",
]


def raw_csv_schema(protocol: str) -> T.StructType:
    """All-string schema for the raw CSV scan (typing happens in typed
    projection, mirroring the reference's read-then-type pipeline)."""
    return T.StructType(
        [T.StructField(name, T.StringType(), True) for name, _ in COLUMNS_BY_PROTOCOL[protocol]]
    )
