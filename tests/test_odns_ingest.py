"""Golden-fixture tests for the ODNS reference-parity surface
(FIXTURES.md §A.3 edge cases; SURVEY §2.1-§2.2 REF rows)."""

from __future__ import annotations

import datetime as dt
import os
import shutil
import time

import pytest

from odns_dataimporter_spark.odns.files import (
    extract_file_date_from_name,
    get_data_path,
    most_recent_file_with_prefix,
)
from odns_dataimporter_spark.odns.ingest import ingest_file
from odns_dataimporter_spark.odns.pipeline import run_ingest
from odns_dataimporter_spark.odns.sinks import delete_by_protocol_sql, write_snapshot_partitioned

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "odns")
TCP_FILE = os.path.join(FIXTURES, "2026", "tcp", "tcp_dns_scan_2026-01-15.csv.gz")
UDP_FILE = os.path.join(FIXTURES, "2026", "udp", "udp_dns_scan_2026-01-16.csv.gz")


def test_path_resolution():
    assert get_data_path("/data", "tcp", 2026) == "/data/2026/tcp"


def test_extract_file_date():
    assert extract_file_date_from_name("/x/tcp_dns_scan_2026-01-15.csv.gz") == "2026-01-15"
    assert extract_file_date_from_name("/x/tcp_dns_scan_undated.csv.gz") is None


def test_most_recent_by_mtime(tmp_path):
    # FIXTURES.md §A.3 case 8: older mtime must lose, regardless of name
    new = tmp_path / "tcp_b_2026-01-02.csv.gz"
    old = tmp_path / "tcp_a_2026-01-01.csv.gz"
    for p in (old, new):
        shutil.copy(TCP_FILE, p)
    now = time.time()
    os.utime(old, (now - 1000, now - 1000))
    os.utime(new, (now, now))
    assert most_recent_file_with_prefix(str(tmp_path), "tcp", "csv.gz") == str(new)
    assert most_recent_file_with_prefix(str(tmp_path), "udp", "csv.gz") is None


def test_tcp_typing_golden(spark):
    rows = {
        r.ip_request: r
        for r in ingest_file(spark, TCP_FILE, "tcp", "2026-01-15").collect()
    }
    full = rows["203.0.113.7"]
    assert full.timestamp_request == dt.datetime(2026, 1, 15, 1, 2, 3, 456789)
    assert full.asn_request == 3320.0 and full.protocol == "tcp"
    assert full.scan_date == "2026-01-15"

    # strict %f: no fraction -> NULL; 1-digit fraction parses (Python %f ditto)
    nofrac = rows["203.0.113.8"]
    assert nofrac.timestamp_request is None
    assert nofrac.timestamp_response == dt.datetime(2026, 1, 15, 1, 2, 4, 100000)

    garbage = rows["203.0.113.9"]
    assert garbage.timestamp_request is None
    assert garbage.asn_request is None  # 'AS3320' -> NULL (permissive float)
    assert garbage.asn_response == 15169.5

    # empty strings -> NULL everywhere
    empties = rows[None] if None in rows else None
    assert empties is not None
    assert empties.ip_request is None and empties.response_type is None

    # short row: missing trailing fields -> NULL
    short = rows["203.0.113.11"]
    assert short.timestamp_request == dt.datetime(2026, 1, 15, 3, 0, 0, 123456)
    assert short.response_type is None and short.org_arecord is None


def test_udp_missing_timestamp_response(spark):
    rows = ingest_file(spark, UDP_FILE, "udp", "2026-01-16").collect()
    assert all(r.timestamp_response is None for r in rows)
    assert {r.protocol for r in rows} == {"udp"}
    assert len(rows[0].__fields__) == 20


def test_snapshot_replace_per_protocol(spark, tmp_path):
    """Dynamic partition overwrite == the reference's delete-then-insert
    per protocol, but atomic: re-ingesting tcp must not touch udp."""
    sink = str(tmp_path / "sink")
    tcp = ingest_file(spark, TCP_FILE, "tcp", "2026-01-15")
    udp = ingest_file(spark, UDP_FILE, "udp", "2026-01-16")
    write_snapshot_partitioned(tcp, sink)
    write_snapshot_partitioned(udp, sink)
    before = spark.read.parquet(sink).groupBy("protocol").count().collect()
    counts = {r.protocol: r["count"] for r in before}
    assert counts == {"tcp": 5, "udp": 2}

    # replace tcp snapshot with a 1-row subset; udp must survive
    write_snapshot_partitioned(tcp.limit(1), sink)
    after = {r.protocol: r["count"] for r in spark.read.parquet(sink).groupBy("protocol").count().collect()}
    assert after == {"tcp": 1, "udp": 2}


def test_full_pipeline_run(spark, tmp_path):
    sink = str(tmp_path / "sink")
    results = run_ingest(spark, FIXTURES, sink, year=2026)
    by_proto = {r.protocol: r for r in results}
    assert by_proto["tcp"].rows == 5 and by_proto["tcp"].scan_date == "2026-01-15"
    assert by_proto["udp"].rows == 2 and by_proto["udp"].scan_date == "2026-01-16"
    assert os.path.basename(by_proto["tcp"].source_file) == "tcp_dns_scan_2026-01-15.csv.gz"


def test_delete_sql_composition():
    sql, params = delete_by_protocol_sql('odns"entries', "tcp")
    assert sql == 'DELETE FROM "odns""entries" WHERE "protocol" = %s'
    assert params == ("tcp",)


def test_distributed_archive_listing(spark):
    from odns_dataimporter_spark.odns.files import list_archive_files_distributed

    df = list_archive_files_distributed(spark, FIXTURES)
    rows = {os.path.basename(r.path): r.length for r in df.collect()}
    assert set(rows) == {
        "tcp_dns_scan_2026-01-15.csv.gz",
        "udp_dns_scan_2026-01-16.csv.gz",
        "tcp_dns_scan_undated.csv.gz",
    }
    for name, length in rows.items():
        disk = os.path.getsize(
            next(
                os.path.join(dp, name)
                for dp, _, fs in os.walk(FIXTURES)
                if name in fs
            )
        )
        assert length == disk


def test_stage_decompress_equals_native_gz_read(spark, tmp_path):
    """The staged (splittable) ingest path must produce exactly the rows
    of the native .gz read — staging changes the physical scan, never
    the data."""
    from odns_dataimporter_spark.odns.ingest import ingest_file

    native = ingest_file(spark, TCP_FILE, "tcp", "2026-01-15")
    staged = ingest_file(
        spark, TCP_FILE, "tcp", "2026-01-15", stage_dir=str(tmp_path / "stage")
    )
    assert staged.columns == native.columns
    from collections import Counter

    assert Counter(map(tuple, staged.collect())) == Counter(map(tuple, native.collect()))
    # idempotent: a second call reuses the cached staged file
    staged2 = ingest_file(
        spark, TCP_FILE, "tcp", "2026-01-15", stage_dir=str(tmp_path / "stage")
    )
    assert staged2.count() == native.count()
