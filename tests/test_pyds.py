"""Python DataSource (`format("odns_scan")`) tests: typed-read
equivalence with the JVM ingest path, planning-time file pruning via
pushFilters, and the archive-watching stream reader."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, IsNotNull

from odns_dataimporter_spark.odns.ingest import ingest_file
from odns_dataimporter_spark.odns.pyds import (
    OdnsScanDataSource,
    OdnsScanReader,
    OdnsScanStreamReader,
    _discover,
)

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "odns")
TCP_FILE = os.path.join(FIXTURES, "2026", "tcp", "tcp_dns_scan_2026-01-15.csv.gz")
UDP_FILE = os.path.join(FIXTURES, "2026", "udp", "udp_dns_scan_2026-01-16.csv.gz")


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(OdnsScanDataSource)
    # runtime-settable in Spark 4.1; get_spark() also sets it at build time
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")


def _canon(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_discovery_layout():
    files = _discover(FIXTURES)
    assert [(p.rsplit("/", 2)[-2], proto, d) for p, proto, d in files] == [
        ("tcp", "tcp", "2026-01-15"),
        ("udp", "udp", "2026-01-16"),
    ]


def test_batch_read_matches_jvm_ingest(spark):
    """The Python source must produce byte-identical typed rows to the
    JVM scan→typed_projection path (same typer semantics, same 20-col
    sink layout)."""
    got = spark.read.format("odns_scan").option("path", FIXTURES).load()
    want = ingest_file(spark, TCP_FILE, "tcp", "2026-01-15").unionByName(
        ingest_file(spark, UDP_FILE, "udp", "2026-01-16")
    )
    assert [(f.name, f.dataType) for f in got.schema] == [
        (f.name, f.dataType) for f in want.schema
    ]  # nullability differs: JVM literals are non-null
    assert _canon(got) == _canon(want)


def test_filter_pushdown_prunes_files():
    r = OdnsScanReader({"path": FIXTURES})
    leftover = list(r.pushFilters([EqualTo(("protocol",), "tcp")]))
    assert leftover == []  # fully consumed at planning time
    parts = r.partitions()
    assert [p.protocol for p in parts] == ["tcp"]

    r2 = OdnsScanReader({"path": FIXTURES})
    leftover2 = list(
        r2.pushFilters(
            [GreaterThanOrEqual(("scan_date",), "2026-01-16"), IsNotNull(("a_record",))]
        )
    )
    # the row-level predicate comes back to Spark; the range pruned files
    assert len(leftover2) == 1 and isinstance(leftover2[0], IsNotNull)
    assert [p.scan_date for p in r2.partitions()] == ["2026-01-16"]


def test_batch_read_with_filter_correct(spark):
    df = (
        spark.read.format("odns_scan")
        .option("path", FIXTURES)
        .load()
        .filter(F.col("protocol") == "tcp")
    )
    want = ingest_file(spark, TCP_FILE, "tcp", "2026-01-15")
    assert _canon(df) == _canon(want)


def test_protocol_option_restricts(spark):
    df = (
        spark.read.format("odns_scan")
        .option("path", FIXTURES)
        .option("protocol", "udp")
        .load()
    )
    assert df.select("protocol").distinct().collect()[0][0] == "udp"
    assert df.filter(F.col("timestamp_response").isNotNull()).count() == 0


def _mk_archive(dst: str, include_udp: bool) -> None:
    os.makedirs(os.path.join(dst, "2026", "tcp"), exist_ok=True)
    os.makedirs(os.path.join(dst, "2026", "udp"), exist_ok=True)
    shutil.copy(TCP_FILE, os.path.join(dst, "2026", "tcp", os.path.basename(TCP_FILE)))
    if include_udp:
        shutil.copy(
            UDP_FILE, os.path.join(dst, "2026", "udp", os.path.basename(UDP_FILE))
        )


def test_stream_reader_emits_only_new_files(tmp_path):
    """Offset bookkeeping without a running query: first read ingests
    everything, a second read from the new offset sees only the file
    that arrived in between, and readBetweenOffsets replays exactly
    that delta."""
    root = str(tmp_path / "archive")
    _mk_archive(root, include_udp=False)
    sr = OdnsScanStreamReader({"path": root})
    start = sr.initialOffset()
    rows1, off1 = sr.read(start)
    n1 = sum(1 for _ in rows1)
    assert n1 > 0 and off1["seen"] == [os.path.basename(TCP_FILE)]

    rows_again, off_same = sr.read(off1)
    assert sum(1 for _ in rows_again) == 0 and off_same == off1

    _mk_archive(root, include_udp=True)
    rows2, off2 = sr.read(off1)
    batch2 = list(rows2)
    assert len(batch2) > 0
    assert all(r[0] == "udp" for r in batch2)  # protocol column
    assert set(off2["seen"]) == {os.path.basename(TCP_FILE), os.path.basename(UDP_FILE)}

    replay = list(sr.readBetweenOffsets(off1, off2))
    assert sorted(replay) == sorted(batch2)


def test_stream_end_to_end_available_now(spark, tmp_path):
    root = str(tmp_path / "archive")
    _mk_archive(root, include_udp=True)
    q = (
        spark.readStream.format("odns_scan")
        .option("path", root)
        .load()
        .groupBy("protocol")
        .agg(F.count("*").alias("n"))
        .writeStream.format("memory")
        .queryName("pyds_counts")
        .outputMode("complete")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.protocol: r.n for r in spark.sql("SELECT * FROM pyds_counts").collect()}
    want_tcp = ingest_file(spark, TCP_FILE, "tcp", "2026-01-15").count()
    want_udp = ingest_file(spark, UDP_FILE, "udp", "2026-01-16").count()
    assert got == {"tcp": want_tcp, "udp": want_udp}


def test_writer_roundtrip(spark, tmp_path):
    """df.write.format('odns_scan') stages per-task files and commit
    moves them into the archive layout; reading the written archive
    back yields the original typed rows."""
    root = str(tmp_path / "out_archive")
    src = spark.read.format("odns_scan").option("path", FIXTURES).load()
    src.write.format("odns_scan").option("path", root).mode("append").save()

    files = _discover(root)
    assert {(proto, d) for _, proto, d in files} == {
        ("tcp", "2026-01-15"),
        ("udp", "2026-01-16"),
    }
    assert not os.path.isdir(os.path.join(root, "_staging"))

    back = spark.read.format("odns_scan").option("path", root).load()
    assert _canon(back) == _canon(src)


def test_writer_rejects_overwrite(spark, tmp_path):
    src = spark.read.format("odns_scan").option("path", FIXTURES).load()
    with pytest.raises(Exception, match="append-only"):
        src.write.format("odns_scan").option(
            "path", str(tmp_path / "x")
        ).mode("overwrite").save()
