"""Live JDBC round-trip against EMBEDDED Derby (closes SURVEY §2.1's
one untested externally-visible behavior: rows actually landing in a
database table and coming back).

The Spark distribution ships Derby (pyspark/jars/derby-10.16.*.jar —
it backs the Hive metastore), and Derby's embedded driver runs inside
the same JVM as local-mode Spark, so the full write path
(`write_jdbc_batched`, reference dataimporter.py:119-127) and read
path (`scan_jdbc_partitioned`, partitioned range extraction) execute
END TO END with no external server. The snapshot-replace sequence
(DELETE by protocol, then batched append — reference
dataimporter.py:187-200) runs through the same JDBC connection,
exercising `delete_by_protocol_sql`'s qmark paramstyle.
"""

from __future__ import annotations

import pytest

from odns_dataimporter_spark.odns.sinks import (
    delete_by_protocol_sql,
    write_jdbc_batched,
)
from odns_dataimporter_spark.sources import scan_jdbc_partitioned

_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"
# explicit VARCHAR DDL types: Derby's default StringType mapping is
# CLOB, which is not comparable (no WHERE/predicate pushdown on it) —
# the same public option a production Postgres deploy uses to pin types
_PROPS = {
    "driver": _DRIVER,
    "createTableColumnTypes": "event_type VARCHAR(32), protocol VARCHAR(16)",
}


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "testdb"
    return f"jdbc:derby:{db};create=true"


def _jdbc_exec(spark, url: str, sql: str, params: tuple = ()):
    """Run one statement through a py4j JDBC connection (the test's
    stand-in for the reference's psycopg cursor)."""
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.prepareStatement(sql)
        for i, p in enumerate(params, start=1):
            st.setString(i, p)
        st.execute()
        st.close()
    finally:
        conn.close()


def _sample(spark, sf_dir):
    from pyspark.sql import functions as F

    from odns_dataimporter_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        "ts",
        # reference rows carry the protocol column the snapshot-replace
        # sink keys on (dataimporter.py:187-200)
        F.when(F.col("event_id") % 2 == 0, "tcp").otherwise("udp").alias("protocol"),
    ).filter(F.col("event_id") <= 1000)


def test_jdbc_write_then_scan_roundtrip(spark, sf_dir, derby_url):
    df = _sample(spark, sf_dir)
    write_jdbc_batched(
        df,
        derby_url,
        "events_rt",
        properties=_PROPS,
        batchsize=200,
        num_partitions=2,
        rows=df.count(),
    )
    back = scan_jdbc_partitioned(
        spark,
        url=derby_url,
        table="events_rt",
        partition_column="event_id",
        lower_bound=1,
        upper_bound=1001,
        num_partitions=4,
    )
    # the partitioned scan must produce 4 range-predicated partitions
    assert back.rdd.getNumPartitions() == 4
    want = sorted(
        (r.event_id, r.user_id, r.event_type, round(r.value, 6), r.ts)
        for r in df.collect()
    )
    got = sorted(
        (r.event_id, r.user_id, r.event_type, round(r.value, 6), r.ts)
        for r in back.collect()
    )
    assert got == want


def test_jdbc_snapshot_replace_by_protocol(spark, sf_dir, derby_url):
    df = _sample(spark, sf_dir)
    write_jdbc_batched(
        df, derby_url, "events_snap", properties=_PROPS, num_partitions=2
    )
    n_tcp = df.filter("protocol = 'tcp'").count()
    n_udp = df.filter("protocol = 'udp'").count()

    # reference snapshot-replace: DELETE one protocol, re-append it
    sql, params = delete_by_protocol_sql("EVENTS_SNAP", "tcp", paramstyle="qmark")
    _jdbc_exec(spark, derby_url, sql, params)
    remaining = scan_jdbc_partitioned(spark, url=derby_url, table="events_snap")
    assert remaining.count() == n_udp  # udp untouched, tcp cleared

    write_jdbc_batched(
        df.filter("protocol = 'tcp'"),
        derby_url,
        "events_snap",
        properties=_PROPS,
        num_partitions=2,
    )
    reloaded = scan_jdbc_partitioned(spark, url=derby_url, table="events_snap")
    assert reloaded.count() == n_tcp + n_udp
    assert reloaded.filter("protocol = 'tcp'").count() == n_tcp


def test_stream_jdbc_upsert_exactly_once(spark, sf_dir, derby_url, tmp_path):
    """Streaming -> JDBC with the idempotent delete-then-append recipe
    (streaming/jobs.py::stream_jdbc_upsert): (1) a full availableNow
    pass lands every source row exactly once; (2) a RESTART from the
    same checkpoint with no new data writes nothing; (3) new source
    files append only their own rows. This is the streaming completion
    of the reference's batched-JDBC sink."""
    from pyspark.sql import functions as F

    from odns_dataimporter_spark.streaming.jobs import (
        prepare_stream_source,
        stream_jdbc_upsert,
    )

    src = prepare_stream_source(spark, sf_dir, str(tmp_path / "src"))
    ckpt = str(tmp_path / "ckpt")
    n_src = spark.read.parquet(src).count()

    n1 = stream_jdbc_upsert(spark, src, derby_url, "events_stream", ckpt)
    assert n1 >= 1
    back = scan_jdbc_partitioned(spark, url=derby_url, table="events_stream")
    assert back.count() == n_src
    assert back.select("event_id").distinct().count() == n_src

    # restart, no new data: checkpoint replays nothing, table unchanged
    n2 = stream_jdbc_upsert(spark, src, derby_url, "events_stream", ckpt)
    assert n2 == 0 or scan_jdbc_partitioned(
        spark, url=derby_url, table="events_stream"
    ).count() == n_src

    # new arrivals: exactly the new rows land
    extra = spark.range(5).select(
        (F.col("id") + 10_000_000).alias("event_id"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.col("id").alias("user_id"),
        F.lit("signup").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit('{"k": 1}').alias("props"),
    )
    extra.write.mode("append").parquet(src)
    stream_jdbc_upsert(spark, src, derby_url, "events_stream", ckpt)
    final = scan_jdbc_partitioned(spark, url=derby_url, table="events_stream")
    assert final.count() == n_src + 5
    assert final.filter("event_id >= 10000000").count() == 5


def test_stream_jdbc_upsert_delete_failure_propagates(
    spark, sf_dir, derby_url, tmp_path
):
    """The idempotency DELETE may ignore ONLY table-not-yet-created
    (SQLSTATE 42X05 on Derby); any other DELETE failure must propagate
    so the micro-batch retries instead of appending duplicate rows
    (round-6 ADVICE item 2). Simulated here with a pre-created table
    that LACKS the batch_id column: the DELETE fails with Derby's
    42X04 (column not in any table), which must surface — the old
    swallow-everything guard would have appended anyway and then died
    later, or worse, duplicated rows on a replay."""
    import pytest

    from odns_dataimporter_spark.streaming.jobs import (
        prepare_stream_source,
        stream_jdbc_upsert,
    )

    _jdbc_exec(
        spark, derby_url, "CREATE TABLE events_nobatch (event_id BIGINT)"
    )
    src = prepare_stream_source(spark, sf_dir, str(tmp_path / "src2"))
    ckpt = str(tmp_path / "ckpt2")
    with pytest.raises(Exception) as ei:
        stream_jdbc_upsert(spark, src, derby_url, "events_nobatch", ckpt)
    assert "42X04" in str(ei.value) or "BATCH_ID" in str(ei.value).upper()


def test_stream_jdbc_upsert_table_missing_still_ignored(
    spark, sf_dir, derby_url, tmp_path
):
    """First-ever batch against a brand-new table name: the DELETE hits
    Derby's 42X05 (table does not exist) and is ignored; the append
    then creates the table. The narrowed guard must keep this path
    working."""
    from odns_dataimporter_spark.streaming.jobs import (
        prepare_stream_source,
        stream_jdbc_upsert,
    )

    src = prepare_stream_source(spark, sf_dir, str(tmp_path / "src3"))
    ckpt = str(tmp_path / "ckpt3")
    n = stream_jdbc_upsert(spark, src, derby_url, "events_fresh_tbl", ckpt)
    assert n >= 1
    back = scan_jdbc_partitioned(spark, url=derby_url, table="events_fresh_tbl")
    assert back.count() == spark.read.parquet(src).count()
