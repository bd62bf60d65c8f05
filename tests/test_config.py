"""Config-file parity tests (reference config.ini.template surface)."""

from __future__ import annotations

import textwrap

from odns_dataimporter_spark.odns.config import load_config


def test_load_full_config(tmp_path):
    p = tmp_path / "config.ini"
    p.write_text(
        textwrap.dedent(
            """
            [postgres-db]
            host = db.example
            port = 5433
            user = odns
            password = secret
            dbname = scans

            [db-table-names]
            odnstable = odns_entries

            [paths]
            archive_root = /data
            sink_path = /warehouse/odns
            """
        )
    )
    cfg = load_config(str(p))
    assert cfg.jdbc_url == "jdbc:postgresql://db.example:5433/scans"
    assert cfg.jdbc_properties["user"] == "odns"
    assert cfg.table_name == "odns_entries"
    assert cfg.archive_root == "/data"
    assert cfg.sink_path == "/warehouse/odns"


def test_cli_reads_config(tmp_path):
    import os

    from odns_dataimporter_spark.__main__ import main

    fixtures = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "odns")
    p = tmp_path / "config.ini"
    p.write_text(f"[paths]\narchive_root = {fixtures}\n")
    assert main(["--check-health", "--config", str(p)]) == 0
