"""CLI contract tests (exit codes per reference dataimporter.py:216-227)."""

from __future__ import annotations

import os

from odns_dataimporter_spark.__main__ import main

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "odns")


def test_health_ok(spark):
    assert main(["--check-health", "--archive", FIXTURES]) == 0


def test_health_bad_path(spark):
    assert main(["--check-health", "--archive", "/nonexistent/archive"]) == 1


def test_ingest_run(spark, tmp_path):
    sink = str(tmp_path / "sink")
    assert main(["--archive", FIXTURES, "--sink", sink, "--year", "2026"]) == 0
    assert os.path.isdir(sink)


def test_ingest_requires_sink(spark):
    assert main(["--archive", FIXTURES]) == 1


def test_cli_ingest_with_stage_dir(spark, tmp_path, capsys):
    """--stage-dir routes through the staged-decompress fast path and
    produces the same per-protocol row counts."""
    import os

    from odns_dataimporter_spark.__main__ import main

    archive = os.path.join(os.path.dirname(__file__), "fixtures", "odns")
    rc = main(
        [
            "--archive", archive,
            "--sink", str(tmp_path / "sink"),
            "--year", "2026",
            "--stage-dir", str(tmp_path / "stage"),
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "tcp: 5 rows" in out
    assert "udp: 2 rows" in out


def test_cli_run_query(spark, sf_dir, capsys):
    assert main(["--run-query", "agg_min_max", "--sf-dir", sf_dir, "--limit", "5"]) == 0
    out = capsys.readouterr().out
    assert "o_orderstatus" in out or "min" in out


def test_cli_run_query_unknown(spark, capsys):
    assert main(["--run-query", "agg_min_maxx"]) == 1
    assert "close matches" in capsys.readouterr().err
