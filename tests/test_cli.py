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
