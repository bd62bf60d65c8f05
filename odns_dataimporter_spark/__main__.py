"""CLI entry point mirroring the reference's contract (SURVEY §3.1-3.2).

  python -m odns_dataimporter_spark --archive /data --sink /warehouse/odns
  python -m odns_dataimporter_spark --check-health --archive /data

Exit codes match the reference (dataimporter.py:216-227,302-306):
0 on success / healthy, 1 on failure — the container-orchestration
contract.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="odns_dataimporter_spark")
    p.add_argument("--archive", help="scan archive root (<root>/<yyyy>/<proto>/)")
    p.add_argument("--sink", help="partitioned parquet sink path")
    p.add_argument("--config", help="ini config (see config.ini.template); flags override")
    p.add_argument("--year", type=int, default=None, help="archive year (default: current)")
    p.add_argument("--repartition", type=int, default=None)
    p.add_argument(
        "--stage-dir",
        default=None,
        help="stage-decompress .gz archives here before scanning "
        "(splittable scan — the fast path for large single files)",
    )
    p.add_argument("--check-health", action="store_true")
    p.add_argument(
        "--run-query",
        metavar="NAME",
        help="run a registered analytics query by name against --sf-dir "
        "and print up to --limit rows (see COVERAGE.md for the list)",
    )
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                   help="parquet table dir for --run-query")
    p.add_argument("--limit", type=int, default=20)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.run_query:
        return _run_query(args.run_query, args.sf_dir, args.limit)
    if args.config:
        from odns_dataimporter_spark.odns.config import load_config

        cfg = load_config(args.config)
        args.archive = args.archive or cfg.archive_root
        args.sink = args.sink or cfg.sink_path
    if not args.archive:
        print("--archive (or a config with paths.archive_root) is required", file=sys.stderr)
        return 1
    from pyspark.sql import SparkSession

    from odns_dataimporter_spark.odns.sinks import healthcheck_paths
    from odns_dataimporter_spark.session import get_spark

    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(app_name="odns-ingest")
    try:
        if args.check_health:
            ok = healthcheck_paths(spark, args.archive)
            print(f"shared drive {'healthy' if ok else 'UNHEALTHY'}: {args.archive}")
            return 0 if ok else 1
        if not args.sink:
            print("--sink is required for an ingest run", file=sys.stderr)
            return 1
        from odns_dataimporter_spark.odns.pipeline import run_ingest

        results = run_ingest(
            spark,
            args.archive,
            args.sink,
            year=args.year,
            repartition=args.repartition,
            stage_dir=args.stage_dir,
        )
        for r in results:
            print(
                f"{r.protocol}: {r.rows} rows"
                + (f" from {r.source_file} (scan_date={r.scan_date})" if r.source_file else " (no file found)")
            )
        return 0
    except Exception as exc:  # the reference exits 1 on any failure
        print(f"ingest failed: {exc}", file=sys.stderr)
        return 1
    finally:
        if owns_session:  # embedded callers (tests) keep their session
            spark.stop()


def _run_query(name: str, sf_dir: str, limit: int) -> int:
    """Developer surface: run any registry operator by name."""
    from pyspark.sql import SparkSession

    from odns_dataimporter_spark.registry import REGISTRY, all_queries
    from odns_dataimporter_spark.session import get_spark

    all_queries()
    if name not in REGISTRY:
        import difflib

        close = difflib.get_close_matches(name, REGISTRY, n=5)
        print(f"unknown query {name!r}; close matches: {close}", file=sys.stderr)
        return 1
    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(app_name=f"query-{name}")
    try:
        df = REGISTRY[name].fn(spark, sf_dir)
        df.show(limit, truncate=False)
        return 0
    except Exception as exc:
        print(f"query failed: {exc}", file=sys.stderr)
        return 1
    finally:
        if owns_session:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
