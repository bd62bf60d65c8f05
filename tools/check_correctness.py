#!/usr/bin/env python
"""Driver-mimic correctness harness: run every ``queries()`` entry and its
DuckDB ``oracle_sql()`` side-by-side at sf0.01 through the repo's own
strict comparator (``odns_dataimporter_spark.oracle.compare`` — row
count, column names AND types, order-insensitive value hash), so
regressions surface before the round boundary.

Usage: python tools/check_correctness.py [query ...]   (default: all)
       JSON_OUT=path python tools/check_correctness.py
           — additionally write a per-query artifact (the round's
           CORRECTNESS_LOCAL_FULL_r{N}.json): {name: {status, rows,
           detail}} with status ok | rows_only | fail.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from odns_dataimporter_spark.oracle import compare, duckdb_connect
from odns_dataimporter_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    only = set(sys.argv[1:])
    spark = get_spark(app_name="check-correctness", cpus=os.environ.get("SPARK_GRAFT_CPUS", "16"))
    qs, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb_connect(SF_DIR)

    n = 0
    fails: list[str] = []
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n += 1
        try:
            df = fn(spark, SF_DIR)
            if name in oracles:
                res = compare(name, df, con, oracles[name])
                if not res.ok:
                    fails.append(name)
                    report[name] = {"status": "fail", "detail": res.detail[:300]}
                    print(f"FAIL      {name}  {res.detail}", flush=True)
                else:
                    report[name] = {"status": "ok"}
                    print(f"ok        {name}", flush=True)
            else:
                rows = df.count()
                report[name] = {"status": "rows_only", "rows": rows}
                print(f"rows-only {name}  rows={rows}", flush=True)
        except Exception:
            fails.append(name)
            err = traceback.format_exc(limit=3).splitlines()[-1][:300]
            report[name] = {"status": "fail", "detail": err}
            print(f"FAIL      {name}  {err}", flush=True)
        # drop py4j handles so ContextCleaner can evict lazy
        # localCheckpoint blocks between queries (round-6 heap rule)
        del df
        gc.collect()

    out = os.environ.get("JSON_OUT")
    if out:
        with open(out, "w") as fh:
            json.dump(
                {"sf_dir": SF_DIR, "n": n, "fails": fails, "queries": report},
                fh,
                indent=1,
                sort_keys=True,
            )
    print(json.dumps({"n": n, "fails": fails}))
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
