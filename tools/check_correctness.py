#!/usr/bin/env python
"""Driver-mimic correctness harness: run every ``queries()`` entry and its
DuckDB ``oracle_sql()`` side-by-side at sf0.01 through the repo's own
strict comparator (``odns_dataimporter_spark.oracle.compare`` — row
count, column names AND types, order-insensitive value hash), so
regressions surface before the round boundary.

Usage: python tools/check_correctness.py [query ...]   (default: all)
"""

from __future__ import annotations

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
                    print(f"FAIL      {name}  {res.detail}", flush=True)
                else:
                    print(f"ok        {name}", flush=True)
            else:
                print(f"rows-only {name}  rows={df.count()}", flush=True)
        except Exception:
            fails.append(name)
            err = traceback.format_exc(limit=3).splitlines()[-1][:300]
            print(f"FAIL      {name}  {err}", flush=True)

    print(json.dumps({"n": n, "fails": fails}))
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
