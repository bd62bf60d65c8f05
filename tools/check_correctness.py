#!/usr/bin/env python
"""Driver-mimic correctness harness: run every ``queries()`` entry and its
DuckDB ``oracle_sql()`` side-by-side at sf0.01, compare row count, schema
arity, and an order-insensitive value hash (columns sorted by name, rows
sorted lexicographically — the driver's comparison, re-implemented here so
regressions surface before the round boundary).

Usage: python tools/check_correctness.py [query ...]   (default: all)
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry
from odns_dataimporter_spark.session import get_spark
from odns_dataimporter_spark.tables import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _norm(v) -> str:
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def value_hash(rows, cols) -> str:
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    for r in sorted(tuple(_norm(r[i]) for i in idx) for r in rows):
        h.update("|".join(r).encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> None:
    only = set(sys.argv[1:])
    spark = get_spark(app_name="check-correctness", cpus=os.environ.get("SPARK_GRAFT_CPUS", "16"))
    qs, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    results: dict[str, dict] = {}
    fails: list[str] = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec: dict = {}
        try:
            df = fn(spark, SF_DIR)
            scols = df.columns
            srows = [[r[i] for i in range(len(scols))] for r in df.collect()]
            rec["spark_rows"] = len(srows)
            if name in oracles:
                cur = con.execute(oracles[name])
                ocols = [d[0] for d in cur.description]
                orows = cur.fetchall()
                rec["oracle_rows"] = len(orows)
                rec["rows_match"] = len(srows) == len(orows)
                rec["schema_match"] = sorted(scols) == sorted(ocols)
                rec["hash_match"] = value_hash(srows, scols) == value_hash(orows, ocols)
                if not (rec["rows_match"] and rec["schema_match"] and rec["hash_match"]):
                    fails.append(name)
            else:
                rec["err"] = "no_oracle"
        except Exception:
            rec["err"] = traceback.format_exc(limit=3).splitlines()[-1][:300]
            fails.append(name)
        results[name] = rec
        status = "FAIL" if name in fails else ("ok" if rec.get("hash_match") else "rows-only")
        print(f"{status:9s} {name}  {rec}", flush=True)

    print(json.dumps({"n": len(results), "fails": fails}))
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
