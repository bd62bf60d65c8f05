"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL side by side and
compares row count, column names, and an order-insensitive canonical
value set. Used by tests/test_oracle_parity.py so every operator is
validated before the driver ever sees it. Stricter than it needs to be:
floats must match exactly (the in-query rounding conventions in
queries/_helpers.py are what make that achievable).
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass

import duckdb

from odns_dataimporter_spark.tables import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return f"{type(v).__name__}:{v!r}"


def _canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon_cell(r[i]) for i in order) for r in rows)


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str = ""


# Spark dtype string -> normalized type token (DuckDB types map onto the
# same tokens below). Exact matching matters: if the driver compares
# schemas, int32-vs-int64 is a failure even when every value is equal.
_SPARK_TYPE_NORM = {
    "int": "INTEGER",
    "bigint": "BIGINT",
    "smallint": "SMALLINT",
    "double": "DOUBLE",
    "float": "FLOAT",
    "string": "VARCHAR",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
    "boolean": "BOOLEAN",
}


def _type_mismatches(spark_df, rel) -> list[str]:
    duck = {c.lower(): str(t) for c, t in zip(rel.columns, rel.types)}
    out = []
    for c, t in spark_df.dtypes:
        want = duck.get(c.lower())
        norm = _SPARK_TYPE_NORM.get(t, t.upper())
        if want is not None and norm != want:
            out.append(f"{c}: spark={t} duckdb={want}")
    return out


def compare(name: str, spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> CompareResult:
    mine_cols = list(spark_df.columns)
    mine_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    oracle_cols = list(rel.columns)
    oracle_rows = rel.fetchall()

    if sorted(c.lower() for c in mine_cols) != sorted(c.lower() for c in oracle_cols):
        return CompareResult(name, False, f"columns differ: {mine_cols} vs {oracle_cols}")
    bad_types = _type_mismatches(spark_df, rel)
    if bad_types:
        return CompareResult(name, False, f"types differ: {bad_types}")
    if len(mine_rows) != len(oracle_rows):
        return CompareResult(
            name, False, f"row count differs: spark={len(mine_rows)} oracle={len(oracle_rows)}"
        )
    a = _canon_rows([c.lower() for c in mine_cols], mine_rows)
    b = _canon_rows([c.lower() for c in oracle_cols], oracle_rows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return CompareResult(name, False, f"values differ; first diffs: {diffs}")
    return CompareResult(name, True)
