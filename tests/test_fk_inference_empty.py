"""Empty-child-table sweep for profile_fk_inference (round-6 ADVICE
item 3): the inclusion coefficient's n_child_keys=0 branch — SUM over
zero rows is NULL, try_divide(NULL, 0) must stay NULL, is_fk must stay
NULL — verified as full oracle parity against DuckDB on a fixture
where every CHILD table is empty (covering both empty-child/non-empty-
parent and empty-child/empty-parent pairs), which the degenerate sweep
never exercised (it only covers documents/embeddings)."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from odns_dataimporter_spark.oracle import compare
from odns_dataimporter_spark.registry import REGISTRY, all_queries

all_queries()

_TABLES = {
    # child tables (orders, lineitem, customer) are EMPTY; parents that
    # are only-parents (supplier, nation) carry rows, so candidate 3/4
    # exercise empty-child-vs-nonempty-parent while 1/2/5 exercise the
    # doubly-empty join.
    "orders": pd.DataFrame({"o_orderkey": pd.Series([], dtype="int64"),
                            "o_custkey": pd.Series([], dtype="int64")}),
    "lineitem": pd.DataFrame({"l_orderkey": pd.Series([], dtype="int64"),
                              "l_suppkey": pd.Series([], dtype="int64")}),
    "customer": pd.DataFrame({"c_custkey": pd.Series([], dtype="int64"),
                              "c_nationkey": pd.Series([], dtype="int64")}),
    "supplier": pd.DataFrame({"s_suppkey": pd.Series([1, 2, 3], dtype="int64")}),
    "nation": pd.DataFrame({"n_nationkey": pd.Series([0, 1], dtype="int64")}),
}


@pytest.fixture(scope="module")
def empty_child_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fk_empty"))
    for name, df in _TABLES.items():
        df.to_parquet(os.path.join(d, f"{name}.parquet"), index=False)
    return d


def test_fk_inference_empty_child_oracle_parity(spark, empty_child_dir):
    spec = REGISTRY["profile_fk_inference"]
    df = spec.fn(spark, empty_child_dir)
    con = duckdb.connect()
    try:
        for t in _TABLES:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{empty_child_dir}/{t}.parquet')"
            )
        res = compare("profile_fk_inference", df, con, spec.oracle)
    finally:
        con.close()
    assert res.ok, f"profile_fk_inference on empty children: {res.detail}"


def test_fk_inference_empty_child_null_metrics(spark, empty_child_dir):
    """The branch's contract, pinned explicitly: every pair reports
    n_child_keys=0 and NULL for n_matched / inclusion_q6 / is_fk — no
    division-by-zero error, no spurious is_fk=true on vacuous input."""
    rows = {r.fk_pair: r for r in
            REGISTRY["profile_fk_inference"].fn(spark, empty_child_dir).collect()}
    assert len(rows) == 5
    for r in rows.values():
        assert r.n_child_keys == 0
        assert r.n_matched is None
        assert r.inclusion_q6 is None
        assert r.is_fk is None
