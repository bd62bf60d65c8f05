"""Replays the driver's DuckDB-oracle comparison for every registered
query at sf0.001 (fast). This is the primary correctness gate: if this
passes, the driver's sf0.01 check should too (same engines, same
semantics, 10x rows)."""

from __future__ import annotations

import pytest

from odns_dataimporter_spark.oracle import compare, duckdb_connect
from odns_dataimporter_spark.registry import REGISTRY, all_queries

all_queries()  # trigger registration


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connect(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize(
    "name", [n for n, s in sorted(REGISTRY.items()) if s.oracle is not None]
)
def test_oracle_parity(name, spark, sf_dir, con):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    res = compare(name, df, con, spec.oracle)
    assert res.ok, res.detail
    if spec.min_rows:
        assert df.count() >= spec.min_rows, (
            f"{name}: oracle matched but result is empty — vacuous pass "
            "(a broken filter would hide here); set min_rows=0 if this "
            "query can legitimately be empty at this scale"
        )


@pytest.mark.parametrize(
    "name", [n for n, s in sorted(REGISTRY.items()) if s.oracle is None]
)
def test_rows_only_runs(name, spark, sf_dir):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
