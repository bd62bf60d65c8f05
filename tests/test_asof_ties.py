"""Property test for the asof family's determinism under duplicate
(user_id, ts) signups (VERDICT r3 item 3).

The shipped testdata happens to contain no tied signups, so nothing in
the standard oracle-parity sweep exercises the tie rule — and testdata
layout drifts between rounds. Here hypothesis generates event sets whose
timestamps are drawn from a TINY domain (5 distinct microsecond values),
so same-user same-ts signup collisions are near-certain, then replays
the exact driver comparison (odns_dataimporter_spark.oracle.compare)
against DuckDB on the generated parquet.

If either window ordering in joins.py loses its signup_id tiebreak
(ORDER BY abs(offset), ts, event_id in the oracle), this fails.
"""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from odns_dataimporter_spark.oracle import compare
from odns_dataimporter_spark.registry import REGISTRY, all_queries

all_queries()

_ASOF_QUERIES = ["join_asof", "join_asof_nearest", "join_asof_tolerance"]

_BASE = dt.datetime(2024, 3, 1, 12, 0, 0)
# 5 possible timestamps => birthday-paradox ties on every example
_TS_DOMAIN = [_BASE + dt.timedelta(microseconds=250_000 * i) for i in range(5)]


@st.composite
def _event_sets(draw):
    rows = []
    eid = 0
    for user in range(draw(st.integers(1, 3))):
        n_sign = draw(st.integers(0, 4))
        n_buy = draw(st.integers(1, 4))
        for _ in range(n_sign):
            ts = draw(st.sampled_from(_TS_DOMAIN))
            rows.append((eid, ts, user, "signup", 0.0, "{}"))
            eid += 1
        for _ in range(n_buy):
            ts = draw(st.sampled_from(_TS_DOMAIN))
            rows.append((eid, ts, user, "purchase", 1.0, "{}"))
            eid += 1
    # shuffle event_id assignment order so id order is decoupled from
    # generation order (ids stay unique)
    ids = draw(st.permutations([r[0] for r in rows]))
    return [(i,) + r[1:] for i, r in zip(ids, rows)]


def _write_events(tmpdir: str, rows) -> str:
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    path = os.path.join(tmpdir, "events.parquet")
    df.to_parquet(path, index=False)
    return tmpdir


@pytest.mark.parametrize("name", _ASOF_QUERIES)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_event_sets())
def test_asof_tie_determinism(name, rows, spark, tmp_path_factory):
    sf_dir = _write_events(str(tmp_path_factory.mktemp("asof")), rows)
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    con = duckdb.connect()
    try:
        con.sql(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf_dir}/events.parquet')"
        )
        res = compare(name, df, con, spec.oracle)
    finally:
        con.close()
    assert res.ok, f"{name} under tied signups: {res.detail}\nrows={rows}"
