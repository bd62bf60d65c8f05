"""Boundary property test for the let-bound winnow chain (round 5).

The O(n²)-fix rewrite (ARCHITECTURE.md "Plan-reuse conventions" #1)
restructured text_winnow_fingerprints / dedup_winnow_pairs into nested
single-element transform lambdas; the CASE boundaries (docs shorter
than k, shorter than k+w−1) now live INSIDE lambda scopes. Hypothesis
generates corpora dominated by boundary-length docs and replays the
driver's DuckDB comparison on them.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from odns_dataimporter_spark.oracle import compare
from odns_dataimporter_spark.registry import REGISTRY, all_queries

all_queries()

_WORDS = ["aa", "bb", "cc", "dd"]


@st.composite
def _corpora(draw):
    docs = []
    n = draw(st.integers(3, 8))
    for i in range(n):
        # lengths clustered on the k / k+w-1 boundaries (k=3, w=4)
        ln = draw(st.sampled_from([0, 1, 2, 3, 4, 5, 6, 7, 12]))
        toks = [draw(st.sampled_from(_WORDS)) for _ in range(ln)]
        docs.append((i, " ".join(toks), "en", "src", ln))
    return docs


@pytest.mark.parametrize("name", ["text_winnow_fingerprints", "dedup_winnow_pairs"])
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_corpora())
def test_winnow_boundary_lengths(name, docs, spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("winnow"))
    pd.DataFrame(
        docs, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(os.path.join(d, "documents.parquet"), index=False)
    spec = REGISTRY[name]
    df = spec.fn(spark, d)
    con = duckdb.connect()
    try:
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')"
        )
        res = compare(name, df, con, spec.oracle)
    finally:
        con.close()
    assert res.ok, f"{name}: {res.detail}\ndocs={docs}"
