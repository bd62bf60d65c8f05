"""Degenerate-document sweep: every oracle-backed text/llm operator
must run AND hash-match DuckDB on a corpus of boundary-length docs
(empty, 1..6 tokens, one long doc) — lengths the shipped testdata never
produces.

Round-5 findings this sweep caught before the driver could:
- Spark's sequence(1, k) is DESCENDING for k < 1, feeding slice() a
  zero/negative start (ANSI crash) on sub-n-gram docs
  (text_repetition_score, text_bigram_freq, decontam_ngram);
- zero-denominator ANSI crashes where DuckDB yields NULL
  (_q6 ratios, tokenizer_bpe_encode chars-per-subword);
- ln(0) crashing the DUCKDB side of text_char_entropy on empty docs;
- NULL-vs-'' divergence of array_to_string/concat_ws on empty arrays
  (text_winnow_fingerprints digest).
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql.utils import AnalysisException

from odns_dataimporter_spark.oracle import compare
from odns_dataimporter_spark.registry import REGISTRY, all_queries

all_queries()

_TEXTS = [
    "",
    "aa",
    "aa bb",
    "aa bb cc",
    "aa bb cc dd",
    "aa bb cc dd ee ff",
    ("aa " * 11 + "bb").strip(),
]

_OPS = sorted(
    n
    for n, s in REGISTRY.items()
    if s.oracle and any(k in (s.tags or ()) for k in ("llm", "text"))
)


@pytest.fixture(scope="module")
def degen_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("degen"))
    rows = [
        (i, t, "en" if i % 2 else "de", "src", len(t)) for i, t in enumerate(_TEXTS)
    ]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(os.path.join(d, "documents.parquet"), index=False)
    pd.DataFrame(
        {
            "vec_id": range(4),
            "embedding": [np.arange(64, dtype=np.float32) / 64 for _ in range(4)],
            "label": [0, 1, 0, 1],
        }
    ).to_parquet(os.path.join(d, "embeddings.parquet"), index=False)
    return d


@pytest.mark.parametrize("name", _OPS)
def test_degenerate_corpus_parity(name, spark, degen_dir):
    spec = REGISTRY[name]
    try:
        df = spec.fn(spark, degen_dir)
        rows_probe = df.limit(1).count()  # force execution errors here
    except AnalysisException as ex:
        if "PATH_NOT_FOUND" in str(ex):
            pytest.skip("op reads tables absent from the degenerate fixture")
        raise
    del rows_probe
    con = duckdb.connect()
    try:
        for t in ("documents", "embeddings"):
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{degen_dir}/{t}.parquet')"
            )
        res = compare(name, df, con, spec.oracle)
    finally:
        con.close()
    assert res.ok, f"{name} on degenerate docs: {res.detail}"
