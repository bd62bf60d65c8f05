"""The winnowing GUARANTEE (Schleimer et al. 2003, thm. 1): any shared
token span of length >= k + w - 1 between two documents yields at
least one shared selected fingerprint. This is the property that makes
fingerprint-based matching sound (no false negatives above the
threshold length), so we test OUR operator on adversarially planted
spans rather than trusting the construction."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from odns_dataimporter_spark.queries.llm_text import (
    _WIN_K,
    _WIN_W,
    dedup_winnow_pairs,
    text_winnow_fingerprints,
)

_GUARANTEE_LEN = _WIN_K + _WIN_W - 1  # 6 tokens


def _mk_docs(tmpdir: str) -> str:
    """50 planted pairs: docs (2i, 2i+1) share an 8-token span at
    different offsets, surrounded by per-doc unique filler tokens."""
    rows = []
    for i in range(50):
        # span long enough that winnowing must select >= 3 distinct
        # in-span fingerprints (one per w windows): L - k + 1 - w + 1
        # in-span windows, ceil(windows / w) >= 3 at L = 16
        span = [f"s{i}_{j}" for j in range(16)]
        left = [f"a{i}_{j}" for j in range(7)]
        right = [f"b{i}_{j}" for j in range(9)]
        rows.append((2 * i, " ".join(left + span + ["x%d" % i] * 3)))
        rows.append((2 * i + 1, " ".join(["y%d" % i] * 5 + span + right)))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf["lang"] = "en"
    pdf["source"] = "synthetic"
    pdf["n_chars"] = pdf["text"].str.len()
    path = os.path.join(tmpdir, "documents.parquet")
    pdf.to_parquet(path)
    return tmpdir


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    return _mk_docs(str(tmp_path_factory.mktemp("winnow")))


def test_planted_spans_share_a_fingerprint(spark, planted_dir):
    fps = text_winnow_fingerprints(spark, planted_dir).collect()
    by_doc = {r["doc_id"]: r["fingerprint_digest"] for r in fps}
    assert len(by_doc) == 100
    # digest equality is too strong (docs differ outside the span);
    # instead check via the pair op below — here just sanity: every doc
    # selected at least one fingerprint
    assert all(r["n_fingerprints"] > 0 for r in fps)


def test_planted_pairs_surface_in_match_table(spark, planted_dir):
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_winnow_pairs(spark, planted_dir).collect()
    }
    missing = [
        (2 * i, 2 * i + 1) for i in range(50) if (2 * i, 2 * i + 1) not in pairs
    ]
    # the 16-token span holds 11 fully-in-span windows whose minima are
    # context-independent, and a selection can persist across at most w
    # windows, so both docs share >= ceil(11/4) = 3 fingerprints — the
    # op's threshold is exactly met by the guarantee, not by luck
    assert not missing, f"planted pairs without shared fingerprints: {missing[:5]}"
