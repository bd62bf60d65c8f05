"""Algebraic invariants that must hold on ANY input — complementing the
oracle parity suite (which pins exact values on the shipped testdata)
with properties that catch logic errors the fixed dataset can't reach.
"""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from odns_dataimporter_spark.registry import REGISTRY, all_queries

all_queries()


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory):
    """A small documents corpus WITH guaranteed exact duplicates and
    near-duplicates across the prior/new split (doc_id % 10), which the
    shipped sf0.001 testdata does not contain."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = []
    for i in range(40):
        if i % 10 >= 8 and i >= 12:
            # new-batch docs (id % 10 >= 8): exact copies of a PRIOR-split
            # doc — offset chosen so the copied id ends in 7 (< 8)
            j = i - (11 if i % 10 == 8 else 12)
            text = f"{base} doc{j} filler{j % 7}"
        else:
            text = f"{base} doc{i} filler{i % 7}"
        rows.append((i, text, "en" if i % 2 else "de", f"src{i % 3}", len(text)))
    df = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    d = str(tmp_path_factory.mktemp("docs"))
    df.to_parquet(os.path.join(d, "documents.parquet"), index=False)
    return d


def test_minhash_candidates_include_identical_docs(spark, docs_dir):
    """J=1 pairs agree on EVERY band, so LSH must always surface them —
    a banding bug (wrong lane slicing, band hash mixup) breaks this
    before it breaks anything subtle."""
    from odns_dataimporter_spark.queries.llm_dedup import _candidate_pairs
    from odns_dataimporter_spark.tables import load_table

    docs = load_table(spark, docs_dir, "documents")
    dups = {
        (r.a, r.b)
        for r in docs.alias("x")
        .join(docs.alias("y"), F.col("x.text") == F.col("y.text"))
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .collect()
    }
    assert dups, "fixture must contain exact duplicates"
    cands = {(r.doc_a, r.doc_b) for r in _candidate_pairs(docs).collect()}
    missing = dups - cands
    assert not missing, f"identical pairs missed by LSH banding: {missing}"


def test_incremental_minhash_finds_planted_batch_dups(spark, docs_dir):
    """Every planted new-batch copy of a prior doc is an exact-text
    match (Jaccard 1.0) and must come back with its prior original."""
    out = {
        r.new_id: (r.matched_prior_id, r.jaccard_q6)
        for r in REGISTRY["dedup_incremental_minhash"].fn(spark, docs_dir).collect()
    }
    for i in range(12, 40):
        if i % 10 >= 8:
            j = i - (11 if i % 10 == 8 else 12)
            assert i in out, f"planted dup new_id={i} not detected"
            assert out[i] == (j, 1.0), (i, out[i])


def test_shard_pack_conservation(spark, docs_dir):
    """Shard packing must conserve docs and tokens, produce contiguous
    non-overlapping doc ranges in shard order, and never exceed the
    budget by more than one document's tokens (a doc is never split)."""
    from odns_dataimporter_spark.queries.etl_ops import _SHARD_TOKENS
    from odns_dataimporter_spark.tables import load_table

    docs = load_table(spark, docs_dir, "documents")
    n_docs = docs.count()
    n_tokens = docs.select(
        F.sum(F.size(F.split("text", " ")))
    ).collect()[0][0]
    max_doc = docs.select(
        F.max(F.size(F.split("text", " ")))
    ).collect()[0][0]

    shards = sorted(
        REGISTRY["etl_shard_pack"].fn(spark, docs_dir).collect(),
        key=lambda r: r.shard,
    )
    assert sum(r.n_docs for r in shards) == n_docs
    assert sum(r.n_tokens for r in shards) == n_tokens
    for prev, cur in zip(shards, shards[1:]):
        assert cur.shard == prev.shard + 1, "shard ids must be dense"
        assert cur.first_doc == prev.last_doc + 1, "doc ranges must be contiguous"
    for r in shards[:-1]:
        # a shard closes only once its budget is reached; the overshoot
        # is bounded by the last doc that crossed the line
        assert r.n_tokens <= _SHARD_TOKENS + max_doc


def test_asof_offsets_bounded_by_direction(spark, sf_dir):
    """join_asof (backward-only) must never produce a negative wait;
    join_asof_nearest's |offset| must never exceed the backward wait
    for the same purchase (nearest is at least as close)."""
    back = {
        r.purchase_id: r.wait_us
        for r in REGISTRY["join_asof"].fn(spark, sf_dir).collect()
        if r.wait_us is not None
    }
    assert back and all(w >= 0 for w in back.values())
    near = {
        r.purchase_id: r.offset_us
        for r in REGISTRY["join_asof_nearest"].fn(spark, sf_dir).collect()
        if r.offset_us is not None
    }
    for pid, off in near.items():
        if pid in back:
            assert abs(off) <= back[pid], (pid, off, back[pid])


def test_strip_dup_spans_complements_coverage(spark, sf_dir):
    """text_strip_dup_spans removes exactly the token positions that
    text_dup_span_coverage counts as covered: kept_tokens must equal
    n_tokens - covered_tokens for EVERY document (both ops derive from
    the same cross-doc span union; a divergence means one of the two
    interval sweeps is wrong)."""
    cov = REGISTRY["text_dup_span_coverage"].fn(spark, sf_dir).select(
        "doc_id", "n_tokens", "covered_tokens"
    )
    strip = REGISTRY["text_strip_dup_spans"].fn(spark, sf_dir).select(
        "doc_id", F.col("kept_tokens").alias("kept")
    )
    bad = (
        cov.join(strip, "doc_id")
        .filter(F.col("kept") != F.col("n_tokens") - F.col("covered_tokens"))
        .count()
    )
    assert bad == 0


def test_snm_pairs_linear_and_thresholded(spark, sf_dir):
    """Sorted-neighborhood invariants: every emitted pair really meets
    the integer-exact Jaccard >= 0.5 bar, pair ids are distinct, and
    the candidate count is bounded by n_docs * window (the linearity
    guarantee that distinguishes SNM from the hash-bucket families)."""
    from odns_dataimporter_spark.queries.llm_dedup import _SNM_WINDOW
    from odns_dataimporter_spark.tables import load_table

    df = REGISTRY["dedup_sorted_neighborhood"].fn(spark, sf_dir)
    rows = df.collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) <= n_docs * _SNM_WINDOW
    for r in rows:
        assert r.a_id != r.b_id
        assert 2 * r.inter >= r.uni > 0


def test_kneser_ney_is_a_probability_distribution(spark, sf_dir):
    """Interpolated KN must produce a (near-)normalized conditional
    distribution: for every context w1, sum over OBSERVED w2 of
    p_kn(w2|w1) <= 1 + eps, and contexts whose observed continuations
    cover the whole continuation mass sum to ~1. A discount/backoff
    arithmetic slip (wrong denominator, unscaled continuation term)
    breaks this immediately."""
    df = REGISTRY["text_bigram_kneser_ney"].fn(spark, sf_dir)
    sums = (
        df.groupBy("w1").agg(F.sum("p_kn_q6").alias("s")).collect()
    )
    assert sums
    for r in sums:
        # observed-bigram mass can be < 1 (unseen w2 carry backoff
        # mass) but may never exceed 1 beyond quantization error
        assert r.s <= 1.0 + 1e-4, (r.w1, r.s)
