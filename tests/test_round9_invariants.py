"""Round-9 invariant tests: fixes flagged by the round-8
VERDICT/ADVICE — SimHash layout tiering, the HITS zero-edge guard, the
connected-components cache leak, and the geo_nearest_hub integer
decision metric."""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd
import pytest

from odns_dataimporter_spark import size_hints
from odns_dataimporter_spark.oracle import compare, duckdb_connect
from odns_dataimporter_spark.registry import REGISTRY, all_queries

all_queries()


# --- dedup_simhash_hamming: size-tiered pigeonhole layouts ------------------


def _simhash_rows(spark, sf_dir, monkeypatch, chunks: int):
    monkeypatch.setattr(size_hints, "derived_simhash_chunks", lambda _: chunks)
    df = REGISTRY["dedup_simhash_hamming"].fn(spark, sf_dir)
    return sorted(tuple(r) for r in df.collect())


def test_simhash_tiers_produce_identical_pairs(spark, sf_dir, monkeypatch):
    """Both pigeonhole layouts (4x15 single-chunk, 6x10 three-chunk
    combos) are complete candidate generators for Hamming <= 3, and the
    exact bit_count verify makes the output layout-invariant — the
    property that lets one static oracle cover the size-tiered op."""
    small = _simhash_rows(spark, sf_dir, monkeypatch, 4)
    prod = _simhash_rows(spark, sf_dir, monkeypatch, 6)
    assert small == prod


def test_simhash_small_tier_is_selected_locally(sf_dir):
    """Every local test corpus is far below the ~200k-doc saturation
    threshold, so the cheap 4-chunk tier must be what benchmarks see."""
    assert size_hints.derived_simhash_chunks(sf_dir) == 4
    assert size_hints.derived_simhash_chunks("/nonexistent") == 6  # unknown -> safe


def test_simhash_tier_oracle_parity(spark, sf_dir, monkeypatch):
    """The 4-chunk tier (never the driver-visible default at sf0.01
    before this round) hash-matches the 6x10-form oracle verbatim."""
    monkeypatch.setattr(size_hints, "derived_simhash_chunks", lambda _: 4)
    con = duckdb_connect(sf_dir)
    r = compare(
        "dedup_simhash_hamming",
        REGISTRY["dedup_simhash_hamming"].fn(spark, sf_dir),
        con,
        REGISTRY["dedup_simhash_hamming"].oracle,
    )
    assert r.ok, r.detail


# --- graph_hits: zero-edge corpus (every user has exactly one event) --------


@pytest.fixture(scope="module")
def single_event_users_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hits_degenerate"))
    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (i, base + dt.timedelta(minutes=i), i, ["view", "click", "buy"][i % 3], 1.0, "{}")
        for i in range(9)
    ]
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    df.to_parquet(os.path.join(d, "events.parquet"), index=False)
    return d


def test_hits_zero_edge_graph_is_all_zero_and_parity(spark, single_event_users_dir):
    """No user has >= 2 events -> the transition edge set is empty ->
    every raw score is 0.0 and the sum normalization used to be 0/0
    (NaN on Spark, engine-dependent in DuckDB). The round-9 guard emits
    0.0 on both engines, keyed on the exact integer edge count."""
    rows = REGISTRY["graph_hits"].fn(spark, single_event_users_dir).collect()
    assert len(rows) == 3  # the three event types still appear as nodes
    for r in rows:
        assert r.hub_q6 == 0.0 and r.auth_q6 == 0.0
    import duckdb

    con = duckdb.connect()
    try:
        con.sql(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{single_event_users_dir}/events.parquet')"
        )
        r = compare(
            "graph_hits",
            REGISTRY["graph_hits"].fn(spark, single_event_users_dir),
            con,
            REGISTRY["graph_hits"].oracle,
        )
    finally:
        con.close()
    assert r.ok, r.detail


def test_hits_normal_corpus_parity_after_guard(spark, sf_dir):
    """The guard must not disturb the non-degenerate path."""
    con = duckdb_connect(sf_dir)
    r = compare(
        "graph_hits",
        REGISTRY["graph_hits"].fn(spark, sf_dir),
        con,
        REGISTRY["graph_hits"].oracle,
    )
    assert r.ok, r.detail


# --- _min_label_components: no persisted RDD outlives the call --------------


def test_cluster_components_leaves_no_cached_dataframes(spark, sf_dir):
    """round-9 ADVICE: the final check-round's persist() used to leak
    one InMemoryRelation per invocation into the CacheManager (only
    unpersisted when a LATER check round ran). After the fix, a full
    run leaves the DataFrame cache registry exactly as empty as it
    started. (localCheckpoint RDDs are NOT in scope: they live in the
    RDD layer and the ContextCleaner reaps them on GC.)"""
    spark.catalog.clearCache()
    df = REGISTRY["dedup_cluster_components"].fn(spark, sf_dir)
    df.count()
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    assert cache_mgr.isEmpty(), "InMemoryRelation leaked past convergence"


# --- geo_nearest_hub: integer decision metric --------------------------------


def test_geo_nearest_hub_parity_with_integer_decision(spark, sf_dir):
    con = duckdb_connect(sf_dir)
    r = compare(
        "geo_nearest_hub",
        REGISTRY["geo_nearest_hub"].fn(spark, sf_dir),
        con,
        REGISTRY["geo_nearest_hub"].oracle,
    )
    assert r.ok, r.detail


# --- dedup_semdedup_ann: ANN-assisted assignment twin -------------------------


def test_semdedup_ann_covers_all_vectors_and_is_deterministic(spark, sf_dir):
    """The ANN twin must emit exactly one decision row per vector (the
    own-cell route guarantee means no vector is ever stranded with an
    empty candidate set) and be bit-stable across runs."""
    fn = REGISTRY["dedup_semdedup_ann"].fn
    a = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
    b = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
    assert a == b
    from odns_dataimporter_spark.tables import load_table

    n = load_table(spark, sf_dir, "embeddings").count()
    assert len(a) == n
    assert len({r[0] for r in a}) == n  # one row per vec_id


def test_semdedup_ann_assignment_agreement(spark, sf_dir):
    """>= 95% of vectors land on the SAME centroid as the exact
    brute-force twin (round-9 VERDICT item 7's pinned recall bar);
    boundary vectors may legitimately route to a second-nearest cell."""
    exact = {
        r.vec_id: r.cid for r in REGISTRY["dedup_semdedup"].fn(spark, sf_dir).collect()
    }
    ann = {
        r.vec_id: r.cid
        for r in REGISTRY["dedup_semdedup_ann"].fn(spark, sf_dir).collect()
    }
    assert set(ann) == set(exact)
    agree = sum(1 for v, c in ann.items() if exact[v] == c) / len(ann)
    assert agree >= 0.95, f"ANN assignment agreement {agree:.3f} < 0.95"
