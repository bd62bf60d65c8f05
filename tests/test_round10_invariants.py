"""Round-10 invariant tests for the round-9 VERDICT/ADVICE fixes:

- `_fdiv` (queries/joins.py): true floor division on longs — the
  range-join family's bin decomposition must survive pre-epoch
  (negative-microsecond) timestamps, where Spark's truncate-toward-
  zero `div` would make bin 0 span (-w, w) and miscount.
- jpeg `_LUT_CACHE`: bounded (a long-lived mapInPandas worker decoding
  crawled images with per-image Huffman tables must not grow without
  bound).
"""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import pandas as pd
import pytest

from odns_dataimporter_spark.oracle import compare
from odns_dataimporter_spark.queries.joins import _fdiv
from odns_dataimporter_spark.registry import REGISTRY, all_queries

all_queries()


def test_fdiv_is_floor_division(spark):
    """_fdiv == Python // (true floor) for every sign combination,
    including exact-multiple boundaries; plain `div` differs on 10 of
    these (every negative non-multiple)."""
    from pyspark.sql import functions as F

    w = 7
    xs = [-22, -21, -20, -8, -7, -6, -1, 0, 1, 6, 7, 8, 20, 21, 22]
    df = spark.createDataFrame([(x,) for x in xs], "x long")

    got = {
        r["x"]: r["q"]
        for r in df.select("x", F.expr(_fdiv("x", w)).alias("q")).collect()
    }
    for x in xs:
        assert got[x] == x // w, (x, got[x], x // w)


@pytest.fixture(scope="module")
def pre_epoch_events_dir(tmp_path_factory):
    """Signups/purchases straddling the epoch: timestamps from ~36 h
    before 1970-01-01 to ~36 h after, dense enough that several 1 h
    windows span negative→positive microseconds and several purchases
    sit in bins that truncating division would mislabel."""
    d = str(tmp_path_factory.mktemp("preepoch_ev"))
    base = dt.datetime(1969, 12, 30, 12, 0, 0)
    rows = []
    eid = 0
    for i in range(72):  # one signup + two purchases per hour, 72 h
        t = base + dt.timedelta(hours=i)
        rows.append((eid, t, eid % 5, "signup", 1.0, "{}"))
        eid += 1
        for m in (11, 47):
            rows.append(
                (eid, t + dt.timedelta(minutes=m), eid % 5, "purchase", 2.0, "{}")
            )
            eid += 1
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    df.to_parquet(os.path.join(d, "events.parquet"), index=False)
    return d


@pytest.mark.parametrize(
    "op", ["join_range_binned", "join_interval_overlap", "join_range_count_sweep"]
)
def test_range_family_pre_epoch_parity(spark, pre_epoch_events_dir, op):
    """Full value-hash parity vs the pairwise DuckDB oracle on
    pre-epoch data — fails under truncating `div` bin math."""
    spec = REGISTRY[op]
    con = duckdb.connect()
    try:
        con.sql(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{pre_epoch_events_dir}/events.parquet')"
        )
        res = compare(op, spec.fn(spark, pre_epoch_events_dir), con, spec.oracle)
    finally:
        con.close()
    assert res.ok, res.detail


def test_scalable_row_number_equals_global_window(spark, sf_dir):
    """The range-partitioned two-pass rank (VERDICT r9 item 5; the
    helper pattern scalable_prefix_sum reuses in r11 — its original
    consumer, graph_clustering_coefficient, dropped its rank map
    entirely in the r11 hub-local rewrite) must reproduce the
    single-task global row_number EXACTLY on the real node-degree
    distribution — size only ever moves the plan, never the rank
    map."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from odns_dataimporter_spark.queries._helpers import scalable_row_number
    from odns_dataimporter_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("x")
    )
    deg = li.groupBy("x").agg(F.count("*").cast("long").alias("d"))
    old = {
        (r["x"], r["r"])
        for r in deg.select(
            "x", F.row_number().over(W.orderBy("d", "x")).alias("r")
        ).collect()
    }
    new = {
        (r["x"], r["r"])
        for r in scalable_row_number(deg, ["d", "x"], out="r")
        .select("x", "r")
        .collect()
    }
    assert old == new and len(old) > 0


# --- dedup_semdedup_kmeans: sample-trained centroid twin (VERDICT r9 item 6)


@pytest.fixture(scope="module")
def topic_sorted_emb_dir(tmp_path_factory, spark, sf_dir):
    """A 'topic-sorted dump' remap of the embeddings corpus: vec_id
    reassigned by rank of the first coordinate, so the exact twin's
    first-k centroid pick lands on k near-identical extreme vectors —
    the degenerate case the kmeans twin exists to survive."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from odns_dataimporter_spark.tables import load_table

    d = str(tmp_path_factory.mktemp("sorted_emb"))
    emb = load_table(spark, sf_dir, "embeddings")
    emb.select(
        (F.row_number().over(W.orderBy(F.element_at("embedding", 1), "vec_id")) - 1)
        .cast("long")
        .alias("vec_id"),
        "embedding",
        "label",
    ).write.parquet(os.path.join(d, "embeddings.parquet"))
    return d


def test_semdedup_kmeans_covers_all_vectors_and_is_deterministic(spark, sf_dir):
    """One decision row per vector (the shared ANN worker's own-cell
    guarantee) and bit-stable across runs — training is exact-integer
    partial-sum arithmetic, so Lloyd means are order-independent."""
    fn = REGISTRY["dedup_semdedup_kmeans"].fn
    a = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
    b = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
    assert a == b
    from odns_dataimporter_spark.tables import load_table

    n = load_table(spark, sf_dir, "embeddings").count()
    assert len(a) == n
    assert len({r[0] for r in a}) == n  # one row per vec_id


def _semdedup_quality(spark, name, d):
    from pyspark.sql import functions as F

    df = REGISTRY[name].fn(spark, d)
    r = df.agg(
        F.avg("cos_cent_q6").alias("mc"),
        F.avg(F.col("is_kept").cast("double")).alias("kf"),
    ).collect()[0]
    return r["mc"], r["kf"]


def test_semdedup_kmeans_quality_contract(spark, sf_dir, topic_sorted_emb_dir):
    """The pinned quality contract (round-9 VERDICT item 6): trained
    centroids must yield TIGHTER clusters than the exact twin's
    first-k init — higher mean assigned-centroid cosine — on the real
    corpus AND on the topic-sorted remap where first-k degenerates
    (measured r10: 0.259 vs 0.189 orig, 0.260 vs 0.182 sorted — the
    margin asserted is half the observed gap). The keep/drop RATE must
    stay in family with the exact twin (same τ rule on a comparable
    clustering), so quality cannot be bought by dropping everything."""
    for d in (sf_dir, topic_sorted_emb_dir):
        mc_exact, kf_exact = _semdedup_quality(spark, "dedup_semdedup", d)
        mc_km, kf_km = _semdedup_quality(spark, "dedup_semdedup_kmeans", d)
        assert mc_km >= mc_exact + 0.03, (d, mc_km, mc_exact)
        assert abs(kf_km - kf_exact) <= 0.15, (d, kf_km, kf_exact)


def test_semdedup_kmeans_ordering_invariant_quality(spark, sf_dir, topic_sorted_emb_dir):
    """Corpus ORDER must not move the kmeans twin's clustering quality
    (hash-spread seeds + sample training see ids, not sort position):
    mean centroid cosine on the sorted remap within 0.05 of the
    original corpus. The exact twin has no such guarantee — that is
    the motivating defect."""
    mc_orig, _ = _semdedup_quality(spark, "dedup_semdedup_kmeans", sf_dir)
    mc_sorted, _ = _semdedup_quality(spark, "dedup_semdedup_kmeans", topic_sorted_emb_dir)
    assert abs(mc_sorted - mc_orig) <= 0.05, (mc_orig, mc_sorted)


def test_jpeg_lut_cache_bounded():
    """Feeding more distinct Huffman tables than the cap leaves the
    cache at the cap (FIFO eviction), and a re-request after eviction
    still returns a correct LUT."""
    from odns_dataimporter_spark import jpeg

    jpeg._LUT_CACHE.clear()
    tables = []
    for i in range(jpeg._LUT_CACHE_MAX + 5):
        # one 2-bit code and one 3-bit code; vary the symbol values so
        # every (bits, vals) key is distinct
        bits = [0, 1, 1] + [0] * 13
        vals = [i & 0xFF, (i + 1) & 0xFF]
        tables.append((bits, vals))
        jpeg._build_decode_lut(bits, vals)
    assert len(jpeg._LUT_CACHE) == jpeg._LUT_CACHE_MAX
    # oldest entries evicted; rebuilding one is correct, not stale
    bits0, vals0 = tables[0]
    lut_len, lut_val = jpeg._build_decode_lut(bits0, vals0)
    # window starting with the 2-bit code 00 decodes symbol vals0[0]
    assert lut_len[0] == 2 and lut_val[0] == vals0[0]
