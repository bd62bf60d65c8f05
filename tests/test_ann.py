"""ANN variants: determinism and recall against the exact top-k
(promised by the sim_ann_lsh / sim_ann_ivf docstrings)."""

from __future__ import annotations

from odns_dataimporter_spark.registry import REGISTRY, all_queries

all_queries()


def _pairs(df):
    return {(r.probe_id, r.cand_id) for r in df.collect()}


def _run(name, spark, sf_dir):
    return REGISTRY[name].fn(spark, sf_dir)


def test_ann_deterministic(spark, sf_dir):
    for name in ("sim_ann_lsh", "sim_ann_ivf"):
        a = _pairs(_run(name, spark, sf_dir))
        b = _pairs(_run(name, spark, sf_dir))
        assert a == b, name


def test_ann_recall_positive(spark, sf_dir):
    exact = _pairs(_run("sim_topk_cosine", spark, sf_dir))
    for name in ("sim_ann_lsh", "sim_ann_ivf"):
        approx = _pairs(_run(name, spark, sf_dir))
        hits = len(exact & approx)
        assert hits > 0, f"{name}: zero recall vs exact top-k"


def test_count_min_sketch_estimates_bound_exact_counts(spark, sf_dir):
    """Decode the per-day CMS through the JVM and check the sketch
    contract: estimate >= exact count, and estimate - exact <= eps * N."""
    from odns_dataimporter_spark.registry import REGISTRY, all_queries
    from odns_dataimporter_spark.tables import load_table

    all_queries()
    import pyspark.sql.functions as F

    rows = REGISTRY["agg_count_min_sketch"].fn(spark, sf_dir).collect()
    exact = {
        (r.day, r.event_type): r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"), "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    jvm = spark._jvm
    for r in rows:
        cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
            bytes.fromhex(r.sketch_hex)
        )
        day_types = [(d, t) for (d, t) in exact if d == r.day]
        assert day_types
        for d, t in day_types:
            est = cms.estimateCount(t)
            assert est >= exact[(d, t)]
            assert est - exact[(d, t)] <= 0.01 * r.n_events + 1
