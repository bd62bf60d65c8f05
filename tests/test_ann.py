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
