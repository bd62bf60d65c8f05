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


def test_hll_sketch_estimates_near_exact(spark, sf_dir):
    """HLL estimates must land within ~3x the default-precision rsd of
    the exact distinct counts, and the merged sketch must estimate the
    union (>= the largest group, <= sum of groups)."""
    rows = {r.o_orderstatus: r for r in REGISTRY["agg_hll_sketch"].fn(spark, sf_dir).collect()}
    merged = rows.pop("__all_statuses__")
    assert merged.exact_nd is None
    per_estimates = []
    for r in rows.values():
        assert r.exact_nd > 0
        assert abs(r.estimate - r.exact_nd) <= max(3, 0.1 * r.exact_nd)
        per_estimates.append(r.estimate)
    assert max(per_estimates) * 0.8 <= merged.estimate <= sum(per_estimates) * 1.1


def test_knn_graph_invariant_in_block_count(spark, sf_dir):
    """sim_knn_graph is EXACT: the block count only tiles the work, so
    the result must be identical for any B (the size-derived value
    included) — the guarantee that lets derived_knn_blocks scale B
    with the corpus without touching answers."""
    from odns_dataimporter_spark.queries.llm_similarity import _knn_graph
    from odns_dataimporter_spark.size_hints import derived_knn_blocks

    def rows(df):
        return sorted(map(tuple, df.collect()))

    base = rows(_knn_graph(spark, sf_dir, 2))
    for b in (4, 8, derived_knn_blocks(sf_dir)):
        assert rows(_knn_graph(spark, sf_dir, b)) == base, f"B={b}"


def test_lsh_recall_positive_across_plane_counts(spark, sf_dir):
    """The LSH pipeline contract (deterministic buckets, recall > 0 vs
    the exact top-k) must hold at multiple plane counts around the
    size-derived one — resizing the corpus only moves the
    recall/candidate-volume trade, never breaks the pipeline."""
    from odns_dataimporter_spark.queries.llm_similarity import _ann_lsh
    from odns_dataimporter_spark.size_hints import derived_lsh_planes

    exact = _pairs(_run("sim_topk_cosine", spark, sf_dir))
    derived = derived_lsh_planes(sf_dir)
    assert 4 <= derived <= 24
    for planes in {4, derived, derived + 2}:
        approx = _pairs(_ann_lsh(spark, sf_dir, planes))
        assert len(exact & approx) > 0, f"planes={planes}: zero recall"


def test_ivf_multiprobe_recall_monotone(spark, sf_dir):
    """nprobe=2 candidates are a superset of nprobe=1's, and a true
    global-top-k member in the candidate set always survives the final
    per-probe top-k (it outscores every non-member), so recall must be
    monotone in nprobe."""
    exact = _pairs(_run("sim_topk_cosine", spark, sf_dir))
    r1 = len(exact & _pairs(_run("sim_ann_ivf", spark, sf_dir)))
    r2 = len(exact & _pairs(_run("sim_ann_ivf_multiprobe", spark, sf_dir)))
    assert r2 >= r1 > 0
