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


def test_pq_deterministic_and_recall(spark, sf_dir):
    """sim_ann_pq: md5-seeded codebooks + exact-integer distance math
    => identical output across runs; ADC recall must comfortably beat
    chance (random 5-of-n ~ 1%; measured 0.36+ at the K=64 preset on
    this worst-case uniform corpus)."""
    a = _pairs(_run("sim_ann_pq", spark, sf_dir))
    b = _pairs(_run("sim_ann_pq", spark, sf_dir))
    assert a == b
    exact = _pairs(_run("sim_topk_cosine", spark, sf_dir))
    recall = len(a & exact) / len(exact)
    assert recall >= 0.15, f"PQ ADC recall collapsed: {recall}"


def test_pq_output_shape_and_plan(spark, sf_dir):
    """Full per-probe top-k comes back (the ADC stage scored every
    candidate through the code table), scores are valid cosines, and
    the plan never degrades to a cartesian product — the broadcast
    LUT join on (sub, code) is what makes ADC linear in the corpus."""
    from odns_dataimporter_spark.queries.llm_similarity import _N_PROBES, _TOP_K

    pq = _run("sim_ann_pq", spark, sf_dir)
    plan = pq._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    rows = pq.collect()
    assert len(rows) == _N_PROBES * _TOP_K
    assert all(-1.001 <= r.score <= 1.001 for r in rows)
    per_probe = {}
    for r in rows:
        per_probe.setdefault(r.probe_id, set()).add(r.cand_id)
    assert all(len(c) == _TOP_K for c in per_probe.values())


def test_approx_percentile_rank_error_bounded(spark, sf_dir):
    """GK summary contract: each approximate percentile's true RANK in
    the group must be within n/accuracy of the requested rank (the
    bound Greenwald-Khanna guarantees; accuracy=1000 in the op)."""
    from odns_dataimporter_spark.tables import load_table
    import pyspark.sql.functions as F

    approx = {
        r.event_type: (r.n, (r.p50_cents, r.p95_cents, r.p99_cents))
        for r in _run("agg_approx_percentile", spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    vals = {}
    for r in ev.collect():
        vals.setdefault(r.event_type, []).append(r.cents)
    for et, (n, apx) in approx.items():
        xs = sorted(vals[et])
        assert n == len(xs)
        for pct, a in zip((0.5, 0.95, 0.99), apx):
            # rank of the returned value among the group's values
            import bisect

            lo = bisect.bisect_left(xs, a)
            hi = bisect.bisect_right(xs, a)
            target = pct * n
            tol = n / 1000 + 1
            assert lo - tol <= target <= hi + tol, (et, pct, a, lo, hi, target)
