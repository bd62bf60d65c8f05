"""Invariant/property tests for the round-8 closing waves: geo family,
nonparametric completions, HITS, PMI, TextRank, silhouette, HMM,
variance ratio, peak detection.

Each test asserts a mathematical property the oracle comparison cannot
see (the oracle proves ENGINE AGREEMENT; these prove the shared answer
is RIGHT): brute-force cross-checks for the spatial argmins, range and
sign laws for the statistics, conservation for the containment join.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from odns_dataimporter_spark.registry import REGISTRY, all_queries
from odns_dataimporter_spark.tables import load_table

all_queries()


def _rows(spark, sf_dir, name):
    return REGISTRY[name].fn(spark, sf_dir).collect()


# --- geo -----------------------------------------------------------------------


def test_geo_nearest_hub_matches_bruteforce(spark, sf_dir):
    """The packed-integer argmin must agree with a brute-force python
    reimplementation of the decision metric. Round 9 switched the
    selection from floored haversine to the EXACT integer
    equirectangular d2 (round-9 ADVICE: floor(haversine) could flip
    across libms within an ulp of a quantization boundary), so the
    brute force is pure integer arithmetic — no float anywhere."""
    rows = _rows(spark, sf_dir, "geo_nearest_hub")
    got = {r.hub_key: r.n_assigned for r in rows}

    cust = load_table(spark, sf_dir, "customer").select("c_custkey").collect()
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey").collect()

    def lat_u(k):
        return (k * 2654435761) % 180000001 - 90000000

    def lon_u(k):
        return (k * 2246822519) % 360000001 - 180000000

    hubs = [
        (r.n_nationkey, lat_u(r.n_nationkey + 1), lon_u(r.n_nationkey + 1))
        for r in nat
    ]
    want: dict[int, int] = {}
    for c in cust:
        plat, plon = lat_u(c.c_custkey), lon_u(c.c_custkey)
        best = min(
            hubs,
            key=lambda h: ((h[1] - plat) ** 2 + (h[2] - plon) ** 2, h[0]),
        )
        want[best[0]] = want.get(best[0], 0) + 1
    assert got == want


def test_geo_point_in_box_conserves_nothing_lost(spark, sf_dir):
    """Every box key appears exactly once (LEFT join keeps empties) and
    n_inside is bounded by the customer count."""
    rows = _rows(spark, sf_dir, "geo_point_in_box")
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert sorted(r.box_key for r in rows) == [0, 1, 2, 3, 4]
    assert all(0 <= r.n_inside <= n_cust for r in rows)


def test_geo_grid_knn_is_true_block_nearest(spark, sf_dir):
    """Each reported neighbor must be the exact d² argmin (smallest key
    on ties) among the point's 3×3-block mates, cross-checked in
    python."""
    rows = _rows(spark, sf_dir, "geo_grid_knn")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey").collect()
    w = min(
        10_000_000,
        max(500_000, math.floor(10_000_000 * math.sqrt(1500.0 / len(cust)))),
    )
    pts = {}
    for c in cust:
        k = c.c_custkey
        la = (k * 2654435761) % 180000001 - 90000000
        lo = (k * 2246822519) % 360000001 - 180000000
        pts[k] = (la, lo, (la + 90000000) // w, (lo + 180000000) // w)
    by_cell: dict[tuple, list] = {}
    for k, (la, lo, cl, cn) in pts.items():
        by_cell.setdefault((cl, cn), []).append(k)
    checked = 0
    for r in rows:
        la, lo, cl, cn = pts[r.custkey]
        cand = []
        for dl in (-1, 0, 1):
            for dn in (-1, 0, 1):
                cand.extend(by_cell.get((cl + dl, cn + dn), []))
        cand = [c for c in cand if c != r.custkey]
        assert cand, f"{r.custkey} reported a neighbor but block is empty"
        best = min(
            cand,
            key=lambda o: (
                (la - pts[o][0]) ** 2 + (lo - pts[o][1]) ** 2,
                o,
            ),
        )
        d2 = (la - pts[best][0]) ** 2 + (lo - pts[best][1]) ** 2
        assert (r.nn_custkey, r.d2_u) == (best, d2)
        checked += 1
    assert checked == len(rows) and checked > 0


def test_geo_grid_rollup_conserves_points(spark, sf_dir):
    rows = _rows(spark, sf_dir, "geo_grid_rollup")
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert sum(r.n_points for r in rows) == n_cust
    assert all(0 <= r.cell_lat10 < 19 and 0 <= r.cell_lon10 < 37 for r in rows)


# --- nonparametrics --------------------------------------------------------------


def test_kruskal_wallis_nonnegative_and_tie_corrected_larger(spark, sf_dir):
    [r] = _rows(spark, sf_dir, "stats_kruskal_wallis")
    assert r.h_q6 >= 0
    # C = 1 - ties/(n^3-n) <= 1, so H/C >= H
    assert r.h_tie_q6 >= r.h_q6 - 1e-6
    assert r.k == 5


def test_friedman_chi2_range(spark, sf_dir):
    [r] = _rows(spark, sf_dir, "stats_friedman")
    # chi2_F is bounded by n(k-1) (all blocks perfectly concordant)
    assert -1e-6 <= r.chi2_q6 <= r.n * (r.k - 1) + 1e-6


def test_wilcoxon_wpos_bounds(spark, sf_dir):
    [r] = _rows(spark, sf_dir, "stats_wilcoxon_signed_rank")
    # 0 <= W+ <= n(n+1)/2, doubled ranks sum to exactly n(n+1)
    assert 0 <= r.wpos_x2 <= r.n * (r.n + 1)


def test_mcnemar_cells_partition_users(spark, sf_dir):
    [r] = _rows(spark, sf_dir, "stats_mcnemar")
    ev = load_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    assert r.n11 + r.n10 + r.n01 + r.n00 == n_users
    if r.n10 + r.n01 > 0:
        want = math.floor(
            (r.n10 - r.n01) ** 2 / (r.n10 + r.n01) * 1e6
        ) / 1e6
        assert r.chi2_q6 == want


# --- graph / text / embedding -----------------------------------------------------


def test_hits_normalized_nonnegative(spark, sf_dir):
    rows = _rows(spark, sf_dir, "graph_hits")
    assert all(r.hub_q6 >= 0 and r.auth_q6 >= 0 for r in rows)
    # sum-normalized: floored component sums land within n*1e-6 of 1
    assert abs(sum(r.hub_q6 for r in rows) - 1.0) <= len(rows) * 1e-6
    assert abs(sum(r.auth_q6 for r in rows) - 1.0) <= len(rows) * 1e-6


def test_pmi_counts_consistent(spark, sf_dir):
    rows = _rows(spark, sf_dir, "text_pmi_pairs")
    for r in rows:
        assert r.w1 < r.w2
        assert r.c12 <= min(r.c1, r.c2)
        assert r.c12 >= 5


def test_textrank_topk_sorted_and_positive(spark, sf_dir):
    rows = _rows(spark, sf_dir, "text_textrank_keywords")
    assert 0 < len(rows) <= 10
    scores = [r.textrank_q6 for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_silhouette_in_unit_range(spark, sf_dir):
    rows = _rows(spark, sf_dir, "embed_silhouette")
    emb_n = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n for r in rows) == emb_n
    assert all(-1.0 <= r.mean_sil_q6 <= 1.0 for r in rows)


# --- time series / HMM -------------------------------------------------------------


def test_hmm_loglik_negative_p_in_range(spark, sf_dir):
    rows = _rows(spark, sf_dir, "ml_hmm_forward")
    assert rows
    for r in rows:
        # each step multiplies probabilities < 1, so ll < 0
        assert r.loglik_q6 < 0
        assert 0.0 <= r.p_burst_final_q6 <= 1.0
        assert r.n_days >= 1


def test_variance_ratio_positive(spark, sf_dir):
    rows = _rows(spark, sf_dir, "ts_variance_ratio")
    assert rows
    assert all(r.vr_q6 > 0 for r in rows)


def test_peaks_are_real_local_maxima(spark, sf_dir):
    """Recompute the dense hourly series in python and check every
    reported peak strictly beats its left neighbor and >= its right."""
    rows = _rows(spark, sf_dir, "ts_peak_detect")
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("hour")
        )
        .agg(F.count("*").alias("n"))
        .collect()
    )
    lo, hi = ev.agg(
        F.date_trunc("hour", F.min("ts")), F.date_trunc("hour", F.max("ts"))
    ).first()
    counts = {(r.event_type, r.hour): r.n for r in hourly}
    import datetime

    types = sorted({t for t, _ in counts})
    series = {}
    for t in types:
        xs, cur = [], lo
        while cur <= hi:
            xs.append(counts.get((t, cur), 0))
            cur += datetime.timedelta(hours=1)
        series[t] = xs
    # index peaks by (type, hour string)
    hours = []
    cur = lo
    while cur <= hi:
        hours.append(cur.strftime("%Y-%m-%d %H:%M:%S"))
        cur += datetime.timedelta(hours=1)
    idx = {h: i for i, h in enumerate(hours)}
    for r in rows:
        i = idx[r.hour]
        xs = series[r.event_type]
        assert 0 < i < len(xs) - 1
        assert xs[i - 1] < xs[i] >= xs[i + 1]
        assert xs[i] == r.x


# --- DBSCAN / Fisher ---------------------------------------------------------------


def test_dbscan_matches_bruteforce(spark, sf_dir):
    """Exact python DBSCAN over the same derived point set must agree
    on every point's role AND cluster id (min-key labeling)."""
    rows = {r.custkey: (r.role, r.cluster_id) for r in _rows(spark, sf_dir, "geo_dbscan_grid")}
    cust = load_table(spark, sf_dir, "customer").select("c_custkey").collect()
    n = len(cust)
    M = max(30, n // 150)
    EPS = min(4_000_000, max(100_000, math.floor(4_000_000 * math.sqrt(1500.0 / n))))
    pts = {}
    for c in cust:
        k = c.c_custkey
        if k % 37 < 30:
            city = (k // 37) % M + 1
            la = (city * 2654435761) % 180000001 - 90000000
            lo = (city * 2246822519) % 360000001 - 180000000
            la = max(-90000000, min(90000000, la + (k * 1779033703) % 4000001 - 2000000))
            lo = max(-180000000, min(180000000, lo + (k * 3144134277) % 4000001 - 2000000))
        else:
            la = (k * 2654435761) % 180000001 - 90000000
            lo = (k * 2246822519) % 360000001 - 180000000
        pts[k] = (la, lo)
    keys = sorted(pts)
    nbrs = {k: [] for k in keys}
    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            d2 = (pts[a][0] - pts[b][0]) ** 2 + (pts[a][1] - pts[b][1]) ** 2
            if d2 <= EPS * EPS:
                nbrs[a].append(b)
                nbrs[b].append(a)
    core = {k for k in keys if len(nbrs[k]) + 1 >= 4}
    # components over core-core edges via union-find
    parent = {k: k for k in core}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in core:
        for b in nbrs[a]:
            if b in core:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    label = {k: min(c for c in core if find(c) == find(k)) for k in core}
    want = {}
    for k in keys:
        if k in core:
            want[k] = ("core", label[k])
        else:
            cn = [label[b] for b in nbrs[k] if b in core]
            want[k] = ("border", min(cn)) if cn else ("noise", None)
    assert rows == want


def test_fisher_matches_lgamma_reference(spark, sf_dir):
    """log10 p from the shared Stirling text must sit within 1e-4 of a
    python math.lgamma reference (Stirling's absolute accuracy)."""
    [r] = _rows(spark, sf_dir, "stats_fisher_exact")
    from math import lgamma, log, exp

    def lc(n, k):
        return lgamma(n + 1) - lgamma(k + 1) - lgamma(n - k + 1)

    r1, r2, c1 = r.a + r.b, r.c + r.d, r.a + r.c
    n = r1 + r2

    def lp(k):
        return lc(r1, k) + lc(r2, c1 - k) - lc(n, c1)

    lo, hi = max(0, c1 - r2), min(r1, c1)
    obs = lp(r.a)
    inc = [lp(k) for k in range(lo, hi + 1) if lp(k) <= obs + 1e-7]
    m = max(inc)
    ref = (m + log(sum(exp(x - m) for x in inc))) / log(10.0)
    assert abs(r.log10_p_q6 - ref) < 1e-4
    assert r.log10_p_q6 <= 0.0
