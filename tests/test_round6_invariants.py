"""Mathematical invariants of the round-6 sixth-to-tenth-wave
operators — properties the oracle hash-match alone can't state (it
only proves both engines compute the SAME thing, not the RIGHT thing).
"""

from __future__ import annotations

import math

from odns_dataimporter_spark.registry import REGISTRY, all_queries

all_queries()


def test_pca_vector_is_unit_norm_and_psd(spark, sf_dir):
    rows = REGISTRY["embed_pca_power"].fn(spark, sf_dir).collect()
    assert len(rows) == 64
    v2 = sum(r["loading_q6"] ** 2 for r in rows)
    # loadings are floor-q6 of a unit vector: norm within quantization
    assert abs(v2 - 1.0) < 1e-3
    eig = rows[0]["eigenvalue_q9"]
    assert all(r["eigenvalue_q9"] == eig for r in rows)
    # covariance matrices are PSD: the Rayleigh quotient can't be < 0
    assert eig >= 0.0


def test_matryoshka_full_dim_recall_is_one(spark, sf_dir):
    rows = {
        r["trunc_dim"]: r
        for r in REGISTRY["embed_matryoshka_recall"].fn(spark, sf_dir).collect()
    }
    full = rows[64]
    assert full["n_match"] == full["n_probes"]
    assert full["recall1_q6"] == 1.0
    # truncation can only lose probes, never invent them
    assert all(r["n_probes"] <= full["n_probes"] for r in rows.values())


def test_auc_gini_identity(spark, sf_dir):
    row = REGISTRY["ml_auc_roc"].fn(spark, sf_dir).collect()[0]
    # Gini = 2*AUC - 1; both are independently floor-quantized so allow
    # one quantum of slack
    assert abs(row["gini_q6"] - (2 * row["auc_q6"] - 1)) <= 3e-6
    assert 0.0 <= row["auc_q6"] <= 1.0
    assert 0.0 <= row["ks_q6"] <= 1.0
    # the synthetic score carries real signal: better than coin-flip
    assert row["auc_q6"] > 0.55


def test_lift_gains_monotone_and_bounded(spark, sf_dir):
    rows = sorted(
        REGISTRY["ml_lift_gains"].fn(spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    gains = [r["cum_gain_q6"] for r in rows]
    # cumulative gain is nondecreasing and ends at ~1
    assert all(a <= b + 1e-9 for a, b in zip(gains, gains[1:]))
    assert abs(gains[-1] - 1.0) < 2e-6
    # equal-count deciles: sizes differ by at most 1 from N/10
    n = sum(r["n"] for r in rows)
    assert all(abs(r["n"] - n / 10) <= 1 for r in rows)
    # score-ranked deciles: the top decile beats the base rate
    assert rows[0]["lift_q6"] >= 1.0


def test_stl_components_reassemble(spark, sf_dir):
    rows = REGISTRY["ts_stl_decompose"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows[:50]:
        # y = trend + seasonal + resid up to the three independent
        # floor-q6 quantizations
        recon = r["trend_q6"] + r["seasonal_q6"] + r["resid_q6"]
        assert abs(recon - r["y"]) < 5e-6 + 2e-6 * 3


def test_holt_winters_seasonal_centering(spark, sf_dir):
    rows = REGISTRY["ts_holt_winters"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # forecast identity: 7l + 28b + sum(s) (all floor-q6'd once)
        expect = (
            7.0 * r["level_q6"] + 28.0 * r["trend_q6"] + r["season_sum_q6"]
        )
        assert abs(r["forecast_week_q6"] - expect) < 1e-3


def test_rrf_scores_bounded(spark, sf_dir):
    rows = REGISTRY["sim_rrf_fusion"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    for r in rows:
        # two rankers, best possible rank 1 each
        assert r["rrf_q9"] <= 2.0 / 61.0 + 1e-9
        assert r["rrf_q9"] > 0.0
        assert r["r_bm25"] is not None or r["r_cos"] is not None


def test_balanced_classes_undersamples_to_minority(spark, sf_dir):
    rows = REGISTRY["sample_balanced_classes"].fn(spark, sf_dir).collect()
    n_min = min(r["n_orig"] for r in rows)
    for r in rows:
        # expected kept = n_min per class; hash noise is binomial —
        # allow 5 sigma
        sigma = math.sqrt(
            max(r["n_orig"], 1)
            * (n_min / r["n_orig"])
            * (1 - n_min / r["n_orig"])
        )
        assert abs(r["n_kept"] - n_min) <= 5 * sigma + 1
        assert r["n_kept"] <= r["n_orig"]


def test_fk_inference_finds_real_fks_and_rejects_control(spark, sf_dir):
    rows = {
        r["fk_pair"]: r
        for r in REGISTRY["profile_fk_inference"].fn(spark, sf_dir).collect()
    }
    assert rows["orders.o_custkey->customer.c_custkey"]["is_fk"]
    assert rows["lineitem.l_orderkey->orders.o_orderkey"]["is_fk"]
    assert not rows["orders.o_orderkey->customer.c_custkey"]["is_fk"]


def test_ols_matches_numpy_lstsq(spark, sf_dir):
    import numpy as np
    import pandas as pd

    row = REGISTRY["ml_ols_normal_eq"].fn(spark, sf_dir).collect()[0]
    assert 0.0 <= row["r2_q6"] <= 1.0
    df = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    y = np.round(df.l_extendedprice * 100)
    x = np.column_stack(
        [np.ones(len(df)), np.round(df.l_quantity), np.round(df.l_discount * 100)]
    )
    beta, *_ = np.linalg.lstsq(x, y, rcond=None)
    # Cramer on exact integer sums agrees with LAPACK least squares
    assert abs(row["beta0_q6"] - beta[0] / 100) < 1e-3
    assert abs(row["beta1_q6"] - beta[1] / 100) < 1e-5
    assert abs(row["beta2_q6"] - beta[2] / 100) < 1e-5


def test_qini_endpoint_identity(spark, sf_dir):
    rows = sorted(
        REGISTRY["events_uplift_qini"].fn(spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    # Qini at the full population = total incremental responders
    tot_t = sum(r["n_t"] for r in rows)
    tot_c = sum(r["n_c"] for r in rows)
    tot_rt = sum(r["r_t"] for r in rows)
    tot_rc = sum(r["r_c"] for r in rows)
    expect = tot_rt - tot_rc * tot_t / tot_c
    assert abs(rows[-1]["qini_q6"] - expect) < 2e-6


def test_randomization_test_p_value_valid(spark, sf_dir):
    row = REGISTRY["stats_randomization_test"].fn(spark, sf_dir).collect()[0]
    assert row["n_draws"] == 200
    assert 0 <= row["n_extreme"] <= 200
    # p in (0, 1]: the +1 smoothing forbids exactly 0
    assert 0.0 < row["p_q6"] <= 1.0
