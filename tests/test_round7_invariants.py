"""Mathematical invariants of the round-7 operators — properties the
oracle hash-match alone can't state (it proves both engines agree, not
that the computed thing is RIGHT)."""

from __future__ import annotations

import math

from odns_dataimporter_spark.registry import REGISTRY, all_queries

all_queries()


def test_msprt_p_values_always_valid_shape(spark, sf_dir):
    rows = sorted(
        REGISTRY["events_msprt_sequential"].fn(spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    assert rows, "needs at least one day"
    for r in rows:
        # p = min(1, 1/Lambda) is a probability
        assert 0.0 <= r["p_always_valid_q6"] <= 1.0
        # cumulative sample sizes never decrease
    nt = [r["n_t"] for r in rows]
    nc = [r["n_c"] for r in rows]
    assert nt == sorted(nt) and nc == sorted(nc)
    # reject flag is consistent with the p-value at the 0.05 line
    for r in rows:
        if r["p_always_valid_q6"] < 0.049999:
            assert r["reject_05"]


def test_wordpiece_piece_counts_bound_chars(spark, sf_dir):
    rows = REGISTRY["tokenizer_wordpiece_encode"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # every piece covers >= 1 char; unks are pieces too
        assert r["n_pieces"] >= 1
        assert r["n_unk"] <= r["n_pieces"]
        # compression ratio: pieces can't cover more chars than exist
        assert r["n_pieces"] <= r["n_chars"]
        assert r["chars_per_piece_q6"] >= 1.0


def test_neyman_allocation_spends_at_most_budget(spark, sf_dir):
    rows = REGISTRY["sample_neyman_allocation"].fn(spark, sf_dir).collect()
    assert rows
    total = sum(r["alloc_h"] for r in rows)
    # floor-rounded proportional shares never exceed the budget and
    # lose at most one unit per stratum
    assert total <= 500
    assert total >= 500 - len(rows)
    for r in rows:
        assert r["sigma_q6"] >= 0.0
        assert 0 <= r["alloc_h"] <= r["n_h"] or r["alloc_h"] >= 0


def test_mutual_information_nonnegative_and_ranked(spark, sf_dir):
    rows = REGISTRY["ml_feature_selection_mi"].fn(spark, sf_dir).collect()
    assert len(rows) == 4
    # MI >= 0 up to the per-cell quantization (each cell floors at 1e-9)
    for r in rows:
        assert r["mi_q9"] >= -1e-6
    ranked = sorted(rows, key=lambda r: r["mi_rank"])
    mis = [r["mi_q9"] for r in ranked]
    assert mis == sorted(mis, reverse=True)


def test_kalman_gain_decreases_to_steady_state(spark, sf_dir):
    rows = sorted(
        REGISTRY["ts_kalman_1d"].fn(spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    assert len(rows) >= 3
    gains = [r["gain_q6"] for r in rows]
    # diffuse prior: first gain ~1, then monotone decrease to the
    # steady-state ratio (Riccati recursion is monotone from above)
    assert gains[0] > 0.99
    assert all(a >= b - 1e-9 for a, b in zip(gains, gains[1:]))
    # steady state for Q=1e4, R=1e6: K* = (sqrt(Q^2+4QR)-Q)/(2R) ~ 0.0951
    assert abs(gains[-1] - 0.0951) < 0.02
    # posterior variance is positive and bounded by P0
    assert all(0 < r["p_milli2"] <= 1_000_000_000 for r in rows)


def test_sax_words_are_valid_and_paa_centered(spark, sf_dir):
    rows = REGISTRY["ts_sax_symbols"].fn(spark, sf_dir).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for t, rs in by_type.items():
        word = rs[0]["sax_word"]
        assert set(word) <= set("abcd")
        assert len(word) == len(rs) <= 8
        # z-normalized PAA means weighted by segment size sum to ~0
        tot = sum(r["paa_q6"] * r["n_in_seg"] for r in rs)
        n = sum(r["n_in_seg"] for r in rs)
        assert abs(tot / n) < 0.01
        # symbols consistent with breakpoints
        for r in rs:
            sym = "a" if r["paa_q6"] < -0.6745 else (
                "b" if r["paa_q6"] < 0 else (
                    "c" if r["paa_q6"] < 0.6745 else "d"))
            # paa_q6 is floored AFTER symbol assignment: only boundary
            # rows may differ by one letter
            assert abs(ord(sym) - ord(r["symbol"])) <= 1


def test_ccnet_paragraph_dedup_conserves_chunks(spark, sf_dir):
    rows = REGISTRY["dedup_paragraph_ccnet"].fn(spark, sf_dir).collect()
    assert rows
    n_docs = len(rows)
    total_chunks = sum(r["n_chunks"] for r in rows)
    total_kept = sum(r["n_kept"] for r in rows)
    # every doc keeps at most what it had; globally at least one chunk
    # per distinct paragraph survives
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_chunks"]
        if r["n_kept"] == 0:
            assert r["kept_digest"] is None
    assert 0 < total_kept <= total_chunks
    assert n_docs == len({r["doc_id"] for r in rows})


def test_readability_bounds(spark, sf_dir):
    rows = REGISTRY["text_readability_smog"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_syllables"] >= r["n_words"]  # >=1 syllable per word
        assert 0 <= r["n_poly"] <= r["n_words"]
        assert r["n_sent"] == math.ceil(r["n_words"] / 15)
        # SMOG = 1.043*sqrt(30*poly/sent) + 3.1291 >= 3.1291
        assert r["smog_q6"] >= 3.1291 - 1e-6


def test_pca_topk_components_orthogonal(spark, sf_dir):
    rows = REGISTRY["embed_pca_topk"].fn(spark, sf_dir).collect()
    assert len(rows) == 128
    v = {1: [0.0] * 64, 2: [0.0] * 64}
    eig = {}
    for r in rows:
        v[r["component"]][r["dim"]] = r["loading_q6"]
        eig[r["component"]] = r["eigenvalue_q9"]
    n1 = sum(x * x for x in v[1])
    n2 = sum(x * x for x in v[2])
    assert abs(n1 - 1.0) < 1e-3 and abs(n2 - 1.0) < 1e-3
    dot = sum(a * b for a, b in zip(v[1], v[2]))
    # the final Gram-Schmidt step forces orthogonality to quantization
    assert abs(dot) < 1e-3
    # eigenvalue ordering up to near-degeneracy: with lambda1 ~ lambda2
    # (the 10-cluster synthetic embeddings), 12 power steps cannot
    # strictly order the pair — allow a 15% flip margin, require PSD
    assert eig[2] <= eig[1] * 1.15 + 1e-9
    assert eig[1] >= -1e-9 and eig[2] >= -1e-9


def test_cvm_nonnegative_and_null_consistent(spark, sf_dir):
    rows = REGISTRY["stats_cvm_twosample"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["cvm_q9"] >= -1e-9
        assert r["n_early"] > 0 and r["n_late"] > 0
        assert r["reject_05"] == (r["cvm_q9"] > 0.461) or abs(
            r["cvm_q9"] - 0.461
        ) < 1e-6


def test_gbm_residual_step_reduces_sse(spark, sf_dir):
    rows = {
        r["round"]: r
        for r in REGISTRY["ml_gbm_residual_step"].fn(spark, sf_dir).collect()
    }
    assert set(rows) == {1, 2}
    for r in rows.values():
        assert r["n_left"] > 0 and r["n_right"] > 0
        # fitting on the training residuals can never increase SSE
        assert r["sse_ratio_q6"] <= 1.0 + 1e-6
        assert r["sse_ratio_q6"] > 0.0
    # the shrunken corrections move in opposite directions around the mean
    r1 = rows[1]
    assert r1["corr_left_q6"] * r1["corr_right_q6"] <= 0.0


def test_gini_bounds(spark, sf_dir):
    rows = REGISTRY["events_gini_concentration"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1e-6 <= r["gini_q6"] <= 1.0
        assert r["n_users"] <= r["n_events"]


def test_learning_curve_nested_and_improving(spark, sf_dir):
    rows = {
        r["train_pct"]: r
        for r in REGISTRY["ml_learning_curve"].fn(spark, sf_dir).collect()
    }
    assert set(rows) == {25, 50, 100}
    # nested subsets: training sizes strictly increase
    assert rows[25]["n_train"] < rows[50]["n_train"] < rows[100]["n_train"]
    # holdout RMSE never EXPLODES with more data (the synthetic
    # lineitem draws price INDEPENDENT of quantity — corr ~ 0.003 — so
    # the true slope is ~0 and its sign is noise; the protocol, not the
    # signal, is under test)
    r25, r100 = rows[25]["holdout_rmse_q6"], rows[100]["holdout_rmse_q6"]
    assert r100 <= r25 * 1.05
    for r in rows.values():
        assert r["holdout_rmse_q6"] > 0
        assert r["intercept_q6"] > 0  # prices are positive


def test_its_slope_identity(spark, sf_dir):
    rows = REGISTRY["events_causal_impact_its"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_pre"] >= 2 and r["n_post"] >= 2
        # slope_change = post - pre up to independent q6 flooring
        assert abs(
            r["slope_change_q6"]
            - (r["post_slope_q6"] - r["pre_slope_q6"])
        ) <= 3e-6


def test_binseg_root_dominates_and_partitions(spark, sf_dir):
    rows = {
        r["split_level"]: r
        for r in REGISTRY["ts_changepoint_binseg"].fn(spark, sf_dir).collect()
    }
    assert 1 in rows
    root = rows[1]
    assert 1 <= root["cp_index"] < root["n_seg"]
    for lvl, r in rows.items():
        assert r["gain_q3"] >= 0.0
        assert r["n_seg"] >= 2
    if 2 in rows:
        assert rows[2]["cp_index"] < root["cp_index"]
        assert rows[2]["n_seg"] == root["cp_index"]
    if 3 in rows:
        assert rows[3]["cp_index"] > root["cp_index"]
        assert rows[3]["n_seg"] == root["n_seg"] - root["cp_index"]


def test_alignment_uniformity_signs(spark, sf_dir):
    rows = (
        REGISTRY["embed_alignment_uniformity"].fn(spark, sf_dir).collect()
    )
    assert rows
    for r in rows:
        # squared distances: alignment >= 0; for unit-norm vectors
        # ||zi-zj||^2 <= 4
        assert -1e-9 <= r["align_q6"] <= 4.0
        # log-mean of exp(-2d^2) terms in (0, 1] => uniformity <= 0
        assert r["uniformity_q6"] <= 1e-9
        assert r["n_pairs"] > 0
    # the synthetic `label` column is independent of the 10-cluster
    # geometry, so same-label pairs behave like random pairs: the
    # alignment must sit AT the random-pair expectation (~2 for unit
    # vectors), not collapse to 0 or blow past the 4 bound
    mean_align = sum(r["align_q6"] for r in rows) / len(rows)
    assert 1.5 < mean_align < 2.5


def test_doremi_mixture_is_distribution_tilted_to_loss(spark, sf_dir):
    rows = REGISTRY["sample_doremi_mixture"].fn(spark, sf_dir).collect()
    assert rows
    total_w = sum(r["weight_q6"] for r in rows)
    assert abs(total_w - 1.0) < 1e-4  # floor-q6 per domain
    # multiplicative weights preserve loss ordering: heavier weight on
    # harder domains
    by_loss = sorted(rows, key=lambda r: r["loss_q6"])
    by_w = sorted(rows, key=lambda r: r["weight_q6"])
    assert [r["domain"] for r in by_loss] == [r["domain"] for r in by_w]
    total_toks = sum(r["n_tokens"] for r in rows)
    assert sum(r["budget_tokens"] for r in rows) <= total_toks * 1.0 + len(
        rows
    )


def test_spearman_bounds_and_symmetric_pairs(spark, sf_dir):
    rows = REGISTRY["stats_spearman_corr"].fn(spark, sf_dir).collect()
    assert len(rows) == 6
    for r in rows:
        assert -1.0 - 1e-6 <= r["rho_q6"] <= 1.0 + 1e-6
        order = ["qv", "dv", "tv", "pv"]
        assert order.index(r["var_a"]) < order.index(r["var_b"])
    # synthetic lineitem draws measures independently: no pair should
    # show strong monotone dependence
    assert max(abs(r["rho_q6"]) for r in rows) < 0.3


def test_tukey_pairs_and_nonnegative_q(spark, sf_dir):
    rows = REGISTRY["stats_tukey_hsd"].fn(spark, sf_dir).collect()
    k = len({r["group_a"] for r in rows} | {r["group_b"] for r in rows})
    assert len(rows) == k * (k - 1) // 2
    for r in rows:
        assert r["q_stat_q6"] >= 0.0
        assert r["significant_05"] == (r["q_stat_q6"] > 3.858) or abs(
            r["q_stat_q6"] - 3.858
        ) < 1e-5
        # |mean diff| consistent with q: both derive from the same diff
        assert (abs(r["mean_diff_q6"]) > 0) == (r["q_stat_q6"] > 0) or abs(
            r["mean_diff_q6"]
        ) < 1e-5


def test_wav_zcr_bounds(spark, sf_dir):
    rows = REGISTRY["multimodal_wav_zcr"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["zcr"] < max(r["n_samples"], 1)
        assert r["n_frames"] == r["n_samples"] // 100
        assert 0 <= r["n_voiced"] <= r["n_frames"]
        # PCM16 from byte payloads: peak is (b-128)*256 so <= 32768
        assert 0 <= r["peak_abs"] <= 32768


def test_iptw_recovers_randomized_effect(spark, sf_dir):
    row = REGISTRY["events_iptw_ate"].fn(spark, sf_dir).collect()[0]
    assert row["n_users"] > 0
    # the assignment IS randomized (hash), so the true effect is ~0 and
    # propensities are ~0.5 in every stratum: the IPTW point estimate
    # must sit near zero relative to the outcome scale
    assert abs(row["ate_q6"]) < 0.5 * max(row["mu_t_q6"], row["mu_c_q6"])
    assert row["mu_t_q6"] > 0 and row["mu_c_q6"] > 0


def test_hysteresis_episode_accounting(spark, sf_dir):
    rows = REGISTRY["ts_alert_hysteresis"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["hours_in_alert"] <= r["n_hours"]
        # an episode needs at least one alert hour; episodes can't
        # outnumber alert hours
        assert r["n_alerts"] <= max(r["hours_in_alert"], 0)
        if r["hours_in_alert"] > 0:
            assert r["n_alerts"] >= 1
        assert abs(
            r["alert_frac_q6"] - r["hours_in_alert"] / r["n_hours"]
        ) < 1e-5


def test_shuffle_skew_profile_consistency(spark, sf_dir):
    rows = sorted(
        REGISTRY["profile_shuffle_skew"].fn(spark, sf_dir).collect(),
        key=lambda r: r["heavy_rank"],
    )
    assert 1 <= len(rows) <= 5
    counts = [r["key_rows"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    r = rows[0]
    # L2 skew factor >= 1 (Cauchy-Schwarz, equality iff uniform)
    assert r["l2_skew_q6"] >= 1.0 - 1e-6
    # the heaviest key IS the max: ratio consistent
    assert r["max_over_mean_q6"] >= 1.0 - 1e-6
    assert r["recommended_salts"] >= 1
    assert r["key_rows"] <= r["n_rows"]


def test_ridge_probe_beats_majority_class(spark, sf_dir):
    row = REGISTRY["ml_ridge_probe"].fn(spark, sf_dir).collect()[0]
    assert row["n"] > 0
    maj = max(row["n_pos"], row["n"] - row["n_pos"]) / row["n"]
    # the 10 clusters are label-independent BUT ridge on 64 dims can
    # still fit some signal; at minimum the probe must not be
    # degenerate (predicting one class everywhere scores exactly maj)
    assert 0.0 < row["accuracy_q6"] <= 1.0
    assert row["accuracy_q6"] >= maj - 0.1
    assert row["w_norm_q6"] >= 0.0


def test_platt_improves_on_uncalibrated_and_bounded_by_saturated(
    spark, sf_dir
):
    row = REGISTRY["ml_platt_calibration"].fn(spark, sf_dir).collect()[0]
    assert row["n_bins"] >= 2
    assert 0 < row["pos"] < row["tot"]
    # NLLs are positive and the saturated model (when defined) is the
    # attainable floor for any calibrator on the same bins
    assert row["nll_calibrated_q6"] > 0
    if row["nll_saturated_q6"] is not None:
        assert row["nll_calibrated_q6"] >= row["nll_saturated_q6"] - 1e-4
    # the synthetic score has positive lift: the fitted slope must be
    # positive (higher score => higher probability)
    assert row["platt_a_q6"] > 0


def test_watermark_natural_text_near_null(spark, sf_dir):
    rows = REGISTRY["text_watermark_greenlist"].fn(spark, sf_dir).collect()
    assert rows
    n_flagged = sum(1 for r in rows if r["watermarked"])
    for r in rows:
        assert 0 <= r["n_green"] <= r["n_scored"]
    # natural (hash-random) text: green rate ~ gamma, z ~ N(0,1); a
    # z>4 flag should be a <<1% event
    assert n_flagged <= max(1, len(rows) // 50)
    mean_z = sum(r["z_q6"] for r in rows) / len(rows)
    assert abs(mean_z) < 1.0


def test_mahalanobis_drift_null_on_random_split(spark, sf_dir):
    row = REGISTRY["embed_drift_mahalanobis"].fn(spark, sf_dir).collect()[0]
    assert row["n_a"] > 0 and row["n_b"] > 0
    assert row["mahalanobis2_q9"] >= 0.0
    # even/odd vec_id is a random split of the SAME distribution: the
    # scaled statistic must not scream drift
    assert not row["drift_alarm"]
    assert 0 <= row["n_drifted_dims"] <= 64


def test_croston_state_within_observed_range(spark, sf_dir):
    row = (
        REGISTRY["ts_croston_intermittent"].fn(spark, sf_dir).collect()[0]
    )
    assert 0 < row["n_nonzero"] <= row["n_hours"]
    # smoothed size is a convex combination of observed sizes (>= 1);
    # smoothed interval of observed intervals (>= 1)
    assert row["size_hat_q6"] >= 1.0 - 1e-6
    assert row["interval_hat_q6"] >= 1.0 - 1e-6
    # rate = size/interval is bounded by the max hourly demand
    assert 0 < row["demand_rate_q6"] <= row["size_hat_q6"] + 1e-6


def test_kmeans_lloyd3_partitions_and_unit_sphere(spark, sf_dir):
    rows = REGISTRY["ml_kmeans_lloyd3"].fn(spark, sf_dir).collect()
    assert 1 <= len(rows) <= 8
    total = sum(r["n_members"] for r in rows)
    for r in rows:
        assert r["n_members"] >= 1
        assert r["inertia_q6"] >= 0.0
        # unit-norm inputs: centroid means live inside the unit ball
        assert 0.0 <= r["centroid_norm_q6"] <= 1.0 + 1e-6
    # every vector is assigned exactly once
    from odns_dataimporter_spark.tables import load_table

    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert total == n_vecs


def test_gmm_em_is_a_valid_mixture(spark, sf_dir):
    rows = {
        r["component"]: r
        for r in REGISTRY["ml_gmm_em_1d"].fn(spark, sf_dir).collect()
    }
    assert set(rows) == {1, 2}
    w = rows[1]["weight_q6"] + rows[2]["weight_q6"]
    assert abs(w - 1.0) < 1e-4
    for r in rows.values():
        assert 0.0 < r["weight_q6"] < 1.0
        assert r["sigma_q6"] >= 0.09  # sqrt of the variance floor
        assert r["mu_q6"] > 0  # values are nonnegative (exp draws)
    # EM preserves the init ordering mu1 <= mu2 on a well-separated run
    assert rows[1]["mu_q6"] <= rows[2]["mu_q6"] + 1e-6


def test_levene_statistic_nonnegative(spark, sf_dir):
    row = REGISTRY["stats_levene_variance"].fn(spark, sf_dir).collect()[0]
    assert row["n_groups"] >= 2
    assert row["w_stat_q6"] >= -1e-6
    assert row["reject_05"] == (row["w_stat_q6"] > 2.37) or abs(
        row["w_stat_q6"] - 2.37
    ) < 1e-4


def test_entropy_rate_information_inequalities(spark, sf_dir):
    import math

    row = (
        REGISTRY["text_bigram_entropy_rate"].fn(spark, sf_dir).collect()[0]
    )
    # conditioning never increases entropy; joint >= conditional; both
    # bounded by ln of the distinct-bigram count
    assert 0.0 <= row["cond_entropy_nats_q9"] <= row[
        "joint_entropy_nats_q9"
    ] + 1e-6
    assert row["joint_entropy_nats_q9"] <= math.log(
        row["n_distinct_bigrams"]
    ) + 1e-6
    assert row["n_distinct_bigrams"] <= row["n_bigrams"]
