"""Round-8 invariant tests: degenerate-input guards and scale-shape
fixes flagged by the round-7 VERDICT/ADVICE."""

from __future__ import annotations

import datetime as dt
import math
import os

import duckdb
import pandas as pd
import pytest

from odns_dataimporter_spark.oracle import compare
from odns_dataimporter_spark.registry import REGISTRY, all_queries

all_queries()


@pytest.fixture(scope="module")
def one_bin_events_dir(tmp_path_factory):
    """Every event value lands in ONE deci-unit histogram bin → sample
    variance exactly 0 (round-7 ADVICE: GMM init must floor it)."""
    d = str(tmp_path_factory.mktemp("onebin_ev"))
    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (i, base + dt.timedelta(minutes=i), i % 3, "view", 1.02, "{}")
        for i in range(12)
    ]
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    df.to_parquet(os.path.join(d, "events.parquet"), index=False)
    return d


def test_gmm_zero_variance_init_is_finite(spark, one_bin_events_dir):
    """All values in one deci-unit bin: init var would be 0 without the
    floor, and exp(-x/0)/sqrt(0) NaN would propagate to every output on
    BOTH engines (so the oracle alone can't catch it)."""
    spec = REGISTRY["ml_gmm_em_1d"]
    rows = spec.fn(spark, one_bin_events_dir).collect()
    assert len(rows) == 2
    for r in rows:
        for c in ("weight_q6", "mu_q6", "sigma_q6"):
            assert r[c] is not None and math.isfinite(r[c]), (r, c)
    # and the two engines still agree on the floored trajectory
    con = duckdb.connect()
    try:
        con.sql(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{one_bin_events_dir}/events.parquet')"
        )
        res = compare(
            "ml_gmm_em_1d", spec.fn(spark, one_bin_events_dir), con, spec.oracle
        )
    finally:
        con.close()
    assert res.ok, res.detail


def test_wordpiece_token_longer_than_old_budget(spark, tmp_path):
    """A 30-char word needs 30 single-char pieces — more than the old
    fixed 20-step fold budget, which silently truncated segmentation
    (round-7 ADVICE item 4). The budget is now sized per token from
    len(token) on both engines."""
    d = str(tmp_path)
    pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["q" * 30, "zz " + "x" * 25],
            "lang": ["en", "en"],
            "source": ["s", "s"],
            "n_chars": [30, 28],
        }
    ).to_parquet(os.path.join(d, "documents.parquet"), index=False)
    spec = REGISTRY["tokenizer_wordpiece_encode"]
    rows = {r["doc_id"]: r for r in spec.fn(spark, d).collect()}
    # 'q'*30: 30 continuation singles; no unks ('q' is in the vocab)
    assert rows[0]["n_pieces"] == 30 and rows[0]["n_unk"] == 0
    # 'zz' = 2 pieces; 'x'*25 = 25 pieces
    assert rows[1]["n_pieces"] == 27 and rows[1]["n_chars"] == 27
    con = duckdb.connect()
    try:
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')"
        )
        res = compare(
            "tokenizer_wordpiece_encode", spec.fn(spark, d), con, spec.oracle
        )
    finally:
        con.close()
    assert res.ok, res.detail


def test_min_label_components_path_graph_converges_logarithmically(spark):
    """A 65-node path graph has diameter 64: plain min-label propagation
    needs 64 rounds, pointer halving ~log2(64)+slack. Asserts both the
    exact single-component result and the logarithmic round count
    (round-7 VERDICT item 4: the loop is now bounded AND fast on
    pathological chains)."""
    from odns_dataimporter_spark.queries.llm_dedup import _min_label_components

    n = 65
    chain = [(i, i + 1) for i in range(n - 1)]
    und = chain + [(b, a) for a, b in chain]
    edges = spark.createDataFrame(und, "u long, v long")
    labels, rounds = _min_label_components(edges)
    got = {r["node"]: r["lbl"] for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}
    assert rounds <= 12, f"path-64 took {rounds} rounds (not logarithmic)"


def test_min_label_components_multi_component(spark):
    from odns_dataimporter_spark.queries.llm_dedup import _min_label_components

    pairs = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)]
    und = pairs + [(b, a) for a, b in pairs]
    edges = spark.createDataFrame(und, "u long, v long")
    labels, _ = _min_label_components(edges)
    got = {r["node"]: r["lbl"] for r in labels.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_isotonic_is_monotone_and_matches_sequential_pava(spark, sf_dir):
    """The minimax closed form must (a) be non-decreasing and (b) equal
    the classic sequential pool-adjacent-violators stack run in pure
    Python on the same bin histogram."""
    rows = sorted(
        REGISTRY["ml_isotonic_calibration"].fn(spark, sf_dir).collect(),
        key=lambda r: r["score_bin"],
    )
    assert rows
    iso = [r["iso_rate_q6"] for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(iso, iso[1:])), "not monotone"
    # sequential PAVA on the same (n, p) histogram
    blocks = []  # (weight, sum)
    for r in rows:
        blocks.append([r["n"], r["n_pos"]])
        while len(blocks) >= 2 and (
            blocks[-2][1] * blocks[-1][0] > blocks[-1][1] * blocks[-2][0]
        ):  # mean(prev) > mean(last), exact integer cross-multiply
            w2, s2 = blocks.pop()
            blocks[-1][0] += w2
            blocks[-1][1] += s2
    # expand block means back onto bins (block weights are whole bins
    # by construction)
    expanded = []
    bi = 0
    for w, s in blocks:
        cnt = 0
        while cnt < w:
            cnt += rows[bi]["n"]
            expanded.append(s / w)
            bi += 1
    import math

    want = [math.floor(v * 1e6) / 1e6 for v in expanded]
    assert iso == want, list(zip(iso, want))[:5]


def test_conformal_coverage_guarantee(spark, sf_dir):
    """Split conformal guarantees >= ceil((n+1)*0.9)/n coverage on the
    calibration split by construction — check the exact counts."""
    import math

    for r in REGISTRY["ml_conformal_interval"].fn(spark, sf_dir).collect():
        nc, cov = r["n_calibration"], r["n_covered"]
        assert cov >= math.ceil((nc + 1) * 0.9) - 1  # rank-th value included
        assert cov / nc >= 0.9 - 1.0 / nc
        assert r["qhat_q6"] >= 0


def test_unigram_viterbi_matches_bruteforce(spark):
    """The bounded-state integer DP must equal a straightforward
    Python Viterbi with the same learned costs — guards against a
    shared off-by-one in BOTH engines' substr/shift logic (the oracle
    alone cannot see that class of bug)."""
    import math
    from collections import defaultdict

    from odns_dataimporter_spark.queries.llm_text import (
        _UNI_INF,
        _UNI_MAXP,
        _UNI_PIECES,
    )

    sf = "/root/testdata/sf0.001"
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    freq = defaultdict(int)
    for t in texts.values():
        for w in t.split(" "):
            freq[w] += 1
    occ = defaultdict(int)
    for w, f in freq.items():
        for p in _UNI_PIECES:
            occ[p] += f * (len(w) - len(w.replace(p, ""))) // len(p)
    total = sum(occ.values())
    cost = {
        p: (math.floor(-math.log(c / total) * 1e6) + 1) * 128 + 1
        for p, c in occ.items()
        if c > 0
    }
    unk = (math.floor(math.log(2.0 * total) * 1e6) + 1) * 128 + 1

    def viterbi(w):
        best = [0] + [_UNI_INF] * len(w)
        for pos in range(1, len(w) + 1):
            for l in range(1, min(_UNI_MAXP, pos) + 1):
                c = cost.get(w[pos - l : pos], unk if l == 1 else _UNI_INF)
                best[pos] = min(best[pos], best[pos - l] + c)
        return best[len(w)]

    want = {}
    for did, t in texts.items():
        np_ = nll = nch = 0
        for w in t.split(" "):
            b = viterbi(w)
            np_ += b % 128
            nll += b // 128
            nch += len(w)
        want[did] = (np_, nll / 1e6, nch)
    got = {
        r["doc_id"]: (r["n_pieces"], r["nll_q6"], r["n_chars"])
        for r in REGISTRY["tokenizer_unigram_encode"].fn(spark, sf).collect()
    }
    assert got == want


def test_quantile_regression_line_sits_near_the_tau_quantile(spark, sf_dir):
    """The pinball-optimal line should leave roughly tau=0.9 of the
    mass below it (grid-coarseness slack allowed)."""
    from pyspark.sql import functions as F

    row = (
        REGISTRY["ml_quantile_regression_grid"].fn(spark, sf_dir).collect()[0]
    )
    assert row["tau"] == 0.9
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a, b = row["intercept"], row["slope_per_hour"]
    frac = (
        ev.select(
            (F.col("value") <= a + b * F.hour("ts")).cast("int").alias("u")
        )
        .agg(F.avg("u"))
        .collect()[0][0]
    )
    assert 0.80 <= frac <= 0.97, frac
