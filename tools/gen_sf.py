#!/usr/bin/env python
"""Generate synthetic testdata at an arbitrary scale factor, matching
the driver testdata's measured shape (TESTDATA.md tables; distributions
reverse-engineered from /root/testdata/sf0.1 — see SCALING.md).

Purpose: the driver ships sf{0.001,0.01,0.1} only; the round-6 scale
rehearsal needs sf1 (10x the bench tier) to measure how every headline
query's runtime scales with data size. This generator reproduces the
statistical shape — key cardinalities, value distributions, duplicate
structure, cluster structure — NOT the driver's exact bytes (the driver
tiers aren't prefixes of each other either; scaling ratios only need
shape fidelity).

Measured shape at sf0.1 (scaled linearly unless noted):
  customer 15k | supplier 1k | part 20k | orders 150k | lineitem 600k
  events 100k (1 user per ~66 events) | documents 5k (5% near-dup
  tail with a ' dup' marker token, 31-word vocab, 10..100 tokens)
  embeddings 2k = 0.4x docs ("vectors lag the crawl"), 64-dim
  unit-norm in 10 clusters | region 5 / nation 25 fixed.
  events.value ~ Exponential(50) (mean~=std~=50, median~=34.7=50 ln 2);
  orders span 1995-01-01..2001-08-01; lineitem ships 1..95 days later;
  events span 30 days of 2024-01. Timestamps written as
  timestamp[us] (the r2+ driver layout — Spark infers TIMESTAMP_NTZ,
  which tables.load_table normalizes).

Usage: python tools/gen_sf.py --sf 1 --out /root/repo/.sfdata/sf1
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]
MKTSEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "MEDIUM", "SMALL", "LARGE", "STANDARD", "PROMO"]
PADJ = ["large", "hot", "blue", "old", "cold", "new", "red", "green"]
PNOUN = ["ring", "bolt", "plate", "gear", "wheel", "cap", "rod", "pin"]
EVENT_TYPES = ["signup", "purchase", "view", "click", "error"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


def _ts(base: str, offset_days: np.ndarray) -> np.ndarray:
    return (
        np.datetime64(base) + (offset_days * 86_400_000_000).astype("timedelta64[us]")
    ).astype("datetime64[us]")


def generate(sf: float, out: str, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out, exist_ok=True)
    k = sf / 0.1  # multiplier relative to the measured sf0.1 tier

    def write(name: str, df: pd.DataFrame) -> None:
        # SPLITTABILITY: pyarrow's default writes one giant row group
        # (up to ~1Mi rows) — Spark can only assign a row group to the
        # task whose split contains its start offset, so a 500k-row
        # single-group documents.parquet made EVERY scan single-task at
        # sf10 (caught live in the round-8 rehearsal: 12 of 13 tasks
        # idle, 1.4 cores on a 32-core box). 32k-row groups give any
        # tier honest multi-task scans, matching how real 100 TB lakes
        # are written.
        df.to_parquet(
            os.path.join(out, f"{name}.parquet"),
            index=False,
            row_group_size=32_768,
        )
        print(f"{name}: {len(df):,} rows")

    write("region", pd.DataFrame({
        "r_regionkey": np.arange(5, dtype=np.int32), "r_name": REGIONS,
    }))
    write("nation", pd.DataFrame({
        "n_nationkey": np.arange(25, dtype=np.int32),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": (np.arange(25) % 5).astype(np.int32),
    }))

    n_cust = int(15_000 * k)
    write("customer", pd.DataFrame({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": rng.choice(MKTSEGMENTS, n_cust),
    }))

    n_supp = int(1_000 * k)
    write("supplier", pd.DataFrame({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    n_part = int(20_000 * k)
    adj = rng.choice(PADJ, n_part)
    noun = rng.choice(PNOUN, n_part)
    write("part", pd.DataFrame({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": np.char.add(np.char.add(adj.astype("U8"), " "), noun.astype("U8")),
        "p_brand": np.char.add("Brand#", rng.integers(0, 25, n_part).astype("U2")),
        "p_type": rng.choice(PTYPES, n_part),
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(900.0 + np.arange(n_part) * 0.1, 2),
    }))

    n_ord = int(150_000 * k)
    odate_days = rng.uniform(0, 2404, n_ord)
    write("orders", pd.DataFrame({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord).astype(np.int64),
        "o_orderstatus": rng.choice(["O", "P", "F"], n_ord),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": _ts("1995-01-01", np.floor(odate_days)),
        "o_orderpriority": rng.choice(PRIORITIES, n_ord),
    }))

    n_li = int(600_000 * k)
    lok = np.sort(rng.integers(0, n_ord, n_li).astype(np.int64))
    # per-order line numbers: cumcount within runs of equal orderkey
    first = np.r_[0, np.flatnonzero(np.diff(lok)) + 1]
    linenum = (np.arange(n_li) - np.repeat(first, np.diff(np.r_[first, n_li])) + 1)
    write("lineitem", pd.DataFrame({
        "l_orderkey": lok,
        "l_partkey": rng.integers(0, n_part, n_li).astype(np.int64),
        "l_suppkey": rng.integers(0, n_supp, n_li).astype(np.int64),
        "l_linenumber": linenum.astype(np.int32),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": rng.choice(["A", "N", "R"], n_li),
        "l_linestatus": rng.choice(["O", "F"], n_li),
        "l_shipdate": _ts("1995-01-01", np.floor(odate_days[lok] + rng.uniform(1, 95, n_li))),
    }))

    n_ev = int(100_000 * k)
    n_users = max(1, int(1_500 * k))
    ev_ts = np.sort(rng.uniform(0, 30, n_ev))  # ts ascending in event_id
    write("events", pd.DataFrame({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": _ts("2024-01-01", ev_ts),
        "user_id": rng.integers(0, n_users, n_ev).astype(np.int64),
        "event_type": rng.choice(EVENT_TYPES, n_ev),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": np.char.add(
            np.char.add('{"k": ', rng.integers(0, 100, n_ev).astype("U3")), "}"
        ),
    }))

    n_doc = int(5_000 * k)
    lens = rng.integers(10, 101, n_doc)
    toks = rng.choice(np.array(VOCAB, dtype=object), int(lens.sum()))
    offs = np.r_[0, np.cumsum(lens)]
    texts = [" ".join(toks[offs[i]:offs[i + 1]]) for i in range(n_doc)]
    # 5% duplicate tail: copy of a random earlier doc + ' dup' marker
    # (the same near-dup structure the driver corpus has; a few exact
    # dup pairs arise when two tail docs copy the same source)
    n_dup = n_doc // 20
    dup_ids = rng.choice(n_doc, n_dup, replace=False)
    src_ids = rng.integers(0, n_doc, n_dup)
    for d, s in zip(dup_ids, src_ids):
        if d != s:
            texts[d] = texts[s] + " dup"
    write("documents", pd.DataFrame({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(LANGS, n_doc, p=LANG_P),
        "source": np.char.add("src", rng.integers(0, 20, n_doc).astype("U2")),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))

    n_emb = int(2_000 * k)  # 0.4x docs: vectors lag the crawl (sf>=0.1)
    cents = rng.normal(0, 1, (10, 64))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    vecs = cents[labels] + 0.35 * rng.normal(0, 1 / 8, (n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    write("embeddings", pd.DataFrame({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": list(vecs.astype(np.float32)),
        "label": labels.astype(np.int32),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    a = ap.parse_args()
    generate(a.sf, a.out, a.seed)
