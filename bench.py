#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution is forced with the noop sink (full computation, no driver
collect). Each query runs twice; the second (warm) time is reported so
JVM/JIT and file-listing warmup don't dominate at small scale.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from odns_dataimporter_spark.registry import REGISTRY, all_queries
from odns_dataimporter_spark.session import get_spark

HEADLINE = [
    "agg_hash_group",
    "agg_distinct",
    "join_inner_equi",
    "join_broadcast",
    "join_asof",
    "window_rank",
    "window_frame_agg",
    "limit_topk",
    "dedup_exact",
    "dedup_near_minhash",
    "sim_topk_cosine",
    "text_tfidf",
    "stream_session",
    "odns_scan_csv_gz",
    "join_snowflake_q5",
    "sql_api_q6",
    "sql_api_q13",
    "sql_api_q19",
    "join_range_binned",
    "join_skew_salted",
    "dedup_embedding_cosine",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="bench", cpus=cpus)
    all_queries()
    names = [n for n in HEADLINE if n in REGISTRY]

    def run(name: str) -> float:
        df = REGISTRY[name].fn(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    timings: dict[str, float] = {}
    for name in names:
        run(name)  # warmup
        timings[name] = round(run(name), 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_warm",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
