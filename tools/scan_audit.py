#!/usr/bin/env python
"""Scan-count audit: for every registered query, count how many times
each base parquet table appears in the EXECUTED physical plan. A big
table appearing >= `threshold` times means an expensive derivation
feeds diverging consumers and is being re-derived per consumer — at
100 TB each extra appearance is a full re-read of the table.

Round-5 findings fixed this way: graph_triangle_count (36 lineitem
scans -> 1), graph_link_prediction (26), sim_ann_pq (18),
graph_assortativity (12), dedup_semdedup / ts_downsample_lttb (8).
The remaining 3-4-scan entries are the deliberate broadcast-1-row
scalar pattern (a second COLUMN-PRUNED scan for a corpus scalar is
cheaper than checkpointing the full stream — and keeps plan
construction action-free).

Usage: python tools/scan_audit.py [threshold=3]
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from odns_dataimporter_spark.registry import REGISTRY, all_queries
from odns_dataimporter_spark.session import get_spark

BIG_TABLES = ("lineitem", "orders", "events", "documents", "embeddings")


def main() -> None:
    threshold = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="scan_audit", cpus=8, shuffle_partitions=8)
    all_queries()
    d = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    flagged = []
    for name in sorted(REGISTRY):
        try:
            plan = (
                REGISTRY[name]
                .fn(spark, d)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as ex:  # noqa: BLE001 — report, keep auditing
            print(f"ERR {name}: {str(ex)[:80]}")
            continue
        scans = re.findall(r"file:[^\s\],]*?/(\w+)\.parquet", plan)
        multi = {
            t: k for t, k in Counter(scans).items() if k >= threshold and t in BIG_TABLES
        }
        if multi:
            flagged.append((name, multi))
            print(name, multi)
    print(f"flagged {len(flagged)} queries at threshold {threshold}")
    spark.stop()


if __name__ == "__main__":
    main()
