"""Full-registry scan-count audit, pinned (round-6 VERDICT item 2).

For EVERY registered query, count how many times each big base table
appears in the physical plan. A table appearing >= 4 times means an
expensive derivation feeds diverging consumers and is re-derived per
consumer — at 100 TB each extra appearance is a full re-read. Round 5
found 36-scan plans this way (graph_triangle_count); round 6 fixed the
remaining 4-6-scan re-derivations (dq_constraint_check 5+4 -> 1+1,
stats_bootstrap_ci 5 -> 1, sim_ann_pq 6 -> 0, sim_ann_ivf 4 -> 2,
events_dau_wau_mau / events_rfm_segments / stats_* / text_* via the
checkpoint-on-divergence rule, ARCHITECTURE.md).

The allowlist below is every query allowed to exceed the threshold,
each with the reason and a pinned MAXIMUM — a regression past its
recorded count fails even for allowlisted queries.

Plan strings hide subtrees behind lazy localCheckpoint boundaries, so
the count measures scans that execute per-run (checkpointed subtrees
run once); that is exactly the cost being audited.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest

from odns_dataimporter_spark.registry import REGISTRY, all_queries

all_queries()

BIG_TABLES = ("lineitem", "orders", "events", "documents", "embeddings")
THRESHOLD = 4

# query -> (max allowed scans of any single big table, reason)
ALLOWLIST: dict[str, tuple[int, str]] = {
    "sim_incremental_topk": (
        4,
        "base/delta/probe slices are semantically DISTINCT partitions of "
        "the table (in production: separate storage); each slice scans "
        "once, plus the vec_id<10 probe branch is filter-pruned",
    ),
    "dedup_incremental_minhash": (
        4,
        "prior-corpus and new-batch slices scan separately (at scale the "
        "prior side is a persisted LSH index, see docstring); the two "
        "token-set verification reads reduce through broadcast joins",
    ),
    "text_quality_buckets": (
        4,
        "composes text_unigram_logprob (LM table + scoring pass) with a "
        "pruned (doc_id, lang) join back; each scan is column-pruned and "
        "the LM side is vocabulary-sized after its first reduction",
    ),
    "llm_curation_pipeline_v2": (
        4,
        "three curation verdicts (Gopher, dup-span, DSIR) composed in one "
        "lazy plan; 4 column-pruned scans audited as sound in VERDICT r5",
    ),
}


def test_no_query_rescans_big_tables(spark):
    sf_dir = "/root/testdata/sf0.001"
    violations: list[str] = []
    for name in sorted(REGISTRY):
        try:
            plan = (
                REGISTRY[name]
                .fn(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as ex:  # noqa: BLE001 — a plan-build crash is its own bug
            violations.append(f"{name}: plan build failed: {str(ex)[:120]}")
            continue
        counts = Counter(re.findall(r"file:[^\s\],]*?/(\w+)\.parquet", plan))
        cap, _ = ALLOWLIST.get(name, (THRESHOLD - 1, ""))
        for table, k in counts.items():
            if table in BIG_TABLES and k > cap:
                violations.append(f"{name}: {table} scanned {k}x (cap {cap})")
    assert not violations, "\n".join(violations)


def test_allowlist_entries_still_registered():
    # a renamed/deleted query must not leave a stale allowlist row
    stale = [n for n in ALLOWLIST if n not in REGISTRY]
    assert not stale, f"stale allowlist entries: {stale}"


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
