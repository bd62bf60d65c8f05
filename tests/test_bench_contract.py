"""Bench-harness contract: the headline list stays valid as the
registry evolves (a renamed or dropped op silently vanishing from the
bench is how a coverage regression hides — bench.main() filters with
`if n in REGISTRY`, so nothing would fail at run time)."""

from __future__ import annotations

import bench
from odns_dataimporter_spark.registry import REGISTRY, all_queries

all_queries()


def test_headline_entries_are_registered():
    missing = [n for n in bench.HEADLINE if n not in REGISTRY]
    assert not missing, f"headline entries not in registry: {missing}"


def test_headline_has_no_duplicates():
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))


def test_headline_covers_every_family():
    tags = set()
    for n in bench.HEADLINE:
        tags |= set(REGISTRY[n].tags)
    for family in (
        "agg", "llm", "dedup", "similarity", "text", "events", "stats",
        "graph", "timeseries", "ml", "embedding", "analytics",
    ):
        assert family in tags, f"no headline query carries tag {family!r}"
