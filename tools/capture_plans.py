"""Capture ``explain("formatted")`` physical plans for named registry queries.

Round-10 deliverable helper: the optimization judge cannot run Spark, so
every touched query commits its before/after plan under ``plans/r10/``.
``--repo`` points at the source tree to import (HEAD for "after", a git
worktree of the round-9 commit for "before"), so the same script captures
both sides without code drift.

Usage:
    python tools/capture_plans.py --repo /root/repo --out plans/r10 \
        --suffix _after --sf-dir /root/testdata/sf0.1 name1 name2 ...
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--repo", default="/root/repo")
    p.add_argument("--out", required=True)
    p.add_argument("--suffix", required=True)
    p.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    p.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    p.add_argument("names", nargs="+")
    a = p.parse_args()

    sys.path.insert(0, a.repo)
    from odns_dataimporter_spark.registry import REGISTRY, all_queries
    from odns_dataimporter_spark.session import get_spark

    all_queries()
    spark = get_spark(app_name="plan-capture", cpus=a.cpus)
    os.makedirs(a.out, exist_ok=True)
    for name in a.names:
        if name not in REGISTRY:
            print(f"SKIP {name}: not in registry of {a.repo}")
            continue
        spark.sparkContext.setJobDescription(f"plan-capture {name}")
        df = REGISTRY[name].fn(spark, a.sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(a.out, f"{name}{a.suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') @ {a.sf_dir}, repo={a.repo}\n")
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
