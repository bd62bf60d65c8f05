"""Graph analytics over derived relational graphs.

The event-type transition graph (nodes = event types, weighted edges =
observed user transitions, the same derivation as `events_markov`)
carries a fully oracle-checked weighted PageRank: the iteration is
unrolled to a fixed depth so DuckDB can replay it exactly, and every
floating sum is an ordered fold (sorted contribution lists), keeping
the scores bit-identical across engines. Complements
`dedup_cluster_components` (iterative min-label propagation) as the
second graph algorithm in the engine.

Scale note: after the single big shuffle (the transition count over
events), the graph itself is |event types|² cells — all subsequent
joins are tiny-table math. For a billion-node graph the same unrolled
dataflow holds (join-aggregate per iteration, localCheckpoint between
rounds, exactly what `dedup_cluster_components` does); only the
ordered-fold determinism trick would yield to a plain SUM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from odns_dataimporter_spark.registry import register
from odns_dataimporter_spark.tables import load_table

_DAMP = 0.85
_ITERS = 3

_PR_ORACLE = """
WITH seq AS (
  SELECT event_type AS dst,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS src
  FROM events),
e AS (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE src IS NOT NULL GROUP BY src, dst),
o AS (SELECT src, CAST(SUM(n) AS BIGINT) AS out_n FROM e GROUP BY src),
ew AS (
  SELECT e.src, e.dst, CAST(e.n AS DOUBLE) / CAST(o.out_n AS DOUBLE) AS w
  FROM e JOIN o USING (src)),
nodes AS (SELECT DISTINCT event_type AS node FROM events),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
pr0 AS (SELECT node, 1e0 / CAST(nn.n AS DOUBLE) AS pr
        FROM nodes CROSS JOIN nn),
{iters}
SELECT node, floor(pr * 1e6) / 1e6 AS pr_q6 FROM pr{k}
"""

_PR_ITER = """
c{i} AS (
  SELECT ew.dst, list(ew.w * p.pr ORDER BY ew.src) AS cs
  FROM ew JOIN pr{j} p ON ew.src = p.node GROUP BY ew.dst),
pr{i} AS (
  SELECT n.node,
         1.5e-1 / CAST(nn.n AS DOUBLE)
           + 8.5e-1 * COALESCE(list_reduce(c{i}.cs, (x, y) -> x + y), 0e0)
           AS pr
  FROM nodes n CROSS JOIN nn LEFT JOIN c{i} ON n.node = c{i}.dst)"""


def _pr_oracle() -> str:
    iters = ",".join(
        _PR_ITER.format(i=i, j=i - 1) for i in range(1, _ITERS + 1)
    )
    return _PR_ORACLE.format(iters=iters, k=_ITERS)


@register("graph_pagerank", oracle=_pr_oracle(), tags=("graph", "stats"))
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (damping 0.85, 3 unrolled iterations) on the
    event-type transition graph: pr_{k+1}(v) = 0.15/N + 0.85·Σ_u
    pr_k(u)·w(u→v), with edge weights the row-normalized transition
    counts. Per-node contribution sums are src-ordered folds so both
    engines add in the same sequence — an iterative graph algorithm
    under a full value-hash oracle. One events-scale shuffle (the
    transition count); every iteration afterwards joins tables of
    |event types| rows."""
    ev = load_table(spark, sf_dir, "events")
    win = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.lag("event_type").over(win).alias("src"),
        F.col("event_type").alias("dst"),
    ).filter(F.col("src").isNotNull())
    e = seq.groupBy("src", "dst").agg(F.count("*").cast("long").alias("n"))
    o = e.groupBy("src").agg(F.sum("n").alias("out_n"))
    ew = e.join(o, "src").select(
        "src",
        "dst",
        (F.col("n").cast("double") / F.col("out_n").cast("double")).alias("w"),
    )
    nodes = ev.select(F.col("event_type").alias("node")).distinct()
    n_nodes = nodes.count()  # |event types| — a scalar, not a data scan

    pr = nodes.select("node", F.lit(1.0 / n_nodes).alias("pr"))
    for _ in range(_ITERS):
        contrib = ew.join(pr, ew.src == pr.node).select(
            "dst", "src", (F.col("w") * F.col("pr")).alias("c")
        )
        summed = contrib.groupBy("dst").agg(
            F.sort_array(F.collect_list(F.struct("src", "c"))).alias("cs")
        )
        fold = F.aggregate(F.col("cs"), F.lit(0.0), lambda acc, x: acc + x["c"])
        pr = nodes.join(summed, nodes.node == summed.dst, "left").select(
            "node",
            (
                F.lit(0.15 / n_nodes)
                + F.lit(_DAMP) * F.coalesce(fold, F.lit(0.0))
            ).alias("pr"),
        )
    return pr.select("node", (F.floor(F.col("pr") * 1e6) / 1e6).alias("pr_q6"))
