"""TPC-H-shaped queries through the SQL entry point (SURVEY §2.3/§2.4).

Each query here is ONE SQL text executed verbatim by both engines
(``spark.sql`` over registered parquet views, DuckDB as the oracle) —
the strongest possible parity statement for the SQL API surface.

The driver's testdata is simplified TPC-H (TESTDATA.md): no
l_commitdate / l_receiptdate / l_shipmode / o_comment columns. Queries
whose canonical text needs those keep their OPERATOR SHAPE (the thing
Catalyst has to plan) with a substitute predicate, noted per query:

- Q4  — EXISTS semi-join into lineitem (l_returnflag='R' stands in for
        commitdate < receiptdate).
- Q12 — two-way conditional count over orders⋈lineitem grouped by a
        line attribute (l_linestatus stands in for l_shipmode).
- Q13 — customer order-count distribution via LEFT JOIN + two-level
        aggregation (no o_comment exclusion filter exists here).
- Q19 — disjunction of brand/size/quantity conjunctions over
        lineitem⋈part; Catalyst must still push the common join key
        while keeping the OR residual.

All four shapes are JVM-only plans: scans with pushed filters, one
shuffle per aggregation, broadcast dims.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from odns_dataimporter_spark.registry import register
from odns_dataimporter_spark.tables import register_views


def _sql(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(text)


_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
"""


@register("sql_api_q4", oracle=_Q4_SQL, tags=("sql", "join"))
def sql_api_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order-priority checking): EXISTS decorrelates to a
    LEFT SEMI join on o_orderkey — one pass over lineitem, no
    duplication of matched orders. Date range pushes to the orders
    scan."""
    return _sql(spark, sf_dir, _Q4_SQL)


_Q12_SQL = """
SELECT l.l_linestatus,
       COUNT(*) FILTER (WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
         AS high_line_count,
       COUNT(*) FILTER (WHERE o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
         AS low_line_count
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_linestatus
"""


@register("sql_api_q12", oracle=_Q12_SQL, tags=("sql", "join"))
def sql_api_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes / priority): conditional counts via
    FILTER clauses over a fact⋈fact join; the ship-date range is the
    selective pushed predicate."""
    return _sql(spark, sf_dir, _Q12_SQL)


_Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
) AS per_cust
GROUP BY c_count
"""


@register("sql_api_q13", oracle=_Q13_SQL, tags=("sql", "join"))
def sql_api_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): LEFT OUTER join keeps
    zero-order customers (COUNT over a null column skips them), then a
    second aggregation histograms the counts — two shuffles total."""
    return _sql(spark, sf_dir, _Q13_SQL)


_Q19_SQL = """
SELECT COUNT(*) AS n_items,
       CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 1e6) AS BIGINT))
            AS BIGINT) / 1e6 AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND l_quantity >= 20 AND l_quantity <= 30)
"""


@register("sql_api_q19", oracle=_Q19_SQL, tags=("sql", "join"))
def sql_api_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): disjunctive predicate over a
    join — the equi-key (p_partkey = l_partkey) must still drive a hash
    join with the OR residual as a post-join filter, never a nested
    loop. Revenue is the exact integer-micros sum."""
    return _sql(spark, sf_dir, _Q19_SQL)


_CORR_SCALAR_SQL = """
SELECT o_orderkey, o_custkey
FROM orders o
WHERE CAST(round(o_totalprice * 100) AS BIGINT)
      * (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      * 2
      > 3 * (SELECT SUM(CAST(round(o2.o_totalprice * 100) AS BIGINT))
             FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
"""


@register("sql_correlated_scalar", oracle=_CORR_SCALAR_SQL, tags=("sql", "join"))
def sql_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries: orders priced >1.5× their own
    customer's average — stated as two per-row correlated aggregates,
    which Catalyst must DECORRELATE into one grouped aggregate joined
    back on o_custkey (RewriteCorrelatedScalarSubquery); the naive
    reading is a re-scan of orders per row, O(n²) at 100 TB. The 1.5×
    test is cross-multiplied into exact integer cents (2·price·n >
    3·sum), so no float average ever decides a boundary row."""
    return _sql(spark, sf_dir, _CORR_SCALAR_SQL)


_LATERAL_SQL = """
SELECT n.n_name, t.c_name, t.bal_cents
FROM nation n, LATERAL (
  SELECT c_name, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer
  WHERE c_nationkey = n.n_nationkey
  ORDER BY bal_cents DESC, c_name
  LIMIT 2
) t
"""


@register("sql_lateral_topk", oracle=_LATERAL_SQL, tags=("sql", "join"))
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery in FROM (SPARK-35551): top-2
    customers by account balance per nation, the per-row-subtable SQL
    surface DuckDB/Postgres users expect — Spark plans the correlation
    as a join + per-key limit, not a per-nation re-scan. The balance
    is integer cents with a (bal, name) total order, so the LIMIT cut
    is deterministic on both engines."""
    return _sql(spark, sf_dir, _LATERAL_SQL)


# (A recursive-CTE entry already exists: `sql_recursive_cte` in
# graph_ops.py runs one WITH RECURSIVE text verbatim on both engines.)
