"""Coverage completion for SURVEY §2: remaining join/agg/window variants,
path-utility scalars (REF rows §2.6), the SQL-API entry point, and the
Python-execution surface (§2.9: pandas_udf, applyInPandas grouped-map,
UDTF)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W

from odns_dataimporter_spark.registry import register
from odns_dataimporter_spark.tables import load_table, register_views


@register(
    "join_right_outer",
    oracle="""
SELECT o.o_orderkey, c.c_custkey, c.c_mktsegment
FROM orders o
RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_acctbal < 0
""",
    tags=("join",),
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join (kept distinct from left for parity; Catalyst
    normalizes it to a left join with sides swapped)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "right")
        .filter(F.col("c_acctbal") < 0)
        .select("o_orderkey", "c_custkey", "c_mktsegment")
    )


@register(
    "agg_cube",
    oracle="""
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    tags=("agg",),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping-set combinations."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
        )
    )


@register(
    "window_lead_first",
    oracle="""
SELECT event_id,
       lead(event_id) OVER w AS next_event_id,
       first_value(event_type) OVER w AS first_type,
       last_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND UNBOUNDED FOLLOWING) AS last_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    tags=("window",),
)
def window_lead_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead / first_value / last_value analytics (complement of
    window_analytic's lag)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return ev.select(
        "event_id",
        F.lead("event_id").over(w).alias("next_event_id"),
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(wfull).alias("last_type"),
    )


@register(
    "fn_path_core",
    oracle=r"""
SELECT o_orderkey,
       concat('/data/', CAST(year(current_date) AS VARCHAR), '/tcp/') AS archive_dir,
       list_extract(string_split(concat('/data/2026/tcp/tcp_scan_',
                    strftime(o_orderdate, '%Y-%m-%d'), '.csv.gz'), '/'),
                    len(string_split(concat('/data/2026/tcp/tcp_scan_',
                    strftime(o_orderdate, '%Y-%m-%d'), '.csv.gz'), '/'))) AS basename
FROM orders
""",
    tags=("scalar", "ref"),
)
def fn_path_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's path scalar family (SURVEY §2.6 REF rows):
    template substitution with the current year (dataimporter.py:109-115)
    and basename extraction (zipFileUtils.py:26)."""
    orders = load_table(spark, sf_dir, "orders")
    full_path = F.concat(
        F.lit("/data/2026/tcp/tcp_scan_"),
        F.date_format("o_orderdate", "yyyy-MM-dd"),
        F.lit(".csv.gz"),
    )
    return orders.select(
        "o_orderkey",
        F.concat(
            F.lit("/data/"), F.year(F.current_date()).cast("string"), F.lit("/tcp/")
        ).alias("archive_dir"),
        F.element_at(F.split(full_path, "/"), -1).alias("basename"),
    )


_Q3_SQL = f"""
SELECT o.o_orderkey,
       {{rev}} AS revenue,
       CAST(o.o_orderdate AS DATE) AS orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
ORDER BY revenue DESC, o.o_orderkey
LIMIT 20
"""

# NB: divide by 1e6 (a DOUBLE literal in both dialects) — `1000000.0`
# parses as DECIMAL in Spark SQL and the result type would diverge from
# the double the oracle produces.
_REV_EXACT = (
    "CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 1e6) AS BIGINT))"
    " AS BIGINT) / 1e6"
)


@register("sql_api_q3", oracle=_Q3_SQL.format(rev=_REV_EXACT), tags=("sql", "flagship"))
def sql_api_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style shipping-priority query through the SQL entry point
    (temp views + spark.sql) — Catalyst produces the same optimized plan
    as the DataFrame API; this registers the engine's second query
    surface. Revenue uses the exact integer-micros sum."""
    register_views(spark, sf_dir)
    return spark.sql(_Q3_SQL.format(rev=_REV_EXACT))


@register(
    "scan_parquet",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00' AND l_returnflag = 'R'
""",
    tags=("scan",),
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bare columnar scan with pushdown: the filters and 3-column
    projection reach the parquet reader (asserted in test_plans.py for
    the same pattern) — the primitive every other operator builds on."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_returnflag") == "R")
    ).select("l_orderkey", "l_linenumber", "l_quantity")


# --- §2.9 Python execution surface ---------------------------------------

_ZSCORE_ORACLE = """
WITH stats AS (
  SELECT lang,
         AVG(n_chars) AS mu,
         stddev_pop(n_chars) AS sigma
  FROM documents GROUP BY lang
)
SELECT d.doc_id,
       d.lang,
       floor((d.n_chars - s.mu) / s.sigma * 1000.0) / 1000.0 AS chars_z
FROM documents d JOIN stats s ON d.lang = s.lang
"""


@register("grouped_map_zscore", oracle=_ZSCORE_ORACLE, tags=("python", "udaf"))
def grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDAF surface (applyInPandas): per-language z-score of
    document length, computed with vectorized numpy per group. Quantized
    to 1e-3 because pandas' pairwise summation and DuckDB's sequential
    aggregation differ in the last float bits. This is the engine's
    custom-aggregation escape hatch (SURVEY §2.9 item 4)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        x = pdf["n_chars"].to_numpy(dtype="float64")
        mu = float(x.mean())
        sigma = float(x.std())  # population std, ddof=0
        z = np.floor((x - mu) / sigma * 1000.0) / 1000.0
        return pd.DataFrame({"doc_id": pdf["doc_id"], "lang": pdf["lang"], "chars_z": z})

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("chars_z", T.DoubleType()),
        ]
    )
    return docs.groupBy("lang").applyInPandas(zscore, schema=schema)


@register(
    "pandas_udf_norm",
    oracle="""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[], x -> floor(x * 1048576.0)) AS qe
  FROM embeddings
)
SELECT vec_id,
       floor(sqrt(list_dot_product(qe, qe)) / 1048576.0 * 1000000.0)
         / 1000000.0 AS l2_q6
FROM q
""",
    tags=("python", "udf"),
)
def pandas_udf_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar Pandas UDF (Arrow-batched): L2 norm of the
    embedding column via numpy, now under a FULL value-hash oracle.
    Determinism via the repo's input-quantization discipline (as in
    sim_knn_graph): floor(x*2^20) makes every element integer-valued,
    so the dot product is a sum of integers < 2^52 — exact in float64
    regardless of summation order (numpy pairwise vs DuckDB sequential)
    — and sqrt/divide/floor are then identical single-rounded IEEE ops
    on both engines. Tests additionally pin exact equality against the
    JVM fold twin on the same quantized input. The point of the pair:
    the Arrow path is ~10-100x a row-at-a-time Python UDF, but still
    loses to the fold expression — so the engine's default is the JVM
    path and this is the documented escape hatch for numpy-only math."""
    import math

    import numpy as np

    @F.pandas_udf("double")
    def l2norm_q6(s: pd.Series) -> pd.Series:
        def one(v) -> float:
            q = np.floor(v.astype("float64") * 1048576.0)
            return math.floor(math.sqrt(float(np.dot(q, q))) / 1048576.0 * 1000000.0) / 1000000.0

        return s.apply(one)

    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", l2norm_q6("embedding").alias("l2_q6"))


_UDTF_SCHEMA = "pos INT, token STRING, token_len INT"


@register(
    "udtf_token_explode",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 10
), e AS (
  SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i FROM t
)
SELECT doc_id, CAST(i - 1 AS INT) AS pos, toks[i] AS token,
       CAST(len(toks[i]) AS INT) AS token_len
FROM e
""",
    tags=("python", "udtf"),
)
def udtf_token_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (PySpark 4 @udtf): one input document row → many
    (pos, token, len) rows with metadata — the table-generating surface
    (SURVEY §2.9 item 4), under a full value-hash oracle (DuckDB's
    unnest-with-ordinality formulation). Demonstrated on a bounded
    slice; the pure-DF twin (posexplode) is what production uses,
    asserted equal in tests."""
    from pyspark.sql.functions import udtf

    @udtf(returnType=_UDTF_SCHEMA)
    class TokenExplode:
        def eval(self, text: str):  # noqa: ANN001
            for pos, tok in enumerate((text or "").split(" ")):
                yield pos, tok, len(tok)

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    spark.udtf.register("token_explode", TokenExplode)
    docs.select("doc_id", "text").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.token, t.token_len "
        "FROM _udtf_docs d, LATERAL token_explode(d.text) t"
    )


@register(
    "arrow_batch_norm",
    oracle="""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[], x -> floor(x * 1048576.0)) AS qe
  FROM embeddings
)
SELECT vec_id,
       floor(sqrt(list_dot_product(qe, qe)) / 1048576.0 * 1000000.0)
         / 1000000.0 AS l2_q6
FROM q
""",
    tags=("python", "udf"),
)
def arrow_batch_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow twin of pandas_udf_norm — the LOWEST-overhead Python
    hook: RecordBatches cross the boundary with no pandas
    materialization (no Series boxing, no index), which matters when
    the per-batch work is a short numpy kernel like this. Same
    quantization discipline (floor(x·2^20) → exact integer dot in
    float64 → one sqrt/divide/floor chain), same oracle. The
    Python-interop matrix is now complete: scalar Pandas UDF,
    grouped-map UDAF, UDTF, applyInPandas(WithState), mapInPandas,
    and mapInArrow — with the JVM fold expression remaining the
    default (extras.pandas_udf_norm's docstring has the measured
    ranking)."""
    import math

    import pyarrow as pa

    def norms(batches):
        import numpy as np

        for batch in batches:
            ids = batch.column("vec_id")
            out = []
            for v in batch.column("embedding").to_pylist():
                q = np.floor(np.asarray(v, dtype="float64") * 1048576.0)
                out.append(
                    math.floor(math.sqrt(float(np.dot(q, q))) / 1048576.0 * 1e6) / 1e6
                )
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(out, type=pa.float64())], ["vec_id", "l2_q6"]
            )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return emb.mapInArrow(norms, "vec_id long, l2_q6 double")


@register(
    "udtf_polymorphic_ngrams",
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
           FROM documents WHERE doc_id < 10)
SELECT doc_id,
       CAST(i - 1 AS BIGINT) AS pos,
       toks[i] AS g1, toks[i + 1] AS g2, toks[i + 2] AS g3
FROM t, unnest(range(1, len(toks) - 1)) AS u(i)
WHERE len(toks) >= 3
""",
    tags=("python", "udf"),
)
def udtf_polymorphic_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4's static `analyze()` API): the
    output schema is not fixed at registration — it is COMPUTED at
    plan time from the constant `n` argument (here 3 → columns g1..g3;
    call it with 2 and you get g1..g2 without touching the class).
    This is the dynamic-schema table-function surface (think
    read_files-style functions whose shape depends on arguments) that
    the static-`returnType` UDTF (`udtf_token_explode`) cannot
    express. The oracle is DuckDB's unnest-with-range trigram
    formulation; production n-gram extraction stays in the pure-DF
    shingle construction (llm_dedup), asserted equivalent there — this
    entry pins the API surface."""
    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult, udtf

    class NGrams:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            if not n.isConstantExpression:
                raise Exception("n must be a constant")
            width = int(n.value)
            fields = [T.StructField("pos", T.LongType())]
            fields += [T.StructField(f"g{i + 1}", T.StringType()) for i in range(width)]
            return AnalyzeResult(schema=T.StructType(fields))

        def eval(self, text: str, n: int):  # noqa: ANN001
            toks = (text or "").split(" ")
            for pos in range(len(toks) - n + 1):
                yield (pos, *toks[pos : pos + n])

    spark.udtf.register("poly_ngrams", udtf(NGrams))
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    docs.select("doc_id", "text").createOrReplaceTempView("_poly_docs")
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.g1, t.g2, t.g3 "
        "FROM _poly_docs d, LATERAL poly_ngrams(d.text, 3) t"
    )
