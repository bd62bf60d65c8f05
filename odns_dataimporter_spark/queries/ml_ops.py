"""spark.ml-backed variants of the dedup/text operators (SURVEY §2.7).

The engine's primary implementations are pure-DataFrame (oracle-able,
engine-portable); these twins run the same semantics through the public
spark.ml feature pipeline (Tokenizer → HashingTF → MinHashLSH / IDF),
which is the off-the-shelf path a Spark shop would reach for first.
Rows-only checks: ml hash seeds are Spark-internal so no SQL oracle can
reproduce the values — tests instead assert determinism and agreement
with the pure-DF implementations where semantics overlap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from odns_dataimporter_spark.registry import register
from odns_dataimporter_spark.tables import load_table


@register("dedup_minhash_ml", oracle=None, tags=("llm", "dedup", "rows-only"))
def dedup_minhash_ml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs via spark.ml MinHashLSH
    (Tokenizer→HashingTF→approxSimilarityJoin): the library twin of
    dedup_near_minhash. Deterministic via fixed seed; Jaccard distance
    threshold 0.9 (= similarity ≥ 0.1 on hashed shingle space)."""
    from pyspark.ml.feature import HashingTF, MinHashLSH, Tokenizer

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = Tokenizer(inputCol="text", outputCol="words")
    words = tok.transform(docs)
    tf = HashingTF(inputCol="words", outputCol="features", numFeatures=1 << 16, binary=True)
    feats = tf.transform(words).filter(F.expr("size(words) > 0"))
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=4, seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 0.9, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            (F.floor((1 - F.col("jaccard_dist")) * 1_000_000) / 1_000_000.0).alias("sim"),
        )
    )


@register("text_tfidf_ml", oracle=None, tags=("llm", "text", "rows-only"))
def text_tfidf_ml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF via spark.ml HashingTF+IDF — the library twin of text_tfidf.
    Emits per-doc sparse-vector stats (nnz, max weight) since hashed
    feature indices aren't meaningful terms."""
    from pyspark.ml.feature import IDF, HashingTF, Tokenizer

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = Tokenizer(inputCol="text", outputCol="words").transform(docs)
    tf = HashingTF(inputCol="words", outputCol="tf", numFeatures=1 << 16).transform(words)
    idf_model = IDF(inputCol="tf", outputCol="tfidf").fit(tf)
    out = idf_model.transform(tf)

    from pyspark.ml.functions import vector_to_array

    arr = vector_to_array(F.col("tfidf"))
    return out.select(
        "doc_id",
        F.size(F.filter(arr, lambda x: x != 0)).cast("long").alias("nnz"),
        F.round(F.array_max(arr), 6).alias("max_weight"),
    )


@register(
    "stats_chi_square",
    oracle="""
WITH cells AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS obs
               FROM documents GROUP BY lang, source),
rt AS (SELECT lang, CAST(SUM(obs) AS BIGINT) AS rt FROM cells GROUP BY lang),
ct AS (SELECT source, CAST(SUM(obs) AS BIGINT) AS ct FROM cells GROUP BY source),
tot AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM cells),
terms AS (
  SELECT c.lang, c.source,
         (CAST(c.obs AS DOUBLE)
          - CAST(r.rt AS DOUBLE) * CAST(t.ct AS DOUBLE) / CAST(tot.n AS DOUBLE))
         * (CAST(c.obs AS DOUBLE)
            - CAST(r.rt AS DOUBLE) * CAST(t.ct AS DOUBLE) / CAST(tot.n AS DOUBLE))
         / (CAST(r.rt AS DOUBLE) * CAST(t.ct AS DOUBLE) / CAST(tot.n AS DOUBLE))
           AS term
  FROM cells c JOIN rt r USING (lang) JOIN ct t USING (source) CROSS JOIN tot
),
agg AS (SELECT list(term ORDER BY lang, source) AS a,
               CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
        FROM terms)
SELECT n_cells, n_langs, n_sources,
       (n_langs - 1) * (n_sources - 1) AS dof,
       floor(list_reduce(a, (x, y) -> x + y) * 1e6) / 1e6 AS chi2_q6
FROM agg
""",
    tags=("stats", "analytics"),
)
def stats_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test on the lang × source
    contingency table (the data-drift / composition-shift detector for
    corpus monitoring). The corpus-side work is ONE groupBy to cell
    counts; everything after runs on the tiny contingency table
    (|langs|·|sources| rows, bounded by construction). The final
    statistic folds terms in sorted (lang, source) order on both
    engines — sequential identical IEEE adds, bit-identical before the
    1e-6 floor quantization; expected counts are computed
    scale-before-divide (rt*ct/n) on both sides."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("obs")
    )
    rt = cells.groupBy("lang").agg(F.sum("obs").alias("rt"))
    ct = cells.groupBy("source").agg(F.sum("obs").alias("ct"))
    tot = cells.agg(F.sum("obs").alias("n"))
    t = (
        cells.join(F.broadcast(rt), "lang")
        .join(F.broadcast(ct), "source")
        .crossJoin(F.broadcast(tot))
    )
    exp = (
        F.col("rt").cast("double")
        * F.col("ct").cast("double")
        / F.col("n").cast("double")
    )
    d = F.col("obs").cast("double") - exp
    t = t.select("lang", "source", (d * d / exp).alias("term"))
    agg = t.agg(
        F.sort_array(F.collect_list(F.struct("lang", "source", "term"))).alias("a"),
        F.count("*").cast("long").alias("n_cells"),
        F.count_distinct("lang").cast("long").alias("n_langs"),
        F.count_distinct("source").cast("long").alias("n_sources"),
    )
    chi2 = F.aggregate(
        F.col("a"), F.lit(0.0), lambda acc, x: acc + x["term"]
    )
    return agg.select(
        "n_cells",
        "n_langs",
        "n_sources",
        ((F.col("n_langs") - 1) * (F.col("n_sources") - 1)).alias("dof"),
        (F.floor(chi2 * 1e6) / 1e6).alias("chi2_q6"),
    )
