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
