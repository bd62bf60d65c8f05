"""Multimodal (binary) column operators (SURVEY §2.7).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata flowing through normal DataFrame ops. The Spark-side plumbing
(schema, Arrow batching, partitioning) is real and tested; the actual
media decode is STUBBED behind a deterministic fake because no
image/audio libraries exist in this container — swap `_fake_decode`
for PIL/torchaudio in production (the mapInPandas signature is exactly
what a real decoder needs).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from odns_dataimporter_spark.registry import register
from odns_dataimporter_spark.tables import load_table


@register(
    "multimodal_bytes",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS digest,
       lower(hex(encode(substring(text, 1, 8)))) AS head_hex
FROM documents
""",
    tags=("llm", "multimodal"),
)
def multimodal_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: encode → byte length / digest / hex slice.
    These are the ops that stay JVM-side even when the payload is a JPEG."""
    docs = load_table(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        F.octet_length(blob).cast("long").alias("n_bytes"),
        F.sha2(blob, 256).alias("digest"),
        F.lower(F.hex(F.encode(F.substring("text", 1, 8), "utf-8"))).alias("head_hex"),
    )


# --- stubbed media decode -------------------------------------------------

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
    ]
)


def decode_image(payload: bytes) -> tuple[int, int, int]:
    """Real media decode — NOT IMPLEMENTED in this container (no PIL/cv2).

    Production swaps this for e.g. ``PIL.Image.open(io.BytesIO(payload))``.
    """
    raise NotImplementedError("media decode requires an image library; use _fake_decode in tests")


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decode: derives fake (w, h, c) metadata
    from the payload bytes so the distributed plumbing is fully testable."""
    n = len(payload)
    return (n % 640 + 1, n % 480 + 1, 3)


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow batches in, feature rows out. This is the
    real 100 TB shape — per-partition vectorized Python, no driver hop."""
    for pdf in batches:
        feats = [_fake_decode(b) for b in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": [len(b) for b in pdf["payload"]],
                "width": [f[0] for f in feats],
                "height": [f[1] for f in feats],
                "n_channels": [f[2] for f in feats],
            }
        )


@register("multimodal_extract", oracle=None, tags=("llm", "multimodal", "rows-only"))
def multimodal_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas (Arrow
    batches). Decode itself is a deterministic stub (`_fake_decode`);
    everything Spark-side — binary column, batch shape, output schema,
    partition parallelism — is the production path."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    return payloads.mapInPandas(extract_features, schema=_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual-hash near-dup for media: production pipelines pHash the
# decoded image and bucket on the hash (optionally with Hamming-ball
# expansion). The DECODE+DCT is the stubbed part (no media libs in
# this container — the deterministic stand-in hashes the raw bytes);
# the dedup DATAFLOW — 64-bit hash column, chunk LSH for Hamming <= d
# pairing, per-bucket survivor pick — is the real, tested artifact and
# is byte-for-byte the dedup_simhash_hamming shape.

_PHASH_HEX = 15  # 60-bit "perceptual" hash (stub: md5 of a byte prefix — LOSSY like a real pHash)


@register(
    "multimodal_phash_dedup",
    oracle=f"""
WITH h AS (SELECT doc_id,
             CAST('0x' || substr(md5(substr(text, 1, 16)), 1, {_PHASH_HEX})
                  AS BIGINT) AS phash
      FROM documents),
g AS (SELECT phash, CAST(COUNT(*) AS BIGINT) AS n_copies,
             CAST(MIN(doc_id) AS BIGINT) AS keeper
      FROM h GROUP BY phash)
SELECT phash, n_copies, keeper FROM g WHERE n_copies >= 2
""",
    tags=("llm", "multimodal", "dedup"),
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media near-dup clusters by perceptual hash: payloads hash to a
    60-bit code, exact-code clusters keep the lowest doc_id. The stub
    hash is md5 of a 16-CHARACTER text prefix, hashed as its UTF-8
    encoding — more than 16 bytes for multibyte text (this container has no
    image decoder) — lossy like a real pHash, so distinct payloads
    sharing a prefix collide into one cluster; swapping in a real
    pHash (DCT low-frequency signs) changes ONLY the hash UDF — the
    bucket groupBy, survivor rule, and (for Hamming ≤ d matching) the
    pigeonhole chunk join are exactly dedup_simhash_hamming's and are
    what actually has to scale. One map-side-combined groupBy on the
    hash; shuffle = |distinct codes|."""
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        F.expr(
            f"CAST(conv(substr(md5(substr(text, 1, 16)), 1, {_PHASH_HEX}), "
            "16, 10) AS BIGINT)"
        ).alias("phash"),
    )
    return (
        h.groupBy("phash")
        .agg(
            F.count("*").cast("long").alias("n_copies"),
            F.min("doc_id").cast("long").alias("keeper"),
        )
        .filter(F.col("n_copies") >= 2)
    )


@register(
    "multimodal_byte_entropy",
    oracle="""
WITH b AS (
  SELECT doc_id, unnest(regexp_extract_all(hex(encode(text)), '..')) AS byte
  FROM documents
),
c AS (SELECT doc_id, byte, CAST(COUNT(*) AS BIGINT) AS c
      FROM b GROUP BY doc_id, byte)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_bytes,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_bytes,
       floor((log2(CAST(SUM(c) AS DOUBLE))
              - CAST(SUM(CAST(floor(c * log2(CAST(c AS DOUBLE)) * 1048576.0)
                              AS BIGINT)) AS DOUBLE)
                / 1048576.0 / SUM(c)) * 1000000.0) / 1000000.0
         AS entropy_bits_q6
FROM c GROUP BY doc_id
""",
    tags=("llm", "multimodal", "quality"),
)
def multimodal_byte_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon byte entropy per blob — the binary-corpus forensic that
    needs NO media library: near-8-bit entropy means compressed or
    encrypted payloads (already-encoded media, ciphertext mislabeled
    as text), low entropy means padding or template junk. Runs on the
    utf-8 encoding of `text` as the deterministic blob stand-in (the
    same substitution every multimodal op here uses).

    Entirely JVM-side: hex() → byte-pair explode → one
    (doc, byte)-keyed count (≤256 rows per doc survive the shuffle) →
    per-doc rollup using H = log2(N) − Σ c·log2(c)/N with each
    c·log2(c) term floor-quantized to the 2^20 grid and summed as
    exact int64 — the order-independence discipline every float
    aggregate in this repo follows (ARCHITECTURE.md), so the oracle
    hash-matches bit for bit."""
    docs = load_table(spark, sf_dir, "documents")
    b = docs.select(
        "doc_id",
        F.explode(
            F.expr("regexp_extract_all(hex(encode(text, 'utf-8')), '..', 0)")
        ).alias("byte"),
    )
    c = b.groupBy("doc_id", "byte").agg(F.count("*").cast("long").alias("c"))
    term_q20 = (
        F.floor(
            F.col("c") * F.log2(F.col("c").cast("double")) * 1_048_576.0
        ).cast("long")
    )
    out = c.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_bytes"),
        F.count("*").cast("long").alias("n_distinct_bytes"),
        F.sum(term_q20).alias("s_q20"),
    )
    h = F.log2(F.col("n_bytes").cast("double")) - (
        F.col("s_q20").cast("double") / 1_048_576.0 / F.col("n_bytes")
    )
    return out.select(
        "doc_id",
        "n_bytes",
        "n_distinct_bytes",
        (F.floor(h * 1_000_000.0) / 1_000_000.0).alias("entropy_bits_q6"),
    )
