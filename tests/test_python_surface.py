"""Tests for the Python-execution surface (SURVEY §2.9) and JDBC source
option construction."""

from __future__ import annotations

import pytest

from odns_dataimporter_spark.queries.extras import (
    pandas_udf_norm,
    udtf_token_explode,
)
from odns_dataimporter_spark.sources import jdbc_scan_options
from odns_dataimporter_spark.tables import load_table

from pyspark.sql import functions as F


def test_pandas_udf_matches_jvm_fold(spark, sf_dir):
    """The Arrow-batched numpy norm must agree EXACTLY with the JVM
    higher-order fold on the same quantized input: floor(x*2^20) makes
    every term integer-valued, so both engines' sums are exact in
    float64 and the final sqrt/divide/floor are identical IEEE ops —
    bit equality, not tolerance."""
    got = {r.vec_id: r.l2_q6 for r in pandas_udf_norm(spark, sf_dir).collect()}
    emb = load_table(spark, sf_dir, "embeddings")
    qx = F.transform("embedding", lambda x: F.floor(x.cast("double") * 1048576.0).cast("double"))
    fold = emb.select(
        "vec_id",
        (
            F.floor(
                F.sqrt(
                    F.aggregate(
                        F.transform(qx, lambda q: q * q),
                        F.lit(0.0),
                        lambda acc, v: acc + v,
                    )
                )
                / 1048576.0
                * 1000000.0
            )
            / 1000000.0
        ).alias("l2_q6"),
    )
    want = {r.vec_id: r.l2_q6 for r in fold.collect()}
    assert got == want


def test_udtf_matches_posexplode(spark, sf_dir):
    got = sorted(
        (r.doc_id, r.pos, r.token, r.token_len)
        for r in udtf_token_explode(spark, sf_dir).collect()
    )
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    twin = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    ).withColumn("token_len", F.length("token"))
    want = sorted((r.doc_id, r.pos, r.token, r.token_len) for r in twin.collect())
    assert got == want


def test_jdbc_options_partitioned():
    opts = jdbc_scan_options(
        url="jdbc:postgresql://db/odns",
        table="odns_entries",
        partition_column="scan_id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=16,
    )
    assert opts["partitionColumn"] == "scan_id"
    assert opts["numPartitions"] == "16"
    assert opts["fetchsize"] == "10000"


def test_jdbc_options_require_bounds():
    with pytest.raises(ValueError):
        jdbc_scan_options(url="u", table="t", partition_column="k")
