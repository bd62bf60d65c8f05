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
    """The Arrow-batched numpy norm must agree with the JVM higher-order
    fold (fn_array_core's sq_norm) to float tolerance."""
    got = {r.vec_id: r.l2 for r in pandas_udf_norm(spark, sf_dir).collect()}
    emb = load_table(spark, sf_dir, "embeddings")
    fold = emb.select(
        "vec_id",
        F.sqrt(
            F.aggregate(
                F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        ).alias("l2"),
    )
    want = {r.vec_id: r.l2 for r in fold.collect()}
    assert got.keys() == want.keys()
    assert all(abs(got[k] - want[k]) < 1e-9 for k in got)


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
