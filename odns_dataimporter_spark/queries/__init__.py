"""Query modules — importing this package registers every operator."""

from odns_dataimporter_spark.queries import (  # noqa: F401
    aggregates,
    etl_ops,
    extras,
    flagship,
    joins,
    llm_dedup,
    llm_quality,
    llm_similarity,
    llm_text,
    ml_ops,
    multimodal,
    odns,
    scalars,
    scale_ops,
    setops,
    streaming_batch,
    tpch_df,
    tpch_full,
    tpch_sql,
    windows,
)
