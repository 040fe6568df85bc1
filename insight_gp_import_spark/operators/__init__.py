"""Operator modules — importing this package populates the registry.

One module per SURVEY.md §2 category. Each operator is a pure function
``(spark, sf_dir) -> DataFrame`` registered with its DuckDB oracle twin.
"""

from insight_gp_import_spark.operators import (  # noqa: F401
    aggregation,
    aggregation_business,
    aggregation_stats,
    corpus_ops,
    graph_ops,
    joins,
    llm,
    multimodal,
    projection,
    quality_ops,
    scans,
    setops,
    scalar_functions,
    streaming_ops,
    timeseries,
    timeseries_models,
    training_dedup,
    training_text,
    udfs,
    windows,
)
