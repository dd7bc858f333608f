"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline smoke check at sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query key.

Column names are aliased identically on both sides; floating aggregates
are rounded identically on both sides so the order-insensitive value hash
is stable across engines (double summation order differs between Spark
partial aggregation and DuckDB's sequential scan).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from auto_tabular_gpu_accelerated_etl_schema_inference_pipeline_spark import (
    queries_registry,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's whole pipeline (scan -> fit 100-bin
    quantile boundaries -> bucketize -> token table) on sf0.001 lineitem
    (reference: /root/reference/etl_benchmark.py gpu_etl_pytorch)."""
    from auto_tabular_gpu_accelerated_etl_schema_inference_pipeline_spark.operators.quantile_bin import (
        LINEITEM_KEYS,
        LINEITEM_MEASURES,
        tokenize_table,
    )
    from auto_tabular_gpu_accelerated_etl_schema_inference_pipeline_spark.session import (
        load_table,
    )

    df = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    return tokenize_table(df, cols=LINEITEM_MEASURES, keep_cols=LINEITEM_KEYS)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return queries_registry.queries()


def oracle_sql() -> dict[str, str]:
    return queries_registry.oracle_sql()
