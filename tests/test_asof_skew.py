"""As-of formulations parity + salted-join equivalence under skew."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def test_asof_pandas_matches_window_formulation(spark, sf_dir):
    from auto_tabular_gpu_accelerated_etl_schema_inference_pipeline_spark.operators.asof_pandas import (
        q_asof_join_pandas,
    )
    from auto_tabular_gpu_accelerated_etl_schema_inference_pipeline_spark.operators.timeseries import (
        q_asof_join_events_orders,
    )

    a = q_asof_join_events_orders(spark, sf_dir)
    b = q_asof_join_pandas(spark, sf_dir)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_salted_join_equals_plain_join(spark):
    from auto_tabular_gpu_accelerated_etl_schema_inference_pipeline_spark.functions.skew import (
        salted_join,
    )

    # skewed large side: 90% of rows share key 0
    large = spark.range(0, 100_000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    plain = large.join(small, "k").select("k", "payload", "v")
    salted = salted_join(large, small, "k", n_salt=8).select("k", "payload", "v")
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0
