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


def test_aqe_skew_join_splits_hot_partition(spark, sf_dir):
    """AQE's OptimizeSkewedJoin must mark and split the hot partition
    (skew=true in the final plan) when one join key dominates — the
    runtime complement to the explicit salting in functions/skew.py.
    Thresholds are floored because fixture shuffles are tiny; at real
    scale the defaults (256 MB / factor 5) do the same job."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = (
            spark.range(200_000)
            .select((F.col("id") * 0 + 7).alias("k"), F.col("id").alias("v"))
            .union(
                spark.range(5_000).select(
                    (F.col("id") % 100).alias("k"), F.col("id").alias("v")
                )
            )
        )
        right = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k").groupBy().agg(F.sum("v"), F.sum("w"))
        j.collect()  # AQE decides at runtime — force execution first
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:3000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
