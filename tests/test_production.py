"""Production operators: deterministic sampling, observe() metrics,
incremental high-water-mark processing, stream-stream join."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from auto_tabular_gpu_accelerated_etl_schema_inference_pipeline_spark.operators import (  # noqa: E402
    production,
)


def test_sample_hash_partition_invariant(spark, sf_dir):
    """Hash-sample membership must not depend on partition layout —
    the property RNG-based df.sample lacks."""
    base = {
        tuple(r)
        for r in production.q_sample_hash(spark, sf_dir).collect()
    }
    df = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .repartition(7, "l_suppkey")
        .filter(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "-",
                        F.col("l_orderkey").cast("string"),
                        F.col("l_linenumber").cast("string"),
                    )
                ),
                1,
                2,
            )
            < production.SAMPLE_THRESHOLD
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    )
    assert {tuple(r) for r in df.collect()} == base
    assert len(base) > 0


def test_incremental_equals_full_recompute(spark, sf_dir):
    """The high-water-mark invariant: any batch count yields the same
    state as a single full recompute (1 batch IS the full recompute)."""
    full = {
        tuple(r)
        for r in production.incremental_user_totals(spark, sf_dir, n_batches=1).collect()
    }
    for n in (3, 7):
        inc = {
            tuple(r)
            for r in production.incremental_user_totals(
                spark, sf_dir, n_batches=n
            ).collect()
        }
        assert inc == full
    assert len(full) > 0


def test_observe_metrics_single_row(spark, sf_dir):
    df = production.q_observe_metrics(spark, sf_dir)
    row = df.collect()[0]
    assert row["n_rows"] > 0
    assert row["n_null_flag"] == 0
    assert row["sum_price"] > 0.0
