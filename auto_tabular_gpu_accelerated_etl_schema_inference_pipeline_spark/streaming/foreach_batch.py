"""foreachBatch sink: the production pattern for streaming into systems
without a native streaming writer (JDBC, key-value stores, table formats
before their streaming API) — each micro-batch arrives as a regular
DataFrame and the callback runs arbitrary BATCH logic on it.

Pattern here: raw event stream -> per-batch partial aggregate -> MERGE
into an accumulating per-user totals table (read target, full-outer
join, add, atomic-rename overwrite). That is the classic incremental
rollup: state lives in the TARGET TABLE, not the stream's state store,
so the stream carries no aggregation state at all (contrast
streaming/stateful.py where Spark's state store holds it).

Semantics note a reviewer should see: foreachBatch gives at-least-once
delivery — a batch can be re-run after a crash. Production pairs the
merge with the callback's ``batch_id`` (stored in the target, skip if
already applied) or a transactional sink (Delta MERGE) for effective
exactly-once; the bounded fixture drain never replays, and the oracle
equality below proves the merge arithmetic itself.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import configure_for_oracle


def _merge_batch(target_dir: str, spark: SparkSession):
    """Returns the foreachBatch callback closing over the target table
    location. Additive merge keyed on user_id."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        part = (
            batch_df.groupBy("user_id")
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.col("value").cast("decimal(12,2)")).alias("sum_value"),
            )
        )
        cur_path = os.path.join(target_dir, "current")
        if os.path.exists(cur_path):
            cur = spark.read.parquet(cur_path)
            merged = (
                cur.join(part, "user_id", "full_outer")
                .select(
                    "user_id",
                    (
                        F.coalesce(cur["n_events"], F.lit(0))
                        + F.coalesce(part["n_events"], F.lit(0))
                    ).alias("n_events"),
                    (
                        F.coalesce(cur["sum_value"], F.lit(0).cast("decimal(12,2)"))
                        + F.coalesce(part["sum_value"], F.lit(0).cast("decimal(12,2)"))
                    ).cast("decimal(12,2)").alias("sum_value"),
                )
            )
        else:
            merged = part.select(
                "user_id", "n_events", F.col("sum_value").cast("decimal(12,2)")
            )
        # write-new-then-rename: readers of `current` never see a partial
        # table (poor man's transactional commit; Delta/Iceberg replace
        # this dance with a real one)
        new_path = os.path.join(target_dir, f"v{batch_id}")
        merged.write.mode("overwrite").parquet(new_path)
        old = os.path.join(target_dir, "prev")
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(cur_path):
            os.rename(cur_path, old)
        os.rename(new_path, cur_path)

    return apply


def run_foreach_batch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the bounded events stream through the merge sink; return the
    final target table (decimal partials widened to double at the end —
    the cross-engine-exact pattern used by incremental_user_totals)."""
    configure_for_oracle(spark)
    from .windows import _events_stream

    ev = _events_stream(spark, sf_dir).select("user_id", "value")
    target_dir = tempfile.mkdtemp(prefix="febatch_target_")
    ckpt = os.path.join(target_dir, "ckpt")
    q = (
        ev.writeStream.foreachBatch(_merge_batch(target_dir, spark))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
    out = (
        spark.read.parquet(os.path.join(target_dir, "current"))
        .select(
            "user_id",
            "n_events",
            F.round(F.col("sum_value").cast("double"), 2).alias("sum_value"),
        )
        # materialize before the temp dir can be cleaned up
        .localCheckpoint()
    )
    shutil.rmtree(target_dir, ignore_errors=True)
    return out


def q_streaming_foreach_batch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_foreach_batch_upsert(spark, sf_dir)


QUERIES = {"streaming_foreach_batch_upsert": q_streaming_foreach_batch_upsert}

ORACLES = {
    "streaming_foreach_batch_upsert": """
SELECT user_id, count(*) AS n_events,
  round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_value
FROM events
GROUP BY user_id
""",
}
