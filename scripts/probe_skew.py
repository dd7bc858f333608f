"""Skewed-key scale probe — companion to the round-5 shuffle-heavy probe.

The r5 probe measured a both-sides-shuffled equi-join over 100x sf0.1
lineitem replicas (60 M rows) with a UNIFORM key and found ~10 M rows/s
through a full exchange. This probe re-runs the same join with a
Zipf-shaped key — one hot key owning ~20% of all rows — which is the one
scale risk the uniform probe can't see: at 100 TB a hot key turns one
reducer into the job's critical path unless the engine splits it.

Three measurements:
  uniform        — the r5 baseline shape (re-measured same host/session)
  skew_aqe_on    — hot key, AQE skew-join enabled (the production path);
                   asserts OptimizeSkewedJoin actually engaged
                   (skew=true in the final adaptive plan)
  skew_aqe_off   — hot key, skew-join disabled (the contrast: what the
                   hot reducer costs when nothing splits it)

Pass criterion (VERDICT r5 item 3): skew_aqe_on within ~2x uniform.

Usage: python scripts/probe_skew.py [replication]   (default 100)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_KEYS = 1_500_000  # distinct join keys at 100x (uniform ~40 rows/key)


def replicated_lineitem(spark: SparkSession, sf_dir: str, reps: int) -> DataFrame:
    """100x the sf0.1 lineitem via explode(sequence) — the same
    replication the r5 scale probes used (no driver loop, no unionAll
    chain; one narrow map stage)."""
    base = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    # the fixture is ONE parquet row group = one map task; AQE splits a
    # skewed reduce partition at MAP-output boundaries, so a hot key fed
    # by a single mapper is unsplittable no matter its size (measured:
    # 37.6 MB hot partition, "number of skewed partitions: left 0").
    # Fan the 600 k-row base out to 32 mappers first — at 100 TB the
    # scan stage has thousands of map tasks and this is the native
    # shape; the fixture needs it made explicit.
    return base.repartition(32).withColumn(
        "rep", F.explode(F.sequence(F.lit(1), F.lit(reps)))
    )


def keyed(df: DataFrame, n_keys: int, hot_fraction_inv: int | None) -> DataFrame:
    """Attach the join key and an 8-byte high-entropy payload.
    hot_fraction_inv=None -> uniform over n_keys; hot_fraction_inv=5 ->
    a deterministic 1/5 (20%) of rows all land on key 0 (the Zipf
    head), the rest stay uniform.

    The payload is load-bearing for the probe's honesty: a hot
    partition whose rows are (constant key, low-entropy quantity)
    lz4-compresses so well in the shuffle that its BYTE size ducks
    under AQE's byte-based skew detection even at 17x the median row
    count — measured on this host: 12.75 M-row hot partition, no
    skew=true at a 10 MB threshold. Real rows carry real payloads;
    8 incompressible bytes/row makes shuffle bytes track row counts the
    way production data does."""
    uniform = F.pmod(
        F.xxhash64(F.col("l_orderkey"), F.col("rep")), F.lit(n_keys)
    ).alias("k")
    payload = F.xxhash64(
        F.col("l_orderkey"), F.col("l_partkey"), F.col("rep")
    ).alias("payload")
    if hot_fraction_inv is None:
        return df.select(uniform, F.col("l_quantity").alias("v"), payload)
    hot = F.pmod(
        F.xxhash64(F.col("l_partkey"), F.col("rep"), F.lit(42)),
        F.lit(hot_fraction_inv),
    ) == 0
    return df.select(
        F.when(hot, F.lit(0)).otherwise(uniform).alias("k"),
        F.col("l_quantity").alias("v"),
        payload,
    )


def dim_side(spark: SparkSession, n_keys: int) -> DataFrame:
    """Right side sized past any broadcast threshold so the join is a
    genuine both-sides exchange (broadcast additionally disabled in
    run())."""
    return spark.range(n_keys).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("w")
    )


def shuffle_join_agg(left: DataFrame, right: DataFrame) -> DataFrame:
    # pmod AFTER the join so the full-entropy payload is what shuffles
    # (and so its sum stays inside BIGINT under ANSI arithmetic)
    return left.join(right, "k").groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v") + F.col("w")).alias("s"),
        F.sum(F.pmod(F.col("payload"), F.lit(1_000_000))).alias("p"),
    )


def run(reps: int) -> dict:
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.driver.memory", "48g")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        # thresholds floored proportionally to the probe's data size:
        # shuffle blocks are lz4-compressed, so the hot partition's 12 M
        # rows land ~tens of MB on disk vs ~2-4 MB for healthy ones —
        # 10 MB sits between them. The pinned test's discipline: at
        # real scale the defaults (256 MB / factor 5) make the same
        # decision on the same shape
        .config(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "10MB",
        )
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    results: dict = {"reps": reps, "n_keys": N_KEYS}
    big_uniform = keyed(replicated_lineitem(spark, SF_DIR, reps), N_KEYS, None)
    big_skew = keyed(replicated_lineitem(spark, SF_DIR, reps), N_KEYS, 5)
    dim = dim_side(spark, N_KEYS)

    # warm the JVM + page cache off the clock (r5 probe protocol)
    big_uniform.count()

    def timed(name: str, left: DataFrame, skew_join: bool) -> None:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", str(skew_join).lower()
        )
        q = shuffle_join_agg(left, dim)
        t0 = time.time()
        row = q.collect()[0]
        wall = time.time() - t0
        plan = q._jdf.queryExecution().executedPlan().toString()
        results[name] = {
            "sec": round(wall, 2),
            "rows_joined": row["n"],
            "skew_split_engaged": "skew=true" in plan,
        }
        print(f"{name}: {wall:.2f}s rows={row['n']} "
              f"skew_split={'skew=true' in plan}", flush=True)

    timed("uniform", big_uniform, skew_join=True)
    timed("skew_aqe_on", big_skew, skew_join=True)
    timed("skew_aqe_off", big_skew, skew_join=False)
    results["skew_on_vs_uniform"] = round(
        results["skew_aqe_on"]["sec"] / results["uniform"]["sec"], 2
    )
    # The probe's contract, enforced: a run where the split never
    # engaged measured an UNSPLIT hot key — timings would be
    # pass-shaped noise, not evidence. Fail loudly instead.
    assert results["skew_aqe_on"]["skew_split_engaged"], (
        "AQE skew split did not engage on the skewed run — "
        "thresholds vs partition bytes need re-derivation (see the "
        "payload/mapper-boundary notes above)"
    )
    assert not results["skew_aqe_off"]["skew_split_engaged"], (
        "skew split engaged with skewJoin.enabled=false — conf not applied"
    )
    return results


if __name__ == "__main__":
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    out = run(reps)
    print(json.dumps(out))
