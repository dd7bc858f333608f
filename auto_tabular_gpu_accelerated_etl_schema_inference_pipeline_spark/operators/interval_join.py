"""Bucketized point-in-interval join — the scalable plan for interval
joins WITHOUT an equi key.

The reference has no joins at all (SURVEY.md §2.2); timeseries.py's
events_range_join covers the interval join that HAS a user equi-key. This
module covers the harder shape (IP-range lookup, geo tiles, calendar
windows): every point must be tested against every interval, which Spark
plans as a BroadcastNestedLoopJoin — fine only while one side broadcasts.

The scale path implemented here turns the non-equi predicate into an
equi-join: pick a bucket width >= the maximum interval length, explode
each interval to the (<= 2) buckets it overlaps, tag each point with its
single bucket, equi-join on the bucket, then verify exact containment
with a cheap residual filter. Correctness is bucket-width-independent (a
point and an interval that overlap ALWAYS share the point's bucket when
width >= max interval length — the interval cannot skip over it); the
width only tunes fan-out (explode factor <= 2) vs selectivity of the
residual filter. No duplicate matches: a point lives in exactly one
bucket and an interval's exploded bucket rows are distinct.

At fixture scale the interval side also happens to broadcast; at 100 TB
both sides stay distributed and the bucket equi-join shuffles fixed-width
(bucket, key) pairs — no nested loop anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import configure_for_oracle, load_table

_US_PER_DAY = 86_400_000_000


def bucketized_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Inner-join `points` to every interval with start <= point <= end
    (integer units), via bucket-expansion equi-join. `bucket_width` must
    be >= the maximum interval length (end - start + 1)."""
    ivx = intervals.withColumn(
        "_bk",
        F.explode(
            F.expr(
                f"sequence({start_col} div {bucket_width},"
                f" {end_col} div {bucket_width})"
            )
        ),
    )
    pts = points.withColumn("_bk", F.expr(f"{point_col} div {bucket_width}"))
    return (
        pts.join(ivx, "_bk")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("_bk")
    )


#: orders above this total define the interval side; window is the 3-day
#: span [orderdate, orderdate + 2] in epoch days.
BIG_ORDER_THRESHOLD = 450_000
WINDOW_DAYS = 3
_BUCKET_DAYS = 4  # >= WINDOW_DAYS, so each interval overlaps <= 2 buckets


def _epoch_day(col: str) -> Column:
    # TPC-H date columns land as TIMESTAMP_NTZ (midnight-valued); the
    # date cast truncates without any timezone shift on either engine.
    return F.expr(f"datediff(cast({col} as date), date'1970-01-01')").cast(
        "long"
    )


def q_interval_bucket_join_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """For each high-value order, count ALL lineitems (any order) shipped
    during the 3 days starting at its order date — a keyless calendar-
    window join ("what shipped fleet-wide while this order was placed"),
    executed as the bucketized equi-join, never a nested loop."""
    configure_for_oracle(spark)
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    iv = orders.filter(F.col("o_totalprice") > BIG_ORDER_THRESHOLD).select(
        "o_orderkey",
        _epoch_day("o_orderdate").alias("sd"),
        (_epoch_day("o_orderdate") + F.lit(WINDOW_DAYS - 1)).alias("ed"),
    )
    pts = li.select(
        "l_quantity", _epoch_day("l_shipdate").alias("pd")
    )
    joined = bucketized_interval_join(pts, iv, "pd", "sd", "ed", _BUCKET_DAYS)
    return joined.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n_shipped"),
        F.round(F.sum("l_quantity"), 0).cast("bigint").alias("qty_shipped"),
    )


_INTERVAL_ORACLE = f"""
WITH iv AS (
  SELECT o_orderkey,
    epoch_us(o_orderdate) // {_US_PER_DAY} AS sd,
    epoch_us(o_orderdate) // {_US_PER_DAY} + {WINDOW_DAYS - 1} AS ed
  FROM orders WHERE o_totalprice > {BIG_ORDER_THRESHOLD}
)
SELECT o_orderkey, count(*) AS n_shipped,
  CAST(round(sum(l_quantity), 0) AS BIGINT) AS qty_shipped
FROM iv JOIN lineitem
  ON (epoch_us(l_shipdate) // {_US_PER_DAY}) BETWEEN sd AND ed
GROUP BY o_orderkey
"""


QUERIES = {"interval_bucket_join_orders": q_interval_bucket_join_orders}
ORACLES = {"interval_bucket_join_orders": _INTERVAL_ORACLE}
