"""Deterministic sketch structures built as plain aggregations — the
engine-portable complement to Spark's built-in sketches
(approx_count_distinct / percentile_approx / approx_top_k, which are
rows-only at the gate because their HLL/KLL internals are
Spark-specific). A count-min sketch built from md5-derived hashes is
bit-reproducible on ANY engine, so the sketch itself — not just its
estimates — is oracle-verifiable.

Scale design: the build is ONE groupBy over (depth, bucket) — d·w
counters total (4×64 here), mergeable across partitions/days by simple
addition (the CMS linearity property a 100 TB rollup pipeline exploits:
sketch(day1+day2) = sketch(day1) + sketch(day2)). The estimate pass
broadcasts the tiny counter table; queries never rescan raw data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import configure_for_oracle, load_events

CMS_DEPTH = 4
CMS_WIDTH = 64
CMS_PROBE_K = 10


def _bucket_expr(depth_col: str, key_col: str) -> str:
    """Engine-portable hash bucket: md5 of 'depth:key', first 8 hex
    chars as an int, mod width. Identical in DuckDB via the same string
    construction."""
    return (
        f"cast(conv(substring(md5(concat(cast({depth_col} as string), ':', "
        f"cast({key_col} as string))), 1, 8), 16, 10) as bigint) % {CMS_WIDTH}"
    )


def q_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over events.user_id, probed at the exact top-10
    users: per key the true count and the CMS estimate (min over the 4
    hashed counters — always >= true, the CMS guarantee, pinned by a
    property test). Both the counters and the probes are deterministic,
    so the whole structure is value-verified cross-engine."""
    configure_for_oracle(spark)
    ev = load_events(spark, sf_dir)
    keyed = ev.select(F.col("user_id").cast("string").alias("k"))
    depths = keyed.select(
        "k", F.explode(F.array(*[F.lit(i) for i in range(CMS_DEPTH)])).alias("d")
    )
    counters = depths.groupBy(
        "d", F.expr(_bucket_expr("d", "k")).alias("b")
    ).agg(F.count(F.lit(1)).alias("cnt"))

    top = (
        keyed.groupBy("k")
        .agg(F.count(F.lit(1)).alias("true_n"))
        .orderBy(F.col("true_n").desc(), F.col("k").asc())
        .limit(CMS_PROBE_K)
    )
    probes = top.select(
        "k",
        "true_n",
        F.explode(F.array(*[F.lit(i) for i in range(CMS_DEPTH)])).alias("d"),
    ).withColumn("b", F.expr(_bucket_expr("d", "k")))
    return (
        probes.join(F.broadcast(counters), ["d", "b"])
        .groupBy("k", "true_n")
        .agg(F.min("cnt").alias("cms_estimate"))
        .select(
            F.col("k").cast("bigint").alias("user_id"),
            "true_n",
            "cms_estimate",
        )
    )


_CMS_BUCKET_SQL = (
    "(('0x' || substr(md5(CAST(d AS VARCHAR) || ':' || k), 1, 8))::BIGINT) "
    f"% {CMS_WIDTH}"
)

_CMS_ORACLE = f"""
WITH keyed AS (
  SELECT CAST(user_id AS VARCHAR) AS k FROM events
), depths AS (
  SELECT k, unnest(generate_series(0, {CMS_DEPTH - 1})) AS d FROM keyed
), counters AS (
  SELECT d, {_CMS_BUCKET_SQL} AS b, count(*) AS cnt
  FROM depths GROUP BY 1, 2
), top AS (
  SELECT k, count(*) AS true_n FROM keyed GROUP BY k
  ORDER BY true_n DESC, k ASC LIMIT {CMS_PROBE_K}
), probes AS (
  SELECT k, true_n, unnest(generate_series(0, {CMS_DEPTH - 1})) AS d
  FROM top
)
SELECT CAST(p.k AS BIGINT) AS user_id, p.true_n,
  min(c.cnt) AS cms_estimate
FROM (SELECT k, true_n, d, {_CMS_BUCKET_SQL} AS b FROM probes) p
JOIN counters c ON p.d = c.d AND p.b = c.b
GROUP BY p.k, p.true_n
"""


QUERIES = {"count_min_sketch": q_count_min_sketch}
ORACLES = {"count_min_sketch": _CMS_ORACLE}
