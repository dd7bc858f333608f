"""Skew-handling join utilities (SURVEY.md §4: the reference is a
single-box engine with no shuffle at all; at 100 TB a skewed join key is
the classic cluster-killer, handled here by salting — the manual
complement to AQE's skewJoin, for when the skew is known ahead of time).

Salted join: the large side appends a uniform salt in [0, n_salt); the
small side is replicated n_salt times; the join key becomes
(key, salt), so one hot key's rows spread over n_salt reducers instead
of one. Exact same result set as the unsalted join (replication x
partition-of-one-side preserves the join semantics for inner/left
joins on equi-keys)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    n_salt: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join `large ⋈ small` on column `on`, salted n_salt ways.

    The salt on the large side is derived from rand(seed) — uniform,
    cheap, and independent of the key (a key-derived salt would re-create
    the hotspot). The small side is exploded once per salt value; its
    size multiplies by n_salt, so keep small genuinely small or
    broadcast it."""
    salted_large = large.withColumn(
        "_salt", F.floor(F.rand(seed) * n_salt).cast("int")
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = salted_large.join(salted_small, [on, "_salt"], how)
    return out.drop("_salt")


def q_join_skew_salted(spark, sf_dir: str):
    """Salted fact-dim join registered as a first-class query: events
    (large, user_id moderately hot) x per-user dim from customer, salted
    8 ways, then aggregated by market segment. The salt is provably
    result-neutral — the oracle is the PLAIN join's aggregate."""
    from ..session import configure_for_oracle, load_events, load_table

    configure_for_oracle(spark)
    ev = load_events(spark, sf_dir).select("user_id", "value")
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(ev, dim, "user_id", n_salt=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
    )


QUERIES = {"join_skew_salted": q_join_skew_salted}

ORACLES = {
    "join_skew_salted": """
SELECT c.c_mktsegment,
  count(*) AS n_events,
  CAST(sum(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
""",
}
