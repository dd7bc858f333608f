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
