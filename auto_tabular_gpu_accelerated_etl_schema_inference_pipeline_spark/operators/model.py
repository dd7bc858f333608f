"""Fitted-model persistence for the tokenizer — the reference's fitted
state (boundary tensor at etl_benchmark.py:74 / host_thresholds at
etl_benchmark_numba.py:62) dies with the process; a real pipeline fits
once and transforms many times across jobs, so the boundary vectors
(plus bin semantics metadata) persist as JSON.

State is KBs (bins+1 floats per column): save/load is driver-side file
IO; the loaded model broadcasts into the same map-only Bucketizer
transform. At 100 TB the model store would be object storage — the JSON
format is trivially portable.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from .quantile_bin import (
    DEFAULT_BINS,
    bucketize,
    bucketize_pandas_udf,
    fit_quantile_boundaries,
    fit_quantile_boundaries_sampled,
)

FORMAT_VERSION = 1


@dataclass
class QuantileBinModel:
    """Fit/transform split as a persistable model (scan -> fit -> save;
    later: load -> transform, no re-fit)."""

    bins: int = DEFAULT_BINS
    boundaries: dict[str, list[float]] = field(default_factory=dict)
    relative_error: float = 0.001
    fit_strategy: str = "sketch"

    @classmethod
    def fit(
        cls,
        df: DataFrame,
        cols: list[str],
        bins: int = DEFAULT_BINS,
        relative_error: float = 0.001,
        strategy: str = "sketch",
    ) -> "QuantileBinModel":
        if strategy == "sampled":
            bounds = fit_quantile_boundaries_sampled(df, cols, bins)
        else:
            bounds = fit_quantile_boundaries(df, cols, bins, relative_error)
        return cls(
            bins=bins,
            boundaries=bounds,
            relative_error=relative_error,
            fit_strategy=strategy,
        )

    def transform(
        self,
        df: DataFrame,
        keep_cols: list[str] | None = None,
        backend: str = "bucketizer",
    ) -> DataFrame:
        if backend == "pandas_udf":
            return bucketize_pandas_udf(df, self.boundaries, keep_cols=keep_cols)
        return bucketize(df, self.boundaries, keep_cols=keep_cols)

    def save(self, path: str) -> None:
        payload = {
            "format_version": FORMAT_VERSION,
            "bins": self.bins,
            "relative_error": self.relative_error,
            "fit_strategy": self.fit_strategy,
            "boundaries": self.boundaries,
        }
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(payload, f)

    @classmethod
    def load(cls, path: str) -> "QuantileBinModel":
        with open(path) as f:
            payload = json.load(f)
        if payload.get("format_version") != FORMAT_VERSION:
            raise ValueError(
                f"unsupported model format {payload.get('format_version')}"
            )
        return cls(
            bins=payload["bins"],
            boundaries={k: [float(x) for x in v] for k, v in payload["boundaries"].items()},
            relative_error=payload["relative_error"],
            fit_strategy=payload["fit_strategy"],
        )


# --- ML inference as pure SQL (operator fusion — the ICDE 2025
# "Machine Learning Inference Pipeline Execution Using Pure SQL"
# pattern applied to a fitted decision tree) -------------------------

#: a depth-3 tree over lineitem features, FITTED OFFLINE and shipped as
#: literals — inference is one fused CASE expression inside the scan
#: projection: zero UDF, zero model server, whole-stage codegen. Leaf
#: scores are the model's predicted return-rate (ppm).
TREE_LEAVES = {
    1: ("small_lowdisc", 240_000),
    2: ("small_discounted", 260_000),
    3: ("bulk_cheap", 250_000),
    4: ("bulk_mid", 245_000),
    5: ("bulk_large", 255_000),
}

_TREE_CASE = """
CASE
  WHEN l_quantity <= 25 THEN
    CASE WHEN CAST(round(l_discount * 100) AS INTEGER) <= 5
         THEN 1 ELSE 2 END
  ELSE
    CASE WHEN CAST(round(l_extendedprice * 100) AS BIGINT) <= 3000000
         THEN 3
         ELSE CASE WHEN l_quantity <= 40 THEN 4 ELSE 5 END
    END
END
"""


def q_decision_tree_calibration(spark, sf_dir: str):
    """Decision-tree INFERENCE in pure SQL + calibration audit: every
    lineitem routes through the fused CASE tree (see _TREE_CASE — the
    shipped model), then per leaf the PREDICTED return-rate ppm is laid
    next to the OBSERVED rate (returnflag = 'R' share, exact integer
    ppm) — the model-monitoring table that tells you which leaves have
    drifted. Inference is map-only inside the scan stage; the audit is
    one 5-group aggregate. At 100 TB this replaces a row-at-a-time
    model server with the scan itself — the operator-fusion argument."""
    from pyspark.sql import functions as F

    from ..session import configure_for_oracle, load_table

    configure_for_oracle(spark)
    li = load_table(spark, sf_dir, "lineitem")
    leaf_label = F.create_map(
        *[
            c
            for k, (label, _) in TREE_LEAVES.items()
            for c in (F.lit(k), F.lit(label))
        ]
    )
    leaf_score = F.create_map(
        *[
            c
            for k, (_, score) in TREE_LEAVES.items()
            for c in (F.lit(k), F.lit(score))
        ]
    )
    scored = li.select(
        F.expr(_TREE_CASE).alias("leaf_id"),
        (F.col("l_returnflag") == "R").cast("int").alias("is_return"),
    )
    agg = scored.groupBy("leaf_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("is_return").alias("n_returns"),
    )
    return agg.select(
        "leaf_id",
        leaf_label[F.col("leaf_id")].alias("leaf_label"),
        "n_rows",
        leaf_score[F.col("leaf_id")].cast("bigint").alias(
            "predicted_return_ppm"
        ),
        F.expr("n_returns * 1000000L div n_rows").alias(
            "observed_return_ppm"
        ),
    )


def _tree_oracle() -> str:
    label_case = " ".join(
        f"WHEN {k} THEN '{label}'" for k, (label, _) in TREE_LEAVES.items()
    )
    score_case = " ".join(
        f"WHEN {k} THEN {score}" for k, (_, score) in TREE_LEAVES.items()
    )
    return f"""
WITH scored AS (
  SELECT {_TREE_CASE} AS leaf_id,
    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS is_return
  FROM lineitem
), agg AS (
  SELECT leaf_id, count(*) AS n_rows,
    CAST(sum(is_return) AS BIGINT) AS n_returns
  FROM scored GROUP BY 1
)
SELECT leaf_id,
  CASE leaf_id {label_case} END AS leaf_label,
  n_rows,
  CAST(CASE leaf_id {score_case} END AS BIGINT) AS predicted_return_ppm,
  CAST(n_returns * 1000000 // n_rows AS BIGINT) AS observed_return_ppm
FROM agg
"""


QUERIES = {"decision_tree_calibration": q_decision_tree_calibration}
ORACLES = {"decision_tree_calibration": _tree_oracle()}
