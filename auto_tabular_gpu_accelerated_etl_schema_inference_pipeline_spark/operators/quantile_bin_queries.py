"""queries()/oracle_sql() entries for the quantile-bin tokenizer
(reference O4-O9 — SURVEY.md §2.1)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import configure_for_oracle, load_table
from .quantile_bin import (
    LINEITEM_KEYS,
    LINEITEM_MEASURES,
    exact_quantile_bin,
    tokenize_table,
)


def q_quantile_bin_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equal-count binning (ntile semantics) of lineitem measures.

    Deterministic under ties: the window sort is extended to a total
    order with (l_orderkey, l_linenumber), matching the oracle's ORDER BY
    exactly. This is the oracle-grade variant of the reference's
    pd.qcut loop (etl_benchmark.py:30-34)."""
    configure_for_oracle(spark)
    df = load_table(spark, sf_dir, "lineitem")
    return exact_quantile_bin(
        df, LINEITEM_MEASURES, bins=100, keys=LINEITEM_KEYS, tiebreak=LINEITEM_KEYS
    )


def q_quantile_bin_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group exact binning: 10 equal-count price bins WITHIN each
    (l_returnflag, l_linestatus) segment via a PARTITIONED ntile window —
    the distributed exact lane (shuffle on the group key, per-group local
    sort; no single-partition window)."""
    from .quantile_bin import exact_quantile_bin_grouped

    configure_for_oracle(spark)
    df = load_table(spark, sf_dir, "lineitem")
    return exact_quantile_bin_grouped(
        df,
        group_cols=["l_returnflag", "l_linestatus"],
        cols=["l_extendedprice"],
        bins=10,
        tiebreak=LINEITEM_KEYS,
        keys=LINEITEM_KEYS,
    )


def q_quantile_bin_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-fit + Bucketizer transform — the 100 TB path (approx
    boundary placement on tied data ⇒ rows-only check, SURVEY §7)."""
    configure_for_oracle(spark)
    df = load_table(spark, sf_dir, "lineitem")
    return tokenize_table(
        df, cols=LINEITEM_MEASURES, keep_cols=LINEITEM_KEYS, relative_error=0.001
    )


def q_quantile_bin_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized searchsorted lane (the reference's GPU-kernel port;
    parity with the Bucketizer lane is covered in tests)."""
    configure_for_oracle(spark)
    df = load_table(spark, sf_dir, "lineitem")
    return tokenize_table(
        df,
        cols=LINEITEM_MEASURES,
        keep_cols=LINEITEM_KEYS,
        relative_error=0.001,
        backend="pandas_udf",
    )


def q_quantile_bin_exact_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boundary-path semantics proven against the oracle: exact SQL
    ``percentile`` fit (bit-identical to DuckDB ``quantile_cont`` — both
    Type-7 linear interpolation) + Bucketizer transform, mirrored in SQL
    by counting interior boundaries <= v. This gives the SCALABLE lane's
    semantics an oracle (the ntile oracle only covers the exact lane);
    the sketch-fit variant differs solely in boundary placement."""
    from .quantile_bin import bucketize, fit_quantile_boundaries

    configure_for_oracle(spark)
    df = load_table(spark, sf_dir, "lineitem")
    bounds = fit_quantile_boundaries(df, LINEITEM_MEASURES, bins=100, relative_error=0.0)
    # Round boundaries to 6dp before dedupe (mirrored in the oracle):
    # interpolated quantiles differ between engines in final ulps, which
    # makes the DEDUPED interior lists differ in LENGTH on low-cardinality
    # columns (discount/tax). With 2dp data, 6dp-rounded boundaries are
    # either exact data values (unchanged) or strictly between adjacent
    # 2dp values — so no comparison b <= v can flip.
    bounds = {c: [round(x, 6) for x in v] for c, v in bounds.items()}
    return bucketize(df, bounds, keep_cols=LINEITEM_KEYS)


def q_tokenize_generated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference workload end-to-end (O1->O9): generate the randn table
    with spark.range+randn, fit, bucketize. Rows-only (synthetic input is
    engine-side, not a driver view)."""
    from ..sources.generator import generate_normal_table

    df = generate_normal_table(spark, rows=100_000, cols=8, seed=42)
    return tokenize_table(df, relative_error=0.001)


_NTILE_COLS = ",\n  ".join(
    f"CAST(ntile(100) OVER (ORDER BY {c}, l_orderkey, l_linenumber) - 1 AS INTEGER)"
    f" AS {c}_bin"
    for c in LINEITEM_MEASURES
)

_PROBS = ",".join(str(i / 100) for i in range(101))
_BND_COLS = ",\n    ".join(
    f"list_sort(list_distinct(list_transform("
    f"list_slice(quantile_cont({c}, [{_PROBS}]), 2, 100), x -> round(x, 6)))) AS b_{c}"
    for c in LINEITEM_MEASURES
)
_BIN_COLS = ",\n  ".join(
    f"CAST(len(list_filter(b.b_{c}, x -> x <= t.{c})) AS INTEGER) AS {c}_bin"
    for c in LINEITEM_MEASURES
)

def q_quantile_bin_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-Arrow kernel lane (mapInArrow — no pandas layer; see
    bucketize_map_in_arrow). Rows-only like the other approx-fit lanes;
    parity with the Bucketizer lane incl. NaN/null is test-pinned."""
    from .quantile_bin import bucketize_map_in_arrow, fit_quantile_boundaries

    configure_for_oracle(spark)
    df = load_table(spark, sf_dir, "lineitem")
    bounds = fit_quantile_boundaries(
        df, LINEITEM_MEASURES, bins=100, relative_error=0.001
    )
    return bucketize_map_in_arrow(df, bounds, keep_cols=LINEITEM_KEYS)


QUERIES = {
    "quantile_bin_per_group": q_quantile_bin_per_group,
    "quantile_bin_lineitem": q_quantile_bin_lineitem,
    "quantile_bin_map_in_arrow": q_quantile_bin_map_in_arrow,
    "quantile_bin_exact_boundaries": q_quantile_bin_exact_boundaries,
    "quantile_bin_scalable": q_quantile_bin_scalable,
    "quantile_bin_pandas_udf": q_quantile_bin_pandas_udf,
    "tokenize_generated": q_tokenize_generated,
}

ORACLES = {
    "quantile_bin_per_group": """
SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus,
  CAST(ntile(10) OVER (PARTITION BY l_returnflag, l_linestatus
                       ORDER BY l_extendedprice, l_orderkey, l_linenumber)
       - 1 AS INTEGER) AS l_extendedprice_bin
FROM lineitem
""",
    "quantile_bin_lineitem": f"""
SELECT l_orderkey, l_linenumber,
  {_NTILE_COLS}
FROM lineitem
""",
    "quantile_bin_exact_boundaries": f"""
WITH b AS (
  SELECT
    {_BND_COLS}
  FROM lineitem
)
SELECT t.l_orderkey, t.l_linenumber,
  {_BIN_COLS}
FROM lineitem t, b
""",
}
