"""Central registry mapping query names -> (Spark callable, DuckDB oracle).

Each operator module exposes ``QUERIES: dict[str, callable]`` (callable
takes ``(spark, sf_dir)`` and returns a DataFrame) and ``ORACLES:
dict[str, str]`` (ANSI SQL DuckDB runs on the same parquet views). A
query present in QUERIES but absent from ORACLES gets the driver's weaker
rows-only check (reserved for approximate / non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

_MODULES = [
    "operators.quantile_bin_queries",
    "operators.relational",
    "operators.relational_ext",
    "operators.relational_ext2",
    "operators.tpch_more",
    "operators.tpch_deep",
    "operators.cdc",
    "operators.text",
    "operators.dedup",
    "operators.graph",
    "operators.variant_json",
    "operators.similarity",
    "operators.timeseries",
    "operators.asof_pandas",
    "operators.schema_infer",
    "operators.multimodal",
    "operators.production",
    "operators.udtf_queries",
    "operators.llm_prep",
    "operators.llm_prep2",
    "streaming.windows",
    "streaming.stateful",
    "streaming.stateful_v2",
    "streaming.foreach_batch",
    "streaming.joins",
    "streaming.enrich",
    "functions.skew",
    "pipelines",
]

_PKG = __name__.rsplit(".", 1)[0]


def _modules():
    mods = []
    for m in _MODULES:
        try:
            mods.append(import_module(f"{_PKG}.{m}"))
        except ImportError:
            continue  # module not built yet — registry grows as we build
    return mods


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        for name, fn in getattr(mod, "QUERIES", {}).items():
            assert name not in out, f"duplicate query name {name}"
            out[name] = fn
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(getattr(mod, "ORACLES", {}))
    return out
