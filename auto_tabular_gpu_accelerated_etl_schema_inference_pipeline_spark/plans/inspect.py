"""Physical-plan inspection utilities: assert that the plan Catalyst
produced is the plan we designed for scale — filters pushed into the
parquet scan, projections pruned, small sides broadcast, no accidental
single-partition windows in scalable paths.

These guards are the engine's answer to "would this survive a 100x
scale-up?": the properties they check are exactly the ones that decide
whether a stage is map-only or a full-table shuffle at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filters(df: DataFrame, fragment: str) -> None:
    """The filter must reach the parquet reader (PushedFilters), not run
    post-scan: at 100 TB pushdown is the difference between reading row
    groups and skipping them via min/max stats."""
    plan = formatted_plan(df)
    assert "PushedFilters: [" in plan, f"no pushed filters in plan:\n{plan}"
    assert fragment in plan, f"expected pushed filter {fragment!r} in plan:\n{plan}"


def assert_read_schema_pruned(df: DataFrame, max_cols: int) -> None:
    """Column pruning must reach the scan: ReadSchema lists every column
    physically read."""
    plan = formatted_plan(df)
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, f"no ReadSchema in plan:\n{plan}"
    ncols = len([c for c in m.group(1).split(",") if c.strip()])
    assert ncols <= max_cols, (
        f"scan reads {ncols} columns, expected <= {max_cols}:\n{m.group(1)}"
    )


def assert_broadcast_join(df: DataFrame, min_count: int = 1) -> None:
    """Dimension joins must be BroadcastHashJoin — a shuffle of the fact
    table on a dimension key is the classic 100 TB mistake."""
    plan = formatted_plan(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= min_count, f"expected >= {min_count} broadcast joins, got {n}:\n{plan}"


def assert_no_single_partition_window(df: DataFrame) -> None:
    """Scalable paths must not contain a global (non-partitioned) window
    — Window.orderBy without partitionBy funnels the table through one
    task."""
    plan = formatted_plan(df)
    assert "SinglePartition" not in plan, (
        f"plan funnels data through a single partition:\n{plan}"
    )


def assert_whole_stage_codegen(df: DataFrame) -> None:
    """The hot path should be inside WholeStageCodegen spans (JVM-fused),
    not interpreted row-by-row. Codegen-mode explain compiles the plan
    and reports the subtree count without executing (AQE hides codegen
    ids in formatted mode until finalization)."""
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "codegen"
    )
    assert "Found" in plan and "WholeStageCodegen" in plan, (
        f"no codegen subtrees:\n{plan[:2000]}"
    )


def assert_bloom_filter_pruning(df: DataFrame) -> None:
    """A runtime bloom-filter (row-level runtime filter) must be injected
    on the fact-side scan: the build side aggregates a bloom_filter_agg
    over its join keys, the probe side filters rows through
    might_contain BEFORE the shuffle — at 100 TB this prunes most of the
    shuffle write when the dimension filter is selective but the join is
    too big to broadcast."""
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "might_contain" in plan and "bloom_filter_agg" in plan, (
        f"no runtime bloom filter in plan:\n{plan[:2000]}"
    )
