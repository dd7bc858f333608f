"""Bench-context repro probe for the quantile_bin_pandas_udf anomaly
(VERDICT r12 item 5).

Observation under test: across r10-r12 the lane intermittently reads
~12 s INSIDE the full bench (at every SF, even sf0.001 with 600 rows)
while solo runs are 0.8-1.1 s steady — i.e. the cost is a fixed
overhead that appears only in a grown JVM, not data volume. Hypotheses:

  H1 Python-worker-pool effects: the lane is the first/heaviest
     ArrowEvalPython consumer after dozens of JVM-only queries; its
     workers must be forked + import numpy/pandas at that point, and a
     grown, fragmented JVM + page-cache-churned box makes those forks
     slow. (spark.python.worker.reuse is already true — the default —
     so reuse-class configs have no remaining headroom.)
  H2 Pure host weather coinciding with the lane's slot in the suite.

Method: one bench-style session (get_spark, the bench warmup), then:
  phase A  run the first N (default 30) HEADLINE queries exactly as
           bench.py runs them (noop sink) to reproduce the grown-JVM
           state;
  phase B  time quantile_bin_pandas_udf x RUNS in that state,
           bracketed by the CPU gauge;
  phase C  time a JVM-only control lane (tpch_q6) the same way — if B
           is slow and C is not, the overhead is Python-boundary-
           specific (H1); if both are slow it is weather (H2);
  phase D  for H1 attribution, time a MINIMAL ArrowEvalPython job
           (trivial pandas_udf over 1k rows) BEFORE and AFTER phase B:
           the first Arrow job in the grown JVM pays the worker-pool
           spawn; the second shows the steady floor.

Writes PROBE_BENCH_CONTEXT_r13.json. Solo numbers for the same lane
come from scripts/solo_bench.py (fresh JVM) for comparison.

Usage: python scripts/probe_bench_context.py [n_prefix]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_SOLO_RUNS", "3"))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cpu_gauge(spark) -> float:
    t0 = time.perf_counter()
    spark.range(2_000_000_000).selectExpr("max(xxhash64(id))").collect()
    return round(time.perf_counter() - t0, 4)


def _arrow_micro(spark) -> float:
    """Minimal ArrowEvalPython job: isolates Python-worker spawn +
    Arrow init from any real query logic. The udf is built via the
    shared kernels module — this script carries ``from __future__
    import annotations``, under which pandas_udf type-hint inference
    fails (the repo-wide gotcha; kernels live hint-free)."""
    from pyspark.sql import functions as F

    from auto_tabular_gpu_accelerated_etl_schema_inference_pipeline_spark.functions.udf_kernels import (
        probe_plus1_pandas_udf,
    )

    t0 = time.perf_counter()
    spark.range(1000).select(
        probe_plus1_pandas_udf()(F.col("id").cast("double"))
    ).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 4)


def main(argv: list[str]) -> int:
    n_prefix = int(argv[0]) if argv else 30
    from auto_tabular_gpu_accelerated_etl_schema_inference_pipeline_spark import (
        get_spark,
        load_table,
    )
    import __spark_entry__ as entrymod
    from bench import HEADLINE

    spark = get_spark(app_name="probe_bench_context")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    load_table(spark, SF_DIR, "lineitem").limit(1000).count()

    out: dict = {"sf": SF_DIR, "n_prefix": n_prefix}
    out["calib_cpu_start"] = _cpu_gauge(spark)

    queries = entrymod.queries()

    # phase A: grow the JVM exactly as bench.py does
    t0 = time.perf_counter()
    ran = 0
    for name in HEADLINE[:n_prefix]:
        fn = queries.get(name)
        if fn is None or name == "quantile_bin_pandas_udf":
            continue
        spark.sparkContext.setJobDescription(f"probe prefix: {name}")
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        ran += 1
    out["prefix_ran"] = ran
    out["prefix_total_s"] = round(time.perf_counter() - t0, 4)

    # phase D pre: first trivial Arrow job in the grown JVM
    spark.sparkContext.setJobDescription("probe: arrow micro (pre)")
    out["arrow_micro_pre"] = _arrow_micro(spark)

    # phase B: the lane, in-context
    fn = queries["quantile_bin_pandas_udf"]
    runs = []
    for i in range(RUNS):
        spark.sparkContext.setJobDescription(
            f"probe: quantile_bin_pandas_udf run {i}"
        )
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 4))
    out["lane_in_context_runs"] = runs

    # phase C: JVM-only control in the same state
    ctrl = queries["tpch_q6"]
    cruns = []
    for i in range(RUNS):
        spark.sparkContext.setJobDescription(f"probe: tpch_q6 control {i}")
        t0 = time.perf_counter()
        ctrl(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        cruns.append(round(time.perf_counter() - t0, 4))
    out["control_tpch_q6_runs"] = cruns

    # phase D post: steady Arrow floor
    spark.sparkContext.setJobDescription("probe: arrow micro (post)")
    out["arrow_micro_post"] = _arrow_micro(spark)
    out["calib_cpu_end"] = _cpu_gauge(spark)

    path = os.path.join(REPO, "PROBE_BENCH_CONTEXT_r13.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps(out, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
