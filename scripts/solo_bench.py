"""Solo adjudication timer — the established x3-on-a-quiet-host protocol
for bench-tail regressions (VERDICT r4/r5): time named registry queries
in a fresh bench-style session, 3 runs each, with the same host-weather
calibration gauges bench.py records so a slow number can be attributed
to the host or to the code.

Usage: python scripts/solo_bench.py auto_tokenize_lineitem rare_level_collapse
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_SOLO_RUNS", "3"))


def main(names: list[str]) -> None:
    from auto_tabular_gpu_accelerated_etl_schema_inference_pipeline_spark import (
        get_spark,
        load_table,
    )
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="solo_bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup
    load_table(spark, SF_DIR, "lineitem").limit(1000).count()

    out: dict = {"sf": SF_DIR}
    t0 = time.perf_counter()
    spark.range(2_000_000_000).selectExpr("max(xxhash64(id))").collect()
    out["calib_cpu_parallel"] = round(time.perf_counter() - t0, 4)
    t0 = time.perf_counter()
    spark.range(200_000_000).selectExpr("xxhash64(id) AS k").sortWithinPartitions(
        "k"
    ).write.format("noop").mode("overwrite").save()
    out["calib_mem_bandwidth"] = round(time.perf_counter() - t0, 4)
    # disk cold-read gauge (bench.py's third gauge, r11): adjudicates
    # IO-bound flags that neither CPU nor in-memory bandwidth explains;
    # shared helper = per-run tempfile + try/finally (ADVICE r11)
    from bench import disk_cold_read_gauge

    out["calib_disk_cold_read"] = round(disk_cold_read_gauge(), 4)

    queries = entrymod.queries()
    for name in names:
        runs = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            queries[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = runs
        print(f"{name}: {runs}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1:])
