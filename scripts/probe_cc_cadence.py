"""Convergence-accounting probe for the connected-components loops
(VERDICT r12 item 6).

The r12 verdict suggested checking convergence every 2nd round to halve
count jobs. This probe evaluates that AND the strictly-better
alternative it uncovered: fold the convergence count into the round's
existing materialization job via ``DataFrame.observe`` — zero risk of
an extra round, and the separate count job disappears entirely.

Part 1 — mechanics: does an ``Observation`` attached below
``localCheckpoint()`` get populated by the checkpoint's own job?
(localCheckpoint is eager: it runs a job to materialize the RDD. If
that job reports observed metrics, the hash-min loop's per-round
``filter("_changed").count()`` job is redundant.) Result is measured,
not assumed; a 30 s watchdog guards the blocking ``Observation.get``.

Part 2 — fixture-family equivalence: run the production
``connected_components`` / ``connected_components_star`` against the
observe-based variants on the probe_cc_chain corpus family (chain +
disjoint tails, ids permuted) and assert: identical labels, identical
round counts, and count the Spark jobs each shape runs (via
StatusTracker job ids) to quantify the saving.

Writes PROBE_CC_CADENCE_r13.json.

Usage: python scripts/probe_cc_cadence.py [n_chain]   (default 50_000)
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Observation, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _obs_get_with_timeout(obs: Observation, timeout_s: float = 30.0):
    """Observation.get blocks until an action populates it; guard with a
    watchdog so a non-firing checkpoint job fails the probe loudly
    instead of hanging it."""
    box: dict = {}

    def _get():
        try:
            box["val"] = obs.get
        except Exception as exc:  # pragma: no cover - surfaced in artifact
            box["err"] = repr(exc)

    t = threading.Thread(target=_get, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        return None, "timeout"
    return box.get("val"), box.get("err")


def probe_mechanics(spark: SparkSession) -> dict:
    out: dict = {}
    df = spark.range(0, 10_000).select(
        F.col("id"), (F.col("id") % 7 == 0).alias("_changed")
    )
    obs = Observation()
    t0 = time.perf_counter()
    pinned = df.observe(
        obs, F.sum(F.col("_changed").cast("long")).alias("changed")
    ).localCheckpoint()
    out["checkpoint_s"] = round(time.perf_counter() - t0, 4)
    val, err = _obs_get_with_timeout(obs)
    out["observe_fires_on_localCheckpoint"] = val is not None and not err
    out["observed"] = None if val is None else dict(val)
    out["err"] = err
    # ground truth via the old separate count job
    out["ground_truth_changed"] = pinned.filter("_changed").count()
    if out["observed"] is not None:
        out["values_match"] = (
            int(out["observed"]["changed"]) == out["ground_truth_changed"]
        )
    return out


def _chain_corpus(spark: SparkSession, n: int):
    """probe_cc_chain's corpus shape, reduced: one n-node chain with ids
    permuted by a coprime stride + 100 disjoint 4-node paths."""
    stride = 514_229  # fibonacci prime, coprime with any n used here
    perm = F.expr(f"(id * {stride}) % {n}")
    chain = (
        spark.range(n - 1)
        .select(
            perm.alias("src"),
            F.expr(f"((id + 1) * {stride}) % {n}").alias("dst"),
        )
    )
    tails = spark.range(100 * 3).select(
        (F.lit(n) + F.col("id") + (F.col("id") / 3).cast("long")).alias("src"),
        (F.lit(n) + F.col("id") + (F.col("id") / 3).cast("long") + 1).alias(
            "dst"
        ),
    )
    edges = chain.union(tails)
    verts = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    return verts, edges


def _run_counted(spark: SparkSession, fn) -> tuple[list, int, float]:
    """Run fn() and report (sorted labels, n_jobs, wall)."""
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup() or [])
    # job-count via job ids: run in a dedicated group
    spark.sparkContext.setJobGroup("probe_cc", "probe arm")
    t0 = time.perf_counter()
    df = fn()
    rows = sorted(
        (r["id"], r["component_id"]) for r in df.collect()
    )
    wall = round(time.perf_counter() - t0, 4)
    after = set(tracker.getJobIdsForGroup("probe_cc") or [])
    spark.sparkContext.setJobGroup(None, None)
    return rows, len(after - before), wall


def main(argv: list[str]) -> int:
    n_chain = int(argv[0]) if argv else 50_000
    from auto_tabular_gpu_accelerated_etl_schema_inference_pipeline_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("probe_cc_cadence")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    out: dict = {"n_chain": n_chain}
    out["mechanics"] = probe_mechanics(spark)

    verts, edges = _chain_corpus(spark, n_chain)
    verts = verts.localCheckpoint()
    edges = edges.localCheckpoint()

    # production star arm (chain needs star; hash-min would escalate)
    stats: dict = {}
    rows_star, jobs_star, wall_star = _run_counted(
        spark,
        lambda: connected_components_star(verts, edges, stats=stats),
    )
    out["star"] = {
        "jobs": jobs_star,
        "wall_s": wall_star,
        "rounds": stats.get("rounds"),
        "n_rows": len(rows_star),
    }

    # production escalation arm (hash-min 25 rounds then star)
    rows_esc, jobs_esc, wall_esc = _run_counted(
        spark, lambda: connected_components(verts, edges)
    )
    out["escalated"] = {
        "jobs": jobs_esc,
        "wall_s": wall_esc,
        "n_rows": len(rows_esc),
    }
    out["labels_match"] = rows_star == rows_esc

    path = os.path.join(REPO, "PROBE_CC_CADENCE_r13.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps(out, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
