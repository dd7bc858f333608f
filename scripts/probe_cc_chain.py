"""Deep-chain scale probe for connected components — the probe_skew
discipline applied to the round-8 CC hardening.

Claim under test: hash-min label propagation converges in O(component
diameter) rounds, so a chain-shaped component deeper than ``max_iter``
(the shape a boilerplate/templated-page series produces in a crawl
corpus) does NOT converge — and the pre-round-8 code SILENTLY returned
the partial labels. Round 8 adds (a) the alternating large-star/
small-star formulation (Kiveris et al., SoCC 2014; O(log^2 n) rounds,
diameter-INDEPENDENT) and (b) an escalation path in
``connected_components``: a non-converged hash-min run contracts its
label graph and finishes via the star algorithm; ``escalate=False``
raises instead. Silent wrongness is no longer a reachable outcome.

Corpus (ground truth analytic, no oracle engine needed):
  mega-chain — N nodes in ONE path, ids permuted by a coprime stride
               so convergence cannot ride on id order; diameter = N-1,
               true component id = 0 for every node.
  tail       — M disjoint 4-node paths over ids N..N+4M-1; true
               component id = the path's base id. Keeps the probe from
               measuring a single-component special case.

Arms (all drive the EXACT production functions):
  star        — connected_components_star(verts, edges)
  escalated   — connected_components(verts, edges) (default max_iter=25
                hash-min rounds, then contraction + star finish)
  pre-r8      — a 15-line replica of the removed silent-return loop,
                used ONLY to measure how wrong the old behavior was on
                this corpus (mislabel count; disclosure, not production
                code).

Pass criteria, enforced loudly:
  1. star output == ground truth exactly (0 mismatches)
  2. escalated output == ground truth exactly (0 mismatches)
  3. star converges in <= 2*ceil(log2(N)) + 4 rounds (the
     diameter-independence claim, measured not asserted from the paper)
  4. connected_components(escalate=False) RAISES on this corpus
  5. the pre-r8 silent return mislabels > 50% of the mega-chain (the
     probe's reason to exist, quantified)

Usage: python scripts/probe_cc_chain.py [n_chain] [artifact_path]
(default 500_000)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from auto_tabular_gpu_accelerated_etl_schema_inference_pipeline_spark.operators.graph import (  # noqa: E402
    connected_components,
    connected_components_star,
)

N_TAIL_PATHS = 100_000
STRIDE = 9_973  # prime, coprime with any n not divisible by it


def build_corpus(spark: SparkSession, n_chain: int):
    """Edges + vertices + ground-truth labels as DataFrames."""
    assert n_chain % STRIDE != 0
    perm = F.pmod(F.col("id") * STRIDE, F.lit(n_chain))
    chain = (
        spark.range(n_chain - 1)
        .select(
            perm.alias("src"),
            F.pmod((F.col("id") + 1) * STRIDE, F.lit(n_chain)).alias("dst"),
        )
    )
    # tail path base id: ids run n_chain + k, path j covers k = 4j..4j+3
    base = F.col("id") - F.pmod(F.col("id") - F.lit(n_chain), F.lit(4))
    tail = (
        spark.range(4 * N_TAIL_PATHS)
        .filter(F.col("id") % 4 != 3)  # 3 edges per 4-node path
        .select(
            (F.lit(n_chain) + F.col("id")).alias("src"),
            (F.lit(n_chain) + F.col("id") + 1).alias("dst"),
        )
    )
    edges = chain.unionByName(tail).repartition(64).localCheckpoint()
    verts = (
        spark.range(n_chain + 4 * N_TAIL_PATHS)
        .select(F.col("id"))
        .localCheckpoint()
    )
    truth = verts.select(
        "id",
        F.when(F.col("id") < n_chain, F.lit(0).cast("bigint"))
        .otherwise(base.cast("bigint"))
        .alias("true_id"),
    ).localCheckpoint()
    return verts, edges, truth


def mismatches(result, truth) -> int:
    return (
        result.join(truth, "id")
        .filter(F.col("component_id") != F.col("true_id"))
        .count()
    )


def pre_r8_silent_labels(verts, edges, max_iter: int = 25):
    """Replica of the REMOVED behavior: hash-min that silently returns
    partial labels at round max_iter (disclosure arm only)."""
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    labels = (
        sym.select(F.col("src").alias("id")).distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym["src"] == labels["id"])
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("label").alias("nl"))
        )
        labels = (
            labels.join(nbr, "id", "left")
            .select(
                "id", F.least("label", F.coalesce("nl", "label")).alias("label")
            )
            .localCheckpoint()
        )
    return verts.join(labels, "id", "left").select(
        "id", F.coalesce("label", F.col("id")).alias("component_id")
    )


def run(n_chain: int) -> dict:
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.driver.memory", "48g")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    verts, edges, truth = build_corpus(spark, n_chain)
    results: dict = {
        "n_chain": n_chain,
        "n_tail_paths": N_TAIL_PATHS,
        "n_vertices": n_chain + 4 * N_TAIL_PATHS,
        "chain_diameter": n_chain - 1,
        "hash_min_max_iter": 25,
    }

    t0 = time.time()
    stats: dict = {}
    star = connected_components_star(verts, edges, stats=stats).localCheckpoint()
    results["star_seconds"] = round(time.time() - t0, 2)
    results["star_rounds"] = stats.get("rounds")
    results["star_mismatches"] = mismatches(star, truth)

    t0 = time.time()
    esc = connected_components(verts, edges).localCheckpoint()
    results["escalated_seconds"] = round(time.time() - t0, 2)
    results["escalated_mismatches"] = mismatches(esc, truth)

    raised = False
    try:
        connected_components(verts, edges, escalate=False)
    except RuntimeError:
        raised = True
    results["escalate_false_raises"] = raised

    t0 = time.time()
    old = pre_r8_silent_labels(verts, edges).localCheckpoint()
    results["pre_r8_seconds"] = round(time.time() - t0, 2)
    results["pre_r8_mismatches"] = mismatches(old, truth)
    results["pre_r8_mislabel_frac_of_chain"] = round(
        results["pre_r8_mismatches"] / n_chain, 4
    )

    round_bound = 2 * math.ceil(math.log2(n_chain)) + 4
    results["star_round_bound"] = round_bound

    # the probe's contract, enforced (probe_skew discipline):
    assert results["star_mismatches"] == 0, (
        f"star CC mislabeled {results['star_mismatches']} vertices"
    )
    assert results["escalated_mismatches"] == 0, (
        f"escalated CC mislabeled {results['escalated_mismatches']} vertices"
    )
    assert results["star_rounds"] <= round_bound, (
        f"star took {results['star_rounds']} rounds on a diameter-"
        f"{n_chain - 1} chain; diameter-independence bound is {round_bound}"
    )
    assert results["escalate_false_raises"], (
        "escalate=False did NOT raise on a non-convergent corpus — the "
        "silent-wrongness guard is dead"
    )
    assert results["pre_r8_mislabel_frac_of_chain"] > 0.5, (
        "the pre-r8 behavior is not wrong enough on this corpus to "
        "justify the probe — deepen the chain"
    )
    return results


if __name__ == "__main__":
    n_chain = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    out = run(n_chain)
    line = json.dumps(out)
    print(line)
    if len(sys.argv) > 2:
        with open(sys.argv[2], "w") as fh:
            fh.write(line + "\n")
