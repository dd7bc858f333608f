"""Banded-LSH scale probe — the skew-probe discipline applied to the
ANN/near-dup family (VERDICT r6 item 5: the one scale claim that was
still prose-only).

Question: at ~10 M vectors (1600x the sf0.1 fixture corpus), does the
corpus-adaptive bits-per-band formula (similarity.lsh_band_bits) hold
the expected bucket near its ~200-row design target and keep candidate
work near-LINEAR in corpus size — or does clustering in real-shaped
data quietly re-quadratize it?

The probe runs the EXACT production tagging path
(similarity.lsh_tag_bands — the same mapInPandas matmul the
q_similarity_lsh_near_dup lane executes, factored out so this probe and
the lane cannot drift apart) over a synthetic Gaussian-mixture corpus
(50 k centroids x ~200 points, sigma giving intra-cluster cosine ~0.93
— clustered like a near-dup-bearing production corpus, NOT uniform
noise, which would flatter the bucket distribution), then measures per
(band, sig) bucket:

  adaptive   — bits = lsh_band_bits(n) (the production formula)
  fixed_sf01 — bits frozen at the value the 6 k-vector fixture corpus
               uses (the contrast arm: what shipping a small-corpus
               constant to a big corpus would cost)

Recorded per arm: bucket-count/max/mean/p99, candidate-pair count
(sum over buckets of c*(c-1)/2 — the exact number of cosine dots the
scoring stage would perform), and that count as a fraction of the
all-pairs bound n*(n-1)/2.

Pass criteria, enforced loudly (the probe_skew contract):
  1. adaptive mean bucket within 8x of LSH_TARGET_BUCKET (clustered
     signatures are non-uniform by design; 8x still proves the formula
     tracks corpus size, while an O(n) bucket would blow past it by
     orders of magnitude),
  2. adaptive candidate count within 4x of the NEAR-LINEAR design
     budget n_bands * n * target_bucket / 2 (the uniform-signature
     expectation; 4x is the measured clustering overhead's headroom —
     an O(n^2) regression overshoots this by n/target, ~4 orders of
     magnitude at 10 M),
  3. adaptive candidates at least 10x below the fixed-bits contrast —
     the adaptivity must be demonstrably load-bearing.

Usage: python scripts/probe_lsh.py [n_vectors]   (default 10_000_000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from auto_tabular_gpu_accelerated_etl_schema_inference_pipeline_spark.operators.similarity import (  # noqa: E402
    LSH_TARGET_BUCKET,
    N_LSH_BANDS,
    lsh_band_bits,
    lsh_tag_bands,
)

N_CLUSTERS = 50_000
SIGMA = 0.18  # per-dim noise around unit-norm-ish centroids
DIM = 64


def synthetic_embeddings(spark: SparkSession, n: int) -> DataFrame:
    """Gaussian-mixture corpus: vec_id i belongs to cluster i % 50k;
    centroid is a deterministic hash-seeded unit direction; the point is
    centroid + N(0, SIGMA^2) per dim. Deterministic per row (seed =
    vec_id), so reruns measure the same corpus."""

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            # one RNG per batch, seeded by the batch's first id — rows
            # are range-partitioned deterministically, so the corpus is
            # rerun-stable; per-row rng init would cost 10M generator
            # setups
            rng = np.random.default_rng(int(ids[0]) + 1)
            cl = ids % N_CLUSTERS
            # centroid matrix for the clusters present in this batch
            ucl, inv = np.unique(cl, return_inverse=True)
            cents = np.stack(
                [
                    np.random.default_rng(int(c) * 2654435761 % 2**31)
                    .standard_normal(DIM)
                    for c in ucl
                ]
            )
            cents /= np.linalg.norm(cents, axis=1, keepdims=True)
            V = cents[inv] + rng.standard_normal((len(ids), DIM)) * SIGMA
            yield pd.DataFrame(
                {
                    "vec_id": ids,
                    "embedding": list(V.astype(np.float32)),
                }
            )

    return spark.range(n).mapInPandas(
        gen, "vec_id bigint, embedding array<float>"
    )


def bucket_profile(tagged: DataFrame) -> dict:
    """Shuffle only (band, sig) partial counts (embedding pruned before
    the agg), then reduce the per-bucket counts to distribution stats +
    the exact candidate-pair total in ONE aggregate row."""
    buckets = tagged.groupBy("band", "sig").agg(
        F.count(F.lit(1)).alias("c")
    )
    row = buckets.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("c").alias("max_bucket"),
        F.avg("c").alias("mean_bucket"),
        F.expr("percentile(c, 0.5)").alias("p50_bucket"),
        F.expr("percentile(c, 0.99)").alias("p99_bucket"),
        F.sum(F.col("c") * (F.col("c") - 1) / 2)
        .cast("double")
        .alias("candidate_pairs"),
    ).collect()[0]
    return {
        "n_buckets": row["n_buckets"],
        "max_bucket": row["max_bucket"],
        "mean_bucket": round(row["mean_bucket"], 1),
        "p50_bucket": round(row["p50_bucket"], 1),
        "p99_bucket": round(row["p99_bucket"], 1),
        "candidate_pairs": row["candidate_pairs"],
    }


def run(n: int) -> dict:
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.driver.memory", "48g")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    emb = synthetic_embeddings(spark, n).repartition(64)
    emb.count()  # warm JVM + materialization path off the clock

    bits_adaptive = lsh_band_bits(n)
    bits_fixed = lsh_band_bits(6000)  # what the sf0.1 fixture corpus uses
    all_pairs = n * (n - 1) / 2
    results: dict = {
        "n_vectors": n,
        "n_clusters": N_CLUSTERS,
        "sigma": SIGMA,
        "n_bands": N_LSH_BANDS,
        "target_bucket": LSH_TARGET_BUCKET,
        "band_bits_adaptive": bits_adaptive,
        "band_bits_fixed_sf01": bits_fixed,
        "all_pairs_bound": all_pairs,
    }
    for name, bits in (
        ("adaptive", bits_adaptive),
        ("fixed_sf01", bits_fixed),
    ):
        t0 = time.time()
        prof = bucket_profile(lsh_tag_bands(emb, bits))
        prof["sec"] = round(time.time() - t0, 1)
        prof["candidate_frac_of_all_pairs"] = round(
            prof["candidate_pairs"] / all_pairs, 8
        )
        results[name] = prof
        print(f"{name} (bits={bits}): {prof}", flush=True)

    adaptive_pairs = results["adaptive"]["candidate_pairs"]
    assert adaptive_pairs > 0, (
        "adaptive arm produced ZERO candidate pairs — n_vectors is too "
        "small for the probe to mean anything (every bucket a singleton)"
    )
    results["adaptive_vs_fixed_candidate_ratio"] = round(
        results["fixed_sf01"]["candidate_pairs"] / adaptive_pairs, 1
    )
    # The probe's contract, enforced — a silently-degenerate run must
    # fail, not print pass-shaped numbers (probe_skew discipline):
    a = results["adaptive"]
    assert a["mean_bucket"] <= 8 * LSH_TARGET_BUCKET, (
        f"adaptive mean bucket {a['mean_bucket']} blew past 8x the "
        f"{LSH_TARGET_BUCKET}-row design target — lsh_band_bits is not "
        "tracking corpus size"
    )
    linear_budget = N_LSH_BANDS * n * LSH_TARGET_BUCKET / 2
    results["adaptive_vs_linear_budget"] = round(
        a["candidate_pairs"] / linear_budget, 2
    )
    assert a["candidate_pairs"] <= 4 * linear_budget, (
        f"adaptive candidate work {a['candidate_pairs']:.3g} exceeds 4x "
        f"the near-linear budget {linear_budget:.3g} — bucketing has "
        "re-quadratized"
    )
    assert (
        results["adaptive_vs_fixed_candidate_ratio"] >= 10
    ), "adaptive bits are not demonstrably load-bearing vs fixed bits"
    return results


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    out = run(n)
    print(json.dumps(out))
