"""Hot-key scale probe for the round-8 market-basket scale twin — the
probe_asof_range discipline applied to the last documented "cap or
salt it at scale" prose claim (analytics.py module header).

Claim under test: basket_support_guarded_form's block decomposition
removes the direct pair self-join's single-task quadratic emitter. A
mega-order with d distinct items makes the direct form emit
d(d-1)/2 pairs inside ONE sort-merge group — and, as
PROBE_ASOF_RANGE_r07 measured for the as-of family, that is not an
AQE-rescuable shuffle skew: the blowup is in what the task EMITS
mid-stage (the hot key's shuffled INPUT is only d rows, far below any
skew-split threshold), so no runtime re-plan can touch it. The guarded
form routes orders over BASKET_BLOCK_THRESHOLD distinct items through
a block-pair equi-join on (okey, u, v), spreading the same
d^2/2 output over n_blocks*(n_blocks+1)/2 shuffle keys.

Both arms drive the EXACT production code (the *_form functions the
registry queries call) over three deterministic corpora:

  uniform — 1 M (order, part) rows over 200 k orders (~5 items/order,
            the fixture's shape at scale; ~2.5 M pairs)
  hot10k  — uniform PLUS one pathological 10 k-item order (direct
            form: ~5e7 pairs in ONE task; full-query contract arm)
  hot30k  — uniform PLUS one 30 k-item order (~4.5e8 one-task pairs;
            stream contract arm)

Metric design (differs from the as-of probe for a reason): a mega
order's d^2/2 pairs ARE the answer — the hot corpora's OUTPUT is
20x / 180x the uniform corpus's, so raw wall-clock flatness is the
wrong contract. The twin's claim is about WHERE the pair work runs,
so flatness is NORMALIZED per emitted pair, and the load-bearing
proof is taken at both stages: the pair stream (emission to a noop
sink) and the full support query (whose map-side partial agg runs in
the SAME task as the direct form's single-group emission — the
production query shape, and where the penalty is largest).

This probe's first run found TWO real defects, both fixed in
analytics.py and re-measured here:
  - AQE coalescePartitions folded the block-join's exchange (tiny
    shuffle INPUT, a few MB of replicated rows) down to 1-2
    partitions, re-serializing the d^2/2 emission the decomposition
    exists to spread — the same map-output-boundary blindness
    PROBE_ASOF_RANGE_r07 documented, this time ON the twin. Fix: the
    explicit repartition(N, okey, u, v) on both join sides (user-
    specified counts are exempt from coalescing). 23.8 s -> 3.7 s on
    the 30 k stream.
  - 16 blocks' 136 keys left ~3x balls-in-bins skew over a 64-
    partition shuffle; 32 blocks' 528 keys hash evenly (8.3 -> 3.7 s).

Pass criteria, enforced loudly:
  1. guarded stream throughput flatness (per-pair, hot30k vs
     uniform) <= 2.5x.
  2. stream_direct_hot30k >= 2x stream_guarded_hot30k — the single
     task emitter is the bottleneck the twin removes.
  3. full_direct_hot10k >= 2x full_guarded_hot10k — the win survives
     (grows, via the co-located partial agg) on the production query.
  4. guard overhead on polite data <= 2.5x (the window count is the
     only cost when no order routes through blocks).
  5. hot-corpus parity: zero exceptAll rows both directions on the
     supported output, AND an equal (count, folded-hash-sum) multiset
     checksum on the UNFILTERED pair stream — the support >= 2 filter
     drops every unique hot-order pair, so the checksum is what
     proves the blocked path neither dropped nor duplicated them.

Usage: python scripts/probe_market_basket.py [scale] [artifact_path]
(default 1 -> 1 M uniform rows, 10 k / 30 k hot orders)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from auto_tabular_gpu_accelerated_etl_schema_inference_pipeline_spark.operators.analytics import (  # noqa: E402
    MIN_PAIR_SUPPORT,
    _basket_support,
    basket_pair_stream_direct,
    basket_pair_stream_guarded,
    basket_support_direct_form,
    basket_support_guarded_form,
)

N_ORDERS = 200_000
N_PARTS = 40_000


def synth_items(spark: SparkSession, n: int, hot_items: int) -> DataFrame:
    """~n uniform (order, part) rows (~n/N_ORDERS items per order) plus
    one hot order holding hot_items DISTINCT parts."""
    base = spark.range(n).select(
        F.pmod(F.xxhash64("id", F.lit("o")), F.lit(N_ORDERS)).alias("okey"),
        F.pmod(F.xxhash64("id", F.lit("p")), F.lit(N_PARTS)).alias("part"),
    )
    hot = spark.range(hot_items).select(
        F.lit(N_ORDERS + 1).cast("bigint").alias("okey"),
        F.col("id").alias("part"),  # sequential -> all distinct
    )
    return base.unionByName(hot).distinct().repartition(64).localCheckpoint()


def timed_noop(df: DataFrame) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def parity(a: DataFrame, b: DataFrame) -> bool:
    b = b.select(*a.columns)
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def checksum(pairs: DataFrame) -> tuple:
    """Order-independent fingerprint of the UNFILTERED pair MULTISET
    (count + xxhash64 sum): one map-side global aggregate, no shuffle —
    equal multisets give equal sums, and multiplicity is captured
    because every duplicate contributes its hash again. The hash is
    folded MOD 2^31-1 before summing: a raw xxhash64 sum overflows
    BIGINT within a handful of rows under ANSI (values are uniform over
    the whole signed-long range), while the folded sum stays below 2^63
    up to ~4e9 pairs."""
    row = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.pmod(F.xxhash64("p1", "p2"), F.lit(2_147_483_647))
        ).alias("h"),
    ).collect()[0]
    return (row["n"], row["h"])


def run(scale: int) -> dict:
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.driver.memory", "48g")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    n = 1_000_000 * scale
    hot_full = 10_000 * scale   # full-query contract corpus (~5e7 pairs)
    hot_stream = 30_000 * scale  # stream contract corpus (~4.5e8 pairs)
    uni = synth_items(spark, n, 0)
    hot = synth_items(spark, n, hot_full)
    hot30 = synth_items(spark, n, hot_stream)
    results: dict = {
        "scale": scale,
        "uniform_rows": n,
        "n_orders": N_ORDERS,
        "hot_full_items": hot_full,
        "hot_stream_items": hot_stream,
        "hot_full_direct_pairs_one_task": hot_full * (hot_full - 1) // 2,
        "hot_stream_direct_pairs_one_task": (
            hot_stream * (hot_stream - 1) // 2
        ),
        "min_pair_support": MIN_PAIR_SUPPORT,
    }
    # exact emitted-pair volumes: the normalizers for the throughput
    # contract (the hot corpora's output is 20x / 180x the uniform's —
    # that growth is the ANSWER, not overhead, so flatness is per-pair)
    results["uniform_pairs"] = basket_pair_stream_direct(uni).count()
    results["hot_full_pairs"] = basket_pair_stream_direct(hot).count()
    results["hot_stream_pairs"] = basket_pair_stream_guarded(hot30).count()
    arms = {
        # pair STREAM (noop sink, no downstream shuffle): isolates the
        # emission stage the twin restructures. The 30 k mega-order is
        # the contract arm (direct = 4.5e8 pairs in ONE task).
        "stream_direct_uniform": lambda: basket_pair_stream_direct(uni),
        "stream_guarded_uniform": lambda: basket_pair_stream_guarded(uni),
        "stream_direct_hot30k": lambda: basket_pair_stream_direct(hot30),
        "stream_guarded_hot30k": lambda: basket_pair_stream_guarded(hot30),
        # full support query (groupBy included) at the 10 k mega-order:
        # the direct form's single task emits AND map-side-aggregates
        # its 5e7 pairs (the agg lives in the same stage), so the
        # serialization penalty is largest here — the production query
        # shape. (30 k direct-full is ~10 min of one-task hash agg;
        # measured once, not re-paid every probe run.)
        "full_direct_uniform": lambda: basket_support_direct_form(uni),
        "full_guarded_uniform": lambda: basket_support_guarded_form(uni),
        "full_direct_hot10k": lambda: basket_support_direct_form(hot),
        "full_guarded_hot10k": lambda: basket_support_guarded_form(hot),
    }
    timed_noop(uni.limit(1000))  # warm the JVM + noop sink off the clock
    for name, make in arms.items():
        sec = timed_noop(make())
        results[name] = sec
        print(f"{name}: {sec}s", flush=True)

    print("checking hot-corpus parity (twins must agree under skew)...",
          flush=True)
    results["hot_parity_supported"] = parity(
        _basket_support(basket_pair_stream_direct(hot)).localCheckpoint(),
        _basket_support(basket_pair_stream_guarded(hot)).localCheckpoint(),
    )
    cs_direct = checksum(basket_pair_stream_direct(hot))
    cs_guarded = checksum(basket_pair_stream_guarded(hot))
    results["hot_checksum_direct"] = cs_direct
    results["hot_checksum_guarded"] = cs_guarded
    results["hot_parity_unfiltered_checksum"] = cs_direct == cs_guarded

    def ratio(num: float, den: float) -> float:
        # 2dp-rounded denominators can hit 0.0 on tiny scales; the
        # floor biases conservatively (flatness up, speedup down)
        return round(num / max(den, 0.01), 2)

    # per-pair stream cost in microseconds (the normalized metric)
    us_uniform = 1e6 * results["stream_guarded_uniform"] / results["uniform_pairs"]
    us_hot = 1e6 * results["stream_guarded_hot30k"] / results["hot_stream_pairs"]
    results["guarded_us_per_pair_uniform"] = round(us_uniform, 4)
    results["guarded_us_per_pair_hot30k"] = round(us_hot, 4)
    results["guarded_throughput_flatness"] = ratio(us_hot, us_uniform)
    results["stream_direct_over_guarded_hot30k"] = ratio(
        results["stream_direct_hot30k"], results["stream_guarded_hot30k"]
    )
    results["full_direct_over_guarded_hot10k"] = ratio(
        results["full_direct_hot10k"], results["full_guarded_hot10k"]
    )
    results["guard_overhead_uniform"] = ratio(
        results["full_guarded_uniform"], results["full_direct_uniform"]
    )
    # the probe's contract, enforced (probe_skew discipline):
    assert results["hot_parity_supported"], (
        "basket twins DISAGREE on the hot corpus (supported output)"
    )
    assert results["hot_parity_unfiltered_checksum"], (
        "blocked path dropped or duplicated hot-order pairs: "
        f"direct {cs_direct} vs guarded {cs_guarded}"
    )
    assert results["guarded_throughput_flatness"] <= 2.5, (
        "guarded per-pair cost DEGRADES under the mega-order: "
        f"{us_hot:.4f} us/pair hot vs {us_uniform:.4f} us/pair uniform "
        f"({results['guarded_throughput_flatness']}x)"
    )
    assert results["stream_direct_over_guarded_hot30k"] >= 2, (
        f"guarded twin is not load-bearing on the hot pair stream: "
        f"{results['stream_direct_over_guarded_hot30k']}x"
    )
    assert results["full_direct_over_guarded_hot10k"] >= 2, (
        f"guarded twin is not load-bearing on the full support query: "
        f"{results['full_direct_over_guarded_hot10k']}x"
    )
    assert results["guard_overhead_uniform"] <= 2.5, (
        "the guard's window count costs too much on polite data: "
        f"{results['guard_overhead_uniform']}x"
    )
    return results


if __name__ == "__main__":
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    out = run(scale)
    line = json.dumps(out)
    print(line)
    if len(sys.argv) > 2:  # optional artifact path
        with open(sys.argv[2], "w") as fh:
            fh.write(line + "\n")
