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
registry queries call) over two deterministic corpora:

  uniform — 1 M (order, part) rows over 200 k orders (~5 items/order,
            the fixture's shape at scale)
  hot     — the same corpus PLUS one pathological 5 k-item order
            (direct-form emission: ~12.5 M pairs in ONE task, ~6x the
            entire uniform corpus's pair volume)

Pass criteria, enforced loudly:
  1. guarded_hot <= 2.5x guarded_uniform  (mega-order independence)
  2. direct_hot  >= 2x guarded_hot        (the twin is load-bearing)
  3. hot-corpus parity: zero exceptAll rows in both directions on the
     supported output, AND equal (count, sum, hash-checksum) on the
     UNFILTERED pair-support relation — the support >= 2 filter drops
     every unique hot-order pair, so the checksum is what proves the
     blocked path neither dropped nor duplicated them.

Usage: python scripts/probe_market_basket.py [scale]  (default 1 ->
1 M uniform rows, 5 k-item hot order; scale multiplies both)
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
    """Order-independent fingerprint of the UNFILTERED pair-support
    relation (count / total support / xxhash64 sum)."""
    sup = pairs.groupBy("p1", "p2").agg(F.count(F.lit(1)).alias("support"))
    row = sup.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("support").alias("s"),
        F.sum(F.xxhash64("p1", "p2", "support")).alias("h"),
    ).collect()[0]
    return (row["n"], row["s"], row["h"])


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
    hot_items = 5_000 * scale
    uni = synth_items(spark, n, 0)
    hot = synth_items(spark, n, hot_items)
    results: dict = {
        "scale": scale,
        "uniform_rows": n,
        "n_orders": N_ORDERS,
        "hot_order_items": hot_items,
        "hot_direct_pairs_one_task": hot_items * (hot_items - 1) // 2,
        "min_pair_support": MIN_PAIR_SUPPORT,
    }
    arms = {
        "direct_uniform": lambda: basket_support_direct_form(uni),
        "direct_hot": lambda: basket_support_direct_form(hot),
        "guarded_uniform": lambda: basket_support_guarded_form(uni),
        "guarded_hot": lambda: basket_support_guarded_form(hot),
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

    results["guarded_flatness"] = ratio(
        results["guarded_hot"], results["guarded_uniform"]
    )
    results["direct_over_guarded_hot"] = ratio(
        results["direct_hot"], results["guarded_hot"]
    )
    # the probe's contract, enforced (probe_skew discipline):
    assert results["hot_parity_supported"], (
        "basket twins DISAGREE on the hot corpus (supported output)"
    )
    assert results["hot_parity_unfiltered_checksum"], (
        "blocked path dropped or duplicated hot-order pairs: "
        f"direct {cs_direct} vs guarded {cs_guarded}"
    )
    assert results["guarded_flatness"] <= 2.5, (
        f"guarded form is NOT mega-order-independent: hot/uniform = "
        f"{results['guarded_flatness']}"
    )
    assert results["direct_over_guarded_hot"] >= 2, (
        f"guarded twin is not load-bearing on the hot corpus: "
        f"{results['direct_over_guarded_hot']}x"
    )
    return results


if __name__ == "__main__":
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    out = run(scale)
    print(json.dumps(out))
