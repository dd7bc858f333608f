"""Hot-key scale probe for the round-7 scale twins — the skew/LSH probe
discipline applied to the as-of and range-join families.

Claims under test (both shipped as registry twins sharing the direct
form's oracle):
  - asof_directions_union_form: intermediate = |events| + |order dates|
    with NO events x orders fan-out, so it survives per-key order
    multiplicity of ANY depth — unlike the join form, whose per-user
    fan-out the fixture only bounds because TPC-H multiplicity is ~10.
  - range_join_bucketed_form: joining on (user, hour_bucket) bounds
    fan-out by events-per-user-per-HOUR, not events-per-user, so one
    hyperactive user cannot quadratize the join.

Both probes drive the EXACT production code (the *_form functions the
registry queries call — factored out precisely so probe and lane cannot
drift) over two deterministic synthetic corpora:

  uniform — 1 M events / 1 M orders over 100 k users (multiplicity ~10,
            the fixture's shape at 10x scale)
  hot     — the same corpus PLUS one pathological user: 50 k orders +
            200 extra events (as-of arm: ~10.5 M fan-out rows on one
            key, as much as the whole uniform corpus produces), and a
            300 k-event / 1 k-signup 3-day burst (range arm: ~300 M
            candidate pairs enumerated inside ONE sort-merge group —
            single-task quadratic work parallelism cannot touch).

Recorded per form x corpus: wall seconds (noop-sink materialization).
On the hot corpus both family pairs are also checked for EXACT output
parity (exceptAll both ways) — the twins must agree under skew, not
just on the polite fixture.

Pass criteria, enforced loudly:
  1. union_hot  <= 2.5x union_uniform   (multiplicity-independence)
  2. bucketed_hot <= 2.5x bucketed_uniform (hour-bucket bound holds)
  3. join_hot   >= 2x union_hot          (the as-of twin is load-bearing)
  4. direct_hot >= 2x bucketed_hot       (the range twin is load-bearing)
  5. hot-corpus parity: zero exceptAll rows in both directions, both
     families.

Measured finding (PROBE_ASOF_RANGE_r07.json, two consistent runs):
the join form's hot-key cost is NOT an AQE-rescuable shuffle skew —
the fan-out rows are GENERATED inside the hot key's single sort-merge
task and consumed by the same stage's partial aggregate, so the 10.5 M
hot-key rows run on one core (~70 s) while the uniform corpus's
equal-volume fan-out spreads over every core (~5-9 s). This is the
same map-output-boundary limitation PROBE_SKEW_r06 documented, one
stage later: AQE splits what it can SHUFFLE, not what a task emits
mid-stage. The union/bucketed twins don't split the work — they avoid
creating it (union_hot 4-6 s flat; bucketed_hot ~2.6 s flat).

Usage: python scripts/probe_asof_range.py [scale]   (default 1 -> 1 M
rows/side; scale multiplies every corpus knob)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from auto_tabular_gpu_accelerated_etl_schema_inference_pipeline_spark.operators.timeseries import (  # noqa: E402
    asof_directions_join_form,
    asof_directions_union_form,
    range_join_bucketed_form,
    range_join_direct_form,
)

N_USERS = 100_000
EPOCH_US = 1_704_067_200_000_000  # 2024-01-01 UTC
YEAR_US = 365 * 86_400_000_000
HOT_SPAN_US = 3 * 86_400_000_000  # the hot user's 3-day burst


def _ts(expr, base_us: int, span_us: int):
    return F.timestamp_micros(
        F.lit(base_us) + F.pmod(F.xxhash64(expr, F.lit("t")), F.lit(span_us))
    )


def synth_events(
    spark: SparkSession, n: int, hot_extra: int, hot_signups: int
) -> DataFrame:
    """Uniform events over N_USERS (1% signups) plus a hot-user burst:
    hot_extra non-signup events and hot_signups signups for user 0,
    packed into a 3-day span (so the range arm's hour buckets stay
    genuinely occupied)."""
    base = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.pmod(F.xxhash64("id", F.lit("u")), F.lit(N_USERS)).alias("user_id"),
        _ts(F.col("id"), EPOCH_US, YEAR_US).alias("ts"),
        F.when(
            F.pmod(F.xxhash64("id", F.lit("s")), F.lit(100)) < 1,
            F.lit("signup"),
        )
        .otherwise(F.lit("click"))
        .alias("event_type"),
    )
    hot = spark.range(hot_extra + hot_signups).select(
        (F.col("id") + n).alias("event_id"),
        F.lit(0).cast("bigint").alias("user_id"),
        _ts(F.col("id") + n, EPOCH_US, HOT_SPAN_US).alias("ts"),
        F.when(F.col("id") < hot_signups, F.lit("signup"))
        .otherwise(F.lit("click"))
        .alias("event_type"),
    )
    return base.unionByName(hot).repartition(64)


def synth_orders(spark: SparkSession, n: int, hot_extra: int) -> DataFrame:
    base = spark.range(n).select(
        F.col("id").alias("o_orderkey"),
        F.pmod(F.xxhash64("id", F.lit("c")), F.lit(N_USERS)).alias(
            "o_custkey"
        ),
        _ts(F.col("id"), EPOCH_US, YEAR_US).alias("o_orderdate"),
    )
    hot = spark.range(hot_extra).select(
        (F.col("id") + n).alias("o_orderkey"),
        F.lit(0).cast("bigint").alias("o_custkey"),
        _ts(F.col("id") + n, EPOCH_US, YEAR_US).alias("o_orderdate"),
    )
    return base.unionByName(hot).repartition(64)


def timed_noop(df: DataFrame) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def parity(a: DataFrame, b: DataFrame) -> bool:
    b = b.select(*a.columns)
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


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
    ev_uni = synth_events(spark, n, 0, 0).localCheckpoint()
    # per-arm hot corpora: the as-of arm's hot user gets 200 extra
    # events against a 50 k-deep order book (join-form fan-out for that
    # ONE user: ~210 x 50,010 ~= 10.5 M rows — as much as the entire
    # uniform corpus's fan-out, concentrated in one join group); the
    # range arm's hot user gets a 300 k-event 3-day burst (direct-form
    # intermediate ~1 k signups x 301 k events ~= 300 M pairs — and ALL
    # of them enumerate inside ONE sort-merge join group, i.e. one
    # task: the per-user quadratic no amount of cluster parallelism
    # can split. The bucketed form's per-(user, hour) groups hold the
    # same data at ~4 k events/bucket -> ~8 M distributed pairs.)
    ev_hot_asof = synth_events(spark, n, 200 * scale, 0).localCheckpoint()
    ev_hot_range = synth_events(
        spark, n, 300_000 * scale, 1_000 * scale
    ).localCheckpoint()
    ord_uni = synth_orders(spark, n, 0).localCheckpoint()
    ord_hot = synth_orders(spark, n, 50_000 * scale).localCheckpoint()
    results: dict = {
        "scale": scale,
        "n_rows_per_side": n,
        "n_users": N_USERS,
        "hot_orders": 50_000 * scale,
        "hot_events_asof": 200 * scale,
        "hot_events_range": 301_000 * scale,
    }
    arms = {
        "asof_join_uniform": lambda: asof_directions_join_form(ev_uni, ord_uni),
        "asof_join_hot": lambda: asof_directions_join_form(ev_hot_asof, ord_hot),
        "asof_union_uniform": lambda: asof_directions_union_form(ev_uni, ord_uni),
        "asof_union_hot": lambda: asof_directions_union_form(ev_hot_asof, ord_hot),
        "range_direct_uniform": lambda: range_join_direct_form(ev_uni),
        "range_direct_hot": lambda: range_join_direct_form(ev_hot_range),
        "range_bucketed_uniform": lambda: range_join_bucketed_form(ev_uni),
        "range_bucketed_hot": lambda: range_join_bucketed_form(ev_hot_range),
    }
    # warm the JVM + noop sink off the clock
    timed_noop(ev_uni.limit(1000))
    for name, make in arms.items():
        sec = timed_noop(make())
        results[name] = sec
        print(f"{name}: {sec}s", flush=True)

    print("checking hot-corpus parity (twins must agree under skew)...",
          flush=True)
    results["asof_hot_parity"] = parity(
        asof_directions_join_form(ev_hot_asof, ord_hot),
        asof_directions_union_form(ev_hot_asof, ord_hot),
    )
    results["range_hot_parity"] = parity(
        range_join_direct_form(ev_hot_range),
        range_join_bucketed_form(ev_hot_range),
    )
    # denominators come from timed_noop (rounded to 2dp) — a sub-10ms
    # arm (tiny --scale on a fast box) rounds to 0.0, and a clean
    # assertion message beats a ZeroDivisionError (ADVICE r7); the
    # floor biases the ratios CONSERVATIVELY (flatness up, speedup down)
    def ratio(num: float, den: float) -> float:
        return round(num / max(den, 0.01), 2)

    results["asof_union_flatness"] = ratio(
        results["asof_union_hot"], results["asof_union_uniform"]
    )
    results["range_bucketed_flatness"] = ratio(
        results["range_bucketed_hot"], results["range_bucketed_uniform"]
    )
    results["asof_twin_speedup_hot"] = ratio(
        results["asof_join_hot"], results["asof_union_hot"]
    )
    results["range_twin_speedup_hot"] = ratio(
        results["range_direct_hot"], results["range_bucketed_hot"]
    )
    # the probe's contract, enforced (probe_skew discipline):
    assert results["asof_hot_parity"], "as-of twins DISAGREE on the hot corpus"
    assert results["range_hot_parity"], "range twins DISAGREE on the hot corpus"
    assert results["asof_union_flatness"] <= 2.5, (
        f"union form is NOT multiplicity-independent: hot/uniform = "
        f"{results['asof_union_flatness']}"
    )
    assert results["range_bucketed_flatness"] <= 2.5, (
        f"bucketed form's hour bound did not hold: hot/uniform = "
        f"{results['range_bucketed_flatness']}"
    )
    assert results["asof_twin_speedup_hot"] >= 2, (
        f"as-of union twin is not load-bearing on the hot corpus: "
        f"{results['asof_twin_speedup_hot']}x"
    )
    assert results["range_twin_speedup_hot"] >= 2, (
        f"range bucketed twin is not load-bearing on the hot corpus: "
        f"{results['range_twin_speedup_hot']}x"
    )
    return results


if __name__ == "__main__":
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    out = run(scale)
    print(json.dumps(out))
