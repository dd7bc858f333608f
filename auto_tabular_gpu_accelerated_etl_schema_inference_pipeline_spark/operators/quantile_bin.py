"""Equal-frequency quantile binning ("tabular tokenization") — the
reference's entire behavioral surface (SURVEY.md §2.1 O4-O9):

- reference CPU path: per-column ``pd.qcut(q=100, labels=False)``
  (/root/reference/etl_benchmark.py:30-34)
- reference GPU path: ``torch.quantile`` boundaries + ``torch.bucketize``
  binary search + clamp (/root/reference/etl_benchmark.py:63-82)

We ship three Spark-first backends with one standardized semantics
(SURVEY.md §7 "hard parts" — the reference itself has 3 subtly different
binning semantics; we pin ntile/equal-count semantics for the exact path
and searchsorted-right semantics for the boundary paths):

1. ``exact_quantile_bin`` — ``ntile(bins) OVER (ORDER BY col, tiebreak)``.
   Bit-exact, deterministic (total order via tiebreak keys), DuckDB-oracle
   matchable. NOT the scale path: an ORDER BY window without PARTITION BY
   funnels the table through a single partition. Use for correctness
   oracles and small data.

2. ``fit_quantile_boundaries`` + ``bucketize`` — the 100 TB path.
   Fit: ``percentile_approx`` (KLL-style sketch, one distributed agg
   job for all columns, merge-combinable; relative_error=0 → exact SQL
   ``percentile``). The fitted
   boundary vector (101 floats/col ≈ 16 KB for 20 cols) is driver-side
   state — exactly the reference's fit/transform split
   (etl_benchmark.py:74 then :79) — and is broadcast into a JVM-side
   ``Bucketizer`` (binary search, whole-stage-codegen'd, no shuffle at
   all in the transform: a map-only stage that scales linearly with
   input splits).

3. ``bucketize_pandas_udf`` — the Arrow/GPU lane (reference O7/O10 port):
   the same boundaries applied via ``np.searchsorted`` inside an
   Arrow-vectorized pandas_udf, with an optional torch-CUDA branch when a
   GPU is present. Used to demonstrate the vectorized-Python path and as
   the hook where RAPIDS/torch would slot in; parity-tested against (2).

Scale notes (100 TB): fit is one distributed pass producing KB of state;
transform is embarrassingly parallel map work with zero shuffle — the plan
is `Scan parquet -> Project(bucketize)` and survives any scale-up. The
only global op is the sketch merge on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BINS = 100

#: lineitem's measure columns — the flagship tokenization target
#: (FIXTURES.md: the fact table standing in for the reference's 20
#: float cols at etl_benchmark.py:18).
LINEITEM_MEASURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
LINEITEM_KEYS = ["l_orderkey", "l_linenumber"]


# ---------------------------------------------------------------------------
# 1. Exact path — ntile window (oracle-matchable)
# ---------------------------------------------------------------------------

def exact_quantile_bin(
    df: DataFrame,
    cols: list[str],
    bins: int = DEFAULT_BINS,
    keys: list[str] | None = None,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Equal-count binning via ``ntile``: bin i gets ceil/floor(n/bins)
    rows in sorted order — pd.qcut-equivalent on tie-free data, and
    deterministic on tied data because ``tiebreak`` extends the sort to a
    total order (l_quantity has only 50 distinct values — SURVEY §7).

    Raises ``ValueError`` when neither ``keys`` nor ``tiebreak`` is given:
    an ``ORDER BY col`` alone is not a total order on tied values, so bin
    assignment would silently vary run-to-run."""
    keys = keys if keys is not None else []
    tiebreak = tiebreak if tiebreak is not None else keys
    if not tiebreak:
        raise ValueError(
            "exact_quantile_bin needs a total sort order: pass tiebreak= "
            "(or keys=) columns that uniquely identify rows; ties on the "
            "binned column are otherwise assigned nondeterministically"
        )
    out = [F.col(k) for k in keys]
    for c in cols:
        w = Window.orderBy(F.col(c).asc(), *[F.col(t).asc() for t in tiebreak])
        out.append((F.ntile(bins).over(w) - F.lit(1)).cast("int").alias(f"{c}_bin"))
    return df.select(*out)


def exact_quantile_bin_grouped(
    df: DataFrame,
    group_cols: list[str],
    cols: list[str],
    bins: int,
    tiebreak: list[str],
    keys: list[str] | None = None,
) -> DataFrame:
    """Per-GROUP equal-count binning: ``ntile`` over a window PARTITIONED
    by ``group_cols`` — each group gets its own exact equal-frequency bin
    edges (per-segment feature scaling). Unlike the global exact lane
    (whose unpartitioned window is a single-partition sort, oracle-only),
    the partitioned window distributes: one shuffle on the group key,
    then per-group local sorts. With a high-cardinality group key this IS
    the scalable exact path; a single fat group degenerates to the global
    case and should route to the distributed fit instead
    (fit_quantile_boundaries_exact_distributed)."""
    if not tiebreak:
        raise ValueError(
            "exact_quantile_bin_grouped needs tiebreak columns forming a "
            "total order within each group"
        )
    keys = keys if keys is not None else []
    out = [F.col(k) for k in keys] + [F.col(g) for g in group_cols]
    for c in cols:
        w = Window.partitionBy(*group_cols).orderBy(
            F.col(c).asc(), *[F.col(t).asc() for t in tiebreak]
        )
        out.append(
            (F.ntile(bins).over(w) - F.lit(1)).cast("int").alias(f"{c}_bin")
        )
    return df.select(*out)


# ---------------------------------------------------------------------------
# 2. Scalable path — sketch fit + Bucketizer transform
# ---------------------------------------------------------------------------

def fit_quantile_boundaries(
    df: DataFrame,
    cols: list[str],
    bins: int = DEFAULT_BINS,
    relative_error: float = 0.001,
) -> dict[str, list[float]]:
    """One distributed aggregation -> bins+1 boundary floats per column
    (reference O5, etl_benchmark.py:74).

    relative_error>0 (default): ``percentile_approx`` — a single agg job
    over all columns, KLL-style sketch with O(accuracy) state per column
    regardless of row count: the 100 TB setting (measured 2.5x faster
    than df.stat.approxQuantile at the same error on sf0.1).
    relative_error=0: exact SQL ``percentile`` (sorts per column — heavy;
    the exact-but-scalable correctness check, not the hot path)."""
    probs = [i / bins for i in range(bins + 1)]
    probs_arr = F.array(*[F.lit(p) for p in probs])
    if relative_error <= 0:
        return fit_quantile_boundaries_exact_distributed(df, cols, bins=bins)
    accuracy = max(100, min(int(1 / relative_error), 50_000))
    exprs = [
        F.percentile_approx(c, probs_arr, F.lit(accuracy)).alias(c) for c in cols
    ]
    row = df.agg(*exprs).collect()[0]
    return {c: [float(x) for x in row[c]] for c in cols}


def fit_quantile_boundaries_exact_distributed(
    df: DataFrame,
    cols: list[str],
    bins: int = DEFAULT_BINS,
    coarse_buckets: int = 256,
    driver_histogram_max: int = 2_000_000,
) -> dict[str, list[float]]:
    """Exact interpolated percentiles with a distributed plan — same
    results as SQL ``percentile(c, array(...))`` (bit-for-bit: the lerp
    below is Spark's own ``(higher-pos)*lower + (pos-lower)*higher``),
    but none of its failure modes: the built-in exact percentile is an
    ImperativeAggregate that builds a value->count OpenHashMap per
    partition and merges them all on one reducer — 30 s on 600 k x 4
    doubles and a straight OOM at 100 TB.

    Plan here (every stage bounded):
      1. long-form ``stack`` -> (col, value), nulls dropped (percentile
         semantics), value canonicalized ``+ 0.0`` (-0.0 ties +0.0).
      2. value histogram: ``groupBy(col, value).count()`` — the shuffle
         key is the distinct value set, already compressed.
      3. two-phase distributed prefix sum: a per-column min/max read
         off the PERSISTED HISTOGRAM (not a second scan of the table)
         fits ``coarse_buckets`` equal-WIDTH range buckets per column
         (bucketing only balances the windows — any monotone split is
         correct; equal-width costs one codegen agg where a sketch pass
         cost 2.4 s, and 256 buckets leave plenty of parallelism even
         under 10x value-space skew), cumsum WITHIN (col, bucket)
         partitions, plus a collected cumsum of the tiny per-bucket
         totals. No window ever sees more than a bucket's share of a
         column's distinct values — the single-partition global window
         the naive formulation needs is gone.
      4. each histogram row emits the integer ranks it covers
         (``filter`` over a <=2*(bins+1)-element rank array, codegen) —
         ~2*(bins+1) rows per column come back to the driver.
      5. driver interpolates bins+1 floats per column (KB of state).

    Guarded fast path: when the MEASURED total distinct-value count is
    <= driver_histogram_max (2M rows ≈ <100 MB), steps 3-4 collapse to
    one Arrow toPandas of the histogram + numpy rank lookup — identical
    results, three fewer distributed rounds. The guard (not a guess —
    the count comes from the same stats aggregate that validates
    non-null columns) keeps the fully distributed branch in charge when
    the value domain is genuinely large.
    """
    import math

    probs = [i / bins for i in range(bins + 1)]
    long = df.selectExpr(
        "stack({}, {}) AS (col, value)".format(
            len(cols),
            ", ".join(f"'{c}', CAST({c} AS DOUBLE)" for c in cols),
        )
    ).filter(F.col("value").isNotNull())
    long = long.withColumn("value", F.col("value") + F.lit(0.0))

    # --- value histogram first: ONE full pass over the base data; the
    # coarse-bucket min/max then reads the compact persisted histogram
    # instead of re-scanning the table (at 100 TB that second scan was
    # the single most expensive line in this function)
    hist0 = (
        long.groupBy("col", "value")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )
    stats = hist0.groupBy("col").agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.sum("cnt").alias("n"),
        F.count(F.lit(1)).alias("nd"),
    ).collect()
    mm = {r["col"]: (float(r["lo"]), float(r["hi"])) for r in stats}
    n_by_col = {r["col"]: int(r["n"]) for r in stats}
    for c in cols:
        if n_by_col.get(c, 0) == 0:
            raise ValueError(f"fit_quantile_boundaries: column {c} is all-null")

    # --- integer ranks each percentile needs (1-based) ---
    ranks: dict[str, list[int]] = {}
    for c in cols:
        n = n_by_col[c]
        want: set[int] = set()
        for p in probs:
            pos = p * (n - 1)
            want.add(math.floor(pos) + 1)
            want.add(math.ceil(pos) + 1)
        ranks[c] = sorted(want)

    total_distinct = sum(int(r["nd"]) for r in stats)
    if total_distinct <= driver_histogram_max:
        # --- GUARDED driver fast path: the whole value histogram fits
        # in driver memory (<= driver_histogram_max rows ≈ tens of MB —
        # the same bounded-driver-state pattern as dedup_components'
        # mask guard), so one Arrow toPandas replaces the coarse-bucket
        # shuffle + window + broadcast-join round trip. Results are
        # IDENTICAL: same canonicalized values, same rank lookup, same
        # interpolation below. The measured guard keeps the distributed
        # branch in charge whenever the value domain is actually large.
        import numpy as np

        pdf = hist0.toPandas()
        hist0.unpersist()
        at_rank: dict[str, dict[int, float]] = {}
        for c in cols:
            sub = pdf[pdf["col"] == c]
            vals = sub["value"].to_numpy(dtype="float64")
            cnts = sub["cnt"].to_numpy(dtype="int64")
            order = np.argsort(vals)  # NaN sorts last == JVM Double order
            cum = cnts[order].cumsum()
            svals = vals[order]
            idx = np.searchsorted(cum, np.asarray(ranks[c]), side="left")
            at_rank[c] = {
                k: float(svals[i]) for k, i in zip(ranks[c], idx)
            }
        return _interpolate_boundaries(cols, probs, n_by_col, at_rank)

    # --- coarse range buckets (correctness-neutral load balancing) ---
    bucket_expr = None
    for c in cols:
        lo, hi = mm.get(c, (0.0, 0.0))
        if hi > lo:
            b_c = F.least(
                F.floor(
                    (F.col("value") - F.lit(lo))
                    * F.lit(coarse_buckets / (hi - lo))
                ),
                F.lit(coarse_buckets - 1),
            ).cast("int")
        else:  # constant (or all-null) column: one bucket
            b_c = F.lit(0)
        cond = F.when(F.col("col") == c, b_c)
        bucket_expr = cond if bucket_expr is None else bucket_expr.when(
            F.col("col") == c, b_c
        )
    hist = hist0.withColumn("bucket", bucket_expr)

    # --- two-phase prefix sum: within-bucket window + tiny bucket offsets
    btot = (
        hist.groupBy("col", "bucket")
        .agg(F.sum("cnt").alias("btot"))
        .collect()
    )
    offsets: dict[str, list[tuple[int, int, int]]] = {c: [] for c in cols}
    run: dict[str, int] = {c: 0 for c in cols}
    for r in sorted(btot, key=lambda r: (r["col"], r["bucket"])):
        offsets[r["col"]].append((r["bucket"], run[r["col"]], r["btot"]))
        run[r["col"]] += r["btot"]

    # --- target ranks routed to the bucket whose global-rank span
    # contains them DRIVER-side, so each histogram row only tests the
    # handful of targets in its own bucket (a flat per-row filter over
    # all ~2*(bins+1) targets measured 12 s at 583 k distinct values —
    # 100x more lambda evals than needed).
    per_bucket: dict[tuple[str, int], tuple[int, list[int]]] = {}
    for c in cols:
        spans = offsets[c]
        it = iter(spans)
        bucket, off, tot = next(it)
        for k in ranks[c]:
            while k > off + tot:
                bucket, off, tot = next(it)
            key = (c, bucket)
            if key not in per_bucket:
                per_bucket[key] = (off, [])
            per_bucket[key][1].append(k)
    # the targets relation is tiny (one row per bucket that contains a
    # target rank) — an inner broadcast join both routes each histogram
    # row to its own bucket's target list AND drops targetless buckets
    targets_df = df.sparkSession.createDataFrame(
        [(c, b, off, ks) for (c, b), (off, ks) in per_bucket.items()],
        "col string, bucket int, off bigint, ks array<bigint>",
    )
    w_in = (
        Window.partitionBy("col", "bucket")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    looked = (
        hist.withColumn("cum_in", F.sum("cnt").over(w_in))
        .join(F.broadcast(targets_df), ["col", "bucket"])
        .withColumn("cum_end", F.col("off") + F.col("cum_in"))
        .withColumn("cum_start", F.col("cum_end") - F.col("cnt"))
        .select(
            "col",
            "value",
            F.explode(
                F.filter(
                    F.col("ks"),
                    lambda k: (k > F.col("cum_start")) & (k <= F.col("cum_end")),
                )
            ).alias("rank"),
        )
        .collect()
    )
    hist0.unpersist()
    at_rank: dict[str, dict[int, float]] = {c: {} for c in cols}
    for r in looked:
        at_rank[r["col"]][r["rank"]] = r["value"]
    return _interpolate_boundaries(cols, probs, n_by_col, at_rank)


def _interpolate_boundaries(
    cols: list[str],
    probs: list[float],
    n_by_col: dict[str, int],
    at_rank: dict[str, dict[int, float]],
) -> dict[str, list[float]]:
    """Driver-side lerp shared by both exact-fit branches — bit-identical
    to Spark's Percentile.getPercentile."""
    import math

    out: dict[str, list[float]] = {}
    for c in cols:
        n = n_by_col[c]
        vals = at_rank[c]
        bnds = []
        for p in probs:
            pos = p * (n - 1)
            lower = math.floor(pos)
            higher = math.ceil(pos)
            if lower == higher or vals[lower + 1] == vals[higher + 1]:
                # Spark Percentile.getPercentile short-circuits both the
                # integer-position case AND equal adjacent keys (lerping
                # x with itself would re-derive x with fp rounding)
                bnds.append(vals[lower + 1])
            else:
                # Spark Percentile.getPercentile's exact lerp form
                bnds.append(
                    (higher - pos) * vals[lower + 1]
                    + (pos - lower) * vals[higher + 1]
                )
        out[c] = bnds
    return out


def fit_quantile_boundaries_sampled(
    df: DataFrame,
    cols: list[str],
    bins: int = DEFAULT_BINS,
    sample_rows: int = 250_000,
    seed: int = 42,
) -> dict[str, list[float]]:
    """Sample-based fit: Bernoulli-sample ~sample_rows rows, Arrow-collect
    the sample, exact ``np.quantile`` per column driver-side.

    Statistics: rank error of a p-quantile from an n-row sample is
    ~sqrt(p(1-p)/n); n=250k gives ~1e-3 — the same class as the sketch at
    accuracy 1000 — and n stays FIXED as the table grows, so at 100 TB
    this is one cheap scan + a 100 MB driver sample, while sketch updates
    cost per-row CPU on every executor. Measured at 10M x 20: 3 s vs 57 s
    for percentile_approx(acc=1000) when the table is cached.

    Use over a persisted df when making multiple passes (fit + transform)
    — the same pattern as the reference holding the table in RAM
    (etl_benchmark.py:47-53)."""
    import numpy as np

    n = df.count()
    frac = min(1.0, sample_rows / max(n, 1))
    sample = df.select(cols) if frac >= 1.0 else df.select(cols).sample(frac, seed=seed)
    pdf = sample.toPandas()
    probs = np.linspace(0.0, 1.0, bins + 1)
    return {c: [float(x) for x in np.quantile(pdf[c].to_numpy(), probs)] for c in cols}


def fit_quantile_boundaries_head_sample(
    df: DataFrame,
    cols: list[str],
    bins: int = DEFAULT_BINS,
    sample_rows: int = 250_000,
) -> dict[str, list[float]]:
    """Prefix-sample fit: ``limit(sample_rows)`` + exact ``np.quantile``
    driver-side. The limit short-circuits the scan (CollectLimit stops
    after enough row groups), so unlike the Bernoulli sample — which
    decodes EVERY row to flip its coin — this reads ~sample_rows rows
    total, making fit cost constant in table size without requiring the
    table to be cached.

    Validity: a row-prefix is an unbiased sample only when row order is
    uncorrelated with values (i.i.d. generated data, ingestion-shuffled
    corpora). For time-ordered or clustered layouts use
    fit_quantile_boundaries_sampled (Bernoulli) instead — that is the
    safe default; this is the fast path you opt into when the layout
    allows (the reference's own fit sees rows in file order too,
    etl_benchmark.py:74)."""
    import numpy as np

    # limit().toPandas() is a trap: Arrow collect executes the FULL scan
    # (CollectLimit's incremental short-circuit only applies to row-based
    # actions like count/take — measured 14 s vs 1 s on a 10M-row table).
    # Instead read just enough leading part-files to cover sample_rows:
    # decodes ~one file instead of the whole table, works identically on
    # HDFS/S3 paths, and is the same deterministic prefix.
    pdf = None
    files = sorted(df.inputFiles())
    if files:
        spark = df.sparkSession
        frames = []
        got = 0
        for f in files:
            part = (
                spark.read.schema(df.schema).parquet(f)
                .select(cols).limit(sample_rows - got).toPandas()
            )
            frames.append(part)
            got += len(part)
            if got >= sample_rows:
                break
        import pandas as pd

        pdf = frames[0] if len(frames) == 1 else pd.concat(frames, ignore_index=True)
    if pdf is None:  # not a plain file scan (e.g. a derived frame)
        pdf = df.select(cols).limit(sample_rows).toPandas()
    probs = np.linspace(0.0, 1.0, bins + 1)
    return {c: [float(x) for x in np.quantile(pdf[c].to_numpy(), probs)] for c in cols}


def cumulative_value_counts(
    df: DataFrame, col: str, coarse_buckets: int = 256
) -> DataFrame:
    """Distributed ``(value, cum_end)`` relation for one numeric column:
    cum_end = #rows with value' <= value — i.e. the unnormalized CDF /
    the RANGE-frame running count ``count(*) OVER (ORDER BY col)``,
    WITHOUT the single-partition global window that expression plans as.

    Same two-phase prefix-sum shape as the exact quantile fit: value
    histogram, equal-width coarse buckets from a 1-row min/max agg,
    cumsum within (bucket) windows, tiny per-bucket offsets collected
    and broadcast-joined back. Nulls are excluded (window functions
    would rank them; callers decide null policy)."""
    mm = df.agg(
        F.min(F.col(col).cast("double")).alias("lo"),
        F.max(F.col(col).cast("double")).alias("hi"),
    ).collect()[0]
    lo = float(mm["lo"]) if mm["lo"] is not None else 0.0
    hi = float(mm["hi"]) if mm["hi"] is not None else 0.0
    if hi > lo:
        bucket = F.least(
            F.floor(
                (F.col("value") - F.lit(lo)) * F.lit(coarse_buckets / (hi - lo))
            ),
            F.lit(coarse_buckets - 1),
        ).cast("int")
    else:
        bucket = F.lit(0)
    hist = (
        df.select(F.col(col).cast("double").alias("value"))
        .filter(F.col("value").isNotNull())
        .withColumn("value", F.col("value") + F.lit(0.0))
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("bucket", bucket)
    )
    btot = sorted(
        (
            (r["bucket"], r["btot"])
            for r in hist.groupBy("bucket")
            .agg(F.sum("cnt").alias("btot"))
            .collect()
        )
    )
    run = 0
    rows = []
    for b, t in btot:
        rows.append((b, run))
        run += t
    offsets = df.sparkSession.createDataFrame(rows, "bucket int, off bigint")
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        hist.withColumn("cum_in", F.sum("cnt").over(w_in))
        .join(F.broadcast(offsets), "bucket")
        .select("value", (F.col("off") + F.col("cum_in")).alias("cum_end"))
    )


def _interior_splits(bounds: list[float]) -> list[float]:
    """Strictly-increasing interior boundaries (drop 0%/100% endpoints and
    duplicates — the reference's ``duplicates='drop'`` at
    etl_benchmark.py:34 / Bucketizer's strictly-increasing requirement).

    ``b + 0.0`` canonicalizes -0.0 to +0.0: the JVM Bucketizer binary-
    searches with Double.compare's TOTAL order (-0.0 < 0.0) while the
    numpy/torch kernels use IEEE comparison (-0.0 == 0.0) — a -0.0
    boundary or value would make the lanes disagree by one bin (found by
    hypothesis). Values are canonicalized the same way in bucketize()."""
    interior = sorted(set(b + 0.0 for b in bounds[1:-1]))
    return interior


def save_boundaries(
    spark, bounds: dict[str, list[float]], path: str
) -> None:
    """Persist a fitted boundary model as a tiny parquet artifact
    ((col, idx, value) rows — engine-neutral, human-inspectable, exact:
    doubles round-trip parquet bit-for-bit). This is the train/serve
    split the reference's in-process fit+transform lacks: fit once on
    the training corpus, ship the KB-sized model, tokenize any later
    batch/stream without refitting."""
    rows = [
        (c, i, float(v))
        for c, vals in bounds.items()
        for i, v in enumerate(vals)
    ]
    # One-slice parallelize, NOT createDataFrame(rows).coalesce(1): the
    # plain createDataFrame spreads the pickled rows over default-
    # parallelism slices, and coalesce(1) then evaluates all 32 parent
    # slices SERIALLY inside one task — one Python-worker round-trip
    # each, measured 5.3 s for a 400-row model vs 0.4 s single-slice
    # (r13; the cost landed in every first-on-box model build).
    (
        spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 1),
            "col string, idx int, value double",
        )
        .write.mode("overwrite")
        .parquet(path)
    )


def load_boundaries(spark, path: str) -> dict[str, list[float]]:
    """Reload a save_boundaries artifact. The collect is bounded by
    model size (cols × (bins+1) rows — KBs), never data size."""
    rows = spark.read.parquet(path).collect()
    out: dict[str, dict[int, float]] = {}
    for r in rows:
        out.setdefault(r["col"], {})[r["idx"]] = r["value"]
    return {
        c: [idx_map[i] for i in sorted(idx_map)]
        for c, idx_map in out.items()
    }


def bucketize(
    df: DataFrame,
    boundaries: dict[str, list[float]],
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """JVM-side binary-search bucketize (reference O7 torch.bucketize,
    etl_benchmark.py:79). Semantics: bin = #(interior boundaries <= v),
    i.e. numpy ``searchsorted(interior, v, side='right')``. The ±inf
    sentinel splits make clamping (reference O9, etl_benchmark.py:82)
    unnecessary — every finite value lands in [0, n_bins-1].

    NaN/null semantics (pinned, parity-tested across both lanes): NaN and
    null map to the LAST bin, n_bins-1 — the reference's own behavior
    (torch: bucketize(NaN)=len(bounds) then clamp to BINS-1,
    etl_benchmark.py:79-82; Numba: no threshold exceeds NaN so the
    default bins-1 sticks, etl_benchmark_numba.py:45-49). We pre-map
    NaN/null to +inf so nothing is "invalid" by the time the JVM
    Bucketizer sees it (handleInvalid='error' enforces that claim).

    Map-only stage: no shuffle, fully codegen'd, scales linearly.
    """
    from pyspark.ml.feature import Bucketizer

    cols = list(boundaries)
    splits_arr = [
        [float("-inf")] + _interior_splits(boundaries[c]) + [float("inf")]
        for c in cols
    ]
    # +0.0 canonicalizes -0.0 so the JVM's Double.compare total order
    # agrees with the kernels' IEEE comparison (see _interior_splits);
    # NaN/null -> +inf lands them in the last bucket (splits' top bucket
    # is upper-inclusive), matching np.searchsorted's NaN-at-end result
    norm_in = [f"__{c}_norm" for c in cols]
    normed = df.withColumns(
        {
            t: F.when(
                F.col(c).isNull() | F.isnan(F.col(c)), F.lit(float("inf"))
            ).otherwise(F.col(c) + F.lit(0.0))
            for c, t in zip(cols, norm_in)
        }
    )
    raw_out = [f"__{c}_bin_raw" for c in cols]
    model = Bucketizer(
        inputCols=norm_in, outputCols=raw_out, splitsArray=splits_arr,
        handleInvalid="error",
    )
    keep = keep_cols if keep_cols is not None else []
    out = model.transform(normed).select(
        *[F.col(k) for k in keep],
        *[F.col(r).cast("int").alias(f"{c}_bin") for c, r in zip(cols, raw_out)],
    )
    return out


def bucketize_pandas_udf(
    df: DataFrame,
    boundaries: dict[str, list[float]],
    keep_cols: list[str] | None = None,
    use_gpu: bool | None = None,
) -> DataFrame:
    """Arrow-vectorized bucketize — the port of the reference's GPU lane
    (etl_benchmark.py:53,79: host->device transfer + torch.bucketize).
    JVM->Python Arrow batches play the PCIe role; np.searchsorted is the
    binary search; a torch.cuda branch engages when a GPU exists.

    Same semantics as :func:`bucketize` (parity-tested). Prefer
    :func:`bucketize` in production — it stays JVM-side; this lane exists
    for custom-kernel extensibility (the reference's Numba kernel,
    etl_benchmark_numba.py:39-50, would slot in here).
    """
    from ..functions.udf_kernels import make_searchsorted_udf

    if use_gpu is None:
        try:  # GPU optional; container has no CUDA — clean CPU fallback
            import torch

            use_gpu = torch.cuda.is_available()
        except Exception:
            use_gpu = False

    keep = keep_cols if keep_cols is not None else []
    out_exprs = [F.col(k) for k in keep]
    for c in list(boundaries):
        udf = make_searchsorted_udf(_interior_splits(boundaries[c]), use_gpu)
        out_exprs.append(udf(F.col(c)).alias(f"{c}_bin"))
    return df.select(*out_exprs)


def bucketize_map_in_arrow(
    df: DataFrame,
    boundaries: dict[str, list[float]],
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Bucketize via ``mapInArrow`` — the lowest-overhead Python lane:
    raw pyarrow RecordBatches in and out, no pandas Series construction
    at all (the pandas_udf lane pays a Series wrap/unwrap per column per
    batch). Same pinned semantics as :func:`bucketize` /
    :func:`bucketize_pandas_udf`: bin = #(interior <= v) after -0.0
    canonicalization; NaN/null -> last bin (parity-tested).

    This is where a zero-copy GPU kernel would mount with minimal glue:
    Arrow buffers -> cupy/torch dlpack without a pandas detour."""
    import numpy as np

    cols = list(boundaries)
    keep = keep_cols if keep_cols is not None else []
    interiors = {
        c: np.asarray(_interior_splits(boundaries[c]), dtype=np.float64)
        for c in cols
    }
    out_fields = [(k, df.schema[k].dataType.simpleString()) for k in keep] + [
        (f"{c}_bin", "int") for c in cols
    ]
    schema = ", ".join(f"{n} {t}" for n, t in out_fields)

    def kernel(batches):
        import pyarrow as pa

        for batch in batches:
            arrays = [batch.column(batch.schema.get_field_index(k)) for k in keep]
            names = list(keep)
            for c in cols:
                vals = batch.column(batch.schema.get_field_index(c)).to_numpy(
                    zero_copy_only=False
                )  # nulls -> NaN; NaN sorts after every boundary -> last bin
                vals = vals + 0.0  # canonicalize -0.0 (see _interior_splits)
                bins = np.searchsorted(interiors[c], vals, side="right").astype(
                    "int32"
                )
                arrays.append(pa.array(bins))
                names.append(f"{c}_bin")
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return df.select(*keep, *cols).mapInArrow(kernel, schema=schema)


# ---------------------------------------------------------------------------
# End-to-end pipeline (reference entry point: scan -> fit -> transform)
# ---------------------------------------------------------------------------

def tokenize_table(
    df: DataFrame,
    cols: list[str] | None = None,
    bins: int = DEFAULT_BINS,
    keep_cols: list[str] | None = None,
    relative_error: float = 0.001,
    backend: str = "bucketizer",
) -> DataFrame:
    """scan -> fit(quantiles) -> transform(bucketize): the reference's whole
    pipeline (etl_benchmark.py gpu_etl_pytorch) as one call."""
    if cols is None:
        cols = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName() in ("double", "float")
        ]
    bounds = fit_quantile_boundaries(df, cols, bins, relative_error)
    if backend == "pandas_udf":
        return bucketize_pandas_udf(df, bounds, keep_cols=keep_cols)
    return bucketize(df, bounds, keep_cols=keep_cols)
