"""queries()/oracle_sql() entries for the quantile-bin tokenizer
(reference O4-O9 — SURVEY.md §2.1)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import configure_for_oracle, load_table
from .quantile_bin import (
    LINEITEM_KEYS,
    LINEITEM_MEASURES,
    exact_quantile_bin,
)


def q_quantile_bin_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equal-count binning (ntile semantics) of lineitem measures.

    Deterministic under ties: the window sort is extended to a total
    order with (l_orderkey, l_linenumber), matching the oracle's ORDER BY
    exactly. This is the oracle-grade variant of the reference's
    pd.qcut loop (etl_benchmark.py:30-34)."""
    configure_for_oracle(spark)
    df = load_table(spark, sf_dir, "lineitem")
    return exact_quantile_bin(
        df, LINEITEM_MEASURES, bins=100, keys=LINEITEM_KEYS, tiebreak=LINEITEM_KEYS
    )


def q_quantile_bin_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group exact binning: 10 equal-count price bins WITHIN each
    (l_returnflag, l_linestatus) segment via a PARTITIONED ntile window —
    the distributed exact lane (shuffle on the group key, per-group local
    sort; no single-partition window)."""
    from .quantile_bin import exact_quantile_bin_grouped

    configure_for_oracle(spark)
    df = load_table(spark, sf_dir, "lineitem")
    return exact_quantile_bin_grouped(
        df,
        group_cols=["l_returnflag", "l_linestatus"],
        cols=["l_extendedprice"],
        bins=10,
        tiebreak=LINEITEM_KEYS,
        keys=LINEITEM_KEYS,
    )


#: Recipe version of the persisted boundary artifact (see
#: persisted_exact_boundaries). Encodes the knobs that shape the
#: model's VALUES. Fit-LOGIC changes are caught automatically (the
#: cache tag also hashes the fit functions' source); bump this only
#: for recipe changes the source hash can't see (e.g. a data contract
#: change in the fixture itself).
_BOUNDARY_MODEL_SPEC = "exact-fit:bins=100:round=6dp:v1"


def _exact_rounded_boundaries(df: DataFrame) -> dict[str, list[float]]:
    """Deterministic, DuckDB-expressible boundary fit shared by the three
    transform lanes below: the distributed exact percentile fit
    (histogram + two-phase prefix sum — NOT the single-reducer SQL
    ``percentile`` aggregate) with the 6dp ulp treatment of
    q_quantile_bin_exact_boundaries. Production keeps the sketch fit
    (relative_error>0); only boundary PLACEMENT differs between the two,
    the transform semantics are identical."""
    from .quantile_bin import fit_quantile_boundaries

    bounds = fit_quantile_boundaries(
        df, LINEITEM_MEASURES, bins=100, relative_error=0.0
    )
    return {c: [round(x, 6) for x in v] for c, v in bounds.items()}


def q_quantile_bin_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed-exact fit + JVM Bucketizer transform — the 100 TB path
    (reference O5+O7), oracle-backed since the exact fit + 6dp rounding
    makes every bin DuckDB-expressible (VERDICT r3 item 3). The sketch
    fit stays the production default in tokenize_table; its placement-
    only divergence is parity-tested in tests/test_quantile_bin.py."""
    from .quantile_bin import bucketize

    configure_for_oracle(spark)
    df = load_table(spark, sf_dir, "lineitem")
    bounds = _exact_rounded_boundaries(df)
    # Seed the persisted boundary artifact with the fit THIS lane just
    # paid for (write-if-absent, r13): the five model-serving lanes
    # (pandas_udf / map_in_arrow / saved_model / auto_tokenize /
    # streaming tokenize) otherwise rebuild the IDENTICAL model — the
    # same _exact_rounded_boundaries over the same fixture — inside
    # whichever of them runs first on a fresh box, which is exactly the
    # intermittent 9-12 s quantile_bin_pandas_udf bench reading
    # VERDICT r10-r12 chased (guide §1.2: don't compute things you
    # throw away). This lane's subject (the distributed exact fit) is
    # unchanged — it still fits in-lane every run; only the fit's
    # OUTPUT is now reused instead of recomputed.
    persisted_exact_boundaries(spark, sf_dir, precomputed=bounds)
    return bucketize(df, bounds, keep_cols=LINEITEM_KEYS)


def q_quantile_bin_saved_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model persistence round-trip (the train/serve split): the exact
    boundary fit is SAVED as a KB-sized parquet artifact
    (write-if-absent per fixture), RELOADED from disk, and only the
    reloaded model drives the Bucketizer transform — proving the
    persisted artifact carries the full model bit-for-bit (doubles
    round-trip parquet exactly, so the oracle is the same shared
    boundary oracle as the in-memory lanes). At 100 TB this is how the
    tokenizer actually deploys: fit on the training corpus once, ship
    the artifact, tokenize every later batch/stream without refitting."""
    from .quantile_bin import bucketize

    configure_for_oracle(spark)
    df = load_table(spark, sf_dir, "lineitem")
    return bucketize(
        df, persisted_exact_boundaries(spark, sf_dir), keep_cols=LINEITEM_KEYS
    )


def persisted_exact_boundaries(
    spark: SparkSession, sf_dir: str,
    precomputed: dict[str, list[float]] | None = None,
) -> dict[str, list[float]]:
    """Load (building once per fixture) the persisted exact-fit boundary
    artifact for lineitem's measures — the fit-once/serve-forever
    artifact the saved-model lane proves. Shared with the auto-tokenize
    lane (VERDICT r5 item 4): both deploy the SAME model in production,
    so both serve from the same KB parquet artifact instead of paying
    the exact distributed fit per query.

    ``precomputed`` (r13): a boundary dict a caller ALREADY fitted with
    ``_exact_rounded_boundaries`` over this fixture — seeds the artifact
    without a second fit when the model is absent (the
    q_quantile_bin_scalable lane fits in-lane as its subject and its
    output is bit-identical to what the build here would produce, same
    function over the same files). Ignored when the model exists."""
    import hashlib
    import inspect
    import os
    import tempfile

    from .quantile_bin import (
        fit_quantile_boundaries,
        fit_quantile_boundaries_exact_distributed,
        load_boundaries,
        save_boundaries,
    )

    src = os.path.abspath(os.path.join(sf_dir, "lineitem.parquet"))
    stat = os.stat(src)
    # The tag salts the fixture identity with the MODEL recipe — five
    # oracle lanes serve this artifact, so a change to the fit/rounding
    # logic must invalidate /tmp caches. Two layers: the human-readable
    # _BOUNDARY_MODEL_SPEC for knob changes, plus a hash of the actual
    # fit-path SOURCE (this module's recipe fn and both quantile_bin
    # fit fns it rides), so an edit to the fit logic invalidates even
    # when nobody remembers to bump the spec string.
    # getsource needs the .py on disk; in a pyc-only / zipapp / frozen
    # deployment it raises OSError (ADVICE r7) — fall back to the
    # compiled bytecode, which still changes whenever the fit logic does
    # (only comment/docstring edits stop invalidating, an acceptable
    # loss vs five lanes failing outright).
    _fit_fns = (
        _exact_rounded_boundaries,
        fit_quantile_boundaries,
        fit_quantile_boundaries_exact_distributed,
    )
    try:
        fit_src = "".join(inspect.getsource(f) for f in _fit_fns).encode()
    except OSError:
        fit_src = b"".join(f.__code__.co_code for f in _fit_fns)
    recipe = hashlib.md5(fit_src).hexdigest()[:8]
    tag = hashlib.md5(
        f"{_BOUNDARY_MODEL_SPEC}:{recipe}:{src}:{stat.st_size}:"
        f"{int(stat.st_mtime)}".encode()
    ).hexdigest()[:12]
    model_dir = os.path.join(tempfile.gettempdir(), f"qbin_model_{tag}")
    if not os.path.exists(model_dir):
        # pid alone is not call-unique: two threads in one process (or a
        # retry after a failed save) would share the build path and the
        # second overwrite would delete the first's in-progress artifact
        import uuid

        build = f"{model_dir}.build-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        if precomputed is not None:
            bounds = precomputed
        else:
            df = load_table(spark, sf_dir, "lineitem")
            bounds = _exact_rounded_boundaries(df)
        save_boundaries(spark, bounds, build)
        try:
            os.rename(build, model_dir)
        except OSError:  # concurrent builder won
            import shutil

            shutil.rmtree(build, ignore_errors=True)
    return load_boundaries(spark, model_dir)


def q_quantile_bin_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized searchsorted lane (the reference's GPU-kernel
    port, etl_benchmark.py:53,79) over the same deterministic exact-fit
    boundaries — value-verifies the Python kernel's searchsorted
    semantics (incl. -0.0/NaN handling) against the SQL oracle, not just
    against the Bucketizer twin. Serves the persisted boundary model
    (bit-identical to the in-query fit) — this lane's subject is the
    Arrow KERNEL, not the fit, so it doesn't re-pay the fit."""
    from .quantile_bin import bucketize_pandas_udf

    configure_for_oracle(spark)
    df = load_table(spark, sf_dir, "lineitem")
    return bucketize_pandas_udf(
        df, persisted_exact_boundaries(spark, sf_dir), keep_cols=LINEITEM_KEYS
    )


def q_quantile_bin_exact_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boundary-path semantics proven against the oracle: exact SQL
    ``percentile`` fit (bit-identical to DuckDB ``quantile_cont`` — both
    Type-7 linear interpolation) + Bucketizer transform, mirrored in SQL
    by counting interior boundaries <= v. This gives the SCALABLE lane's
    semantics an oracle (the ntile oracle only covers the exact lane);
    the sketch-fit variant differs solely in boundary placement."""
    from .quantile_bin import bucketize, fit_quantile_boundaries

    configure_for_oracle(spark)
    df = load_table(spark, sf_dir, "lineitem")
    bounds = fit_quantile_boundaries(df, LINEITEM_MEASURES, bins=100, relative_error=0.0)
    # Round boundaries to 6dp before dedupe (mirrored in the oracle):
    # interpolated quantiles differ between engines in final ulps, which
    # makes the DEDUPED interior lists differ in LENGTH on low-cardinality
    # columns (discount/tax). With 2dp data, 6dp-rounded boundaries are
    # either exact data values (unchanged) or strictly between adjacent
    # 2dp values — so no comparison b <= v can flip.
    bounds = {c: [round(x, 6) for x in v] for c, v in bounds.items()}
    return bucketize(df, bounds, keep_cols=LINEITEM_KEYS)


#: seed-pinned generated fixture (VERDICT r3 item 6): rows/cols/seed AND
#: numPartitions are all fixed, so spark.range+randn content is
#: byte-stable across runs and hosts — a stale parquet from an earlier
#: run is bit-identical to a fresh one, making write-if-absent safe for
#: the oracle, which reads the SAME files the Spark query reads back.
GEN_ROWS, GEN_COLS, GEN_SEED, GEN_PARTS = 100_000, 8, 42, 8
_GEN_COLNAMES = [f"col_{i}" for i in range(GEN_COLS)]


def _generated_path() -> str:
    import os
    import tempfile

    return os.path.join(
        tempfile.gettempdir(),
        f"tokgen_r{GEN_ROWS}_c{GEN_COLS}_s{GEN_SEED}_p{GEN_PARTS}",
    )


def q_tokenize_generated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference workload end-to-end (O1->O2->O3->O5->O7): generate the
    randn table with spark.range+randn, sink to parquet (write-if-absent,
    deterministic content — see GEN_* note), scan it back, exact-fit
    boundaries, bucketize. Oracle-backed: DuckDB reads the SAME parquet
    files, so O1's output is value-verified, not just row-counted. 6dp
    boundary rounding applied identically on both sides collapses
    cross-engine interpolation ulps (same treatment as the lineitem
    lanes; adjacent 1%-quantile spacing on 100k randn is ~1e-3, three
    orders above the rounding quantum, so no bin can flip)."""
    import os

    from ..sources.generator import generate_normal_table
    from .quantile_bin import bucketize, fit_quantile_boundaries

    configure_for_oracle(spark)
    path = _generated_path()
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        df = generate_normal_table(
            spark,
            rows=GEN_ROWS,
            cols=GEN_COLS,
            seed=GEN_SEED,
            num_partitions=GEN_PARTS,
            include_id=True,
        )
        df.write.mode("ignore").parquet(path)
    back = spark.read.parquet(path)
    bounds = fit_quantile_boundaries(
        back, _GEN_COLNAMES, bins=100, relative_error=0.0
    )
    bounds = {c: [round(x, 6) for x in v] for c, v in bounds.items()}
    return bucketize(back, bounds, keep_cols=["id"])


_NTILE_COLS = ",\n  ".join(
    f"CAST(ntile(100) OVER (ORDER BY {c}, l_orderkey, l_linenumber) - 1 AS INTEGER)"
    f" AS {c}_bin"
    for c in LINEITEM_MEASURES
)

_PROBS = ",".join(str(i / 100) for i in range(101))
_BND_COLS = ",\n    ".join(
    f"list_sort(list_distinct(list_transform("
    f"list_slice(quantile_cont({c}, [{_PROBS}]), 2, 100), x -> round(x, 6)))) AS b_{c}"
    for c in LINEITEM_MEASURES
)
_BIN_COLS = ",\n  ".join(
    f"CAST(len(list_filter(b.b_{c}, x -> x <= t.{c})) AS INTEGER) AS {c}_bin"
    for c in LINEITEM_MEASURES
)

def q_quantile_bin_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-Arrow kernel lane (mapInArrow — no pandas layer; see
    bucketize_map_in_arrow) over the deterministic exact-fit boundaries —
    oracle-backed like the other two transform lanes; NaN/null parity
    with the Bucketizer lane additionally test-pinned. Serves the
    persisted boundary model like the pandas_udf lane — the subject is
    the raw-Arrow kernel, not the fit."""
    from .quantile_bin import bucketize_map_in_arrow

    configure_for_oracle(spark)
    df = load_table(spark, sf_dir, "lineitem")
    return bucketize_map_in_arrow(
        df, persisted_exact_boundaries(spark, sf_dir), keep_cols=LINEITEM_KEYS
    )


QUERIES = {
    "quantile_bin_per_group": q_quantile_bin_per_group,
    "quantile_bin_lineitem": q_quantile_bin_lineitem,
    "quantile_bin_map_in_arrow": q_quantile_bin_map_in_arrow,
    "quantile_bin_exact_boundaries": q_quantile_bin_exact_boundaries,
    "quantile_bin_scalable": q_quantile_bin_scalable,
    "quantile_bin_saved_model": q_quantile_bin_saved_model,
    "quantile_bin_pandas_udf": q_quantile_bin_pandas_udf,
    "tokenize_generated": q_tokenize_generated,
}

# Shared oracle for the three transform lanes (Bucketizer / pandas_udf /
# mapInArrow): all consume the same exact-fit 6dp-rounded boundaries, so
# bin = #(interior boundaries <= v) is one SQL shape. Keeping three
# entries (not one) keeps each lane independently sampled by the gate.
_EXACT_BOUNDARY_ORACLE = f"""
WITH b AS (
  SELECT
    {_BND_COLS}
  FROM lineitem
)
SELECT t.l_orderkey, t.l_linenumber,
  {_BIN_COLS}
FROM lineitem t, b
"""

_GEN_PROBS = ",".join(str(i / 100) for i in range(101))
_GEN_BND_COLS = ",\n    ".join(
    f"list_sort(list_distinct(list_transform("
    f"list_slice(quantile_cont({c}, [{_GEN_PROBS}]), 2, 100), x -> round(x, 6)))) AS b_{c}"
    for c in _GEN_COLNAMES
)
_GEN_BIN_COLS = ",\n  ".join(
    f"CAST(len(list_filter(b.b_{c}, x -> x <= t.{c})) AS INTEGER) AS {c}_bin"
    for c in _GEN_COLNAMES
)

ORACLES = {
    "quantile_bin_scalable": _EXACT_BOUNDARY_ORACLE,
    "quantile_bin_saved_model": _EXACT_BOUNDARY_ORACLE,
    "quantile_bin_pandas_udf": _EXACT_BOUNDARY_ORACLE,
    "quantile_bin_map_in_arrow": _EXACT_BOUNDARY_ORACLE,
    "tokenize_generated": f"""
WITH t AS (
  SELECT * FROM read_parquet('{_generated_path()}/*.parquet')
), b AS (
  SELECT
    {_GEN_BND_COLS}
  FROM t
)
SELECT t.id,
  {_GEN_BIN_COLS}
FROM t, b
""",
    "quantile_bin_per_group": """
SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus,
  CAST(ntile(10) OVER (PARTITION BY l_returnflag, l_linestatus
                       ORDER BY l_extendedprice, l_orderkey, l_linenumber)
       - 1 AS INTEGER) AS l_extendedprice_bin
FROM lineitem
""",
    "quantile_bin_lineitem": f"""
SELECT l_orderkey, l_linenumber,
  {_NTILE_COLS}
FROM lineitem
""",
    "quantile_bin_exact_boundaries": f"""
WITH b AS (
  SELECT
    {_BND_COLS}
  FROM lineitem
)
SELECT t.l_orderkey, t.l_linenumber,
  {_BIN_COLS}
FROM lineitem t, b
""",
}
