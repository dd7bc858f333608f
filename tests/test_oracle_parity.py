"""Drive every queries() entry against its DuckDB oracle — the local
mirror of the driver's CORRECTNESS gate. Any query added to the registry
is automatically picked up here."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tests.oracle_harness import compare, duckdb_conn  # noqa: E402

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.count()
    assert rows > 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    # Sweeping physical-plan audit, free because the plan is already
    # built: NO query in the registry may plan a CartesianProduct — a
    # cartesian at 100 TB is a scale-killer regardless of fixture size.
    # (Bounded 1-row / tiny-relation cross joins plan as
    # BroadcastNestedLoopJoin, which is allowed; only the real
    # cartesian operator is banned.)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    assert name in QUERIES, f"oracle {name} has no query"
    df = QUERIES[name](spark, sf_dir)
    con = duckdb_conn(sf_dir)
    try:
        compare(df, con, ORACLES[name], name)
    finally:
        con.close()


def test_oracle_output_types_portable():
    """Registry-wide pin for the VERDICT-r4 failure class: DuckDB's
    sum(BIGINT) / windowed sum / integer `//` silently widen to HUGEINT
    (arrow decimal128(38,0)), and DECIMAL outputs surface as decimal128 —
    either diverges from Spark's int64/double in the driver's value-hash
    even when every value is bit-equal (bm25_search, r4). DESCRIBE every
    oracle (bind only, no execution) and ban HUGEINT/UHUGEINT/DECIMAL
    output columns outright: money and ratio columns are exported as
    µ-unit BIGINT on both sides across this repo, so no oracle has a
    legitimate reason to emit one."""
    from tests.conftest import SF_CORRECT

    con = duckdb_conn(SF_CORRECT)
    try:
        offenders = {}
        for name, sql in sorted(ORACLES.items()):
            desc = con.execute("DESCRIBE " + sql).fetchall()
            bad = [
                (col, typ)
                for col, typ, *_ in desc
                if "HUGEINT" in typ.upper() or "DECIMAL" in typ.upper()
            ]
            if bad:
                offenders[name] = bad
        assert not offenders, (
            "oracle output columns with hash-diverging physical types "
            f"(cast to BIGINT / export µ-units instead): {offenders}"
        )
    finally:
        con.close()


def test_registry_imports_every_module():
    """The registry's ImportError guard exists so the engine can grow
    module-by-module — but a typo'd import must not SILENTLY drop a
    module's queries from the external gate."""
    from auto_tabular_gpu_accelerated_etl_schema_inference_pipeline_spark import (
        queries_registry as qr,
    )

    assert len(qr._modules()) == len(qr._MODULES)


def test_registry_rotation_invariants():
    """The rotation bookkeeping the external gate rides on, machine-
    checked (VERDICT r7 item 4): the curated window must be exactly the
    oracle-backed 50-slot prefix a prefix-sampling driver sees — no
    typo'd name can silently burn a slot — and _DRIVER_VERIFIED must be
    exactly the union of fully-green rows across every committed
    CORRECTNESS_r*.json (no wishful folding, no forgotten greens)."""
    import glob
    import json

    from auto_tabular_gpu_accelerated_etl_schema_inference_pipeline_spark import (
        queries_registry as qr,
    )

    window, dv = qr._PRIORITY_WINDOW, qr._DRIVER_VERIFIED
    assert len(window) == len(set(window)), "duplicate window entries"
    missing = [n for n in window if n not in QUERIES]
    assert not missing, f"window names absent from registry: {missing}"
    not_oracle = [n for n in window if n not in ORACLES]
    assert not not_oracle, f"window names without an oracle: {not_oracle}"
    assert dv <= set(QUERIES), sorted(dv - set(QUERIES))
    prefix = [n for n in QUERIES if n in ORACLES][: len(window)]
    assert prefix == list(window), "window != sampled oracle-backed prefix"

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    greens: set[str] = set()
    for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        for name, v in json.load(open(f)).items():
            if (
                v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match")
                and not v.get("err")
            ):
                greens.add(name)
    assert dv == greens, (sorted(dv - greens), sorted(greens - dv))
