"""Local mirror of the driver's correctness gate: run a queries() entry on
Spark and its oracle_sql() on DuckDB over the same parquet, compare
row-count, column names, and order-insensitive values (doubles rounded to
absorb summation-order noise — the real driver hashes values, so queries
are written to round on BOTH sides; the tolerance here is a safety net
for the comparison itself, not a license for loose queries)."""

from __future__ import annotations

import math

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 15 significant digits ≈ bit-exact for doubles; queries are built
        # on exact decimal arithmetic so both engines should agree fully.
        return f"{v:.15g}"
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    return sorted(out, key=repr)


def compare(spark_df, con, sql: str, name: str = "query"):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: rowcount spark={len(s_rows)} duck={len(d_rows)}"
    )
    sn = _normalize(s_rows, s_cols)
    dn = _normalize(d_rows, d_cols)
    mismatches = [(a, b) for a, b in zip(sn, dn) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} value mismatches; first: {mismatches[:3]}"
