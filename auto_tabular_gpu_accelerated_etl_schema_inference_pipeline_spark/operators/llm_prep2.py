"""LLM training-data preparation operators, part 2 (north star in
BASELINE.json; absent from the reference, SURVEY.md §2.2): overlapping
document chunking, exact z-score feature standardization, and skew-safe
two-phase (salted) aggregation.

Scale design (100 TB):
- doc_chunk_overlap is a map-only explode: each document expands to its
  chunk windows inside the scan stage — no shuffle, output rows ~= input
  tokens / stride. The standard pre-embedding / pre-indexing step that
  splits long documents into overlapping context windows.
- zscore_normalize is the classic fit/transform split of the flagship
  tokenizer applied to standardization: the "fit" is one aggregation
  producing KBs of driver state (count + exact integer sums), the
  transform is map-only arithmetic. Sums run in exact integer/decimal
  space so the fitted moments are bit-identical regardless of partition
  count or aggregation order — the float-sum nondeterminism that plagues
  distributed standardization is engineered out, not tolerated.
- agg_salted_sum demonstrates the two-phase aggregation a skewed key
  distribution needs at scale: partial aggregate on (key, salt) spreads
  one hot key over 16 reducers, the final aggregate combines 16 small
  partials. Decimal partials make the salt provably result-neutral (the
  oracle is the UNSALTED single-phase SQL — same bits out).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import configure_for_oracle, load_events, load_table

#: chunk window / stride, in whitespace tokens (fixture docs average ~50
#: tokens, so each doc yields a handful of overlapping chunks)
CHUNK_TOKENS = 16
CHUNK_STRIDE = 12

#: salt fan-out for the two-phase aggregation
SALT_BUCKETS = 16


def q_doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into overlapping token windows: starts at
    1, 1+stride, 1+2*stride, ... <= n_tokens; each chunk keeps up to
    CHUNK_TOKENS tokens. Emits (doc_id, chunk_idx, chunk_start,
    n_chunk_tokens, chunk_text).

    Physical shape: sequence+posexplode+slice inside the scan stage —
    a pure map-side 1-to-N expansion with zero shuffle at any scale
    (the chunker every embedding/RAG pipeline runs before encoding)."""
    configure_for_oracle(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), " ")
    exploded = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.posexplode(
            F.sequence(F.lit(1), F.size(toks), F.lit(CHUNK_STRIDE))
        ).alias("chunk_idx", "s"),
    )
    chunk = F.slice(F.col("toks"), F.col("s"), CHUNK_TOKENS)
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("s").cast("int").alias("chunk_start"),
        F.size(chunk).cast("int").alias("n_chunk_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


# lineitem measures standardized by the z-score transform, with the
# centi-unit scale that makes their sums exact integers (fixture values
# carry at most 2 decimals)
_Z_COLS = ["l_quantity", "l_extendedprice"]


def q_zscore_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score standardization of lineitem measures — the numeric
    feature-scaling twin of the reference's quantile tokenizer (same
    fit/transform shape as etl_benchmark.py:74,79: one reduction produces
    per-column state, then a map-only transform applies it).

    Exactness engineering: values are 2-decimal fixed-point, so the fit
    sums centi-unit BIGINTs (and decimal(38,0) squares) — exact in any
    aggregation order. mean/stddev then come from ONE identical double
    expression over those exact integers in both engines, and the
    per-row z-score is emitted in micro-units so the comparison is
    integer equality."""
    configure_for_oracle(spark)
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count("*").alias("n")]
    for c in _Z_COLS:
        cc = F.round(F.col(c) * 100).cast("bigint")
        aggs.append(F.sum(cc).alias(f"s_{c}"))
        aggs.append(
            F.sum((cc.cast("decimal(19,0)") * cc.cast("decimal(19,0)"))).alias(f"ss_{c}")
        )
    stats = li.agg(*aggs)
    out = li.join(F.broadcast(stats))  # 1-row stats: map-only enrich
    cols = [F.col("l_orderkey"), F.col("l_linenumber")]
    for c in _Z_COLS:
        xc = F.round(F.col(c) * 100).cast("bigint").cast("double")
        n = F.col("n").cast("double")
        mean = F.col(f"s_{c}").cast("double") / n
        var = (F.col(f"ss_{c}").cast("double") - mean * F.col(f"s_{c}").cast("double")) / n
        z = (xc - mean) / F.sqrt(var)
        cols.append(F.round(z * 1_000_000).cast("bigint").alias(f"z_{c}_mu"))
    return out.select(*cols)


def q_agg_salted_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over events: phase 1 groups by
    (event_type, salt=hash(event_id)%16) and computes decimal partials;
    phase 2 combines the 16 partials per key. On a skewed key
    distribution this spreads each hot key over 16 reducers — the
    standard fix when one group key holds 30% of a 100 TB table and AQE
    skew handling can't split a hash aggregate. Decimal partial sums
    commute exactly, so the result is bit-identical to the unsalted
    single-phase SQL the oracle runs."""
    configure_for_oracle(spark)
    ev = load_events(spark, sf_dir)
    partial = (
        ev.groupBy(
            "event_type",
            F.pmod(F.xxhash64("event_id"), F.lit(SALT_BUCKETS)).alias("salt"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(12,2)")).alias("psum"),
            F.count("*").alias("pn"),
        )
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("psum").cast("double").alias("sum_value"),
            F.sum("pn").alias("n_events"),
        )
    )


QUERIES = {
    "doc_chunk_overlap": q_doc_chunk_overlap,
    "zscore_normalize": q_zscore_normalize,
    "agg_salted_sum": q_agg_salted_sum,
}

ORACLES = {
    "doc_chunk_overlap": f"""
WITH t AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks
  FROM documents
), s AS (
  SELECT doc_id, toks,
    unnest(generate_series(1, len(toks), {CHUNK_STRIDE})) AS st
  FROM t
)
SELECT doc_id,
  CAST((st - 1) // {CHUNK_STRIDE} AS INTEGER) AS chunk_idx,
  CAST(st AS INTEGER) AS chunk_start,
  CAST(len(list_slice(toks, st, st + {CHUNK_TOKENS} - 1)) AS INTEGER)
    AS n_chunk_tokens,
  array_to_string(list_slice(toks, st, st + {CHUNK_TOKENS} - 1), ' ')
    AS chunk_text
FROM s
""",
    "zscore_normalize": """
WITH stats AS (
  SELECT count(*) AS n,
    sum(CAST(round(l_quantity * 100) AS BIGINT)) AS s_q,
    sum(CAST(CAST(round(l_quantity * 100) AS BIGINT) AS DECIMAL(19,0))
        * CAST(CAST(round(l_quantity * 100) AS BIGINT) AS DECIMAL(19,0))) AS ss_q,
    sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS s_p,
    sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(19,0))
        * CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(19,0))) AS ss_p
  FROM lineitem
)
SELECT l_orderkey, l_linenumber,
  CAST(round((CAST(CAST(round(l_quantity * 100) AS BIGINT) AS DOUBLE)
      - CAST(s_q AS DOUBLE) / CAST(n AS DOUBLE))
    / sqrt((CAST(ss_q AS DOUBLE)
      - (CAST(s_q AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(s_q AS DOUBLE))
      / CAST(n AS DOUBLE))
    * 1000000) AS BIGINT) AS z_l_quantity_mu,
  CAST(round((CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DOUBLE)
      - CAST(s_p AS DOUBLE) / CAST(n AS DOUBLE))
    / sqrt((CAST(ss_p AS DOUBLE)
      - (CAST(s_p AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(s_p AS DOUBLE))
      / CAST(n AS DOUBLE))
    * 1000000) AS BIGINT) AS z_l_extendedprice_mu
FROM lineitem CROSS JOIN stats
""",
    "agg_salted_sum": """
SELECT event_type,
  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
  count(*) AS n_events
FROM events
GROUP BY event_type
""",
}
