"""End-to-end training-data-preparation pipeline — the composite a user
of the reference actually wants at 100 TB: quality-filter -> dedup ->
tokenize -> partitioned sink, each stage one of the engine's operators.

Stage plan shapes (why this survives scale-up):
1. quality filter: map-only column expressions over the documents scan;
2. exact dedup: one shuffle keyed on a 16-byte digest (not the text);
3. near-dedup: MinHash-LSH candidates + verified Jaccard (bounded
   shuffles; see operators/dedup.py);
4. numeric tokenize: sketch fit (KBs of driver state) + map-only
   bucketize;
5. sink: partitioned parquet so downstream reads prune.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.dedup import minhash_near_dup_drop_ids
from .operators.model import QuantileBinModel
from .operators.text import STOPWORDS
from .session import load_table, spread_small_scan


def quality_filter(
    docs: DataFrame,
    min_tokens: int = 20,
    max_stopword_ratio: float = 0.5,
    min_unique_ratio: float = 0.3,
) -> DataFrame:
    """Gopher/C4-style heuristic quality gate (map-only)."""
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_ratio = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))) / n_tok
    uniq_ratio = F.size(F.array_distinct(toks)) / n_tok
    return docs.filter(
        (n_tok >= min_tokens)
        & (stop_ratio <= max_stopword_ratio)
        & (uniq_ratio >= min_unique_ratio)
    )


def dedup_near_remove(docs: DataFrame) -> DataFrame:
    """Drop near-duplicates of each LSH bucket's min-id representative
    (MinHash-LSH buckets, exact-Jaccard verified >= threshold against
    the representative only — linear in corpus size, vs the all-pairs
    formulation that is quadratic in near-dup cluster size; see
    minhash_near_dup_drop_ids). Runs on the already-filtered/exact-
    deduped corpus — near-dedup of rows earlier stages discarded is
    wasted work."""
    drop = minhash_near_dup_drop_ids(docs)
    return docs.join(drop, "doc_id", "left_anti")


def prepare_training_data(
    spark: SparkSession,
    sf_dir: str,
    out_path: str | None = None,
    near_dedup: bool = True,
) -> DataFrame:
    """documents + lineitem-derived numeric features -> one tokenized,
    deduped, quality-filtered training table."""
    # spread an under-split scan across cores before the expression-
    # bound quality gate (r12, guide §2.5; no-op at production split
    # counts)
    docs = spread_small_scan(
        load_table(spark, sf_dir, "documents"), spark,
        key=f"{sf_dir}/documents.parquet",  # memoized probe (ADVICE r12)
    )
    # Exact dedup via a BOUNDED pin (r13, VERDICT r12 item 4: the r12
    # shape localCheckpointed the full quality-filtered TEXT corpus —
    # size-of-data to executor-local storage). Guide §8 discipline:
    # decide with small rows, move big rows once. The quality gate +
    # digest run ONCE, projected to (doc_id, fp) — ids + 16-byte
    # digests, the bounded decision table — and that is all that pins;
    # the winner set is a min-per-digest over the pinned table; the
    # text-bearing rows then move once through a semi-join keyed on the
    # unique doc_id (reps ⊆ quality survivors, so the raw scan needs no
    # second quality-gate evaluation). Size class of the pin: O(n) rows
    # x ~40 bytes (no text).
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    keyed = (
        quality_filter(docs).select("doc_id", fp.alias("fp"))
        .localCheckpoint()
    )
    reps = (
        keyed.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    # persist: the near-dedup stage references this frame from several
    # self-join branches (signatures, bands, verification) — without the
    # cache each branch re-runs the scan+semi-join lineage from parquet.
    # persist (MEMORY_AND_DISK) rather than localCheckpoint: spill-safe,
    # lineage preserved, and released explicitly below.
    base = docs.join(reps, "doc_id", "left_semi").persist()
    docs = base
    if near_dedup:
        # persist the near-deduped corpus too: fit, transform and the
        # sink are three separate actions — uncached, EACH re-ran the
        # whole MinHash drop computation (measured 3x ~10 s at sf0.1).
        # Materialize it eagerly so the pre-dedup cache can be released
        # before the downstream stages run.
        docs = dedup_near_remove(base).persist()
        docs.count()
        base.unpersist()

    # numeric side: tokenize document stats (the reference op applied to
    # derived features) — fit on the filtered corpus, map-only transform
    feats = docs.select(
        "doc_id",
        "lang",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("double").alias("f_tokens"),
        F.length("text").cast("double").alias("f_chars"),
    )
    model = QuantileBinModel.fit(feats, ["f_tokens", "f_chars"], bins=20)
    tokenized = model.transform(feats, keep_cols=["doc_id", "lang", "source"])
    if out_path:
        tokenized.write.mode("overwrite").partitionBy("lang").parquet(out_path)
    return tokenized


def q_training_data_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry (rows-only: composition of oracle-covered stages +
    an approximate near-dedup stage)."""
    return prepare_training_data(spark, sf_dir, out_path=None)


def build_analytics_mart(
    spark: SparkSession, sf_dir: str, out_path: str | None = None
) -> DataFrame:
    """Warehouse-mart composite: star denormalize (all dims broadcast,
    one fact-fact shuffle — operators/analytics.q_denormalize_star) ->
    (region, brand, day) revenue rollup -> optional region-partitioned
    sink so downstream reads prune. The rollup aggregates the join
    output directly: revenue stays an exact decimal until the final e4
    integer export."""
    from .operators.analytics import q_denormalize_star

    flat = q_denormalize_star(spark, sf_dir)
    mart = (
        flat.groupBy(
            "cust_region",
            "p_brand",
            F.expr(
                "datediff(cast(o_orderdate as date), date'1970-01-01')"
            ).alias("order_day"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (F.sum(F.col("net_price").cast("decimal(18,4)")) * 10000)
            .cast("bigint")
            .alias("revenue_e4"),
        )
    )
    if out_path:
        mart.write.mode("overwrite").partitionBy("cust_region").parquet(
            out_path
        )
    return mart


def q_mart_region_brand_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_analytics_mart(spark, sf_dir)


_MART_ORACLE = """
SELECT r_name AS cust_region, p_brand,
  epoch_us(o_orderdate) // 86400000000 AS order_day,
  count(*) AS n_items,
  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount), 4)
                AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY 1, 2, 3
"""


def q_corpus_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation, fully value-verified: quality gate
    (the exact rational rules of quality_gate_verdict) -> exact dedup
    among survivors (md5 digest, keep-lowest-doc_id) -> per-source
    accounting of every document's fate plus kept-token volume. The
    oracle replays the whole pipeline in one SQL statement, so this is
    the composite twin of training_data_prep with a full value check
    instead of rows-only (minhash is swapped for exact dedup precisely
    to keep the composite deterministic).

    Scale shape: gate flags are map-only; the dedup winner is a
    min-over-window on the 32-byte digest (one shuffle, text never
    moves); the report is a partial agg onto |sources| rows."""
    from pyspark.sql import Window

    from .operators.llm_prep2 import (
        _UNIQ_P,
        _UNIQ_Q,
        _UPPER_P,
        _UPPER_Q,
        GATE_MIN_TOKENS,
    )
    from .session import configure_for_oracle

    configure_for_oracle(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.split(F.col("text"), " ").alias("toks"),
        F.length(F.regexp_replace(F.col("text"), "[^A-Z]", "")).alias(
            "n_upper"
        ),
        F.length(F.col("text")).alias("n_chars"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("fp"),
    )
    n_tok = F.size("toks")
    n_uniq = F.size(F.array_distinct("toks"))
    keep_q = (
        (n_tok >= GATE_MIN_TOKENS)
        & (F.col("n_upper") * _UPPER_Q <= F.lit(_UPPER_P) * F.col("n_chars"))
        & (n_uniq * _UNIQ_Q >= F.lit(_UNIQ_P) * n_tok)
    ).cast("int")
    flagged = docs.select(
        "doc_id", "source", "fp", n_tok.alias("n_tokens"), keep_q.alias("keep_q")
    )
    w_fp = Window.partitionBy("fp")
    min_kept = F.min(
        F.when(F.col("keep_q") == 1, F.col("doc_id"))
    ).over(w_fp)
    fated = flagged.withColumn(
        "fate",
        F.when(F.col("keep_q") == 0, F.lit("quality_drop"))
        .when(F.col("doc_id") != min_kept, F.lit("dup_drop"))
        .otherwise(F.lit("kept")),
    )
    return fated.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum((F.col("fate") == "quality_drop").cast("int"))
        .cast("bigint")
        .alias("n_dropped_quality"),
        F.sum((F.col("fate") == "dup_drop").cast("int"))
        .cast("bigint")
        .alias("n_dropped_dup"),
        F.sum((F.col("fate") == "kept").cast("int"))
        .cast("bigint")
        .alias("n_kept"),
        F.sum(
            F.when(F.col("fate") == "kept", F.col("n_tokens")).otherwise(0)
        )
        .cast("bigint")
        .alias("tokens_kept"),
    )


def _curation_oracle() -> str:
    from .operators.llm_prep2 import (
        _UNIQ_P,
        _UNIQ_Q,
        _UPPER_P,
        _UPPER_Q,
        GATE_MIN_TOKENS,
    )

    return f"""
WITH flagged AS (
  SELECT doc_id, source,
    md5(lower(trim(text))) AS fp,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
    CAST(
      len(string_split(text, ' ')) >= {GATE_MIN_TOKENS}
      AND length(regexp_replace(text, '[^A-Z]', '', 'g')) * {_UPPER_Q}
          <= {_UPPER_P} * length(text)
      AND len(list_distinct(string_split(text, ' '))) * {_UNIQ_Q}
          >= {_UNIQ_P} * len(string_split(text, ' '))
      AS INTEGER) AS keep_q
  FROM documents
), fated AS (
  SELECT source, n_tokens,
    CASE WHEN keep_q = 0 THEN 'quality_drop'
         WHEN doc_id != min(CASE WHEN keep_q = 1 THEN doc_id END)
              OVER (PARTITION BY fp) THEN 'dup_drop'
         ELSE 'kept' END AS fate
  FROM flagged
)
SELECT source, count(*) AS n_total,
  CAST(sum(CASE WHEN fate = 'quality_drop' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_dropped_quality,
  CAST(sum(CASE WHEN fate = 'dup_drop' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_dropped_dup,
  CAST(sum(CASE WHEN fate = 'kept' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_kept,
  CAST(sum(CASE WHEN fate = 'kept' THEN n_tokens ELSE 0 END) AS BIGINT)
    AS tokens_kept
FROM fated GROUP BY source
"""


QUERIES = {
    "training_data_prep": q_training_data_prep,
    "mart_region_brand_daily": q_mart_region_brand_daily,
    "corpus_curation_report": q_corpus_curation_report,
}
ORACLES: dict[str, str] = {
    "mart_region_brand_daily": _MART_ORACLE,
    "corpus_curation_report": _curation_oracle(),
}
