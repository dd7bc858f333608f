"""Corpus-level reports a training-data pipeline publishes per drop:
contamination rate per source, OOV rate against a truncated vocabulary,
and the near-dup cluster-size distribution.

These roll existing oracle-graded operators (llm_prep.decontaminate,
graph.dedup_components) up into the summary tables a data-quality
dashboard actually shows; each reuses the underlying operator's plan and
adds only bounded aggregations on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import configure_for_oracle, load_table
from .llm_prep import EVAL_CUT, EVAL_MOD, q_decontaminate


def q_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source contamination summary: how many train docs share an
    eval trigram, as exact ppm. The number that decides whether a drop
    ships; one broadcast join + one groupBy(source) on top of the
    decontaminate probe."""
    contaminated = q_decontaminate(spark, sf_dir).select(
        "doc_id", F.lit(1).alias("hit")
    )
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(
        ~(F.col("doc_id") % EVAL_MOD < EVAL_CUT)
    ).select("doc_id", "source")
    return (
        train.join(F.broadcast(contaminated), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_train_docs"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_contaminated"),
        )
        .withColumn(
            "contaminated_ppm",
            F.expr("(n_contaminated * 1000000) div n_train_docs"),
        )
    )


_CONTAMINATION_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, doc_id % {EVAL_MOD} < {EVAL_CUT} AS is_eval,
    unnest(list_distinct(list_transform(
      generate_series(1, len(string_split(lower(trim(text)), ' ')) - 2),
      i -> string_split(lower(trim(text)), ' ')[i] || ' ' ||
           string_split(lower(trim(text)), ' ')[i+1] || ' ' ||
           string_split(lower(trim(text)), ' ')[i+2]))) AS shingle
  FROM documents
), hits AS (
  SELECT DISTINCT t.doc_id
  FROM (SELECT * FROM sh WHERE NOT is_eval) t
  WHERE t.shingle IN (SELECT shingle FROM sh WHERE is_eval)
)
SELECT source, count(*) AS n_train_docs,
  CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM hits)
           THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
  (CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM hits)
            THEN 1 ELSE 0 END) AS BIGINT) * 1000000) // count(*)
    AS contaminated_ppm
FROM documents
WHERE NOT (doc_id % {EVAL_MOD} < {EVAL_CUT})
GROUP BY source
"""


VOCAB_TOP_N = 20


def q_vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OOV rate per document against a frequency-truncated top-20
    vocabulary — the tokenizer-design diagnostic (what fraction of the
    corpus a vocab of size N fails to cover). Vocabulary fit is one
    groupBy(word) + deterministic top-N; scoring is a broadcast join."""
    configure_for_oracle(spark)
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), " ")).alias("w"),
    )
    vocab = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("w").asc())
        .limit(VOCAB_TOP_N)
        .select("w", F.lit(1).alias("in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_oov"),
        )
        .withColumn("oov_ppm", F.expr("(n_oov * 1000000) div n_tokens"))
    )


_OOV_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS w
  FROM documents
), vocab AS (
  SELECT w FROM (
    SELECT w, count(*) AS cnt FROM tok GROUP BY w
    ORDER BY cnt DESC, w ASC LIMIT {VOCAB_TOP_N}
  )
)
SELECT doc_id, count(*) AS n_tokens,
  CAST(sum(CASE WHEN w IN (SELECT w FROM vocab) THEN 0 ELSE 1 END)
       AS BIGINT) AS n_oov,
  (CAST(sum(CASE WHEN w IN (SELECT w FROM vocab) THEN 0 ELSE 1 END)
        AS BIGINT) * 1000000) // count(*) AS oov_ppm
FROM tok GROUP BY doc_id
"""


def q_dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size histogram: how big the duplicate families
    are (the report that justifies dedup spend). Two tiny aggregations
    over the connected-components labels."""
    from .graph import q_dedup_components

    comp = q_dedup_components(spark, sf_dir)
    return (
        comp.groupBy("component_id")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
    )


def _cluster_oracle() -> str:
    from .graph import ORACLES as _GRAPH_ORACLES

    return f"""
SELECT cluster_size, count(*) AS n_clusters FROM (
  SELECT component_id, count(*) AS cluster_size
  FROM ({_GRAPH_ORACLES["dedup_components"]}) GROUP BY component_id
) GROUP BY cluster_size
"""


QUERIES = {
    "contamination_report": q_contamination_report,
    "vocab_oov_rate": q_vocab_oov_rate,
    "dedup_cluster_sizes": q_dedup_cluster_sizes,
}

ORACLES = {
    "contamination_report": _CONTAMINATION_ORACLE,
    "vocab_oov_rate": _OOV_ORACLE,
    "dedup_cluster_sizes": _cluster_oracle(),
}
