"""Statistical language-model features over the documents corpus:
unigram-LM negative log-likelihood scoring (the CCNet/KenLM-style
"score text by a corpus LM" quality signal, at unigram order so it is
exactly SQL-expressible) and hashing-trick bag-of-words featurization.

Reference parity: none — the reference has no text surface (SURVEY.md
§2.2); these are LLM-data-pipeline completeness ops next to
text.py's heuristics and llm_prep.py's tf-idf.

Scale design (100 TB):
- Unigram LM: the model IS the word-frequency table — one explode +
  groupBy(word) shuffle builds it; the corpus total is a 1-row agg. Both
  broadcast into the scoring pass, which is explode → map-side hash join
  → per-doc partial aggregation. Per-word surprisal is quantized to
  integer micro-nats BEFORE the per-doc sum, so cross-row aggregation is
  exact integer math in any order.
- Feature hashing: dim = md5-derived bucket (deterministic on both
  engines, no stored vocabulary — the point of the hashing trick); the
  only shuffle is groupBy(doc_id, dim). Long-form output (doc_id, dim,
  n) is the join-friendly sparse representation; assembling a dense
  array is a map-only collect_list away.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import configure_for_oracle, load_table

HASH_DIMS = 64


def _tok(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_for_oracle(spark)
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), " ")).alias("w"),
    )


def q_unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram negative log-likelihood in micro-nats:
    nll(d) = Σ_w∈d −ln(count(w)/total). Low = fluent-under-the-corpus,
    high = surprising — the sort key for perplexity-filtered pretraining
    data. (A real pipeline swaps the unigram table for a KenLM shard;
    the join/aggregate topology is identical.)"""
    tok = _tok(spark, sf_dir)
    vocab = tok.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    total = tok.agg(F.count(F.lit(1)).alias("total"))
    wm = (
        vocab.crossJoin(F.broadcast(total))
        .withColumn(
            "nll_micro",
            F.round(
                F.round(
                    -F.log(
                        F.col("cnt").cast("double")
                        / F.col("total").cast("double")
                    ),
                    6,
                )
                * 1_000_000
            ).cast("bigint"),
        )
        .select("w", "nll_micro")
    )
    return tok.join(F.broadcast(wm), "w").groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("nll_micro").alias("nll_micro_total"),
    )


_UNIGRAM_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS w
  FROM documents
), vocab AS (
  SELECT w, count(*) AS cnt FROM tok GROUP BY w
), tot AS (SELECT count(*) AS total FROM tok),
wm AS (
  SELECT w,
    CAST(round(round(-ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE)), 6)
               * 1000000) AS BIGINT) AS nll_micro
  FROM vocab, tot
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
  CAST(sum(nll_micro) AS BIGINT) AS nll_micro_total
FROM tok JOIN wm USING (w)
GROUP BY doc_id
"""


def q_feature_hashing_bow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick bag-of-words: each token hashes to one of 64 dims
    (md5 prefix — engine-portable and deterministic, no fitted
    vocabulary), counts aggregated per (doc, dim). Sparse long-form
    output."""
    tok = _tok(spark, sf_dir)
    dim = F.expr(
        f"cast(conv(substring(md5(w), 1, 4), 16, 10) as int) % {HASH_DIMS}"
    )
    return tok.groupBy("doc_id", dim.alias("dim")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


_HASHING_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS w
  FROM documents
)
SELECT doc_id,
  (('0x' || substr(md5(w), 1, 4))::INTEGER) % {HASH_DIMS} AS dim,
  count(*) AS n
FROM tok GROUP BY 1, 2
"""


QUERIES = {
    "unigram_lm_score": q_unigram_lm_score,
    "feature_hashing_bow": q_feature_hashing_bow,
}

ORACLES = {
    "unigram_lm_score": _UNIGRAM_ORACLE,
    "feature_hashing_bow": _HASHING_ORACLE,
}
