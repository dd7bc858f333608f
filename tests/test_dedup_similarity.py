"""Cross-checks the oracle can't express: LSH candidate recall against
the exact operators (the reference never compared its redundant
implementations — SURVEY.md §5; we hold approximate paths to their exact
twins)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from auto_tabular_gpu_accelerated_etl_schema_inference_pipeline_spark.operators import (  # noqa: E402
    dedup,
    similarity,
)


def test_minhash_pairs_subset_of_exact(spark, sf_dir):
    """Every MinHash-verified pair IS an exact-Jaccard pair (verification
    step guarantees precision=1; recall is the S-curve's business)."""
    exact = {
        (r["a_id"], r["b_id"]) for r in dedup.q_dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    mh = {
        (r["a_id"], r["b_id"]) for r in dedup.q_dedup_minhash_lsh(spark, sf_dir).collect()
    }
    assert mh <= exact
    if exact:  # recall floor: banding 4x4 at j>=0.95 collides w.p. ~1-(1-0.95^4)^4 ≈ 0.97
        assert len(mh) / len(exact) > 0.5


def test_simhash_runs_and_pairs_sane(spark, sf_dir):
    pairs = dedup.q_dedup_simhash(spark, sf_dir).collect()
    for r in pairs:
        assert r["a_id"] < r["b_id"]
        assert 0 <= r["hamming"] <= 4


def test_ivf_topk_hits_are_genuine(spark, sf_dir):
    """IVF cells restrict the candidate set; every returned neighbor must
    carry its true brute-force cosine, and rank-1 recall should be decent
    (the top neighbor usually shares the query's cell)."""
    brute = {
        (r["q_id"], r["c_id"]): r["cosine"]
        for r in similarity.q_similarity_topk_cosine(spark, sf_dir).collect()
    }
    ivf = similarity.q_similarity_ivf_topk(spark, sf_dir).collect()
    assert len(ivf) > 0
    for r in ivf:
        exact = brute.get((r["q_id"], r["c_id"]))
        if exact is not None:
            assert abs(exact - r["cosine"]) < 1e-12


def test_lsh_topk_subset_of_brute_force(spark, sf_dir):
    """LSH top-k hits are genuine neighbors: every (q, c) pair returned
    by the LSH path appears in the exact top-50 of the brute-force path
    with the identical cosine."""
    from pyspark.sql import functions as F  # noqa: F401

    brute = {
        (r["q_id"], r["c_id"]): r["cosine"]
        for r in similarity.q_similarity_topk_cosine(spark, sf_dir).collect()
    }
    lsh = similarity.q_similarity_lsh_topk(spark, sf_dir).collect()
    assert len(lsh) > 0
    for r in lsh:
        exact_cos = brute.get((r["q_id"], r["c_id"]))
        if exact_cos is not None:
            assert abs(exact_cos - r["cosine"]) < 1e-12


def test_lsh_near_dup_full_corpus_recall(spark):
    """Banded LSH near-dup pairs on the FULL corpus: every returned pair
    must carry its exact cosine (>= threshold), and recall vs the exact
    all-pairs set should be high (8 bands x 2 bits => ~0.97 expected at
    cosine 0.30). Run at sf0.001 (500 vectors -> 125k exact pairs)."""
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    dv = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731
    a = emb.select(F.col("vec_id").alias("a_id"), dv(F.col("embedding")).alias("a_vec"))
    b = emb.select(F.col("vec_id").alias("b_id"), dv(F.col("embedding")).alias("b_vec"))
    exact = {
        (r["a_id"], r["b_id"]): r["cosine"]
        for r in (
            a.join(b, F.col("a_id") < F.col("b_id"))
            .withColumn("cosine", similarity._cosine(F.col("a_vec"), F.col("b_vec")))
            .filter(F.col("cosine") >= similarity.COSINE_DUP_THRESHOLD)
            .collect()
        )
    }
    got = {
        (r["a_id"], r["b_id"]): r["cosine"]
        for r in similarity.q_similarity_lsh_near_dup(spark, sf).collect()
    }
    assert set(got) <= set(exact)
    for pair, cos in got.items():
        assert abs(cos - exact[pair]) < 1e-12
    if exact:
        assert len(got) / len(exact) >= 0.7


def test_minhash_drop_ids_subset_and_recall(spark, sf_dir):
    """The linear representative-based drop set is (a) precise: every
    dropped doc has a verified smaller-id near-dup in the all-pairs set,
    and (b) near-complete: recall vs the all-pairs drop set stays high
    (representatives are themselves cluster members)."""
    pairs = dedup.minhash_near_dup_pairs(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )
    from pyspark.sql import functions as F

    all_pairs_drop = {
        r["doc_id"]
        for r in pairs.select(F.col("b_id").alias("doc_id")).distinct().collect()
    }
    lin_drop = {
        r["doc_id"]
        for r in dedup.minhash_near_dup_drop_ids(
            spark.read.parquet(f"{sf_dir}/documents.parquet")
        ).collect()
    }
    assert lin_drop <= all_pairs_drop
    if all_pairs_drop:
        assert len(lin_drop) / len(all_pairs_drop) >= 0.9


def test_connected_components_hand_graph(spark):
    """Chain 1-2-3, pair 10-11, isolates 20/21: labels converge to the
    min id of each component; isolates keep their own id."""
    from auto_tabular_gpu_accelerated_etl_schema_inference_pipeline_spark.operators.graph import (
        connected_components,
    )

    verts = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 20, 21)], "id bigint"
    )
    edges = spark.createDataFrame([(2, 1), (2, 3), (10, 11)], "src bigint, dst bigint")
    got = {
        r["id"]: r["component_id"]
        for r in connected_components(verts, edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 21}


def test_arrow_cosine_lane_matches_builtin(spark, sf_dir):
    """The mapInPandas BLAS lane must produce the same top-k as the
    codegen zip_with fold: same (q_id, rank, c_id) triples, cosines
    within 1e-9 (BLAS accumulation order differs in final ulps)."""
    from auto_tabular_gpu_accelerated_etl_schema_inference_pipeline_spark.operators.similarity import (
        q_similarity_topk_cosine,
        q_similarity_topk_cosine_arrow,
    )

    exact = {
        (r["q_id"], r["rank"]): (r["c_id"], r["cosine"])
        for r in q_similarity_topk_cosine(spark, sf_dir).collect()
    }
    arrow = {
        (r["q_id"], r["rank"]): (r["c_id"], r["cosine"])
        for r in q_similarity_topk_cosine_arrow(spark, sf_dir).collect()
    }
    assert exact.keys() == arrow.keys()
    for k, (cid, cos) in exact.items():
        acid, acos = arrow[k]
        assert acid == cid, (k, cid, acid)
        assert abs(acos - cos) < 1e-9
