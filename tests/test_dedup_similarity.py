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


def _random_graph(rng, n_nodes, n_edges):
    import random as _r
    nodes = list(range(0, n_nodes * 3, 3))  # non-contiguous ids
    edges = set()
    while len(edges) < n_edges:
        a, b = rng.sample(nodes, 2)
        edges.add((a, b))
    return nodes, sorted(edges)


def _driver_components(nodes, edges):
    """Ground-truth union-find on the driver (test oracle only)."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for n in nodes:
        r = find(n)
        out.setdefault(r, []).append(n)
    return {n: min(members) for r, members in out.items() for n in members}


def test_star_cc_matches_hash_min_and_ground_truth(spark):
    """large-star/small-star parity: on a random 150-node graph both CC
    formulations must equal the driver union-find exactly."""
    import random

    from auto_tabular_gpu_accelerated_etl_schema_inference_pipeline_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(8)
    nodes, edges = _random_graph(rng, 150, 170)
    truth = _driver_components(nodes, edges)
    verts = spark.createDataFrame([(n,) for n in nodes], "id bigint")
    edf = spark.createDataFrame(edges, "src bigint, dst bigint")
    star = {
        r["id"]: r["component_id"]
        for r in connected_components_star(verts, edf).collect()
    }
    hashmin = {
        r["id"]: r["component_id"]
        for r in connected_components(verts, edf).collect()
    }
    assert star == truth
    assert hashmin == truth


def test_hash_min_escalates_on_deep_chain(spark):
    """A 120-deep chain exceeds any small hash-min round budget; the
    pre-r8 code silently returned PARTIAL labels. Now: escalate=False
    raises, and the default contracts + finishes via the star algorithm
    to the exact min label."""
    import pytest as _pytest

    from auto_tabular_gpu_accelerated_etl_schema_inference_pipeline_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    n = 120
    # permuted ids so convergence can't ride on id order
    ids = [(i * 67) % n for i in range(n)]
    chain = [(ids[i], ids[i + 1]) for i in range(n - 1)]
    verts = spark.createDataFrame([(i,) for i in ids], "id bigint")
    edf = spark.createDataFrame(chain, "src bigint, dst bigint")

    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(verts, edf, max_iter=5, escalate=False).collect()

    got = {
        r["id"]: r["component_id"]
        for r in connected_components(verts, edf, max_iter=5).collect()
    }
    assert got == {i: 0 for i in ids}

    star = {
        r["id"]: r["component_id"]
        for r in connected_components_star(verts, edf).collect()
    }
    assert star == {i: 0 for i in ids}


def test_star_cc_isolates_and_empty_edges(spark):
    """Isolated vertices label themselves; an empty edge set is a valid
    (all-isolate) graph for both formulations."""
    from auto_tabular_gpu_accelerated_etl_schema_inference_pipeline_spark.operators.graph import (
        connected_components_star,
    )

    verts = spark.createDataFrame([(5,), (9,), (12,)], "id bigint")
    empty = spark.createDataFrame([], "src bigint, dst bigint")
    got = {
        r["id"]: r["component_id"]
        for r in connected_components_star(verts, empty).collect()
    }
    assert got == {5: 5, 9: 9, 12: 12}


def test_cc_escalation_handles_string_ids(spark):
    """entity_resolution_clusters runs CC over p_name STRINGS; the r8
    escalation (contract + star finish) must be type-generic — min
    labels are lexicographic there. 40-deep chain, forced escalation."""
    from auto_tabular_gpu_accelerated_etl_schema_inference_pipeline_spark.operators.graph import (
        connected_components,
    )

    names = [f"n{i:03d}" for i in range(40)]
    perm = [names[(i * 17) % 40] for i in range(40)]
    verts = spark.createDataFrame([(n,) for n in names], "id string")
    edges = spark.createDataFrame(
        [(perm[i], perm[i + 1]) for i in range(39)], "src string, dst string"
    )
    got = {
        r["id"]: r["component_id"]
        for r in connected_components(verts, edges, max_iter=3).collect()
    }
    assert got == {n: "n000" for n in names}


def test_star_cc_hub_bridge_topology(spark):
    """Two 400-leaf hubs joined by one bridge edge — the high-degree
    shape (a boilerplate template with hundreds of near-identical
    variants) where large-star's groupBy-min per hub does the heavy
    lifting. One component, min id 0; plus an untouched third hub."""
    from auto_tabular_gpu_accelerated_etl_schema_inference_pipeline_spark.operators.graph import (
        connected_components_star,
    )

    h1 = [(0, i) for i in range(2, 402)]          # hub 0
    h2 = [(1, i) for i in range(402, 802)]        # hub 1
    bridge = [(401, 402)]                          # leaf-to-leaf bridge
    h3 = [(1000, i) for i in range(1001, 1101)]   # separate hub 1000
    edges = spark.createDataFrame(
        h1 + h2 + bridge + h3, "src bigint, dst bigint"
    )
    verts = edges.selectExpr("src AS id").union(
        edges.selectExpr("dst AS id")
    ).distinct()
    got = {
        r["id"]: r["component_id"]
        for r in connected_components_star(verts, edges).collect()
    }
    big = {i for i in range(0, 802)}
    assert all(got[i] == 0 for i in big if i in got)
    assert all(got[i] == 1000 for i in [1000] + list(range(1001, 1101)))


def test_ngram_jaccard_wide_vocab_general_branch(spark, tmp_path):
    """The >62-token vocabulary forces the GENERAL verify branch (the
    fixture corpus's 31-token vocab always takes the bitmask fast path,
    so this branch — the one real corpora hit, and the one
    PROBE_TOP5_LINEARITY_r09 found parallelism-starved — needs its own
    exactness pin). Output must equal brute-force exact Jaccard."""
    from itertools import combinations

    vocab = [f"tok{i:03d}" for i in range(80)]  # > 62 -> general branch
    docs, sets = [], {}
    for i in range(10):
        a = vocab[(7 * i) % 40 : (7 * i) % 40 + 40]
        b = a[:-1]  # jaccard 39/40 = 0.975 >= 0.95
        docs.append((2 * i, " ".join(a)))
        docs.append((2 * i + 1, " ".join(b)))
        sets[2 * i], sets[2 * i + 1] = set(a), set(b)
    spark.createDataFrame(docs, "doc_id bigint, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        (r["a_id"], r["b_id"])
        for r in dedup.q_dedup_ngram_jaccard(spark, str(tmp_path)).collect()
    }
    want = {
        (x, y)
        for x, y in combinations(sorted(sets), 2)
        if len(sets[x] & sets[y]) / len(sets[x] | sets[y])
        >= dedup.JACCARD_THRESHOLD
    }
    assert got == want and len(want) > 0
