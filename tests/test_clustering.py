"""Document clustering + labeling (operators/clustering.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bm25s_spark.operators.clustering import (
    cluster_assign,
    cluster_documents,
    cluster_keywords,
    cluster_summary,
    train_cluster_centroids,
)


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def test_assign_matches_brute_force(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 16))
    cent = rng.normal(size=(5, 16))
    got = {r.vec_id: (r.cluster, r.sim)
           for r in cluster_assign(_emb_df(spark, vecs), cent).collect()}
    x = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    c = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    sims = np.round(x @ c.T, 6)
    for i in range(len(vecs)):
        best = int(np.argmax(sims[i]))
        assert got[i][0] == best
        assert got[i][1] == pytest.approx(sims[i][best], abs=2e-6)


def test_assign_tie_and_zero_vector(spark):
    # centroids 1 and 3 are identical: a vector equidistant to both must
    # land in the LOWER cluster id; the zero vector lands in cluster 0
    # with similarity 0 to everything
    cent = np.array([[0.0, 1.0], [1.0, 0.0], [0.0, -1.0], [1.0, 0.0]])
    emb = _emb_df(spark, [[2.0, 0.0], [0.0, 0.0]])
    got = {r.vec_id: r for r in cluster_assign(emb, cent).collect()}
    assert got[0].cluster == 1 and got[0].sim == 1.0
    assert got[1].cluster == 0 and got[1].sim == 0.0


def test_assign_validation():
    with pytest.raises(ValueError, match="centroids"):
        cluster_assign(None, np.zeros(4))


def test_train_separates_obvious_clusters(spark):
    # three orthogonal direction groups with small jitter: k-means must
    # put each group in its own cluster, deterministically across runs
    rng = np.random.default_rng(3)
    base = np.eye(3)
    vecs = np.vstack([
        base[i] + rng.normal(scale=0.05, size=(20, 3)) for i in range(3)
    ])
    emb = _emb_df(spark, vecs)
    a1 = cluster_documents(emb, n_clusters=3, seed=11).collect()
    a2 = cluster_documents(emb, n_clusters=3, seed=11).collect()
    assert sorted(map(tuple, a1)) == sorted(map(tuple, a2))  # deterministic
    by_group = {}
    for r in a1:
        by_group.setdefault(r.vec_id // 20, set()).add(r.cluster)
    assert all(len(s) == 1 for s in by_group.values())  # pure groups
    assert len(set.union(*by_group.values())) == 3      # distinct clusters


def test_summary_hand_values(spark):
    cent = np.array([[1.0, 0.0], [0.0, 1.0]])
    emb = _emb_df(spark, [[1.0, 0.0], [2.0, 0.0], [0.0, 3.0]])
    s = {r.cluster: r for r in
         cluster_summary(cluster_assign(emb, cent)).collect()}
    assert s[0].n_docs == 2 and s[0].avg_sim == 1.0 and s[0].min_sim == 1.0
    assert s[1].n_docs == 1 and s[1].avg_sim == 1.0


def test_keywords_pick_cluster_vocabulary(spark):
    # two clusters with disjoint content vocabulary + one shared term:
    # each cluster's top keyword must be its own vocabulary, and the
    # shared term must score lower (idf ~ 0 lift)
    docs = spark.createDataFrame(
        [(0, "kernel scheduler preempts kernel threads shared"),
         (1, "kernel scheduler runs kernel queues shared"),
         (2, "sourdough starter ferments flour shared"),
         (3, "sourdough bakers proof flour dough shared")],
        "doc_id long, text string",
    )
    assign = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1)], "vec_id long, cluster int"
    )
    kw = cluster_keywords(assign, docs, top_t=2, min_cluster_df=2).collect()
    by_c = {}
    for r in kw:
        by_c.setdefault(r.cluster, []).append(r.term)
    assert by_c[0][0] in ("kernel", "scheduler")
    assert by_c[1][0] in ("sourdough", "flour")
    assert "shared" not in by_c[0] and "shared" not in by_c[1]
    # hand-check one score: kernel in cluster 0 → cluster_df 2, n_c 2,
    # corpus df 2, N 4 → 1.0 * ln(5/3)
    krow = [r for r in kw if r.cluster == 0 and r.term == "kernel"][0]
    assert krow.cluster_df == 2
    assert krow.score == pytest.approx(round(np.log(5.0 / 3.0), 6), abs=1e-9)


def test_keywords_min_cluster_df(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "alpha gamma")],
        "doc_id long, text string",
    )
    assign = spark.createDataFrame([(0, 0), (1, 0)], "vec_id long, cluster int")
    terms = {r.term for r in
             cluster_keywords(assign, docs, min_cluster_df=2).collect()}
    assert terms == {"alpha"}  # beta/gamma appear once → filtered


def test_train_empty_corpus_raises(spark):
    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        train_cluster_centroids(emb, 4)


def test_keywords_duplicate_assignment_resolves_to_min_cluster(spark):
    """A doc assigned to multiple clusters violates the one-row-per-doc
    contract; the guard must resolve it DETERMINISTICALLY (min cluster)
    rather than keep a partition-order-dependent row (regression:
    dropDuplicates could pick either run to run)."""
    docs = spark.createDataFrame(
        [(0, "alpha beta common"), (1, "alpha gamma common"),
         (2, "delta epsilon common"), (3, "delta zeta common")],
        "doc_id long, text string",
    )
    assign = spark.createDataFrame(
        # doc 1 claimed by BOTH clusters (bad input) — min wins → 0
        [(0, 0), (1, 0), (1, 1), (2, 1), (3, 1)],
        "vec_id long, cluster int",
    )
    runs = [
        {(r.cluster, r.term, r.cluster_df, r.score)
         for r in cluster_keywords(assign, docs, min_cluster_df=1,
                                   top_t=10).collect()}
        for _ in range(3)
    ]
    assert runs[0] == runs[1] == runs[2]
    # doc 1 landed in cluster 0: alpha has cluster_df 2 there
    alpha = [t for t in runs[0] if t[0] == 0 and t[1] == "alpha"]
    assert alpha and alpha[0][2] == 2
    # and cluster 1 never counts doc 1's terms (gamma absent from c1)
    assert not [t for t in runs[0] if t[0] == 1 and t[1] == "gamma"]
