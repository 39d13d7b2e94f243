"""RRF hybrid retrieval: fusion math, tie/weight contracts, and the
end-to-end BM25 ⊕ kNN composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bm25s_spark.operators.hybrid import hybrid_retrieve, rrf_fuse


def _ranking(spark, rows):
    return spark.createDataFrame(rows, "query_id string, doc_id long, rank int")


def test_rrf_fuse_math(spark):
    # doc 1 is rank 1 in A and rank 2 in B; doc 2 only in A; doc 3 only in B
    a = _ranking(spark, [("q", 1, 1), ("q", 2, 2)])
    b = _ranking(spark, [("q", 1, 2), ("q", 3, 1)])
    out = {r["doc_id"]: r for r in rrf_fuse([a, b], k=10, rrf_k=60).collect()}
    assert out[1]["rrf_score"] == pytest.approx(1 / 61 + 1 / 62)
    assert out[2]["rrf_score"] == pytest.approx(1 / 62)
    assert out[3]["rrf_score"] == pytest.approx(1 / 61)
    # doc 1 (two contributions) outranks both singles; the two singles
    # order by score (1/61 > 1/62)
    assert out[1]["rank"] == 1 and out[3]["rank"] == 2 and out[2]["rank"] == 3


def test_rrf_fuse_tiebreak_and_k(spark):
    # docs 5 and 3 tie exactly (same single-system rank) → doc_id asc wins
    a = _ranking(spark, [("q", 5, 1), ("q", 3, 1), ("q", 9, 2)])
    rows = rrf_fuse([a], k=2).orderBy("rank").collect()
    assert [r["doc_id"] for r in rows] == [3, 5]  # k=2 truncates doc 9
    assert rows[0]["rank"] == 1 and rows[1]["rank"] == 2


def test_rrf_fuse_weights(spark):
    a = _ranking(spark, [("q", 1, 1)])
    b = _ranking(spark, [("q", 2, 1)])
    rows = rrf_fuse([a, b], k=2, weights=[1.0, 3.0]).orderBy("rank").collect()
    # B's weight 3 → doc 2 scores 3/61 > doc 1's 1/61
    assert [r["doc_id"] for r in rows] == [2, 1]
    assert rows[0]["rrf_score"] == pytest.approx(3 / 61)


def test_rrf_fuse_validation(spark):
    a = _ranking(spark, [("q", 1, 1)])
    with pytest.raises(ValueError):
        rrf_fuse([])
    with pytest.raises(ValueError):
        rrf_fuse([a], weights=[1.0, 2.0])


def test_rrf_fuse_multi_query_isolation(spark):
    a = _ranking(spark, [("q1", 1, 1), ("q2", 2, 1)])
    b = _ranking(spark, [("q1", 1, 1), ("q2", 7, 1)])
    rows = rrf_fuse([a, b], k=5).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["doc_id"])
    assert sorted(by_q["q1"]) == [1]
    assert sorted(by_q["q2"]) == [2, 7]


def test_hybrid_retrieve_end_to_end(spark):
    """A doc that is mid-ranked lexically AND mid-ranked densely must
    beat docs that only one system surfaces."""
    from bm25s_spark.indexer import build_index

    docs = spark.createDataFrame(
        [
            (0, "spark query engine with fast shuffle"),
            (1, "spark query planner"),
            (2, "cats and dogs and weather"),
            (3, "fast shuffle service"),
        ],
        "doc_id long, text string",
    )
    idx = build_index(docs, doc_id_col="doc_id")
    # embeddings: doc 1 is closest to the query vector; doc 2 second;
    # doc 0 and 3 point away
    emb = spark.createDataFrame(
        [
            (0, [0.0, 1.0]),
            (1, [1.0, 0.1]),
            (2, [0.9, 0.5]),
            (3, [-1.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [("qa", "spark query")], "query_id string, text string"
    )
    qvecs = spark.createDataFrame(
        [("qa", [1.0, 0.0])], "query_id string, embedding array<float>"
    )
    from bm25s_spark.operators.similarity import brute_force_knn

    # no implicit dense default: the ANN choice must be named (or an
    # ivf_path supplied) — a silent brute-force would be wrong at scale
    with pytest.raises(ValueError, match="exactly one dense-side"):
        hybrid_retrieve(idx, emb, queries, qvecs, k=4)
    with pytest.raises(ValueError, match="exactly one dense-side"):
        hybrid_retrieve(idx, emb, queries, qvecs, k=4,
                        knn=brute_force_knn, ivf_path="/nope")
    rows = hybrid_retrieve(
        idx, emb, queries, qvecs, k=4, knn=brute_force_knn
    ).orderBy("rank").collect()
    # doc 1 ranks high in both systems → fused rank 1
    assert rows[0]["doc_id"] == 1
    got = {r["doc_id"]: r["rrf_score"] for r in rows}
    # every fused score is a sum of 1/(60+r) terms → positive, bounded
    assert all(0 < s < 2 / 61 + 1e-12 for s in got.values())
    # schema contract
    assert rows[0]["rank"] == 1 and set(rows[0].asDict()) == {
        "query_id", "rank", "doc_id", "rrf_score"
    }


def _scored(spark, rows):
    return spark.createDataFrame(rows, "query_id string, doc_id long, score double")


def test_linear_fuse_minmax_math(spark):
    from bm25s_spark.operators.hybrid import linear_fuse

    # A: scores 10/5/0 → norms 1.0/0.5/0.0; B: scores 2/1 → norms 1.0/0.0
    a = _scored(spark, [("q", 1, 10.0), ("q", 2, 5.0), ("q", 3, 0.0)])
    b = _scored(spark, [("q", 2, 2.0), ("q", 4, 1.0)])
    out = {r["doc_id"]: r for r in
           linear_fuse([a, b], k=10, weights=[0.7, 0.3]).collect()}
    assert out[1]["fused_score"] == pytest.approx(0.7)
    assert out[2]["fused_score"] == pytest.approx(0.7 * 0.5 + 0.3 * 1.0)
    assert out[3]["fused_score"] == pytest.approx(0.0)
    assert out[4]["fused_score"] == pytest.approx(0.0)
    # fused order: doc2 (0.65) > doc1 (0.7)? no — 0.7 > 0.65; then the
    # two zero-score docs tie → doc_id asc
    ranks = {d: r["rank"] for d, r in out.items()}
    assert ranks == {1: 1, 2: 2, 3: 3, 4: 4}


def test_linear_fuse_degenerate_slate_normalizes_to_one(spark):
    from bm25s_spark.operators.hybrid import linear_fuse

    # single-hit system and an all-equal system both normalize to 1.0
    a = _scored(spark, [("q", 7, 3.5)])
    b = _scored(spark, [("q", 7, 9.9), ("q", 8, 9.9)])
    out = {r["doc_id"]: r["fused_score"] for r in
           linear_fuse([a, b], k=10).collect()}
    assert out[7] == pytest.approx(2.0)
    assert out[8] == pytest.approx(1.0)


def test_linear_fuse_validation_and_round(spark):
    from bm25s_spark.operators.hybrid import linear_fuse

    a = _scored(spark, [("q", 1, 1.0), ("q", 2, 0.5)])
    with pytest.raises(ValueError):
        linear_fuse([])
    with pytest.raises(ValueError):
        linear_fuse([a], weights=[1.0, 2.0])
    rows = linear_fuse([a], round_to=2, k=1).collect()
    assert rows[0]["doc_id"] == 1 and rows[0]["fused_score"] == 1.0


def test_hybrid_retrieve_ivf_path(spark, tmp_path_factory):
    """ivf_path= routes the dense side through the partition-pruned IVF
    scan (the scale path) — fused output matches the explicit brute
    callable at an exhaustive probe config (all cells probed → exact)."""
    from bm25s_spark.indexer import build_index
    from bm25s_spark.operators import similarity

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["spark query engine", "fast sort merge", "query plan cache",
             "vector search index", "hash join build", "broadcast tiny dim",
             "shuffle skew salt", "window rank rows"])],
        "doc_id long, text string",
    )
    idx = build_index(docs, doc_id_col="doc_id")
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).where(F.col("vec_id") < 8)
    path = str(tmp_path_factory.mktemp("ivf_hybrid"))
    similarity.ivf_build_partitioned(emb, path, n_centroids=4, seed=42)
    queries = spark.createDataFrame(
        [("qa", "spark query"), ("qb", "hash join")],
        "query_id string, text string",
    )
    qvecs = emb.where(F.col("vec_id") < 2).select(
        F.when(F.col("vec_id") == 0, "qa").otherwise("qb").alias("query_id"),
        "embedding",
    )
    via_ivf = hybrid_retrieve(
        idx, None, queries, qvecs, k=4, ivf_path=path, n_probe=4
    ).collect()
    via_brute = hybrid_retrieve(
        idx, emb, queries, qvecs, k=4, knn=similarity.brute_force_knn
    ).collect()
    key = lambda rows: sorted((r["query_id"], r["rank"], r["doc_id"],
                               round(r["rrf_score"], 9)) for r in rows)
    assert key(via_ivf) == key(via_brute)
