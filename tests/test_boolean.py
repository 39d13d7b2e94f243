"""Boolean NOT retrieval: brute-force parity vs score_all + manual
exclusion, NOT-wins overlap rule, empty/OOV exclusion no-ops, and the
nnoc (bm25l) interaction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bm25s_spark.indexer import build_index
from bm25s_spark.operators.boolean import retrieve_excluding
from bm25s_spark.retrieval import score_all

CORPUS = [
    (0, "spark shuffle join merge"),
    (1, "spark shuffle window"),
    (2, "spark broadcast join"),
    (3, "shuffle partition skew"),
    (4, "parquet column scan"),
]


@pytest.fixture(scope="module")
def idx(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    return build_index(df.select("doc_id", "text"), order_cols=["doc_id"])


def _brute(spark, idx, qdf, method="lucene"):
    """score_all minus docs containing any excluded term (python side)."""
    scores = {
        (r.query_id, r.doc_id): r.score
        for r in score_all(idx, qdf, method=method).collect()
    }
    doc_terms = {d: set(t.split()) for d, t in CORPUS}
    out = {}
    for row in qdf.collect():
        neg = set((row.exclude_text or "").split())
        for (q, d), s in scores.items():
            if q == row.query_id and not (doc_terms[d] & neg):
                out[(q, d)] = s
    return out


def test_exclusion_matches_brute_force(spark, idx):
    qdf = spark.createDataFrame(
        [("q1", "spark shuffle", "join"), ("q2", "shuffle", "spark")],
        "query_id string, text string, exclude_text string",
    )
    got = {
        (r.query_id, r.doc_id): r.score
        for r in retrieve_excluding(idx, qdf, k=5).collect()
    }
    assert got == pytest.approx(_brute(spark, idx, qdf))
    # q1 "spark shuffle NOT join": docs 0,2 contain join → only 1, 3
    assert {d for (q, d) in got if q == "q1"} == {1, 3}
    # q2 "shuffle NOT spark": docs 0,1 contain spark → only 3
    assert {d for (q, d) in got if q == "q2"} == {3}


def test_not_wins_on_overlap(spark, idx):
    """A term both positive and negative excludes every doc containing
    it — q matches nothing that mentions shuffle."""
    qdf = spark.createDataFrame(
        [("q", "spark shuffle", "shuffle")],
        "query_id string, text string, exclude_text string",
    )
    docs = {r.doc_id for r in retrieve_excluding(idx, qdf, k=5).collect()}
    assert docs == {2}  # only doc 2 has spark without shuffle


def test_empty_and_oov_exclusion_are_noops(spark, idx):
    base = spark.createDataFrame(
        [("q", "spark join", None)],
        "query_id string, text string, exclude_text string",
    )
    oov = base.withColumn("exclude_text", F.lit("zzqx"))
    plain = {
        (r.doc_id, round(r.score, 9))
        for r in retrieve_excluding(idx, base, k=5).collect()
    }
    assert plain == {
        (r.doc_id, round(r.score, 9))
        for r in retrieve_excluding(idx, oov, k=5).collect()
    }
    # and equals the unexcluded scorer's candidate set
    ref = {
        (r.doc_id, round(r.score, 9))
        for r in score_all(
            idx, base.select("query_id", "text")
        ).collect()
    }
    assert plain == ref


def test_nnoc_variant_consistency(spark, idx):
    """bm25l: surviving docs keep exactly their score_all score (the
    nnoc add-back is per-query, not affected by exclusion)."""
    qdf = spark.createDataFrame(
        [("q", "spark shuffle", "join")],
        "query_id string, text string, exclude_text string",
    )
    got = {
        r.doc_id: r.score
        for r in retrieve_excluding(idx, qdf, k=5, method="bm25l").collect()
    }
    want = _brute(spark, idx, qdf, method="bm25l")
    assert got == pytest.approx({d: s for (q, d), s in want.items()})


def test_all_negative_query_returns_nothing(spark, idx):
    qdf = spark.createDataFrame(
        [("q", "zzqx", "spark")],
        "query_id string, text string, exclude_text string",
    )
    assert retrieve_excluding(idx, qdf, k=3).count() == 0


def test_k_validation(spark, idx):
    qdf = spark.createDataFrame(
        [("q", "spark", "join")],
        "query_id string, text string, exclude_text string",
    )
    with pytest.raises(ValueError):
        retrieve_excluding(idx, qdf, k=0)
    with pytest.raises(ValueError):
        retrieve_excluding(idx, qdf, k=1, method="nope")


def test_min_match_counts_distinct_terms(spark, idx):
    from bm25s_spark.operators.boolean import retrieve_min_match

    # "spark shuffle join": doc 0 matches 3 terms, docs 1/2 match 2,
    # doc 3 matches 1 (shuffle), doc 4 matches 0
    qdf = spark.createDataFrame(
        [("q", "spark shuffle join")], "query_id string, text string"
    )
    got2 = {r.doc_id for r in retrieve_min_match(idx, qdf, min_match=2).collect()}
    assert got2 == {0, 1, 2}
    got3 = {r.doc_id for r in retrieve_min_match(idx, qdf, min_match=3).collect()}
    assert got3 == {0}
    # min 1 == plain OR retrieval candidates
    got1 = {r.doc_id for r in retrieve_min_match(idx, qdf, min_match=1).collect()}
    assert got1 == {0, 1, 2, 3}


def test_min_match_repeated_term_counts_once(spark, idx):
    from bm25s_spark.operators.boolean import retrieve_min_match

    qdf = spark.createDataFrame(
        [("q", "spark spark spark")], "query_id string, text string"
    )
    assert retrieve_min_match(idx, qdf, min_match=2).count() == 0


def test_min_match_fraction_and_unclamped(spark, idx):
    from bm25s_spark.operators.boolean import retrieve_min_match

    qdf = spark.createDataFrame(
        [("q", "spark shuffle join merge")], "query_id string, text string"
    )
    # ceil(0.5 * 4 terms) = 2 → docs 0 (4 matches), 1 and 2 (2 each)
    got = {r.doc_id for r in
           retrieve_min_match(idx, qdf, min_match=0.5).collect()}
    assert got == {0, 1, 2}
    # unclamped absolute requirement above the query's term count → none
    assert retrieve_min_match(idx, qdf, min_match=9).count() == 0
    with pytest.raises(ValueError):
        retrieve_min_match(idx, qdf, min_match=0)
    with pytest.raises(ValueError):
        retrieve_min_match(idx, qdf, min_match=1.5)


def test_min_match_scores_equal_score_all(spark, idx):
    from bm25s_spark.operators.boolean import retrieve_min_match

    qdf = spark.createDataFrame(
        [("q", "spark shuffle join")], "query_id string, text string"
    )
    full = {
        (r.query_id, r.doc_id): r.score
        for r in score_all(idx, qdf, method="lucene").collect()
    }
    for r in retrieve_min_match(idx, qdf, min_match=2).collect():
        assert r.score == pytest.approx(full[(r.query_id, r.doc_id)])
