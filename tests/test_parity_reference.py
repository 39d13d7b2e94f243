"""End-to-end rank-identity vs the in-process reference library
(FIXTURES.md §4 oracle protocol) on the golden animal corpus (t1) and the
2,000-doc synthetic transcript corpus (t2)."""

from __future__ import annotations

import numpy as np
import pytest

from bm25s_spark.indexer import SparkBM25, build_index
from bm25s_spark.transcripts import ANIMAL_CORPUS, queries_for, transcripts_df

from tests.conftest import assert_rank_identical, ref_topk

METHODS = ["robertson", "lucene", "atire", "bm25l", "bm25+"]


def _corpus_texts(tdf):
    rows = tdf.orderBy("conv_id", "turn_idx").select("text").collect()
    return [r["text"] for r in rows]


def _run_ours(spark, tdf, queries, k, method, idf_method=None, strategy="join",
              weight_mask=None):
    engine = SparkBM25(method=method, idf_method=idf_method)
    engine.index(tdf)
    qdf = spark.createDataFrame(queries, "query_id string, text string")
    mask_df = None
    if weight_mask is not None:
        mask_df = spark.createDataFrame(
            [(i, float(w)) for i, w in enumerate(weight_mask)],
            "doc_id long, weight double",
        )
    res = engine.retrieve(qdf, k=k, strategy=strategy, weight_mask_df=mask_df)
    return [r.asDict() for r in res.collect()]


@pytest.mark.parametrize("method", METHODS)
def test_animal_corpus_all_methods(spark, ref_bm25s, method):
    tdf = transcripts_df(spark, "t1")
    queries = [
        ("q-0000", "a cat is a feline, it's sometimes beautiful but cannot fly"),
        ("q-0001", "does the fish purr like a cat?"),
        ("q-0002", "dog"),
    ]
    k = 3
    ours = _run_ours(spark, tdf, queries, k, method)
    docs, scores = ref_topk(ref_bm25s, ANIMAL_CORPUS, [q[1] for q in queries], k, method)
    assert_rank_identical(ours, docs, scores)


def test_animal_golden_expectations(spark, ref_bm25s):
    """The reference's own golden doc-id expectations
    (reference/tests/core/test_retrieve.py:39-50): top-2 for the feline
    query is [cat, bird] = docs [0, 2]."""
    tdf = transcripts_df(spark, "t1")
    queries = [("q-0000", "a cat is a feline, it's sometimes beautiful but cannot fly")]
    ours = _run_ours(spark, tdf, queries, 2, "lucene")
    got = [r["doc_id"] for r in sorted(ours, key=lambda r: r["rank"])]
    assert got == [0, 2], got


def test_weight_mask_golden(spark, ref_bm25s):
    """Weight-mask golden (reference/tests/core/test_retrieve.py:98-114):
    'cat feline dog bird fish' with mask [1,0,0,1] → docs [0, 3]."""
    tdf = transcripts_df(spark, "t1")
    queries = [("q-0000", "cat feline dog bird fish")]
    mask = [1, 0, 0, 1]
    ours = _run_ours(spark, tdf, queries, 2, "lucene", weight_mask=mask)
    got = sorted(r["doc_id"] for r in ours)
    assert got == [0, 3], got
    docs, scores = ref_topk(
        ref_bm25s, ANIMAL_CORPUS, [queries[0][1]], 2, "lucene", weight_mask=mask
    )
    assert_rank_identical(ours, docs, scores)


@pytest.mark.parametrize("method", METHODS)
def test_t2_corpus_all_methods(spark, ref_bm25s, method):
    tdf = transcripts_df(spark, "t2").persist()
    texts = _corpus_texts(tdf)
    queries = queries_for(texts, 40)
    k = 10
    ours = _run_ours(spark, tdf, queries, k, method)
    docs, scores = ref_topk(ref_bm25s, texts, [q[1] for q in queries], k, method)
    assert_rank_identical(ours, docs, scores)


@pytest.mark.parametrize(
    "method,idf_method",
    [("atire", "robertson"), ("atire", "lucene")],
)
def test_cross_idf_combos(spark, ref_bm25s, method, idf_method):
    """The rank-bm25 / bm25-pt equivalence settings
    (reference/tests/__init__.py:92-98,227)."""
    tdf = transcripts_df(spark, "t2").persist()
    texts = _corpus_texts(tdf)
    queries = queries_for(texts, 15)
    ours = _run_ours(spark, tdf, queries, 10, method, idf_method)
    docs, scores = ref_topk(
        ref_bm25s, texts, [q[1] for q in queries], 10, method, idf_method
    )
    assert_rank_identical(ours, docs, scores)


def test_k_edge_cases(spark, ref_bm25s):
    tdf = transcripts_df(spark, "t1")
    queries = [("q-0000", "cat")]
    # k == num_docs works
    ours = _run_ours(spark, tdf, queries, 4, "lucene")
    assert len(ours) == 4
    # k > num_docs raises (reference/bm25s/__init__.py:759-765)
    with pytest.raises(ValueError):
        _run_ours(spark, tdf, queries, 5, "lucene")


def test_empty_and_oov_queries(spark, ref_bm25s):
    tdf = transcripts_df(spark, "t1")
    queries = [
        ("q-0000", ""),                 # empty
        ("q-0001", "the and of to"),    # all stopwords
        ("q-0002", "zzqx qqzz"),        # all OOV
    ]
    ours = _run_ours(spark, tdf, queries, 2, "lucene")
    by_q = {}
    for r in ours:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        assert len(rows) == 2, (qid, rows)
        assert all(abs(r["score"]) < 1e-12 for r in rows), (qid, rows)


def test_require_all_terms_boolean_and(spark, ref_bm25s):
    """require_all_terms=True: boolean-AND doc filtering with unchanged
    BM25 scores on the qualifying set; OOV / all-stopword queries match
    nothing; sharded strategy rejects the flag."""
    import re

    tdf = transcripts_df(spark, "t2").persist()
    engine = SparkBM25(method="lucene")
    engine.index(tdf)
    queries = [
        ("qa", "cat dog"),
        ("qb", "cat zzznope"),          # OOV term → nothing
        ("qc", "the and of"),           # all stopwords → nothing
    ]
    qdf = spark.createDataFrame(queries, "query_id string, text string")
    got = engine.retrieve(qdf, k=5, require_all_terms=True).collect()

    # brute-force twin over the same tokenizer semantics
    from bm25s_spark.tokenization import STOPWORDS_EN
    texts = _corpus_texts(tdf)
    tok = lambda s: [t for t in re.findall(r"(?u)\b\w\w+\b", s.lower())
                     if t not in STOPWORDS_EN]
    doc_tokens = [set(tok(t)) for t in texts]
    for qid, qtext in queries:
        need = set(tok(qtext))
        want = {i for i, dt in enumerate(doc_tokens) if need and need <= dt}
        ours = {r["doc_id"] for r in got if r["query_id"] == qid}
        assert ours <= want, (qid, ours - want)
        if len(want) <= 5:
            assert ours == want, (qid, want - ours)
    assert not [r for r in got if r["query_id"] in ("qb", "qc")]

    # scores on qualifying docs equal the plain (OR) retrieval scores
    plain = {(r["query_id"], r["doc_id"]): r["score"]
             for r in engine.retrieve(qdf, k=50).collect()}
    for r in got:
        key = (r["query_id"], r["doc_id"])
        if key in plain:
            assert abs(r["score"] - plain[key]) < 1e-9

    with pytest.raises(ValueError, match="require_all_terms"):
        engine.retrieve(qdf, k=5, strategy="sharded", require_all_terms=True)
    tdf.unpersist()
