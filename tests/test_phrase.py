"""Phrase / proximity search: hand-checked fixtures, a brute-force
Python oracle on a randomized corpus, and plan-shape pins."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from bm25s_spark.operators import phrase

TOKEN_RE = re.compile(r"(?u)\b\w\w+\b")


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "quick brown shoes and a quick brown fox"),
        (2, "big big big data"),                    # overlapping "big big"
        (3, "brown quick fox"),                     # right words, wrong order
        (4, "the fox is quick and brown"),          # words apart
        (5, ""),                                    # empty doc
        (6, "quick brown quick brown quick brown"), # repeated bigram
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").persist()


def _match_map(df):
    return {
        (r["query_id"], r["doc_id"]): (r["n_matches"], r["first_pos"])
        for r in df.collect()
    }


def test_phrase_exact_adjacency(spark, docs):
    qs = spark.createDataFrame(
        [("p1", "quick brown"), ("p2", "big big"), ("p3", "quick brown fox")],
        "query_id string, text string",
    )
    got = _match_map(phrase.phrase_match(docs, qs))
    # p1: doc0 once at pos 1, doc1 twice (0 and 5), doc6 three times,
    # doc3/4 never (order / distance)
    assert got[("p1", 0)] == (1, 1)
    assert got[("p1", 1)] == (2, 0)
    assert got[("p1", 6)] == (3, 0)
    assert ("p1", 3) not in got and ("p1", 4) not in got
    # p2: overlapping occurrences each count ("big big big" → 2)
    assert got[("p2", 2)] == (2, 0)
    # p3: doc0 at 1; doc1 at 4 (the 1-char "a" is dropped by the token
    # pattern, so "quick brown fox" is adjacent: quick@4 brown@5 fox@6)
    assert got[("p3", 0)] == (1, 1)
    assert got[("p3", 1)] == (1, 4)
    assert ("p3", 6) not in got


def test_phrase_single_term_and_no_match(spark, docs):
    qs = spark.createDataFrame(
        [("s1", "quick"), ("s2", "zebra stripes")],
        "query_id string, text string",
    )
    got = _match_map(phrase.phrase_match(docs, qs))
    assert got[("s1", 1)] == (2, 0)      # plain occurrence counting
    assert got[("s1", 6)] == (3, 0)
    assert not [k for k in got if k[0] == "s2"]


def test_phrase_topk_ranking(spark, docs):
    qs = spark.createDataFrame(
        [("p1", "quick brown")], "query_id string, text string"
    )
    rows = phrase.phrase_topk(docs, qs, k=2).collect()
    ranked = sorted(rows, key=lambda r: r["rank"])
    assert [r["doc_id"] for r in ranked] == [6, 1]
    assert [r["n_matches"] for r in ranked] == [3, 2]


def test_phrase_pretokenized_queries(spark, docs):
    qs = spark.createDataFrame(
        [("p1", ["quick", "brown"])], "query_id string, text array<string>"
    )
    got = _match_map(phrase.phrase_match(docs, qs))
    assert got[("p1", 1)] == (2, 0)


def test_proximity_window(spark, docs):
    qs = spark.createDataFrame(
        [("w1", "quick fox"), ("w2", "lazy shoes")],
        "query_id string, text string",
    )
    # window=3: doc3 "brown quick fox" has quick@1, fox@2 → anchored at 1
    # (and the fox@2 anchor window [2,5) lacks "quick")
    got = {
        (r["query_id"], r["doc_id"]): (r["n_windows"], r["first_window"])
        for r in phrase.proximity_match(docs, qs, window=3).collect()
    }
    assert got[("w1", 3)] == (1, 1)
    # doc0: quick@1 fox@3 → anchor 1 spans [1,4) ✓; fox@3 alone ✗
    assert got[("w1", 0)] == (1, 1)
    # doc4 "the fox is quick and brown": fox@1 quick@3 → anchor 1 spans
    # [1,4) = {fox, is, quick} ✓; quick@3's window misses fox
    assert got[("w1", 4)] == (1, 1)
    # no doc has both lazy and shoes
    assert not [k for k in got if k[0] == "w2"]


def _brute_phrase(corpus, phrase_terms):
    out = {}
    for doc_id, text in corpus:
        toks = TOKEN_RE.findall(text.lower())
        n = len(phrase_terms)
        starts = [
            s for s in range(len(toks) - n + 1)
            if toks[s:s + n] == phrase_terms
        ]
        if starts:
            out[doc_id] = (len(starts), starts[0])
    return out


def _brute_proximity(corpus, terms, window):
    need = set(terms)
    out = {}
    for doc_id, text in corpus:
        toks = TOKEN_RE.findall(text.lower())
        anchors = [
            p for p, t in enumerate(toks)
            if t in need and need <= set(toks[p:p + window])
        ]
        if anchors:
            out[doc_id] = (len(anchors), anchors[0])
    return out


def test_phrase_matches_bruteforce_random(spark):
    import random

    rng = random.Random(417)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    corpus = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
        for i in range(60)
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    queries = [("q0", "aa bb"), ("q1", "bb bb"), ("q2", "cc dd ee"), ("q3", "aa")]
    qdf = spark.createDataFrame(queries, "query_id string, text string")
    got = _match_map(phrase.phrase_match(df, qdf))
    for qid, qtext in queries:
        want = _brute_phrase(corpus, qtext.split())
        ours = {d: v for (q, d), v in got.items() if q == qid}
        assert ours == want, f"{qid}: {ours} vs {want}"

    gotp = {
        (r["query_id"], r["doc_id"]): (r["n_windows"], r["first_window"])
        for r in phrase.proximity_match(df, qdf, window=4).collect()
    }
    for qid, qtext in queries:
        want = _brute_proximity(corpus, qtext.split(), 4)
        ours = {d: v for (q, d), v in gotp.items() if q == qid}
        assert ours == want, f"{qid}: {ours} vs {want}"


def test_phrase_plan_broadcasts_query_side(spark, docs):
    qs = spark.createDataFrame(
        [("p1", "quick brown")], "query_id string, text string"
    )
    plan = phrase.phrase_match(docs, qs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
