"""Dirichlet query-likelihood ranking: hand-computed tiny-corpus scores,
length-prior behavior, OOV handling, and argument validation.

The reference engine has no LM similarity (its scoring surface is the
BM25 family, ``reference/bm25s/scoring.py:13-136``); the expected values
here are therefore computed from the published formula directly:

    score(q,d) = Σ_{t∈q∩d} mult · ln(1 + tf·T/(μ·cf)) + qlen·ln(μ/(μ+dl))
"""

from __future__ import annotations

import math

import pytest

from bm25s_spark.indexer import build_index
from bm25s_spark.operators.qld import retrieve_qld, score_qld

MU = 2000.0


@pytest.fixture(scope="module")
def tiny_index(spark):
    rows = [
        (0, "apple banana apple"),
        (1, "banana cherry"),
        (2, "apple cherry cherry cherry"),
        (3, "durian"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(docs, doc_id_col="doc_id", stopwords=None).persist()
    yield idx
    idx.unpersist()


def _expected(corpus, query_terms, mu=MU):
    """Pure-Python oracle over token lists."""
    cf: dict[str, int] = {}
    for toks in corpus.values():
        for t in toks:
            cf[t] = cf.get(t, 0) + 1
    total = float(sum(cf.values()))
    inv = [t for t in query_terms if t in cf]
    qlen = float(len(inv))
    out = {}
    for doc_id, toks in corpus.items():
        dl = float(len(toks))
        msum = 0.0
        matched = False
        for t in set(inv):
            tf = toks.count(t)
            if tf:
                matched = True
                msum += inv.count(t) * math.log(
                    1.0 + tf * total / (mu * cf[t])
                )
        if matched:
            out[doc_id] = msum + qlen * math.log(mu / (mu + dl))
    return out


CORPUS = {
    0: ["apple", "banana", "apple"],
    1: ["banana", "cherry"],
    2: ["apple", "cherry", "cherry", "cherry"],
    3: ["durian"],
}


def test_scores_match_formula(spark, tiny_index):
    qdf = spark.createDataFrame(
        [("q1", "apple cherry"), ("q2", "banana banana")],
        "query_id string, text string",
    )
    got = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in score_qld(tiny_index, qdf, mu=MU).collect()
    }
    exp1 = _expected(CORPUS, ["apple", "cherry"])
    exp2 = _expected(CORPUS, ["banana", "banana"])
    exp = {("q1", d): s for d, s in exp1.items()}
    exp.update({("q2", d): s for d, s in exp2.items()})
    assert set(got) == set(exp)  # only matching docs appear
    for k, v in exp.items():
        assert got[k] == pytest.approx(v, abs=1e-12)


def test_topk_ranking_and_tiebreak(spark, tiny_index):
    qdf = spark.createDataFrame([("q1", "cherry")], "query_id string, text string")
    out = retrieve_qld(tiny_index, qdf, k=3, mu=MU, round_to=4).collect()
    ranked = [(r["rank"], r["doc_id"]) for r in sorted(out, key=lambda r: r["rank"])]
    # doc 2 has tf=3 (beats its longer dl); doc 1 has tf=1
    assert ranked == [(1, 2), (2, 1)]
    exp = _expected(CORPUS, ["cherry"])
    scores = {r["doc_id"]: r["score"] for r in out}
    for d, s in exp.items():
        assert scores[d] == pytest.approx(round(s, 4), abs=1e-9)


def test_length_prior_demotes_longer_doc(spark):
    # same single-term tf, different dl → shorter doc must rank first
    rows = [(0, "zebra pad"), (1, "zebra pad pad pad pad pad")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(docs, doc_id_col="doc_id", stopwords=None)
    qdf = spark.createDataFrame([("q", "zebra")], "query_id string, text string")
    out = {r["rank"]: r["doc_id"] for r in retrieve_qld(idx, qdf, k=2).collect()}
    assert out == {1: 0, 2: 1}


def test_oov_terms_drop_from_query_and_qlen(spark, tiny_index):
    qdf = spark.createDataFrame(
        [("with_oov", "apple zzqx"), ("clean", "apple")],
        "query_id string, text string",
    )
    got = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in score_qld(tiny_index, qdf, mu=MU).collect()
    }
    # OOV term contributes nothing anywhere — scores identical to the
    # clean query (qlen counts in-vocab occurrences only)
    for (qid, doc), s in got.items():
        other = ("clean", doc) if qid == "with_oov" else ("with_oov", doc)
        assert got[other] == pytest.approx(s, abs=0.0)


def test_all_oov_query_yields_no_rows(spark, tiny_index):
    qdf = spark.createDataFrame([("q", "zzqx wwvv")], "query_id string, text string")
    assert score_qld(tiny_index, qdf).count() == 0


def test_validation(spark, tiny_index):
    qdf = spark.createDataFrame([("q", "apple")], "query_id string, text string")
    with pytest.raises(ValueError, match="mu"):
        score_qld(tiny_index, qdf, mu=0.0)
    with pytest.raises(ValueError, match="k"):
        retrieve_qld(tiny_index, qdf, k=0)


def test_collection_frequencies_memoized(spark, tiny_index):
    """cf is static per index: the postings aggregation runs once and is
    reused by every subsequent scoring call (the second lookup returns
    the SAME materialized table, no recomputation)."""
    from bm25s_spark.operators.qld import collection_frequencies

    cf1, t1 = collection_frequencies(tiny_index)
    cf2, t2 = collection_frequencies(tiny_index)
    assert cf2 is cf1 and t2 == t1
    # the memo survives a retrieve call and feeds it
    qdf = spark.createDataFrame([("q1", "apple")], "query_id string, text string")
    retrieve_qld(tiny_index, qdf, k=2).count()
    assert tiny_index._qld_cf[0] is cf1
