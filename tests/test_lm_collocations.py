"""Unigram-LM scoring and PMI collocation mining vs brute-force
Python oracles (plus edge cases the sf tables don't exercise:
empty / single-token documents, external model with OOV tokens)."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from bm25s_spark.operators.collocations import pmi_collocations
from bm25s_spark.operators.lm import unigram_counts, with_lm_score

TEXTS = {
    0: "the cat sat on the mat",
    1: "the cat ate the   fish",
    2: "dogs bark",
    3: "x",
    4: "",
    5: "the cat sat on the mat again",
}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in TEXTS.items()], "doc_id long, text string"
    )


def _toks():
    return {i: t.split() for i, t in TEXTS.items()}


def test_lm_score_matches_bruteforce(docs):
    toks = _toks()
    cnt = Counter(w for ts in toks.values() for w in ts)
    t_total, v = sum(cnt.values()), len(cnt)
    got = {r.doc_id: r for r in with_lm_score(docs).collect()}
    assert set(got) == set(TEXTS)
    for i, ts in toks.items():
        assert got[i].n_tokens == len(ts)
        if not ts:
            assert got[i].cross_entropy is None
            continue
        exp = -sum(
            math.log((cnt[w] + 0.5) / (t_total + 0.5 * v)) for w in ts
        ) / len(ts)
        assert got[i].cross_entropy == pytest.approx(exp, rel=1e-12)


def test_lm_score_external_model_oov(spark, docs):
    """Scoring under another corpus's model: OOV tokens get the pure
    add-k smoothing mass."""
    model_docs = spark.createDataFrame(
        [(0, "the the cat")], "doc_id long, text string"
    )
    counts = unigram_counts(model_docs)
    got = {
        r.doc_id: r
        for r in with_lm_score(docs, counts=counts).collect()
    }
    cnt = {"the": 2, "cat": 1}
    t_total, v = 3, 2
    denom = t_total + 0.5 * v
    for i, ts in _toks().items():
        if not ts:
            continue
        exp = -sum(
            math.log((cnt.get(w, 0) + 0.5) / denom) for w in ts
        ) / len(ts)
        assert got[i].cross_entropy == pytest.approx(exp, rel=1e-12)


def test_pmi_matches_bruteforce(docs):
    toks = _toks()
    cnt = Counter(w for ts in toks.values() for w in ts)
    t_uni = sum(cnt.values())
    big = Counter()
    for ts in toks.values():
        for a, b in zip(ts, ts[1:]):
            big[(a, b)] += 1
    t_bi = sum(big.values())
    exp = sorted(
        (
            (round(math.log(c * t_uni * t_uni / (t_bi * cnt[a] * cnt[b])), 4),
             a, b, c)
            for (a, b), c in big.items()
            if c >= 2
        ),
        key=lambda t: (-t[0], t[1], t[2]),
    )
    got = pmi_collocations(docs, min_count=2, k=10).collect()
    assert len(got) == len(exp)
    for i, row in enumerate(got):
        assert row.rank == i + 1
        assert (row.pmi, row.w1, row.w2, row.pair_count) == exp[i]


def test_pmi_min_count_and_k(docs):
    # min_count above every pair count -> empty result, no error
    assert pmi_collocations(docs, min_count=99, k=5).count() == 0
    # k smaller than the qualifying set truncates deterministically
    top1 = pmi_collocations(docs, min_count=2, k=1).collect()
    top3 = pmi_collocations(docs, min_count=2, k=3).collect()
    assert len(top1) == 1 and len(top3) == 3
    assert top1[0] == top3[0]
