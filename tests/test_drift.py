"""Corpus drift + speaker analytics: brute-force parity and contract
tests for ``operators/drift.py`` and ``transcripts.speaker_stats``."""

from __future__ import annotations

import datetime as dt
import math
import re

import pytest
from pyspark.sql import functions as F

from bm25s_spark.operators.drift import distribution_divergence, term_drift
from bm25s_spark.tokenization import resolve_stopwords
from bm25s_spark.transcripts import speaker_stats


# ---------------------------------------------------------------- drift

def _brute_counts(texts, stopwords="en"):
    sw = resolve_stopwords(stopwords)
    counts: dict[str, int] = {}
    for t in texts:
        for tok in re.findall(r"\w\w+", t.lower()):
            if tok not in sw:
                counts[tok] = counts.get(tok, 0) + 1
    return counts


def _brute_drift(texts_a, texts_b, stopwords="en"):
    ca, cb = _brute_counts(texts_a, stopwords), _brute_counts(texts_b, stopwords)
    vocab = sorted(set(ca) | set(cb))
    v = len(vocab)
    na, nb = sum(ca.values()), sum(cb.values())
    rows = {}
    for t in vocab:
        pa = (ca.get(t, 0) + 1.0) / (na + v)
        pb = (cb.get(t, 0) + 1.0) / (nb + v)
        rows[t] = (ca.get(t, 0), cb.get(t, 0), pa, pb,
                   math.log(pa / pb), (pa - pb) * math.log(pa / pb))
    return rows, (na, nb, len(ca), len(cb), v)


CORPUS_A = [
    "spark engine shuffles data across partitions",
    "the spark engine compiles plans to bytecode",
    "tokenizer splits text into terms",
    "quality filters drop boilerplate text",
]
CORPUS_B = [
    "transformer models train on curated text",
    "the tokenizer splits text into terms",
    "curated corpora need quality filters",
    "models need deduplicated training data",
]


@pytest.fixture(scope="module")
def ab(spark):
    a = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS_A)], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS_B)], "doc_id long, text string"
    )
    return a, b


def test_term_drift_matches_brute_force(ab):
    a, b = ab
    got = {r["term"]: r for r in term_drift(a, b, top_t=1000).collect()}
    rows, _ = _brute_drift(CORPUS_A, CORPUS_B)
    assert set(got) == set(rows)
    for t, (cnt_a, cnt_b, pa, pb, lr, sc) in rows.items():
        g = got[t]
        assert (g["cnt_a"], g["cnt_b"]) == (cnt_a, cnt_b)
        assert g["p_a"] == pytest.approx(pa, abs=1e-9)
        assert g["p_b"] == pytest.approx(pb, abs=1e-9)
        assert g["log_ratio"] == pytest.approx(lr, abs=1e-8)
        assert g["score"] == pytest.approx(sc, abs=1e-8)


def test_term_drift_ranking_and_top_t(ab):
    a, b = ab
    got = term_drift(a, b, top_t=5).collect()
    assert [r["rank"] for r in got] == [1, 2, 3, 4, 5]
    keys = [(-r["score"], r["term"]) for r in got]
    assert keys == sorted(keys)
    # a term unique to one side must out-rank a term common to both
    top_terms = {r["term"] for r in got}
    assert "spark" in top_terms  # appears twice in A, never in B


def test_term_drift_direction_signs(ab):
    a, b = ab
    got = {r["term"]: r for r in term_drift(a, b, top_t=1000).collect()}
    assert got["spark"]["log_ratio"] > 0  # vanishing (A-only)
    assert got["models"]["log_ratio"] < 0  # emerging (B-only)
    assert all(r["score"] >= 0 for r in got.values())


def test_distribution_divergence_matches_brute_force(ab):
    a, b = ab
    row = distribution_divergence(a, b).collect()[0]
    rows, (na, nb, va, vb, v) = _brute_drift(CORPUS_A, CORPUS_B)
    assert (row["n_tokens_a"], row["n_tokens_b"]) == (na, nb)
    assert (row["vocab_a"], row["vocab_b"], row["vocab_union"]) == (va, vb, v)
    kl_ab = sum(pa * math.log(pa / pb) for _, _, pa, pb, _, _ in rows.values())
    kl_ba = sum(-pb * math.log(pa / pb) for _, _, pa, pb, _, _ in rows.values())
    assert row["kl_ab"] == pytest.approx(kl_ab, abs=1e-6)
    assert row["kl_ba"] == pytest.approx(kl_ba, abs=1e-6)
    assert row["jeffreys"] == pytest.approx(kl_ab + kl_ba, abs=1e-6)


def test_distribution_divergence_identical_corpora_is_zero(spark, ab):
    a, _ = ab
    row = distribution_divergence(a, a).collect()[0]
    assert row["kl_ab"] == 0.0 and row["kl_ba"] == 0.0 and row["jeffreys"] == 0.0
    assert row["n_tokens_a"] == row["n_tokens_b"]
    assert row["vocab_a"] == row["vocab_b"] == row["vocab_union"]


# ------------------------------------------------------- speaker stats

TS0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _turns(spark):
    rows = [
        # conv c0: user → assistant (7s) → assistant (same role, not a
        # response) → user (12.5s after the last assistant turn)
        ("c0", 0, "user", "hello there engine", TS0),
        ("c0", 1, "assistant", "hi how can i help you today", TS0 + dt.timedelta(seconds=7)),
        ("c0", 2, "assistant", "still thinking", TS0 + dt.timedelta(seconds=9)),
        ("c0", 3, "user", "never mind", TS0 + dt.timedelta(seconds=21, microseconds=500000)),
        # conv c1: single turn — no responses anywhere
        ("c1", 0, "user", "", TS0),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts timestamp"
    )


def test_speaker_stats_values(spark):
    got = {
        (r["conv_id"], r["role"]): r
        for r in speaker_stats(_turns(spark)).collect()
    }
    assert set(got) == {("c0", "user"), ("c0", "assistant"), ("c1", "user")}

    u0 = got[("c0", "user")]
    # tokens: \w\w+ — "hello there engine"=3, "never mind"=2
    assert (u0["n_turns"], u0["n_tokens"]) == (2, 5)
    assert u0["avg_tokens"] == pytest.approx(2.5)
    # one response: turn 3 follows assistant, gap 12.5 s
    assert (u0["n_responses"], u0["sum_response_us"]) == (1, 12_500_000)
    assert u0["avg_response_sec"] == pytest.approx(12.5)

    a0 = got[("c0", "assistant")]
    # turn 1 responds to user (7 s); turn 2 follows same role → NOT a response
    assert (a0["n_turns"], a0["n_responses"]) == (2, 1)
    assert a0["sum_response_us"] == 7_000_000
    assert a0["avg_response_sec"] == pytest.approx(7.0)
    # "hi how can i help you today": \w\w+ drops 1-char "i" → 6 tokens;
    # "still thinking" → 2
    assert a0["n_tokens"] == 8

    u1 = got[("c1", "user")]
    # empty text → 0 tokens; first turn → no response, NULL avg
    assert (u1["n_turns"], u1["n_tokens"], u1["n_responses"]) == (1, 0, 0)
    assert u1["sum_response_us"] == 0
    assert u1["avg_response_sec"] is None


def test_speaker_stats_no_python_in_plan(spark):
    plan = speaker_stats(_turns(spark))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
