"""BM25F multi-field ranking: formula pin, field-weight monotonicity,
additivity of repeated (doc, field) rows, and the non-equivalence to a
weighted sum of per-field BM25 scores (the defining BM25F property,
Robertson/Zaragoza/Taylor CIKM'04)."""

from __future__ import annotations

import math

import pytest

from bm25s_spark.operators.bm25f import build_bm25f, bm25f_retrieve

TURNS = [
    # conv, role, text (stopword-free tokens so hand math is exact)
    ("c1", "user", "spark shuffle"),
    ("c1", "assistant", "shuffle partition partition"),
    ("c2", "user", "parquet pruning"),
    ("c2", "assistant", "shuffle spark spark"),
]
WEIGHTS = {"user": 2.0, "assistant": 1.0}


def _hand_score(term_rows, query_terms, k1=1.5, weights=WEIGHTS, b=0.75):
    """Pure-python BM25F over TURNS-shaped rows for the pinned formula."""
    docs = sorted({d for d, _, _ in term_rows})
    n = len(docs)
    # per-(doc, field) lengths and per-field avgdl over ALL docs
    dl = {}
    tf = {}
    for d, f, text in term_rows:
        toks = text.split()
        dl[(d, f)] = dl.get((d, f), 0) + len(toks)
        for t in toks:
            tf[(d, f, t)] = tf.get((d, f, t), 0) + 1
    fields = sorted({f for _, f in dl})
    avg = {f: sum(dl.get((d, f), 0) for d in docs) / n for f in fields}
    tfw = {}
    for (d, f, t), c in tf.items():
        norm = 1.0 - b + b * dl[(d, f)] / avg[f]
        tfw[(d, t)] = tfw.get((d, t), 0.0) + weights[f] * c / norm
    df = {}
    for (d, t) in tfw:
        df[t] = df.get(t, 0) + 1
    out = {}
    for d in docs:
        s = 0.0
        for t in query_terms:
            if (d, t) not in tfw or t not in df:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            x = tfw[(d, t)]
            s += idf * x / (k1 + x)
        out[d] = s
    return out


@pytest.fixture(scope="module")
def scored(spark):
    turns = spark.createDataFrame(TURNS, "conv_id string, role string, text string")
    idx = build_bm25f(turns, field_weights=WEIGHTS)
    qdf = spark.createDataFrame([("q1", "spark shuffle")], "query_id string, text string")
    res = bm25f_retrieve(idx, qdf, k=5).collect()
    return {r.doc_key: r.score for r in res}


def test_matches_hand_formula(scored):
    hand = _hand_score(TURNS, ["spark", "shuffle"])
    assert set(scored) == {d for d, s in hand.items() if s > 0}
    for d, s in scored.items():
        assert s == pytest.approx(hand[d], rel=1e-9)


def test_not_weighted_sum_of_per_field_bm25(scored):
    """BM25F combines pseudo-frequencies BEFORE saturation; a weighted
    sum of per-field BM25 scores saturates each field separately and
    gives a different number for any doc with the term in >1 field."""
    per_field = 0.0
    for f in ("user", "assistant"):
        rows = [(d, "x", t) for d, ff, t in TURNS if ff == f]
        # single-field BM25F with weight 1 == plain BM25 on that field
        sub = _hand_score(rows, ["spark", "shuffle"], weights={"x": 1.0})
        per_field += WEIGHTS[f] * sub.get("c1", 0.0)
    assert scored["c1"] != pytest.approx(per_field, rel=1e-6)


def test_field_weight_monotonicity(spark):
    """Raising the user-field weight must raise the score of a doc whose
    only query-term occurrences are in user turns, relative to one whose
    occurrences are in assistant turns."""
    turns = spark.createDataFrame(
        [("a", "user", "needle filler"), ("b", "assistant", "needle filler")],
        "conv_id string, role string, text string",
    )
    qdf = spark.createDataFrame([("q", "needle")], "query_id string, text string")

    def score_ratio(w_user):
        idx = build_bm25f(turns, field_weights={"user": w_user, "assistant": 1.0})
        rows = bm25f_retrieve(idx, qdf, k=2).collect()
        s = {r.doc_key: r.score for r in rows}
        return s["a"] / s["b"]

    assert score_ratio(3.0) > score_ratio(1.0)
    assert score_ratio(1.0) == pytest.approx(1.0)


def test_repeated_doc_field_rows_add(spark):
    """Two rows for the same (doc, field) must score identically to one
    concatenated row — tf and field length are both additive."""
    split = spark.createDataFrame(
        [("c", "user", "alpha beta"), ("c", "user", "alpha gamma"),
         ("d", "user", "delta")],
        "conv_id string, role string, text string",
    )
    merged = spark.createDataFrame(
        [("c", "user", "alpha beta alpha gamma"), ("d", "user", "delta")],
        "conv_id string, role string, text string",
    )
    qdf = spark.createDataFrame([("q", "alpha beta")], "query_id string, text string")
    out = []
    for df in (split, merged):
        idx = build_bm25f(df, field_weights={"user": 1.0})
        rows = bm25f_retrieve(idx, qdf, k=2).collect()
        out.append({r.doc_key: r.score for r in rows})
    assert out[0] == pytest.approx(out[1])


def test_unknown_field_gets_defaults(spark):
    """A field absent from field_weights scores with weight 1.0/b 0.75 —
    identical to listing it explicitly."""
    turns = spark.createDataFrame(
        [("c", "system", "needle"), ("d", "user", "needle haystack")],
        "conv_id string, role string, text string",
    )
    qdf = spark.createDataFrame([("q", "needle")], "query_id string, text string")
    implicit = build_bm25f(turns, field_weights={"user": 1.0})
    explicit = build_bm25f(turns, field_weights={"user": 1.0, "system": 1.0})
    a = {r.doc_key: r.score for r in bm25f_retrieve(implicit, qdf, k=2).collect()}
    b = {r.doc_key: r.score for r in bm25f_retrieve(explicit, qdf, k=2).collect()}
    assert a == pytest.approx(b)
