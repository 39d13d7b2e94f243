"""Pseudo-relevance-feedback expansion: brute-force oracle for the
mined terms, recall-bridging behavior, and edge cases."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from bm25s_spark.indexer import build_index
from bm25s_spark.operators.prf import prf_expand, prf_retrieve
from bm25s_spark.retrieval import retrieve

# "feline" never co-occurs with "kitten" in a query, but docs 0/1 bridge
# them; doc 3 contains only the bridge terms, so it is unreachable for
# the query "feline" until expansion adds the bridge.
CORPUS = [
    (0, "feline kitten kitten kitten whiskers whiskers purring"),
    (1, "feline kitten kitten kitten naps sunshine"),
    (2, "canine puppy barking loudly"),
    (3, "kitten whiskers playing yarn"),
    (4, "engine piston torque manifold"),
    (5, "feline climbing curtains chaos"),
]


@pytest.fixture(scope="module")
def index(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    return build_index(docs, doc_id_col="doc_id").persist()


def _brute_expansion(query_terms, feedback_docs, expansion_terms):
    """Replay prf_expand's mining in plain Python (lucene round 1 is
    trusted — asserted separately against retrieve)."""
    texts = {i: t.split() for i, t in CORPUS}
    df = Counter()
    for ts in texts.values():
        for w in set(ts):
            df[w] += 1
    n = float(len(texts))
    return df, n, texts


def test_prf_expand_mines_cooccurring_terms(spark, index):
    qdf = spark.createDataFrame(
        [("q1", "feline")], "query_id string, text string"
    )
    # round 1 for "feline": docs 0, 1, 5 (all contain it).  Mining their
    # terms by sum tf*ln(N/df), excluding "feline" itself.
    df, n, texts = _brute_expansion(["feline"], 3, 2)
    hits = [0, 1, 5]
    scores = Counter()
    for d in hits:
        for w, tf in Counter(texts[d]).items():
            scores[w] += tf * math.log(n / df[w])
    scores.pop("feline")
    expect = sorted(
        scores, key=lambda w: (-round(scores[w], 6), w)
    )[:2]

    out = prf_expand(
        index, qdf, feedback_docs=3, expansion_terms=2
    ).collect()
    assert len(out) == 1
    toks = out[0].text
    assert toks[0] == "feline"
    assert sorted(toks[1:]) == sorted(expect)


def test_prf_retrieve_bridges_vocabulary(spark, index):
    qdf = spark.createDataFrame(
        [("q1", "feline")], "query_id string, text string"
    )
    base = retrieve(index, qdf, k=6, pad=False)
    base_hits = {r.doc_id for r in base.collect() if r.score > 0}
    assert 3 not in base_hits  # doc 3 shares no term with the query

    out = prf_retrieve(
        index, qdf, k=6, feedback_docs=3, expansion_terms=2, pad=False
    )
    prf_hits = {r.doc_id for r in out.collect() if r.score > 0}
    assert 3 in prf_hits  # "kitten"/"whiskers" bridge reaches doc 3
    assert 4 not in prf_hits  # the engine-parts doc stays unreachable


def test_prf_zero_expansion_is_baseline(spark, index):
    qdf = spark.createDataFrame(
        [("q1", "feline kitten")], "query_id string, text string"
    )
    base = {(r.query_id, r.rank, r.doc_id, round(r.score, 9))
            for r in retrieve(index, qdf, k=4).collect()}
    same = {(r.query_id, r.rank, r.doc_id, round(r.score, 9))
            for r in prf_retrieve(index, qdf, k=4,
                                  expansion_terms=0).collect()}
    assert base == same


def test_prf_oov_query_passes_through(spark, index):
    qdf = spark.createDataFrame(
        [("q1", "zzzz qqqq")], "query_id string, text string"
    )
    out = prf_retrieve(index, qdf, k=2, pad=True).collect()
    assert len(out) == 2 and all(r.score == 0.0 for r in out)


def test_prf_validation(spark, index):
    qdf = spark.createDataFrame(
        [("q1", "feline")], "query_id string, text string"
    )
    with pytest.raises(ValueError):
        prf_expand(index, qdf, feedback_docs=0)
    with pytest.raises(ValueError):
        prf_expand(index, qdf, expansion_terms=-1)


def test_prf_delta_matches_full(spark, index):
    """rescore='delta' reproduces the full-rescore ranking and scores
    (BM25 per-term additivity — only FP summation order differs)."""
    qdf = spark.createDataFrame(
        [("q1", "feline"), ("q2", "kitten yarn"), ("q3", "zzznope"),
         ("q4", "")],
        "query_id string, text string",
    )
    k = 4
    full = prf_retrieve(index, qdf, k=k, feedback_docs=3,
                        expansion_terms=2, rescore="full").collect()
    delta = prf_retrieve(index, qdf, k=k, feedback_docs=3,
                         expansion_terms=2, rescore="delta").collect()
    fm = {(r["query_id"], r["rank"]): (r["doc_id"], r["score"]) for r in full}
    dm = {(r["query_id"], r["rank"]): (r["doc_id"], r["score"]) for r in delta}
    assert fm.keys() == dm.keys()
    for key in fm:
        fd, fs = fm[key]
        dd, ds = dm[key]
        assert fd == dd, (key, fm[key], dm[key])
        assert abs(fs - ds) < 1e-9, (key, fs, ds)


def test_prf_delta_nnoc_method(spark, index):
    """Delta decomposition must also hold for a nonoccurrence-constant
    variant (bm25+): scores split into round-1 + expansion nnoc + delta."""
    qdf = spark.createDataFrame(
        [("q1", "feline"), ("q2", "whiskers purring")],
        "query_id string, text string",
    )
    full = prf_retrieve(index, qdf, k=5, feedback_docs=2,
                        expansion_terms=2, method="bm25+",
                        rescore="full").collect()
    delta = prf_retrieve(index, qdf, k=5, feedback_docs=2,
                         expansion_terms=2, method="bm25+",
                         rescore="delta").collect()
    fm = {(r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 9))
          for r in full}
    dm = {(r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 9))
          for r in delta}
    assert fm == dm


def test_prf_delta_rejects_passthrough_flags(spark, index):
    qdf = spark.createDataFrame([("q1", "feline")],
                                "query_id string, text string")
    with pytest.raises(ValueError, match="delta"):
        prf_retrieve(index, qdf, rescore="delta", strategy="sharded")
    with pytest.raises(ValueError, match="rescore"):
        prf_retrieve(index, qdf, rescore="bogus")
    with pytest.raises(ValueError):
        prf_retrieve(index, qdf, k=99, rescore="delta")


def test_prf_delta_localizes_expansion_terms(spark, index):
    """The round-2 plan must consume the mined expansion set as a DRIVER-
    LOCAL relation (the mining postings pass runs once at call time, not
    re-executed inside each of its three consumers) and must carry the
    driver-known `term IN (...)` predicate so a disk-backed postings
    scan can skip row groups outside the expansion terms' ranges."""
    import contextlib
    import io

    from bm25s_spark.operators.prf import prf_score_delta

    qdf = spark.createDataFrame(
        [("q1", "feline")], "query_id string, text string"
    )
    out = prf_score_delta(index, qdf, feedback_docs=3, expansion_terms=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # expansion side is a materialized local relation, not the mining plan
    assert "LocalTableScan" in plan or "Scan ExistingRDD" in plan, plan
    # round-1 feedback mining must NOT appear in the returned plan — it
    # already ran ("escore" is the mining aggregate's unique marker; the
    # index's own term-id assignment windows legitimately remain)
    assert "escore" not in plan, plan
    # the pushable membership predicate over the mined terms is present
    assert re.search(r"term#\d+ IN(SET)? \(", plan), plan


def test_prf_delta_above_cap_skips_in_list(spark, index, monkeypatch):
    """Above IN_LIST_CAP the delta path must NOT build a vocab-sized
    IN expression — the broadcast hash join alone prunes the postings
    scan — and the scores must be unchanged (the predicate is a scan
    optimization, not a semantic filter)."""
    import contextlib
    import io

    import bm25s_spark.operators.prf as prf_mod
    from bm25s_spark.operators.prf import prf_score_delta

    qdf = spark.createDataFrame(
        [("q1", "feline"), ("q2", "kitten yarn")],
        "query_id string, text string",
    )
    capped = prf_score_delta(index, qdf, feedback_docs=3,
                             expansion_terms=2)
    baseline = {(r["query_id"], r["doc_id"]): round(r["score"], 9)
                for r in capped.collect()}

    monkeypatch.setattr(prf_mod, "IN_LIST_CAP", 0)
    uncapped = prf_score_delta(index, qdf, feedback_docs=3,
                               expansion_terms=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        uncapped.explain("formatted")
    plan = buf.getvalue()
    assert not re.search(r"term#\d+ IN(SET)? \(", plan), plan
    got = {(r["query_id"], r["doc_id"]): round(r["score"], 9)
           for r in uncapped.collect()}
    assert got == baseline


def test_prf_delta_empty_expansion_short_circuits(spark, index):
    """An all-OOV batch mines nothing: the delta path must return the
    round-1 scores without executing the round-2 postings pass
    (regression: an empty broadcast join still scanned every posting).
    With padding, each query still gets k nnoc-scored rows."""
    qdf = spark.createDataFrame(
        [("q1", "zzznope"), ("q2", "qqqnada")],
        "query_id string, text string",
    )
    k = 3
    got = prf_retrieve(index, qdf, k=k, feedback_docs=3,
                       expansion_terms=2, rescore="delta").collect()
    # both queries fully OOV → padded zero-score rows, k per query
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {"q1", "q2"}
    for rows in by_q.values():
        assert len(rows) == k
        assert all(r["score"] == 0.0 for r in rows)
    # and it matches the full path exactly
    full = prf_retrieve(index, qdf, k=k, feedback_docs=3,
                        expansion_terms=2, rescore="full").collect()
    assert sorted((r["query_id"], r["rank"], r["doc_id"], r["score"])
                  for r in got) == \
           sorted((r["query_id"], r["rank"], r["doc_id"], r["score"])
                  for r in full)


def test_prf_delta_empty_expansion_plan_has_no_postings_scan(spark, index):
    """The short-circuited plan must not reference the round-2 postings
    join at all — prf_score_delta with zero mined terms is round-1 only."""
    from bm25s_spark.operators.prf import prf_score_delta

    qdf = spark.createDataFrame(
        [("q1", "zzznope")], "query_id string, text string"
    )
    out = prf_score_delta(index, qdf, feedback_docs=2, expansion_terms=2)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the delta leg's full_outer join is absent from the lineage
    assert "full_outer" not in plan.lower().replace("fullouter", "full_outer")
