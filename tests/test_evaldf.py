"""Distributed per-query eval: agreement with the driver-side
eval.evaluate on every metric, judged-query filtering, and the
missing-run zero contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bm25s_spark.eval import evaluate
from bm25s_spark.operators.evaldf import evaluate_per_query


@pytest.fixture(scope="module")
def frames(spark):
    # run: q1 finds rel docs at ranks 1 and 3 (and a graded-2 at rank 5),
    # q2 finds nothing relevant, q3 is judged but absent from the run
    results = spark.createDataFrame(
        [("q1", 1, 10, 5.0), ("q1", 2, 11, 4.0), ("q1", 3, 12, 3.0),
         ("q1", 4, 13, 2.0), ("q1", 5, 14, 1.0),
         ("q2", 1, 20, 9.0), ("q2", 2, 21, 8.0)],
        "query_id string, rank int, doc_id long, score double",
    )
    qrels = spark.createDataFrame(
        [("q1", 10, 1), ("q1", 12, 1), ("q1", 14, 2), ("q1", 99, 1),
         ("q2", 77, 1), ("q2", 20, 0),          # explicit 0-grade row
         ("q3", 5, 1),
         ("q4", 1, 0)],                          # no positives → excluded
        "query_id string, doc_id long, score int",
    )
    return results, qrels


def test_matches_driver_side_evaluate(spark, frames):
    results, qrels = frames
    per_q = {r.query_id: r for r in
             evaluate_per_query(results, qrels, k=5,
                                grade_col="score").collect()}
    # judged queries with positives: q1, q2, q3 (q4 excluded)
    assert set(per_q) == {"q1", "q2", "q3"}
    driver = evaluate(results, qrels, k_values=(5,))
    n = len(per_q)
    assert sum(r.ndcg for r in per_q.values()) / n == pytest.approx(
        driver["ndcg@5"], abs=2e-5)
    assert sum(r.recall for r in per_q.values()) / n == pytest.approx(
        driver["recall@5"], abs=2e-5)
    assert sum(r.precision for r in per_q.values()) / n == pytest.approx(
        driver["p@5"], abs=2e-5)
    assert sum(r.ap for r in per_q.values()) / n == pytest.approx(
        driver["map@5"], abs=2e-5)
    assert sum(r.rr for r in per_q.values()) / n == pytest.approx(
        driver["mrr"], abs=2e-5)


def test_hand_checked_values(spark, frames):
    import math

    results, qrels = frames
    per_q = {r.query_id: r for r in
             evaluate_per_query(results, qrels, k=5,
                                grade_col="score").collect()}
    q1 = per_q["q1"]
    assert q1.n_rel == 4 and q1.hits == 3
    dcg = 1 / math.log2(2) + 1 / math.log2(4) + 2 / math.log2(6)
    idcg = 2 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4) + 1 / math.log2(5)
    assert q1.ndcg == pytest.approx(dcg / idcg)
    assert q1.recall == pytest.approx(3 / 4)
    assert q1.precision == pytest.approx(3 / 5)
    assert q1.ap == pytest.approx((1 / 1 + 2 / 3 + 3 / 5) / 4)
    assert q1.rr == pytest.approx(1.0)
    # q2: positive judged, zero hits
    assert per_q["q2"].ndcg == 0.0 and per_q["q2"].rr == 0.0
    # q3: judged but absent from the run → all zeros
    q3 = per_q["q3"]
    assert (q3.ndcg, q3.recall, q3.precision, q3.ap, q3.rr) == (0, 0, 0, 0, 0)


def test_k_cut_and_validation(spark, frames):
    results, qrels = frames
    per_q = {r.query_id: r for r in
             evaluate_per_query(results, qrels, k=2,
                                grade_col="score").collect()}
    # at k=2 only the rank-1 hit counts for q1, but RR still sees rank 1
    assert per_q["q1"].hits == 1
    assert per_q["q1"].precision == pytest.approx(1 / 2)
    with pytest.raises(ValueError):
        evaluate_per_query(results, qrels, k=0, grade_col="score")


def test_rr_beyond_k(spark):
    """RR uses the full run: first positive at rank 7 with k=5."""
    results = spark.createDataFrame(
        [("q", r, 100 + r, 1.0) for r in range(1, 8)],
        "query_id string, rank int, doc_id long, score double",
    )
    qrels = spark.createDataFrame(
        [("q", 107, 1)], "query_id string, doc_id long, grade int"
    )
    row = evaluate_per_query(results, qrels, k=5).collect()[0]
    assert row.rr == pytest.approx(1 / 7)
    assert row.hits == 0 and row.ndcg == 0.0


def test_macro_matches_driver_side_dict(spark, frames):
    from bm25s_spark.operators.evaldf import evaluate_macro

    results, qrels = frames
    row = evaluate_macro(results, qrels, k=5, grade_col="score").collect()[0]
    driver = evaluate(results, qrels, k_values=(5,))
    assert row.n_queries == 3
    assert row.ndcg == pytest.approx(driver["ndcg@5"], abs=2e-5)
    assert row.recall == pytest.approx(driver["recall@5"], abs=2e-5)
    assert row.precision == pytest.approx(driver["p@5"], abs=2e-5)
    assert row.map == pytest.approx(driver["map@5"], abs=2e-5)
    assert row.mrr == pytest.approx(driver["mrr"], abs=2e-5)


# ---------------------------------------------------------------- runs


def _run_df(spark, rows):
    """rows: list of (query_id, rank, doc_id)."""
    return spark.createDataFrame(
        [(q, r, d, 0.0) for q, r, d in rows],
        "query_id string, rank int, doc_id long, score double",
    )


def _brute_compare(a_list, b_list, k, p):
    """Pure-Python twin of compare_runs for one query (lists of doc
    ids in rank order)."""
    A, B = a_list[:k], b_list[:k]
    inter = set(A) & set(B)
    na, nb, ov = len(A), len(B), len(inter)
    jac = ov / (na + nb - ov)
    num = sum(
        p ** (d - 1) * len(set(A[:d]) & set(B[:d])) / d
        for d in range(1, k + 1)
    )
    den = sum(p ** (d - 1) for d in range(1, k + 1))
    rbo = num / den
    tau = None
    if ov >= 2:
        ra = {d: i for i, d in enumerate(A)}
        rb = {d: i for i, d in enumerate(B)}
        docs = sorted(inter)
        net = np_ = 0
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                np_ += 1
                s = (ra[docs[i]] - ra[docs[j]]) * (rb[docs[i]] - rb[docs[j]])
                net += 1 if s > 0 else -1
        tau = net / np_
    return ov, jac, rbo, tau


def test_compare_runs_identical_reversed_disjoint(spark):
    from bm25s_spark.operators.evaldf import compare_runs

    a = _run_df(spark, [("q1", r, r) for r in range(1, 5)]
                + [("q2", r, r + 10) for r in range(1, 5)]
                + [("q3", r, r + 20) for r in range(1, 5)])
    b = _run_df(spark, [("q1", r, r) for r in range(1, 5)]          # identical
                + [("q2", r, 15 - r) for r in range(1, 5)]          # reversed
                + [("q3", r, r + 40) for r in range(1, 5)])         # disjoint
    got = {r.query_id: r for r in compare_runs(a, b, k=4, p=0.9).collect()}
    assert got["q1"].overlap == 4 and got["q1"].jaccard == 1.0
    assert got["q1"].rbo == 1.0 and got["q1"].tau == 1.0
    assert got["q2"].overlap == 4 and got["q2"].tau == -1.0
    assert 0.0 < got["q2"].rbo < 1.0
    assert got["q3"].overlap == 0 and got["q3"].jaccard == 0.0
    assert got["q3"].rbo == 0.0 and got["q3"].tau is None


def test_compare_runs_brute_force_parity(spark):
    import random

    from bm25s_spark.operators.evaldf import compare_runs

    rng = random.Random(42)
    k, p = 6, 0.85
    rows_a, rows_b, expected = [], [], {}
    for qi in range(12):
        qid = f"q{qi:02d}"
        pool = list(range(20))
        a_docs = rng.sample(pool, k)
        b_docs = rng.sample(pool, k)
        rows_a += [(qid, r + 1, d) for r, d in enumerate(a_docs)]
        rows_b += [(qid, r + 1, d) for r, d in enumerate(b_docs)]
        expected[qid] = _brute_compare(a_docs, b_docs, k, p)
    got = compare_runs(
        _run_df(spark, rows_a), _run_df(spark, rows_b), k=k, p=p,
        round_to=None,
    ).collect()
    assert len(got) == 12
    for r in got:
        ov, jac, rbo, tau = expected[r.query_id]
        assert r.overlap == ov
        assert r.jaccard == pytest.approx(jac, abs=1e-12)
        assert r.rbo == pytest.approx(rbo, abs=1e-12)
        if tau is None:
            assert r.tau is None
        else:
            assert r.tau == pytest.approx(tau, abs=1e-12)


def test_compare_runs_truncates_and_one_sided(spark):
    from bm25s_spark.operators.evaldf import compare_runs

    # rank > k rows ignored; a query present only in run A still emits
    a = _run_df(spark, [("q1", 1, 1), ("q1", 2, 2), ("q1", 3, 99),
                        ("q4", 1, 7)])
    b = _run_df(spark, [("q1", 1, 2), ("q1", 2, 1), ("q1", 3, 98)])
    got = {r.query_id: r for r in compare_runs(a, b, k=2, p=0.9).collect()}
    assert set(got) == {"q1", "q4"}
    assert got["q1"].n_a == 2 and got["q1"].n_b == 2
    assert got["q1"].overlap == 2 and got["q1"].tau == -1.0
    assert got["q4"].n_a == 1 and got["q4"].n_b == 0
    assert got["q4"].overlap == 0 and got["q4"].jaccard == 0.0


def test_rbo_weights_validation():
    from bm25s_spark.operators.evaldf import rbo_weights

    with pytest.raises(ValueError):
        rbo_weights(0)
    with pytest.raises(ValueError):
        rbo_weights(5, p=1.0)
    w, den = rbo_weights(3, 0.5)
    # W[m] = sum_{d=m..3} 0.5^(d-1)/d; den = 1 + .5 + .25
    assert w[2] == pytest.approx(0.25 / 3)
    assert w[1] == pytest.approx(0.5 / 2 + 0.25 / 3)
    assert w[0] == pytest.approx(1.0 + 0.5 / 2 + 0.25 / 3)
    assert den == pytest.approx(1.75)
