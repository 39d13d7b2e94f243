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
