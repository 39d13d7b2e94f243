"""Faceted result counts: hand-checked counts, tie/rank rules, null
facets, top_n cut, score sums, and the broadcast plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bm25s_spark.operators.facets import facet_counts


@pytest.fixture(scope="module")
def frames(spark):
    results = spark.createDataFrame(
        [("q1", 0, 2.0), ("q1", 1, 1.5), ("q1", 2, 1.0), ("q1", 3, 0.5),
         ("q2", 2, 3.0), ("q2", 4, 2.5)],
        "query_id string, doc_id long, score double",
    )
    docs = spark.createDataFrame(
        [(0, "user"), (1, "tool"), (2, "user"), (3, None), (4, "assistant"),
         (5, "user")],
        "doc_id long, role string",
    )
    return results, docs


def test_counts_and_rank(frames):
    results, docs = frames
    rows = facet_counts(results, docs, "role").collect()
    got = {(r.query_id, r.facet): (r.n_docs, r.rank) for r in rows}
    assert got == {
        ("q1", "user"): (2, 1),
        ("q1", "tool"): (1, 2),   # count tie vs NULL → facet asc, nulls last
        ("q1", None): (1, 3),
        ("q2", "assistant"): (1, 1),
        ("q2", "user"): (1, 2),
    }


def test_top_n_cut(frames):
    results, docs = frames
    rows = facet_counts(results, docs, "role", top_n=1).collect()
    got = {r.query_id: r.facet for r in rows}
    assert got == {"q1": "user", "q2": "assistant"}
    with pytest.raises(ValueError):
        facet_counts(results, docs, "role", top_n=0)


def test_score_sums(frames):
    results, docs = frames
    rows = facet_counts(results, docs, "role", score_col="score").collect()
    got = {(r.query_id, r.facet): r.sum_score for r in rows}
    assert got[("q1", "user")] == pytest.approx(3.0)
    assert got[("q1", "tool")] == pytest.approx(1.5)
    assert got[("q2", "assistant")] == pytest.approx(2.5)


def test_unmatched_doc_dropped(spark, frames):
    """A hit with no metadata row vanishes from the counts (inner-join
    contract) rather than polluting a NULL facet."""
    _, docs = frames
    results = spark.createDataFrame(
        [("q", 0, 1.0), ("q", 99, 9.0)],
        "query_id string, doc_id long, score double",
    )
    rows = facet_counts(results, docs, "role").collect()
    assert {(r.facet, r.n_docs) for r in rows} == {("user", 1)}


def test_plan_broadcasts_result_side(frames):
    results, docs = frames
    plan = facet_counts(results, docs, "role")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_date_histogram_buckets(spark):
    from datetime import datetime

    from bm25s_spark.operators.facets import date_histogram

    results = spark.createDataFrame(
        [("q1", 0), ("q1", 1), ("q1", 2), ("q2", 0)],
        "query_id string, doc_id long",
    )
    docs = spark.createDataFrame(
        [(0, datetime(2026, 1, 1, 9, 5)), (1, datetime(2026, 1, 1, 9, 55)),
         (2, datetime(2026, 1, 1, 11, 0)), (3, datetime(2026, 1, 2, 0, 0))],
        "doc_id long, ts timestamp",
    )
    rows = date_histogram(results, docs, interval="hour").collect()
    got = {(r.query_id, r.bucket): r.n_docs for r in rows}
    assert got == {
        ("q1", datetime(2026, 1, 1, 9)): 2,
        ("q1", datetime(2026, 1, 1, 11)): 1,   # 10:00 gap stays sparse
        ("q2", datetime(2026, 1, 1, 9)): 1,
    }
    # day granularity collapses q1 to one bucket
    day = date_histogram(results, docs, interval="day").collect()
    got_day = {(r.query_id, r.bucket): r.n_docs for r in day}
    assert got_day[("q1", datetime(2026, 1, 1))] == 3


def test_index_stats_counters(spark):
    from bm25s_spark.indexer import build_index, index_stats

    df = spark.createDataFrame(
        [(0, "zebra zebra giraffe"), (1, "zebra savanna"), (2, "")],
        "doc_id long, text string",
    )
    idx = build_index(df, doc_id_col="doc_id")
    row = index_stats(idx).collect()[0]
    assert row.num_docs == 3
    assert row.num_terms == 3          # zebra giraffe savanna; "" excluded
    assert row.num_postings == 4       # (0,zebra)(0,giraffe)(1,zebra)(1,savanna)
    assert row.sum_tf == 5             # dl: 3 + 2 + 0
    assert row.max_dl == 3 and row.max_df == 2
    assert row.avgdl == pytest.approx(5 / 3, abs=1e-6)


def test_stats_facet_values_and_nulls(spark):
    from bm25s_spark.operators.facets import stats_facet

    results = spark.createDataFrame(
        [("q1", 0), ("q1", 1), ("q1", 2), ("q2", 3)],
        "query_id string, doc_id long",
    )
    docs = spark.createDataFrame(
        [(0, 10.0), (1, 30.0), (2, None), (3, 7.0)],
        "doc_id long, v double",
    )
    rows = {r.query_id: r for r in stats_facet(results, docs, "v").collect()}
    q1 = rows["q1"]
    # NULL-valued hit counts in n_docs but not in the numeric aggs
    assert q1.n_docs == 3
    assert q1.min == 10.0 and q1.max == 30.0
    assert q1.sum == 40.0 and q1.avg == pytest.approx(20.0)
    q2 = rows["q2"]
    assert (q2.n_docs, q2.min, q2.max, q2.sum, q2.avg) == (1, 7.0, 7.0, 7.0, 7.0)
