"""Did-you-mean: exact self-suggestion, distance/df/term tie order,
short-token guard, NULL for unfixable tokens, and the broadcast plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bm25s_spark.indexer import build_index
from bm25s_spark.operators.spell import did_you_mean


@pytest.fixture(scope="module")
def index(spark):
    # "merge" df=3 vs "merge"-adjacent "merged" df=1: the df tiebreak is
    # observable for the typo "merg" (both at distance 1)
    rows = [
        (0, "merge sort merge"),
        (1, "merge join"),
        (2, "merge merged"),
        (3, "key value store"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(df, doc_id_col="doc_id").persist()
    yield idx
    idx.unpersist()


def _dym(spark, index, text, **kw):
    qdf = spark.createDataFrame([("q1", text)], "query_id string, text string")
    return {r.token: r for r in did_you_mean(index, qdf, **kw).collect()}


def test_exact_token_suggests_itself(spark, index):
    got = _dym(spark, index, "merge sort")
    assert got["merge"].suggestion == "merge" and got["merge"].distance == 0
    assert got["sort"].suggestion == "sort" and got["sort"].distance == 0


def test_distance_then_df_tiebreak(spark, index):
    got = _dym(spark, index, "merg")
    # merge (df 3) and merged (df 1) are both distance-1/2 neighbors;
    # distance asc puts merge (1) over merged (2), and at equal distance
    # df desc would also favor merge
    assert got["merg"].suggestion == "merge"
    assert got["merg"].distance == 1
    assert got["merg"].df == 3


def test_short_token_exact_only(spark, index):
    # "ke" (len 2) must not fuzz to "key"; "kye" (len 3) may (classic
    # Levenshtein: a transposition costs 2 edits)
    got = _dym(spark, index, "ke kye")
    assert got["ke"].suggestion is None and got["ke"].distance is None
    assert got["kye"].suggestion == "key" and got["kye"].distance == 2


def test_unfixable_token_null_row(spark, index):
    got = _dym(spark, index, "zzzzzzz merge")
    assert got["zzzzzzz"].suggestion is None
    assert got["merge"].suggestion == "merge"
    with pytest.raises(ValueError):
        _dym(spark, index, "x", max_edits=0)


def test_plan_broadcasts_token_side(spark, index):
    qdf = spark.createDataFrame([("q1", "merg")], "query_id string, text string")
    plan = did_you_mean(index, qdf)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
