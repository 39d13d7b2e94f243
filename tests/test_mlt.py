"""More-like-this: term mining determinism, similarity sanity, and
plan-shape pins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bm25s_spark.indexer import build_index
from bm25s_spark.operators.mlt import mine_seed_terms, more_like_this


@pytest.fixture(scope="module")
def index(spark):
    rows = [
        (0, "c0", 0, "zebra giraffe savanna zebra zebra giraffe"),
        (1, "c0", 1, "zebra giraffe savanna watering hole"),
        (2, "c0", 2, "quantum spark shuffle partition executor"),
        (3, "c0", 3, "quantum spark shuffle partition driver"),
        (4, "c1", 0, "pasta tomato basil olive oil"),
        (5, "c1", 1, "zebra crossing in the city traffic"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, conv_id string, turn_idx int, text string"
    ).select("doc_id", "text")
    idx = build_index(df, doc_id_col="doc_id").persist()
    yield idx
    idx.unpersist()


def test_mine_seed_terms_restricted_to_seeds(spark, index):
    seeds = spark.createDataFrame([(0,), (2,)], "doc_id long")
    mined = mine_seed_terms(index, seeds, m_terms=3).collect()
    by_seed = {}
    for r in mined:
        by_seed.setdefault(r["seed_doc_id"], []).append(r)
    assert set(by_seed) == {0, 2}
    # doc0: zebra tf=3 (df=3), giraffe tf=2 (df=2) — giraffe's rarer idf
    # wins: 2·ln(6/2)=2.197 > 3·ln(6/3)=2.079; savanna third
    top0 = [r["term"] for r in sorted(by_seed[0], key=lambda r: r["trank"])]
    assert top0 == ["giraffe", "zebra", "savanna"]
    assert all(len(v) == 3 for v in by_seed.values())


def test_more_like_this_finds_similar_docs(spark, index):
    seeds = spark.createDataFrame([(0,), (2,)], "doc_id long")
    res = more_like_this(index, seeds, m_terms=3, k=2).collect()
    top = {
        r["seed_doc_id"]: r["doc_id"] for r in res if r["rank"] == 1
    }
    assert top[0] == 1      # the other savanna doc
    assert top[2] == 3      # the other spark doc
    assert all(r["doc_id"] != r["seed_doc_id"] for r in res)


def test_more_like_this_include_self(spark, index):
    seeds = spark.createDataFrame([(4,)], "doc_id long")
    res = more_like_this(index, seeds, m_terms=5, k=1, include_self=True).collect()
    assert res[0]["doc_id"] == 4   # a doc is most like itself


def test_more_like_this_plan_broadcasts_seeds(spark, index):
    seeds = spark.createDataFrame([(0,)], "doc_id long")
    plan = mine_seed_terms(index, seeds, 3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_more_like_this_validation(spark, index):
    seeds = spark.createDataFrame([(0,)], "doc_id long")
    with pytest.raises(ValueError, match="m_terms"):
        mine_seed_terms(index, seeds, 0)
    with pytest.raises(ValueError, match="k"):
        more_like_this(index, seeds, k=0)
