"""Term vectors: hand-checked tf/df/idf, list vs DataFrame input,
unknown ids, bad method, and the broadcast plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bm25s_spark.indexer import build_index
from bm25s_spark.operators.termvectors import term_vectors


@pytest.fixture(scope="module")
def index(spark):
    rows = [
        (0, "zebra zebra giraffe"),
        (1, "zebra savanna"),
        (2, "quantum spark"),
        (3, "spark shuffle spark"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(df, doc_id_col="doc_id").persist()
    yield idx
    idx.unpersist()


def _lucene_idf(df, n):
    return math.log(1.0 + (n - df + 0.5) / (df + 0.5))


def test_tf_df_idf_values(spark, index):
    rows = term_vectors(index, [0]).collect()
    got = {r.term: r for r in rows}
    assert set(got) == {"zebra", "giraffe"}
    assert got["zebra"].tf == 2 and got["zebra"].df == 2
    assert got["giraffe"].tf == 1 and got["giraffe"].df == 1
    assert got["zebra"].idf == pytest.approx(_lucene_idf(2, 4))
    assert got["giraffe"].idf == pytest.approx(_lucene_idf(1, 4))


def test_dataframe_input_and_dedup(spark, index):
    wanted = spark.createDataFrame([(3,), (3,), (1,)], "doc_id long")
    rows = term_vectors(index, wanted).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, set()).add(r.term)
    assert by_doc == {3: {"spark", "shuffle"}, 1: {"zebra", "savanna"}}
    tf3 = {r.term: r.tf for r in rows if r.doc_id == 3}
    assert tf3["spark"] == 2  # duplicate request rows must not double tf


def test_unknown_doc_and_bad_method(spark, index):
    assert term_vectors(index, [99]).count() == 0
    with pytest.raises(ValueError):
        term_vectors(index, [0], idf_method="nope")


def test_round_to_and_plan(spark, index):
    out = term_vectors(index, [0, 2], idf_method="atire", round_to=4)
    rows = out.collect()
    for r in rows:
        assert r.idf == round(r.idf, 4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
