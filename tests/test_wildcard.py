"""Wildcard (prefix) expansion and retrieval."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bm25s_spark.indexer import build_index
from bm25s_spark.operators.wildcard import expand_terms, wildcard_retrieve


@pytest.fixture(scope="module")
def index(spark):
    rows = [
        (0, "merge mergesort sorting fast"),
        (1, "merge table scan"),
        (2, "window functions are fast"),
        (3, "nothing shared here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(df, doc_id_col="doc_id").persist()
    yield idx
    idx.unpersist()


def _terms(df):
    return {
        (r["query_id"], r["term"]): r["mult"] for r in df.collect()
    }


def test_expand_prefix_and_literals(spark, index):
    qs = spark.createDataFrame(
        [("q1", "merg* fast"), ("q2", "sort*"), ("q3", "zzz*"),
         ("q4", "merge mer*")],
        "query_id string, text string",
    )
    got = _terms(expand_terms(index, qs))
    # q1: merg* → merge, mergesort; fast literal
    assert got[("q1", "merge")] == 1
    assert got[("q1", "mergesort")] == 1
    assert got[("q1", "fast")] == 1
    assert ("q1", "sorting") not in got
    # q2: sort* → sorting (sortING only; "sort" itself not in vocab)
    assert got[("q2", "sorting")] == 1
    # q3: no vocab term starts with zzz
    assert not [k for k in got if k[0] == "q3"]
    # q4: merge matched by BOTH the literal and the prefix → mult 2
    assert got[("q4", "merge")] == 2
    assert got[("q4", "mergesort")] == 1


def test_wildcard_retrieve_ranks_expanded_terms(spark, index):
    qs = spark.createDataFrame(
        [("q1", "merg*")], "query_id string, text string"
    )
    res = wildcard_retrieve(index, qs, k=3, round_to=4).collect()
    docs = [r["doc_id"] for r in sorted(res, key=lambda r: r["rank"])]
    # doc0 matches merge AND mergesort; doc1 only merge
    assert docs[0] == 0 and docs[1] == 1 and len(docs) == 2
    # stopword / OOV literals vanish via the vocab join, so an
    # all-unmatchable query returns nothing
    qs2 = spark.createDataFrame(
        [("q2", "the zzz")], "query_id string, text string"
    )
    assert wildcard_retrieve(index, qs2, k=2).count() == 0


def test_wildcard_validation(spark, index):
    qs = spark.createDataFrame([("q1", "a*")], "query_id string, text string")
    # single-letter prefixes don't parse (token pattern needs >= 2 word
    # chars) — expansion is empty, not an error
    assert wildcard_retrieve(index, qs, k=1).count() == 0
    with pytest.raises(ValueError, match="k"):
        wildcard_retrieve(index, qs, k=0)
    with pytest.raises(ValueError, match="larger"):
        wildcard_retrieve(index, qs, k=99)


def test_regexp_expansion_anchored_and_mult(spark, index):
    from bm25s_spark.operators.wildcard import expand_regexp

    pdf = spark.createDataFrame(
        [("r1", "merg.*"), ("r2", "sort|sorting"), ("r3", "mer"),
         ("r4", "merge"), ("r4", "m.rge")],
        "query_id string, pattern string",
    )
    rows = expand_regexp(index, pdf).collect()
    got = {(r.query_id, r.term): r.mult for r in rows}
    # full-term anchoring: "mer" must NOT match "merge"
    assert not any(q == "r3" for q, _ in got)
    assert got[("r1", "merge")] == 1 and got[("r1", "mergesort")] == 1
    # alternation: only the full-match branch hits ("sort" alone ≠
    # "sorting")
    assert got[("r2", "sorting")] == 1 and ("r2", "sort") not in got
    # two r4 patterns both match merge → multiplicity 2
    assert got[("r4", "merge")] == 2


def test_regexp_retrieve_no_match_and_validation(spark, index):
    from bm25s_spark.operators.wildcard import regexp_retrieve

    pdf = spark.createDataFrame(
        [("r1", "zzz.*")], "query_id string, pattern string"
    )
    assert regexp_retrieve(index, pdf, k=2).count() == 0
    with pytest.raises(ValueError):
        regexp_retrieve(index, pdf, k=0)
