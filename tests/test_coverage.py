"""Query-coverage analytics (`operators/coverage.py`) contract tests
over the golden 4-doc animal corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bm25s_spark.indexer import build_index
from bm25s_spark.operators.coverage import query_coverage
from bm25s_spark.transcripts import ANIMAL_CORPUS


@pytest.fixture(scope="module")
def animal_index(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ANIMAL_CORPUS)], "doc_id long, text string"
    )
    return build_index(docs, doc_id_col="doc_id")


def _report(spark, animal_index, queries):
    qdf = spark.createDataFrame(queries, "query_id string, text string")
    return {
        r["query_id"]: r
        for r in query_coverage(animal_index, qdf).collect()
    }


def test_query_coverage_values(spark, animal_index):
    got = _report(spark, animal_index, [
        ("q_hit", "cat purr"),
        ("q_mixed", "cat zzzunknown"),
        ("q_oov", "zzz qqq"),
        ("q_stop", "the and is a"),
        ("q_dup", "cat cat"),
    ])
    assert set(got) == {"q_hit", "q_mixed", "q_oov", "q_stop", "q_dup"}

    h = got["q_hit"]  # only doc 0 contains cat/purr
    assert (h["n_tokens"], h["n_unique_terms"], h["n_oov_terms"]) == (2, 2, 0)
    assert h["oov_terms"] == ""
    assert (h["n_candidate_docs"], h["zero_hit"]) == (1, 0)

    m = got["q_mixed"]
    assert (m["n_oov_terms"], m["oov_terms"]) == (1, "zzzunknown")
    assert (m["n_candidate_docs"], m["zero_hit"]) == (1, 0)

    o = got["q_oov"]  # fully OOV → zero hit, sorted joined terms
    assert (o["n_tokens"], o["n_oov_terms"]) == (2, 2)
    assert o["oov_terms"] == "qqq,zzz"
    assert (o["n_candidate_docs"], o["zero_hit"]) == (0, 1)

    s = got["q_stop"]  # stopword-only → empty tokenization, still reported
    assert (s["n_tokens"], s["n_unique_terms"], s["n_oov_terms"]) == (0, 0, 0)
    assert (s["n_candidate_docs"], s["zero_hit"]) == (0, 1)

    d = got["q_dup"]  # multiplicity preserved in n_tokens, not in types
    assert (d["n_tokens"], d["n_unique_terms"]) == (2, 1)


def test_query_coverage_counts_all_matching_docs(spark, animal_index):
    # "animal water": "beautiful animal" in doc 2, "water" in doc 3
    got = _report(spark, animal_index, [("q", "animal water")])["q"]
    assert got["n_candidate_docs"] == 2
    assert got["zero_hit"] == 0


def test_query_coverage_broadcasts_query_side(spark, animal_index):
    qdf = spark.createDataFrame([("q", "cat")], "query_id string, text string")
    plan = (
        query_coverage(animal_index, qdf)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_empty_patch_token_counts_as_oov(spark, animal_index):
    """The '' vocab-patch row (df=0, NO postings) must still be
    reported OOV: pre-tokenized queries can carry the empty-fallback
    token (regression: term_stats membership without the df>0 guard
    treated '' as in-vocab)."""
    qdf = spark.createDataFrame(
        [("q_empty", [""]), ("q_mix", ["cat", ""])],
        "query_id string, text array<string>",
    )
    got = {r["query_id"]: r
           for r in query_coverage(animal_index, qdf).collect()}
    e = got["q_empty"]
    assert (e["n_oov_terms"], e["n_candidate_docs"], e["zero_hit"]) == (1, 0, 1)
    m = got["q_mix"]
    assert m["n_oov_terms"] == 1 and m["n_candidate_docs"] == 1
