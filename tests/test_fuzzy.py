"""Fuzzy (edit-distance) expansion and retrieval."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bm25s_spark.indexer import build_index
from bm25s_spark.operators.fuzzy import expand_fuzzy, fuzzy_retrieve


@pytest.fixture(scope="module")
def index(spark):
    rows = [
        (0, "merge sort window"),
        (1, "merge table scan"),
        (2, "key value store"),
        (3, "unrelated words entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(df, doc_id_col="doc_id").persist()
    yield idx
    idx.unpersist()


def _terms(df):
    return {(r["query_id"], r["term"]): r["mult"] for r in df.collect()}


def test_expand_single_edit_typos(spark, index):
    qs = spark.createDataFrame(
        [("q1", "merg sort"),    # deletion + exact
         ("q2", "windoq"),       # substitution
         ("q3", "zzzzz"),        # no neighbor
         ("q4", "ke kay")],      # len<3 exact-only; kay → key
        "query_id string, text string",
    )
    got = _terms(expand_fuzzy(index, qs, max_edits=1))
    assert got[("q1", "merge")] == 1
    assert got[("q1", "sort")] == 1
    assert got[("q2", "window")] == 1
    assert not [k for k in got if k[0] == "q3"]
    assert got[("q4", "key")] == 1
    assert ("q4", "ke") not in got


def test_expand_multiplicity_and_exact_overlap(spark, index):
    # "merge merg" → merge matched by both occurrences → mult 2
    qs = spark.createDataFrame(
        [("q1", "merge merg")], "query_id string, text string"
    )
    got = _terms(expand_fuzzy(index, qs, max_edits=1))
    assert got[("q1", "merge")] == 2


def test_fuzzy_retrieve_end_to_end(spark, index):
    qs = spark.createDataFrame(
        [("q1", "merge tble")],  # insertion typo + deletion typo
        "query_id string, text string",
    )
    res = fuzzy_retrieve(index, qs, k=2, round_to=4).collect()
    top = sorted(res, key=lambda r: r["rank"])
    assert top[0]["doc_id"] == 1      # matches both merge and table
    with pytest.raises(ValueError, match="max_edits"):
        expand_fuzzy(index, qs, max_edits=-1)
    with pytest.raises(ValueError, match="larger"):
        fuzzy_retrieve(index, qs, k=99)


def test_expand_matches_bruteforce(spark, index):
    """The expansion equals a brute-force Levenshtein sweep of the
    vocabulary (including the length band being purely an optimization)."""
    def lev(a, b):
        m, n = len(a), len(b)
        d = list(range(n + 1))
        for i in range(1, m + 1):
            prev, d[0] = d[0], i
            for j in range(1, n + 1):
                cur = min(d[j] + 1, d[j - 1] + 1,
                          prev + (a[i - 1] != b[j - 1]))
                prev, d[j] = d[j], cur
        return d[n]

    vocab = [r["term"] for r in index.term_stats.collect() if r["term"]]
    qtoks = ["merg", "windoq", "ke", "value", "stora"]
    qs = spark.createDataFrame(
        [("q1", " ".join(qtoks))], "query_id string, text string"
    )
    got = {k[1] for k in _terms(expand_fuzzy(index, qs, max_edits=1))}
    want = set()
    for qt in qtoks:
        for v in vocab:
            if v == qt or (len(qt) >= 3 and lev(v, qt) <= 1):
                want.add(v)
    assert got == want
