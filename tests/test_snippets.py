"""Snippet extraction: window choice, highlighting, result-set
composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bm25s_spark.operators.snippets import snippets, snippets_for_results


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "noise noise cat noise noise noise noise noise cat dog noise"),
        (1, "dog at start but cat is far away from here the end"),
        (2, "nothing relevant here at all"),
        (3, "cat dog cat dog"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").persist()


def _rows(df):
    return {
        (r["query_id"], r["doc_id"]): (
            r["n_hit_terms"], r["anchor"], r["snippet"]
        )
        for r in df.collect()
    }


def test_snippet_picks_densest_window(spark, docs):
    qs = spark.createDataFrame([("q1", "cat dog")], "query_id string, text string")
    got = _rows(snippets(docs, qs, window=4))
    # doc0: anchor 2 (lone cat) sees {cat}; anchor 8 sees {cat, dog} → wins
    n, anchor, snip = got[("q1", 0)]
    assert (n, anchor) == (2, 8)
    assert snip == "**cat** **dog** noise"  # window clipped at doc end
    # doc3: anchor 0 covers both with the earliest tie
    assert got[("q1", 3)] == (2, 0, "**cat** **dog** **cat** **dog**")
    # doc1: cat and dog never within 4 tokens → best covers 1 term,
    # earliest anchor (dog@0)
    n1, a1, s1 = got[("q1", 1)]
    assert n1 == 1 and a1 == 0 and s1.startswith("**dog**")
    # doc2: no hits → no row
    assert ("q1", 2) not in got


def test_snippet_mark_and_window_args(spark, docs):
    qs = spark.createDataFrame([("q1", "cat")], "query_id string, text string")
    got = _rows(snippets(docs, qs, window=1, mark="<em>"))
    assert got[("q1", 3)] == (1, 0, "<em>cat<em>")
    with pytest.raises(ValueError, match="window"):
        snippets(docs, qs, window=0)


def test_snippets_for_results_composition(spark, docs):
    from bm25s_spark.indexer import build_index

    idx = build_index(docs, doc_id_col="doc_id")
    qs = spark.createDataFrame([("q1", "cat dog")], "query_id string, text string")
    res = idx.retrieve(qs, k=3)
    out = snippets_for_results(idx, res, qs, window=4).collect()
    assert len(out) == 3                      # one row per result row
    by_doc = {r["doc_id"]: r for r in out}
    assert by_doc[3]["snippet"] is not None
    assert by_doc[3]["rank"] is not None and by_doc[3]["score"] is not None
    # a padded/no-hit result keeps null snippet columns
    no_hit = [r for r in out if r["snippet"] is None]
    assert all(r["doc_id"] == 2 for r in no_hit)
