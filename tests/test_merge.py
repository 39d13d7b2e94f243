"""merge_indexes: partitioned builds over disjoint doc-id sets must
merge into an index exactly equal to a from-scratch full-corpus build
(same scalars, same term_stats, bit-identical impacts, same retrieval)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bm25s_spark.ids import assign_doc_ids
from bm25s_spark.indexer import build_index, merge_indexes
from bm25s_spark.transcripts import queries_for, transcripts_df


def _sorted_rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


@pytest.fixture(scope="module")
def merge_setup(spark):
    docs = assign_doc_ids(transcripts_df(spark, "t2")).persist()
    full = build_index(docs, doc_id_col="doc_id").persist()
    parts = [
        build_index(docs.where(F.col("doc_id") % 3 == i), doc_id_col="doc_id")
        for i in range(3)
    ]
    merged = merge_indexes(*parts).persist()
    yield docs, full, merged
    for idx in (full, merged):
        idx.unpersist()
    docs.unpersist()


def test_merge_scalars_equal(merge_setup):
    _, full, merged = merge_setup
    assert merged.num_docs == full.num_docs
    # integer token counts sum exactly → the mean is bit-identical
    assert merged.avg_doc_len == full.avg_doc_len
    assert (merged.k1, merged.b, merged.delta) == (full.k1, full.b, full.delta)


def test_merge_tables_equal(merge_setup):
    _, full, merged = merge_setup
    assert _sorted_rows(merged.doc_lens, "doc_id") == _sorted_rows(
        full.doc_lens, "doc_id"
    )
    cols = full.term_stats.columns
    assert _sorted_rows(merged.term_stats.select(cols), "term") == _sorted_rows(
        full.term_stats.select(cols), "term"
    )
    # postings: tf/dl are corpus-independent facts; the impacts are
    # deterministic double expressions of (tf, dl, df, N, avgdl), so the
    # merged rows must be BIT-identical to the full build's
    pcols = full.postings.columns
    assert _sorted_rows(
        merged.postings.select(pcols), "term", "doc_id"
    ) == _sorted_rows(full.postings.select(pcols), "term", "doc_id")


def test_merge_retrieval_equal(spark, merge_setup):
    docs, full, merged = merge_setup
    texts = [r["text"] for r in docs.orderBy("doc_id").select("text").collect()]
    qdf = spark.createDataFrame(
        queries_for(texts, 8, seed=11), "query_id string, text string"
    )
    # per-POSTING impacts are bit-identical (test_merge_tables_equal), but
    # per-query score SUMS can differ in the last ulp (different plan →
    # different float summation order), so the unrounded join path gets a
    # tie-aware comparison; the sharded path uses the deterministic gate
    # contract (round_to rounds BEFORE top-k with a doc_id tiebreak) and
    # must match exactly
    from tests.conftest import assert_rank_identical, rows_to_arrays

    for kw in (dict(method="lucene"), dict(method="bm25+")):
        full_rows = [r.asDict() for r in full.retrieve(qdf, k=5, **kw).collect()]
        merged_rows = [r.asDict() for r in merged.retrieve(qdf, k=5, **kw).collect()]
        docs_arr, scores_arr = rows_to_arrays(full_rows)
        assert_rank_identical(merged_rows, docs_arr, scores_arr,
                              rtol=1e-9, atol=1e-9)

    kw = dict(method="lucene", strategy="sharded", exact=True,
              round_to=4, pad=False, prune=False)
    a = _sorted_rows(full.retrieve(qdf, k=5, **kw), "query_id", "rank")
    b = _sorted_rows(merged.retrieve(qdf, k=5, **kw), "query_id", "rank")
    assert a == b


def test_merge_doc_map_union(merge_setup):
    _, full, merged = merge_setup
    assert merged.doc_map is not None
    assert merged.doc_map.count() == full.doc_map.count()


def test_merge_single_index_passthrough(merge_setup):
    _, full, _ = merge_setup
    assert merge_indexes(full) is full


def test_merge_rejects_overlap(spark, merge_setup):
    docs, full, _ = merge_setup
    half = build_index(
        docs.where(F.col("doc_id") % 3 == 0), doc_id_col="doc_id"
    )
    with pytest.raises(ValueError, match="disjoint"):
        merge_indexes(full, half)


def test_merge_rejects_mismatched_params(spark, merge_setup):
    docs, full, _ = merge_setup
    other = build_index(
        docs.where(F.col("doc_id") % 3 == 0), doc_id_col="doc_id", k1=1.2
    )
    with pytest.raises(ValueError, match="k1"):
        merge_indexes(full, other)
    stemmed = build_index(
        docs.where(F.col("doc_id") % 3 == 0), doc_id_col="doc_id",
        stemmer="english",
    )
    with pytest.raises(ValueError, match="tokenizer_kwargs"):
        merge_indexes(full, stemmed)


def test_merge_empty_side(spark, merge_setup):
    """Merging with an index built over zero docs is the no-op merge."""
    docs, full, _ = merge_setup
    empty = build_index(docs.where(F.lit(False)), doc_id_col="doc_id")
    merged = merge_indexes(full, empty)
    assert merged.num_docs == full.num_docs
    assert merged.avg_doc_len == full.avg_doc_len
    pcols = full.postings.columns
    assert _sorted_rows(
        merged.postings.select(pcols), "term", "doc_id"
    ) == _sorted_rows(full.postings.select(pcols), "term", "doc_id")


def test_merge_loaded_indexes(spark, merge_setup, tmp_path):
    """merge_indexes composes with save/load: two halves saved to disk
    (float32 impact storage), loaded back, and merged must reproduce the
    FRESH full build bit-for-bit — the merge recomputes impacts from the
    exact (tf, dl, df) ints, so it doubles as an impact-refresh pass."""
    from bm25s_spark.index_io import load_index, save_index

    docs, full, _ = merge_setup
    for i in range(2):
        half = build_index(docs.where(F.col("doc_id") % 2 == i),
                           doc_id_col="doc_id")
        save_index(half, str(tmp_path / f"half{i}"))
    loaded = [load_index(spark, str(tmp_path / f"half{i}")) for i in range(2)]
    merged = merge_indexes(*loaded)
    assert merged.num_docs == full.num_docs
    assert merged.avg_doc_len == full.avg_doc_len
    pcols = ["term", "doc_id", "tf", "dl"] + [
        c for c in full.postings.columns if c.startswith("impact_")
    ]
    assert _sorted_rows(
        merged.postings.select(pcols), "term", "doc_id"
    ) == _sorted_rows(full.postings.select(pcols), "term", "doc_id")
