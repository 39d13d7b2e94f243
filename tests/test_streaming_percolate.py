"""Streaming percolation: batch-operator parity per micro-batch, the
min_should_match relaxation, and an actual Structured Streaming run."""

from __future__ import annotations

import pytest


DOCS_B1 = [
    (0, "spark shuffle join performance tuning"),
    (1, "pasta recipe with tomato and basil"),
    (2, "shuffle partition skew mitigation"),
]
DOCS_B2 = [
    (3, "broadcast join beats shuffle join for small tables"),
    (4, "nothing relevant at all here"),
]
QUERIES = [
    ("alert_shuffle_join", "shuffle join"),
    ("alert_skew", "skew"),
    ("alert_absent", "kubernetes operator"),
]
SCHEMA = "doc_id long, text string"
QSCHEMA = "query_id string, text string"


def _expected_full_match():
    # alert_shuffle_join needs BOTH terms → docs 0 and 3;
    # alert_skew → doc 2; alert_absent never fires
    return {(0, "alert_shuffle_join"), (3, "alert_shuffle_join"),
            (2, "alert_skew")}


def test_streaming_percolate_batch_parity(spark, tmp_path):
    from bm25s_spark.operators.percolate import percolate
    from bm25s_spark.streaming.percolate import StreamingPercolator

    qdf = spark.createDataFrame(QUERIES, QSCHEMA)
    perc = StreamingPercolator(spark, qdf, str(tmp_path / "perc"))
    try:
        perc.process_batch(spark.createDataFrame(DOCS_B1, SCHEMA), 0)
        perc.process_batch(spark.createDataFrame(DOCS_B2, SCHEMA), 1)
        alerts = perc.alerts().collect()
    finally:
        perc.close()
    got = {(r.doc_id, r.query_id) for r in alerts}
    assert got == _expected_full_match()
    # per-row stats match the batch operator on the union of batches
    both = spark.createDataFrame(DOCS_B1 + DOCS_B2, SCHEMA)
    batch = {
        (r.doc_id, r.query_id): (r.n_matched, r.n_terms)
        for r in percolate(both, qdf).collect()
    }
    for r in alerts:
        assert batch[(r.doc_id, r.query_id)] == (r.n_matched, r.n_terms)
    # batch ids recorded per micro-batch
    by_batch = {r.doc_id: r.batch_id for r in alerts}
    assert by_batch[0] == 0 and by_batch[3] == 1


def test_streaming_percolate_min_should_match(spark, tmp_path):
    from bm25s_spark.streaming.percolate import StreamingPercolator

    qdf = spark.createDataFrame(QUERIES, QSCHEMA)
    perc = StreamingPercolator(
        spark, qdf, str(tmp_path / "perc1"), min_should_match=1
    )
    try:
        perc.process_batch(spark.createDataFrame(DOCS_B1, SCHEMA), 0)
        got = {(r.doc_id, r.query_id) for r in perc.alerts().collect()}
    finally:
        perc.close()
    # OR semantics: doc 2 now also fires the shuffle-join alert
    assert (2, "alert_shuffle_join") in got
    assert (1, "alert_shuffle_join") not in got


def test_streaming_percolate_via_stream(spark, tmp_path):
    from bm25s_spark.streaming.percolate import StreamingPercolator

    src = str(tmp_path / "src")
    spark.createDataFrame(DOCS_B1, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(DOCS_B2, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    qdf = spark.createDataFrame(QUERIES, QSCHEMA)
    perc = StreamingPercolator(spark, qdf, str(tmp_path / "perc2"))
    try:
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = perc.attach(stream, str(tmp_path / "ckpt"))
        q.awaitTermination(120)
        assert not q.isActive
        got = {(r.doc_id, r.query_id) for r in perc.alerts().collect()}
    finally:
        perc.close()
    assert got == _expected_full_match()
