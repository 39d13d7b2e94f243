"""MaxScore pruning equivalence, file loaders, and the eval metrics."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from bm25s_spark.indexer import SparkBM25
from bm25s_spark.transcripts import queries_for, transcripts_df

from tests.conftest import assert_rank_identical, rows_to_arrays


def _rows(df):
    return [r.asDict() for r in df.collect()]


def test_pruning_equivalence(spark):
    """prune=True must return tie-group-identical results to prune=False
    (the MaxScore threshold only ever excludes docs that cannot beat the
    in-shard kth score)."""
    tdf = transcripts_df(spark, "t2").persist()
    texts = [r["text"] for r in tdf.orderBy("conv_id", "turn_idx").select("text").collect()]
    queries = queries_for(texts, 30, seed=11)
    qdf = spark.createDataFrame(queries, "query_id string, text string")
    engine = SparkBM25(method="lucene")
    idx = engine.index(tdf)
    idx.docs_per_shard = 256
    ref = _rows(engine.retrieve(qdf, k=10, strategy="sharded", prune=False))
    pruned = _rows(engine.retrieve(qdf, k=10, strategy="sharded", prune=True))
    docs, scores = rows_to_arrays(ref)
    assert_rank_identical(pruned, docs, scores, rtol=1e-5, atol=1e-5)


def test_loaders(spark, tmp_path):
    """TXT/CSV/JSONL → transcripts shape, preserving file order as doc
    order (reference dummy fixtures shape: hello world / this is a test /
    bm25s is fast)."""
    from bm25s_spark.sources.loaders import load_any

    lines = ["hello world", "this is a test", "bm25s is fast"]
    txt = tmp_path / "dummy.txt"
    txt.write_text("\n".join(lines) + "\n")
    csv = tmp_path / "dummy.csv"
    csv.write_text("id,text\n" + "\n".join(f"{i},{t}" for i, t in enumerate(lines)) + "\n")
    jsonl = tmp_path / "dummy.jsonl"
    jsonl.write_text("\n".join(json.dumps({"id": i, "text": t}) for i, t in enumerate(lines)) + "\n")

    for path in (txt, csv, jsonl):
        tdf = load_any(spark, str(path))
        assert tdf.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        got = [r["text"] for r in tdf.orderBy("conv_id", "turn_idx").collect()]
        assert sorted(got) == sorted(lines), (path, got)

    # end-to-end: index a loaded corpus and retrieve
    engine = SparkBM25()
    engine.index(load_any(spark, str(txt)))
    qdf = spark.createDataFrame([("q0", "hello world")], "query_id string, text string")
    res = _rows(engine.retrieve(qdf, k=1))
    assert len(res) == 1 and res[0]["score"] > 0


def test_eval_metrics(spark):
    from bm25s_spark.eval import evaluate

    results = spark.createDataFrame(
        [
            ("q1", 1, 10, 5.0), ("q1", 2, 11, 4.0), ("q1", 3, 12, 3.0),
            ("q2", 1, 20, 5.0), ("q2", 2, 21, 4.0),
        ],
        "query_id string, rank int, doc_id long, score double",
    )
    qrels = spark.createDataFrame(
        [("q1", 10, 1), ("q1", 12, 1), ("q2", 99, 1)],
        "query_id string, doc_id long, score int",
    )
    m = evaluate(results, qrels, k_values=(1, 3))
    assert m["p@1"] == 0.5          # q1 hit at 1, q2 miss
    assert m["recall@3"] == 0.5     # q1 2/2, q2 0/1
    assert 0 < m["ndcg@3"] < 1
    # trec_eval map_cut divides by the FULL n_rel (2 for q1), not
    # min(n_rel, k): q1 AP@1 = 1/2, q2 = 0 → mean 0.25
    assert m["map@1"] == 0.25
    assert m["map@3"] == round((1.0 + 2 / 3) / 2 / 2, 5)  # q1 hits at 1,3
    assert m["mrr"] == 0.5          # q1 first hit at rank 1, q2 none
    # zero-graded qrels rows must not count as relevant (pytrec_eval
    # counts only rel>0 toward num_rel)
    qrels0 = spark.createDataFrame(
        [("q1", 10, 1), ("q1", 12, 0), ("q2", 99, 1)],
        "query_id string, doc_id long, score int",
    )
    m0 = evaluate(results, qrels0, k_values=(3,))
    assert m0["recall@3"] == 0.5    # q1 1/1 (doc 12 not relevant), q2 0/1


def test_evaluate_warns_on_large_driver_side_runs(spark, monkeypatch):
    """The collect-based evaluator must steer big runs to the
    distributed twin (operators/evaldf) with a UserWarning."""
    import warnings

    from bm25s_spark import eval as eval_mod

    results = spark.createDataFrame(
        [(f"q{i}", 1, i, 1.0) for i in range(5)],
        "query_id string, rank int, doc_id long, score double",
    )
    qrels = spark.createDataFrame(
        [(f"q{i}", i, 1) for i in range(5)],
        "query_id string, doc_id long, score int",
    )
    monkeypatch.setattr(eval_mod, "_DRIVER_SIDE_QUERY_SOFT_LIMIT", 3)
    with pytest.warns(UserWarning, match="evaluate_per_query"):
        eval_mod.evaluate(results, qrels)
    # under the limit: silent
    monkeypatch.setattr(eval_mod, "_DRIVER_SIDE_QUERY_SOFT_LIMIT", 10_000)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        eval_mod.evaluate(results, qrels)
