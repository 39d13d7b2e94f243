#!/usr/bin/env python
"""Step-level iteration harness for the optimization round (bench.py is
frozen for measurement; this file exists so individual steps can be
re-timed and their plans captured without a full bench run).

Usage:
    python bench_extra.py [step ...]      # default: all query steps
    PLANS_DIR=plans/r06 SUFFIX=_before python bench_extra.py --plans [step ...]

Steps reuse the exact call shapes of bench.py's timed blocks (same
corpus, same arguments) so numbers are comparable; each step prints its
seconds.  --plans writes .explain("formatted") output per step.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLANS_DIR = os.environ.get("PLANS_DIR", "plans/r06")
SUFFIX = os.environ.get("SUFFIX", "")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    do_plans = "--plans" in sys.argv

    from pyspark.sql import functions as F

    import bench as benchmod
    import __spark_entry__ as entrymod
    from bm25s_spark.indexer import build_index
    from bm25s_spark.shards import ensure_sharded
    from bm25s_spark.transcripts import distributed_transcripts

    spark = benchmod._spark(CPUS)
    sc = spark.sparkContext

    # warmup identical to bench.py
    w = build_index(distributed_transcripts(spark, 500, 4),
                    order_cols=["conv_id", "turn_idx"], keep_doc_map=False)
    w.docs_per_shard = 512
    ensure_sharded(w).count()
    w.retrieve(benchmod._batch_queries(spark, 64), k=5, strategy="sharded",
               pad=False).count()
    w.sharded.unpersist()
    w.unpersist()

    corpus = benchmod._bench_corpus(spark, SF_DIR)
    idx = build_index(corpus, order_cols=["conv_id", "turn_idx"],
                      keep_doc_map=False)
    idx.postings = idx.postings.persist()
    idx.postings.count()
    ensure_sharded(idx).count()

    qdf = spark.createDataFrame(entrymod.GATE_QUERIES,
                                "query_id string, text string")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))

    steps = {}

    if do_plans and (not args or "index_build" in args):
        os.makedirs(PLANS_DIR, exist_ok=True)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
            .fromString("formatted")
        fresh = build_index(corpus, order_cols=["conv_id", "turn_idx"],
                            keep_doc_map=False)
        with open(os.path.join(PLANS_DIR, f"index_build{SUFFIX}.txt"), "w") as f:
            f.write(fresh.postings._jdf.queryExecution().explainString(mode))
        fresh.unpersist()

    def step(name, fn, plan_df_fn=None):
        if args and name not in args:
            return
        if do_plans and plan_df_fn is not None:
            df = plan_df_fn()
            os.makedirs(PLANS_DIR, exist_ok=True)
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
                .fromString("formatted")
            with open(os.path.join(PLANS_DIR, f"{name}{SUFFIX}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(mode))
        sc.setJobDescription(name)
        t = time.time()
        fn()
        steps[name] = round(time.time() - t, 3)
        sc.setJobDescription(None)
        print(f"{name:26s} {steps[name]:8.3f}", flush=True)

    step("bm25_topk_join_8q",
         lambda: idx.retrieve(qdf, k=10, strategy="join", pad=False).collect(),
         lambda: idx.retrieve(qdf, k=10, strategy="join", pad=False))

    def _batch():
        batch = benchmod._batch_queries(spark, 256)
        idx.retrieve(batch, k=10, strategy="sharded", pad=False).collect()
    step("bm25_batch_sharded", _batch)

    one = spark.createDataFrame(entrymod.GATE_QUERIES[:1],
                                "query_id string, text string")
    step("bm25_topk_1q_sharded",
         lambda: idx.retrieve(one, k=10, strategy="sharded").collect(),
         lambda: idx.retrieve(one, k=10, strategy="sharded"))

    from bm25s_spark.operators.dedup import minhash_lsh_candidates
    step("dedup_minhash_lsh",
         lambda: minhash_lsh_candidates(docs, num_hashes=8, bands=4).count(),
         lambda: minhash_lsh_candidates(docs, num_hashes=8, bands=4))

    from bm25s_spark.operators.similarity import brute_force_knn
    qv = emb.where(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"), "embedding")
    step("knn_cosine_brute",
         lambda: brute_force_knn(emb, qv, k=10).collect(),
         lambda: brute_force_knn(emb, qv, k=10))

    from bm25s_spark.operators.hybrid import rrf_fuse

    def _hybrid():
        bm = idx.retrieve(qdf, k=10, strategy="join", pad=False).select(
            "query_id", "doc_id", "rank")
        qv8 = emb.where(F.col("vec_id") < 8).select(
            F.format_string("q%02d", (F.col("vec_id") + 1).cast("int")
                            ).alias("query_id"), "embedding")
        kn = brute_force_knn(emb, qv8, k=10).select(
            "query_id", F.col("vec_id").alias("doc_id"), "rank")
        rrf_fuse([bm, kn], k=10).collect()
    step("hybrid_rrf_8q", _hybrid)

    from bm25s_spark.functions.text import gopher_filter
    step("gopher_filter_pass",
         lambda: gopher_filter(docs, min_words=20, min_stop_word_hits=1)
         .where(F.col("keep")).count(),
         lambda: gopher_filter(docs, min_words=20, min_stop_word_hits=1)
         .where(F.col("keep")))

    from bm25s_spark.operators.packing import pack_sequences
    step("pack_sequences_pass",
         lambda: pack_sequences(docs, max_tokens=512, n_groups=32).count(),
         lambda: pack_sequences(docs, max_tokens=512, n_groups=32))

    from bm25s_spark.operators.prf import prf_retrieve
    step("prf_8q",
         lambda: prf_retrieve(idx, qdf, k=10, feedback_docs=5,
                              expansion_terms=3, pad=False).collect(),
         lambda: prf_retrieve(idx, qdf, k=10, feedback_docs=5,
                              expansion_terms=3, pad=False))
    step("prf_delta_8q",
         lambda: prf_retrieve(idx, qdf, k=10, feedback_docs=5,
                              expansion_terms=3, rescore="delta",
                              pad=False).collect())

    from bm25s_spark.ids import assign_doc_ids
    from bm25s_spark.operators.recency import retrieve_with_decay

    def _recency():
        ts_map = assign_doc_ids(corpus, ["conv_id", "turn_idx"]).select(
            "doc_id", "ts")
        retrieve_with_decay(idx, qdf, ts_map, now="2026-01-08 00:00:00",
                            half_life_hours=24.0, k=10).collect()
    def _recency_df():
        ts_map = assign_doc_ids(corpus, ["conv_id", "turn_idx"]).select(
            "doc_id", "ts")
        return retrieve_with_decay(idx, qdf, ts_map,
                                   now="2026-01-08 00:00:00",
                                   half_life_hours=24.0, k=10)
    step("recency_topk_8q", _recency, _recency_df)

    from bm25s_spark.operators.lm import with_lm_score
    corpus_docs = corpus.select(
        F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string")
                    ).alias("doc_id"), "text")
    step("lm_score_pass", lambda: with_lm_score(corpus_docs).count(),
         lambda: with_lm_score(corpus_docs))

    from bm25s_spark.operators.collocations import pmi_collocations
    step("pmi_collocations",
         lambda: pmi_collocations(corpus, min_count=5, k=20).collect(),
         lambda: pmi_collocations(corpus, min_count=5, k=20))

    from bm25s_spark.operators.phrase import phrase_topk
    pq = spark.createDataFrame(entrymod.PHRASE_QUERIES,
                               "query_id string, text string")
    step("phrase_topk_6q",
         lambda: phrase_topk(corpus_docs, pq, k=10).collect(),
         lambda: phrase_topk(corpus_docs, pq, k=10))

    from bm25s_spark.operators.querylang import retrieve_parsed
    qlq = spark.createDataFrame(entrymod.QL_QUERIES,
                                "query_id string, text string")
    step("querylang_9q", lambda: retrieve_parsed(idx, qlq, k=10).collect(),
         lambda: retrieve_parsed(idx, qlq, k=10))

    from bm25s_spark.operators.qld import retrieve_qld
    step("qld_topk_8q", lambda: retrieve_qld(idx, qdf, k=10).collect(),
         lambda: retrieve_qld(idx, qdf, k=10))

    import tempfile
    from bm25s_spark.operators.similarity import (
        ivf_build_partitioned, ivf_knn_partitioned)
    ivf_path = os.path.join(tempfile.gettempdir(), "bm25s_extra_ivf")
    step("ivf_partitioned_build",
         lambda: ivf_build_partitioned(emb, ivf_path, n_centroids=16, seed=42))

    def _ivf_knn():
        qv4 = emb.where(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("query_id"), "embedding")
        ivf_knn_partitioned(spark, ivf_path, qv4, k=10, n_probe=2,
                            probe_info={}).collect()
    if "ivf_partitioned_build" in steps or not args or "knn_ivf_partitioned" in args:
        if os.path.exists(os.path.join(ivf_path, "corpus")):
            step("knn_ivf_partitioned", _ivf_knn)

    print(json.dumps(steps))
    spark.stop()


if __name__ == "__main__":
    main()
