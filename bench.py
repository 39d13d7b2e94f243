#!/usr/bin/env python
"""Benchmark harness.

Default: runs the headline pipeline at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {...per-step seconds...}, "sf": ...} plus informational keys
(qps, corpus size).

--scaling: runs the same fixed workload at two parallelism levels
(local[N] vs local[4N], N = $SCALING_N, default 2 — standing in for
N vs 4N executors; each level taskset-pinned in a fresh JVM) and
reports throughput at both plus scaling efficiency — the north_rule's
two-cluster-size criterion evidenced in-sandbox.  $SCALING_PHASES
(comma subset of build,query,qld,sqltok; default all) restricts which
phases run — e.g. SCALING_PHASES=sqltok re-measures just the
JVM-tokenizer build at a corpus size large enough to amortize the
fixed per-job floor, without paying for the slow local[1] phases.

--bigbatch: builds an index over $SCALING_CONVS × $SCALING_TURNS
transcript turns and runs chunked query batches ($BIGBATCH_SIZES,
default 8192,100000), reporting QPS and driver-RSS flatness.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_BATCH_QUERIES = int(os.environ.get("BENCH_QUERIES", "256"))
BENCH_CONVS = int(os.environ.get("BENCH_CONVS", "10000"))
BENCH_TURNS = int(os.environ.get("BENCH_TURNS", "20"))


def _spark(cores: int):
    from bm25s_spark.session import get_spark

    return get_spark("bm25s_spark-bench", cores=cores,
                     shuffle_partitions=max(cores, 16))


def _bench_corpus(spark, sf_dir: str):
    """Transcripts for the bench: the sf documents table embedded as
    turns, unioned with a deterministic synthetic corpus scaled to
    ~BENCH_CONVS×BENCH_TURNS docs (sf0.1's 5k docs alone are too small
    to exercise shuffles)."""
    from pyspark.sql import functions as F
    from bm25s_spark.transcripts import distributed_transcripts
    import __spark_entry__ as entrymod

    real = entrymod._transcripts(spark, sf_dir)
    synth = distributed_transcripts(spark, BENCH_CONVS, BENCH_TURNS).select(
        F.concat(F.lit("s-"), F.col("conv_id")).alias("conv_id"),
        "turn_idx", "role", "text", "tool", "ts",
    )
    return real.unionByName(synth)


def _batch_queries(spark, n: int):
    """Deterministic query batch mixing index vocab + synthetic vocab —
    generated DISTRIBUTED (spark.range + column expressions), so a
    10^6-query batch never materializes as a driver-side row list (which
    would both slow creation and pollute the bigbatch driver-RSS
    flatness measurement)."""
    from pyspark.sql import functions as F

    from bm25s_spark.transcripts import _CONTENT_WORDS

    doc_words = [
        "fast", "key", "order", "sort", "table", "scan", "merge", "part",
        "window", "small", "hash", "join", "group", "query", "row", "data",
    ]
    vocab = doc_words + _CONTENT_WORDS
    arr = F.array(*[F.lit(w) for w in vocab])
    v = len(vocab)
    # same content as the old driver-side loop:
    # words[j] = vocab[(i*7 + j*13) % V] for j in range(3 + i % 5)
    idxs = F.sequence(F.lit(0), (F.col("id") % 5 + 2).cast("int"))
    words = F.transform(
        idxs, lambda j: F.element_at(arr, ((F.col("id") * 7 + j * 13) % v + 1).cast("int"))
    )
    return spark.range(n).select(
        F.format_string("q-%05d", F.col("id")).alias("query_id"),
        F.array_join(words, " ").alias("text"),
    )


def run_workload(cores: int, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    spark = _spark(cores)
    try:
        from bm25s_spark.indexer import build_index
        from bm25s_spark.shards import ensure_sharded
        import __spark_entry__ as entrymod

        steps: dict[str, float] = {}

        # warmup (reported, untimed in the headline — same protocol the
        # scaling workload has always used): JVM JIT/codegen compilation
        # and the 32 Python workers' first pandas/pyarrow import are
        # one-time serial costs identical at any data size; at the
        # target scale they amortize to zero, so the headline measures
        # steady-state throughput and `cold_start_sec` reports the
        # one-time cost separately
        t = time.time()
        from bm25s_spark.transcripts import distributed_transcripts

        w = build_index(distributed_transcripts(spark, 500, 4),
                        order_cols=["conv_id", "turn_idx"],
                        keep_doc_map=False)
        w.docs_per_shard = 512
        ensure_sharded(w).count()
        w.retrieve(_batch_queries(spark, 64), k=5, strategy="sharded",
                   pad=False).count()
        w.sharded.unpersist()
        w.unpersist()
        cold_start_sec = round(time.time() - t, 3)

        t0 = time.time()

        corpus = _bench_corpus(spark, sf_dir)

        t = time.time()
        idx = build_index(corpus, order_cols=["conv_id", "turn_idx"],
                          keep_doc_map=False)
        idx.postings = idx.postings.persist()
        n_postings = idx.postings.count()  # materialize the eager index
        steps["index_build"] = round(time.time() - t, 3)
        n_docs = idx.num_docs

        # same build through the pure-JVM tokenizer engine (no Python in
        # the corpus scan; gate bm25_topk_lucene_sqltok pins identical
        # output) — the fast path a stemmer-less deployment gets
        t = time.time()
        sq = build_index(corpus, order_cols=["conv_id", "turn_idx"],
                         keep_doc_map=False, tokenizer_engine="sql")
        sq.postings.count()
        steps["index_build_sqltok"] = round(time.time() - t, 3)
        sq.unpersist()
        del sq

        # STEMMED builds, both engines, same window: the pandas engine
        # stems every corpus occurrence inside the tokenizer UDF
        # (memoized — each occurrence is a dict hit); the sql engine
        # scans JVM-side and folds stemming into a vocab-sized pass
        # (indexer.stem_tf — Python cost O(distinct terms), but two
        # extra posting-sized exchanges).  Measured roughly break-even
        # here; the sqlstem path exists for deployments where Python
        # worker capacity is the constraint.  Exact-equality parity is
        # pytest-pinned (test_sqlstem_build_exact_parity_realistic_vocab)
        t = time.time()
        st = build_index(corpus, order_cols=["conv_id", "turn_idx"],
                         keep_doc_map=False, stemmer="english")
        st.postings.count()
        steps["index_build_stemmed"] = round(time.time() - t, 3)
        st.unpersist()
        del st
        t = time.time()
        ss = build_index(corpus, order_cols=["conv_id", "turn_idx"],
                         keep_doc_map=False, stemmer="english",
                         tokenizer_engine="sql")
        ss.postings.count()
        steps["index_build_sqlstem"] = round(time.time() - t, 3)
        ss.unpersist()
        del ss

        t = time.time()
        # shard size left at build_index's adaptive pick (~one kernel
        # task per core; 8192 → 26 shards at this 205k-doc corpus)
        sharded = ensure_sharded(idx)
        n_blocks = sharded.count()
        steps["index_shard_compress"] = round(time.time() - t, 3)

        t = time.time()
        qdf = spark.createDataFrame(
            entrymod.GATE_QUERIES, "query_id string, text string"
        )
        idx.retrieve(qdf, k=10, strategy="join", pad=False).collect()
        steps["bm25_topk_join_8q"] = round(time.time() - t, 3)

        # the timed headline batch runs WITHOUT metrics accumulators so
        # round-over-round QPS stays comparable to pre-instrumentation
        # rounds; the instrumented prune on/off pair runs after the total
        t = time.time()
        batch = _batch_queries(spark, N_BATCH_QUERIES)
        res = idx.retrieve(batch, k=10, strategy="sharded", pad=False)
        res.collect()
        steps["bm25_batch_sharded"] = round(time.time() - t, 3)
        qps = round(N_BATCH_QUERIES / max(steps["bm25_batch_sharded"], 1e-9), 2)

        # interactive single-query latency on the sharded path (pad on —
        # the full interactive contract): the ≤chunk fast path tokenizes
        # the query on the driver, so the only pre-kernel Spark job is
        # the vocab-side broadcast semi-join
        t = time.time()
        one = spark.createDataFrame(
            entrymod.GATE_QUERIES[:1], "query_id string, text string"
        )
        idx.retrieve(one, k=10, strategy="sharded").collect()
        steps["bm25_topk_1q_sharded"] = round(time.time() - t, 3)

        t = time.time()
        from bm25s_spark.operators.dedup import minhash_lsh_candidates

        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        minhash_lsh_candidates(docs, num_hashes=8, bands=4).count()
        steps["dedup_minhash_lsh"] = round(time.time() - t, 3)

        t = time.time()
        from bm25s_spark.operators.similarity import brute_force_knn

        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        qv = emb.where(F.col("vec_id") < 16).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        brute_force_knn(emb, qv, k=10).collect()
        steps["knn_cosine_brute"] = round(time.time() - t, 3)

        # NEW in round 4 — hybrid RRF fusion: BM25 top-10 (join path)
        # ⊕ brute-cosine top-10 over the 8 gate queries (vec_id<8 as
        # their dense encodings, the gate convention)
        t = time.time()
        from bm25s_spark.operators.hybrid import rrf_fuse

        bm = idx.retrieve(qdf, k=10, strategy="join", pad=False).select(
            "query_id", "doc_id", "rank"
        )
        qv8 = emb.where(F.col("vec_id") < 8).select(
            F.format_string("q%02d", (F.col("vec_id") + 1).cast("int")
                            ).alias("query_id"),
            "embedding",
        )
        kn = brute_force_knn(emb, qv8, k=10).select(
            "query_id", F.col("vec_id").alias("doc_id"), "rank"
        )
        rrf_fuse([bm, kn], k=10).collect()
        steps["hybrid_rrf_8q"] = round(time.time() - t, 3)

        # NEW in round 4 — full-corpus quality-filter pass (pure column
        # expressions; measures the narrow-scan throughput floor)
        t = time.time()
        from bm25s_spark.functions.text import gopher_filter

        gopher_filter(docs, min_words=20, min_stop_word_hits=1).where(
            F.col("keep")
        ).count()
        steps["gopher_filter_pass"] = round(time.time() - t, 3)

        # NEW in round 4 — sequence packing over the documents table
        t = time.time()
        from bm25s_spark.operators.packing import pack_sequences

        pack_sequences(docs, max_tokens=512, n_groups=32).count()
        steps["pack_sequences_pass"] = round(time.time() - t, 3)

        # NEW late round 4 — two-stage PRF retrieval over the 8 gate
        # queries (round-1 retrieve + feedback mining + expanded round 2
        # against the full bench index)
        t = time.time()
        from bm25s_spark.operators.prf import prf_retrieve

        prf_retrieve(idx, qdf, k=10, feedback_docs=5, expansion_terms=3,
                     pad=False).collect()
        steps["prf_8q"] = round(time.time() - t, 3)

        # NEW round 5 — the same PRF semantics via delta rescoring
        # (round 2 scores only the expansion terms and adds the retained
        # round-1 scores): should track ~2× the plain join-path step,
        # not the full-rescore path's ~3×
        t = time.time()
        prf_retrieve(idx, qdf, k=10, feedback_docs=5, expansion_terms=3,
                     rescore="delta", pad=False).collect()
        steps["prf_delta_8q"] = round(time.time() - t, 3)

        # NEW round 5 — recency-boosted retrieval: the candidate set
        # joins the full 205k-row (doc_id, ts) table for the decay
        # (measures the metadata-join tax on the query path)
        t = time.time()
        from bm25s_spark.ids import assign_doc_ids
        from bm25s_spark.operators.recency import retrieve_with_decay

        ts_map = assign_doc_ids(corpus, ["conv_id", "turn_idx"]).select(
            "doc_id", "ts"
        )
        retrieve_with_decay(idx, qdf, ts_map, now="2026-01-08 00:00:00",
                            half_life_hours=24.0, k=10).collect()
        steps["recency_topk_8q"] = round(time.time() - t, 3)

        # NEW late round 4 — corpus-analytics passes over the FULL bench
        # corpus (not just the 5k documents table): unigram-LM scoring
        # (two scans + vocab broadcast) and PMI collocation mining
        t = time.time()
        from bm25s_spark.operators.lm import with_lm_score

        with_lm_score(
            corpus.select(
                F.concat_ws(
                    "#", "conv_id", F.col("turn_idx").cast("string")
                ).alias("doc_id"),
                "text",
            )
        ).count()
        steps["lm_score_pass"] = round(time.time() - t, 3)

        t = time.time()
        from bm25s_spark.operators.collocations import pmi_collocations

        pmi_collocations(corpus, min_count=5, k=20).collect()
        steps["pmi_collocations"] = round(time.time() - t, 3)

        # NEW latest round 4 — positional phrase search over the FULL
        # bench corpus (posexplode scan + broadcast phrase join + the
        # start-position aggregation; measures the positional-index
        # query path end-to-end)
        t = time.time()
        from bm25s_spark.operators.phrase import phrase_topk

        pq = spark.createDataFrame(
            entrymod.PHRASE_QUERIES, "query_id string, text string"
        )
        phrase_topk(
            corpus.select(
                F.concat_ws(
                    "#", "conv_id", F.col("turn_idx").cast("string")
                ).alias("doc_id"),
                "text",
            ),
            pq, k=10,
        ).collect()
        steps["phrase_topk_6q"] = round(time.time() - t, 3)

        # NEW round-4 final — the mini query language (+must -not
        # term^boost) over the 9 QL gate queries against the full bench
        # index: measures the one-pass composed boolean path (the
        # phrase-clause positional leg is already measured above)
        t = time.time()
        from bm25s_spark.operators.querylang import retrieve_parsed

        qlq = spark.createDataFrame(
            entrymod.QL_QUERIES, "query_id string, text string"
        )
        retrieve_parsed(idx, qlq, k=10).collect()
        steps["querylang_9q"] = round(time.time() - t, 3)

        # Dirichlet query-likelihood ranking over the same index — the
        # LM similarity family; includes the vocab-bounded cf aggregate
        # (one postings scan), so this is the cold per-call cost
        t = time.time()
        from bm25s_spark.operators.qld import retrieve_qld

        retrieve_qld(idx, qdf, k=10).collect()
        steps["qld_topk_8q"] = round(time.time() - t, 3)

        # IVF as a REAL partition key: write the corpus partitionBy(cell),
        # query with a probe partition-filter; scan volume is
        # cells_probed/cells_total of the table (the 100 TB pruning story)
        import glob
        import tempfile

        from bm25s_spark.operators.similarity import (
            ivf_build_partitioned, ivf_knn_partitioned,
        )

        ivf_path = os.path.join(tempfile.gettempdir(), "bm25s_bench_ivf")
        t = time.time()
        ivf_build_partitioned(emb, ivf_path, n_centroids=16, seed=42)
        steps["ivf_partitioned_build"] = round(time.time() - t, 3)
        t = time.time()
        pinfo: dict = {}
        # small probe batch: the scan fraction is the UNION of the batch's
        # probe cells, so a handful of queries shows per-query pruning
        # (a big batch legitimately covers most cells)
        qv4 = emb.where(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        ivf_res = ivf_knn_partitioned(spark, ivf_path, qv4, k=10, n_probe=2,
                                      probe_info=pinfo)
        ivf_res.collect()
        steps["knn_ivf_partitioned"] = round(time.time() - t, 3)
        cells_total = len(glob.glob(os.path.join(ivf_path, "corpus", "cell=*")))
        ivf_scan_fraction = round(
            len(pinfo.get("probe_cells", [])) / max(cells_total, 1), 3
        )

        total = round(time.time() - t0, 3)
        build_docs_per_sec = round(
            n_docs / max(steps["index_build"] + steps["index_shard_compress"], 1e-9), 1
        )

        # MaxScore pruning quantification (AFTER the timed total so the
        # headline stays round-comparable): same batch with prune=False,
        # kernel accumulators counting postings actually scored.  The
        # scan-reduction factor is the evidence that the per-(shard,term)
        # block-max metadata pays — wall clock on this host is ±2× noisy,
        # postings_scanned is exact (modulo task retries, none on a
        # healthy local run).
        m_prune_on: dict = {}
        idx.retrieve(batch, k=10, strategy="sharded", pad=False,
                     metrics=m_prune_on).collect()
        m_prune_off: dict = {}
        t = time.time()
        idx.retrieve(batch, k=10, strategy="sharded", pad=False,
                     prune=False, metrics=m_prune_off).collect()
        prune_off_sec = round(time.time() - t, 3)
        scored_on = int(m_prune_on["postings_scored"].value)
        scored_off = int(m_prune_off["postings_scored"].value)
        prune_stats = {
            "postings_scored_prune_on": scored_on,
            "postings_scored_prune_off": scored_off,
            "prune_scan_reduction": round(scored_off / max(scored_on, 1), 3),
            "prune_off_batch_sec": prune_off_sec,
        }

        # ANN recall quantification (untimed, after the headline total):
        # recall@10 vs brute-force cosine at the PARTIAL probe configs a
        # real deployment runs — the correctness gates only pin the
        # exact-by-construction complete-probe settings, so these are
        # the honest quality numbers for the approximate paths
        from bm25s_spark.operators.similarity import brute_force_knn, lsh_knn

        qv16 = emb.where(F.col("vec_id") < 16).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        bsets: dict = {}
        for r in brute_force_knn(emb, qv16, k=10).collect():
            bsets.setdefault(r["query_id"], set()).add(r["vec_id"])

        def _recall_vs_brute(res) -> float:
            asets: dict = {}
            for r in res.collect():
                asets.setdefault(r["query_id"], set()).add(r["vec_id"])
            recs = [len(asets.get(q, set()) & s) / len(s)
                    for q, s in bsets.items()]
            return round(sum(recs) / len(recs), 3)

        ann_recall = {
            f"ivf_recall_at_probe_{p}": _recall_vs_brute(
                ivf_knn_partitioned(spark, ivf_path, qv16, k=10, n_probe=p)
            )
            for p in (1, 2, 4)
        }
        ann_recall["lsh_recall_r1"] = _recall_vs_brute(
            lsh_knn(emb, qv16, k=10, n_planes=8, multiprobe=1)
        )
        return {
            **ann_recall,
            "steps": steps,
            "total": total,
            "cold_start_sec": cold_start_sec,
            "n_docs": n_docs,
            "n_postings": n_postings,
            "n_blocks": n_blocks,
            "qps": qps,
            "build_docs_per_sec": build_docs_per_sec,
            "ivf_cells_total": cells_total,
            "ivf_scan_fraction": ivf_scan_fraction,
            **prune_stats,
        }
    finally:
        spark.stop()


def run_scaling_workload(cores: int, corpus_path: str, n_queries: int) -> dict:
    """CPU-bound workload for the two-parallelism-level comparison: one
    timed block per phase (build → sharded materialization; batched
    sharded retrieval).  Both levels read the SAME pre-written parquet
    corpus (identical input bytes, no generation jobs inside the timed
    section), and a small warmup build+query runs first so one-time JVM
    costs (codegen compilation, JIT, Python worker spawn) — which are
    serial and identical at every core count — don't pollute the timed
    throughput.

    Strong-scaling setup: the TASK decomposition is identical at both
    levels (fixed shuffle partitions ≫ cores, AQE coalescing off, small
    scan splits) — only the core count varies.  Coarse tasks (1 wave at
    the high level) would let a single straggler set the stage wall
    clock; many small tasks let wave scheduling absorb skew at every
    level, exactly as on a real N- vs 4N-executor cluster."""
    os.environ.setdefault("SPARK_DRIVER_MEM", "16g")
    from bm25s_spark.session import get_spark

    parts = int(os.environ.get("SCALING_PARTS", "128"))
    spark = get_spark(
        "bm25s_spark-scaling", cores=cores, shuffle_partitions=parts,
        extra_conf={
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
        },
    )
    try:
        from bm25s_spark.indexer import build_index
        from bm25s_spark.shards import ensure_sharded
        from bm25s_spark.transcripts import distributed_transcripts

        # -- warmup (untimed): exercises every codepath end-to-end
        w = build_index(distributed_transcripts(spark, 500, 4),
                        order_cols=["conv_id", "turn_idx"], keep_doc_map=False)
        w.docs_per_shard = 512
        ensure_sharded(w).count()
        w.retrieve(_batch_queries(spark, 64), k=5, strategy="sharded",
                   pad=False).count()
        from bm25s_spark.operators.qld import retrieve_qld

        retrieve_qld(w, _batch_queries(spark, 8), k=5).count()
        w.sharded.unpersist()
        w.unpersist()
        # warm the JVM-tokenizer engine's distinct codegen path too
        ws = build_index(distributed_transcripts(spark, 500, 4),
                         order_cols=["conv_id", "turn_idx"],
                         keep_doc_map=False, tokenizer_engine="sql")
        ws.unpersist()

        corpus = spark.read.parquet(corpus_path)
        phases = set(
            os.environ.get("SCALING_PHASES", "build,query,qld,sqltok")
            .split(",")
        )
        out: dict = {"cores": cores}

        if phases & {"build", "query", "qld"}:
            t = time.time()
            idx = build_index(corpus, order_cols=["conv_id", "turn_idx"],
                              keep_doc_map=False)
            n_docs = idx.num_docs
            t_flat = time.time() - t
            idx.docs_per_shard = max(2048, n_docs // 128)
            t = time.time()
            n_blocks = ensure_sharded(idx).count()
            t_shard = time.time() - t
            t_build = t_flat + t_shard
            out.update(
                n_docs=n_docs,
                n_blocks=n_blocks,
                build_sec=round(t_build, 2),
                build_flat_sec=round(t_flat, 2),
                build_shard_sec=round(t_shard, 2),
                build_docs_per_sec=round(n_docs / t_build, 1),
            )

        if "query" in phases:
            batch = _batch_queries(spark, n_queries)
            t = time.time()
            idx.retrieve(batch, k=10, strategy="sharded", pad=False).count()
            t_query = time.time() - t
            out.update(query_sec=round(t_query, 2),
                       qps=round(n_queries / t_query, 2))

        if "qld" in phases:
            # one beyond-BM25 operator family in the scaled phases:
            # Dirichlet query likelihood (join-path shape — broadcast
            # query terms into the flat postings, per-(query, doc)
            # aggregation).  The batch size is tunable: at 64 queries the
            # phase is fixed-cost-heavy (cf checkpoint + broadcast build)
            # and its efficiency reading is noise-dominated; 256+
            # amortizes.
            n_qld = int(os.environ.get("SCALING_QLD_QUERIES", "64"))
            t = time.time()
            retrieve_qld(idx, _batch_queries(spark, n_qld), k=10).count()
            t_qld = time.time() - t
            out["qld_sec"] = round(t_qld, 2)

        if "sqltok" in phases:
            # the pure-JVM tokenizer fast path (gate
            # bm25_topk_lucene_sqltok): same timed shape as the flat
            # build (scan → tokenize → doc-stats action) so the two
            # engines' scaling is directly comparable — tokenization is
            # perfectly data-parallel and the engine swap must not change
            # the build's scaling behavior
            t = time.time()
            sq = build_index(corpus, order_cols=["conv_id", "turn_idx"],
                             keep_doc_map=False, tokenizer_engine="sql")
            t_sqltok = time.time() - t
            out["build_sqltok_sec"] = round(t_sqltok, 3)
            out.setdefault("n_docs", sq.num_docs)
            out["build_sqltok_docs_per_sec"] = round(
                out["n_docs"] / t_sqltok, 1
            )
            sq.unpersist()
        return out
    finally:
        spark.stop()


def _scaling_subprocess(cores: int, corpus_path: str, n_queries: int) -> dict:
    """Run one parallelism level in a fresh process (fresh JVM): sessions
    sharing a JVM contaminate each other's measurements (JIT state, GC
    debris, lingering pools — observed 2× order effects).  The process is
    pinned with ``taskset`` to exactly ``cores`` CPUs so the parallelism
    level is physically enforced, not scheduler-shared — the single-host
    stand-in for an N-executor vs 4N-executor cluster."""
    import subprocess

    cmd = [sys.executable, os.path.abspath(__file__), "--scaling-worker",
           str(cores), corpus_path, str(n_queries)]
    import shutil

    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(
        cmd, capture_output=True, text=True, timeout=3000,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def _burn(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def _cpu_ceiling(n_lo: int, n_hi: int, per: int = 30_000_000) -> dict:
    """Pure-CPU multiprocessing control: the machine's own N→4N scaling
    ceiling, independent of Spark.  On a shared-host VM the hypervisor
    may not serve large vCPU demands; no workload can scale better than
    this control, so it is reported next to the Spark efficiencies."""
    import multiprocessing as mp

    def tput(procs: int) -> float:
        best = 0.0
        for _ in range(2):
            t = time.time()
            with mp.Pool(procs) as p:
                p.map(_burn, [per] * procs)
            best = max(best, procs * per / (time.time() - t))
        return best

    lo, hi = tput(n_lo), tput(n_hi)
    return {
        f"mops_{n_lo}": round(lo / 1e6, 1),
        f"mops_{n_hi}": round(hi / 1e6, 1),
        "efficiency": round((hi / lo) / (n_hi / n_lo), 3),
    }


def _write_scaling_corpus(n_convs: int, turns: int) -> str:
    """Materialize the deterministic corpus once (full parallelism,
    untimed) so every scaling worker reads identical parquet bytes."""
    import tempfile

    path = os.path.join(tempfile.gettempdir(),
                        f"bm25s_scaling_corpus_{n_convs}x{turns}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from bm25s_spark.transcripts import distributed_transcripts

        spark = _spark(CPUS)
        try:
            # 128 files → ≥128 scan splits at every parallelism level
            distributed_transcripts(spark, n_convs, turns).repartition(
                128).write.mode("overwrite").parquet(path)
        finally:
            spark.stop()
    return path


def run_bigbatch(cores: int, corpus_path: str) -> dict:
    """Driver-memory-flatness evidence for chunked query batches: the
    same index serves an 8,192-query batch (single broadcast) and a
    100k-query batch (streamed through the kernel in 16k chunks); QPS
    should be within ~10% and driver RSS must not grow with batch size."""
    spark = _spark(cores)
    try:
        from bm25s_spark.indexer import build_index
        from bm25s_spark.shards import ensure_sharded

        corpus = spark.read.parquet(corpus_path)
        t = time.time()
        idx = build_index(corpus, order_cols=["conv_id", "turn_idx"],
                          keep_doc_map=False)
        idx.docs_per_shard = max(2048, idx.num_docs // 128)
        ensure_sharded(idx).count()
        build_sec = round(time.time() - t, 2)

        def rss_mb() -> float:
            # CURRENT VmRSS, not ru_maxrss: the high-water mark is
            # monotone and would hide per-batch growth below the
            # build-time peak
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("VmRSS"):
                        return round(int(line.split()[1]) / 1024, 1)
            return 0.0

        sizes = tuple(
            int(s) for s in os.environ.get(
                "BIGBATCH_SIZES", "8192,100000"
            ).split(",")
        )
        out = {
            "n_docs": idx.num_docs, "cores": cores,
            "build_sec": build_sec,
            "build_docs_per_sec": round(idx.num_docs / build_sec, 1),
            "post_build_driver_rss_mb": rss_mb(),
        }
        for n in sizes:
            t = time.time()
            idx.retrieve(_batch_queries(spark, n), k=10, strategy="sharded",
                         pad=False).count()
            dt = time.time() - t
            out[f"q{n}_sec"] = round(dt, 2)
            out[f"q{n}_qps"] = round(n / dt, 2)
            out[f"q{n}_driver_rss_mb"] = rss_mb()
        if len(sizes) >= 2:
            out[f"qps_ratio_{sizes[-1]}_vs_{sizes[0]}"] = round(
                out[f"q{sizes[-1]}_qps"] / out[f"q{sizes[0]}_qps"], 3
            )
        return out
    finally:
        spark.stop()


def main():
    if "--help" in sys.argv or "-h" in sys.argv:
        print(__doc__)
        return

    if "--bigbatch" in sys.argv:
        n_convs = int(os.environ.get("SCALING_CONVS", "50000"))
        turns = int(os.environ.get("SCALING_TURNS", "20"))
        os.environ.setdefault("SPARK_DRIVER_MEM", "16g")
        corpus_path = _write_scaling_corpus(n_convs, turns)
        print(json.dumps({
            "metric": "chunked query-batch QPS + driver RSS (8k vs 100k queries)",
            **run_bigbatch(CPUS, corpus_path),
        }))
        return

    if "--scaling-worker" in sys.argv:
        i = sys.argv.index("--scaling-worker")
        cores, corpus_path, n_queries = (
            int(sys.argv[i + 1]), sys.argv[i + 2], int(sys.argv[i + 3]))
        print(json.dumps(run_scaling_workload(cores, corpus_path, n_queries)))
        return

    if "--scaling" in sys.argv:
        # N vs 4N cores. Default N=2 (local[2] vs local[8]): this sandbox
        # VM shares its host with noisy neighbors, and a pure-CPU
        # multiprocessing control measures the machine's own scaling
        # ceiling at ~0.93 for 2→8 processes but only ~0.63 for 4→16 —
        # demands beyond ~8 vCPUs simply aren't served. No workload can
        # exceed the machine ceiling, so the control is measured and
        # reported alongside the Spark numbers. N is configurable.
        n_lo = int(os.environ.get("SCALING_N", "2"))
        n_hi = 4 * n_lo
        n_convs = int(os.environ.get("SCALING_CONVS", "50000"))
        turns = int(os.environ.get("SCALING_TURNS", "20"))
        n_queries = int(os.environ.get("SCALING_QUERIES", "8192"))
        # min-of-2 interleaved runs per level: the sandbox host has heavy
        # noisy-neighbor interference (loadavg 3→22 swings with no guest
        # processes); min over repeats is the standard noise-robust
        # estimator for fixed work
        os.environ.setdefault("SPARK_DRIVER_MEM", "16g")
        reps = int(os.environ.get("SCALING_REPS", "3"))
        corpus_path = _write_scaling_corpus(n_convs, turns)
        lo_runs, hi_runs = [], []
        for _ in range(reps):
            lo_runs.append(_scaling_subprocess(n_lo, corpus_path, n_queries))
            hi_runs.append(_scaling_subprocess(n_hi, corpus_path, n_queries))
        timed_keys = [k for k in ("build_sec", "query_sec", "qld_sec",
                                  "build_sqltok_sec") if k in lo_runs[0]]
        lo = min(lo_runs, key=lambda r: sum(r[k] for k in timed_keys))
        hi = min(hi_runs, key=lambda r: sum(r[k] for k in timed_keys))
        # per-phase min over interleaved reps (noise-robust estimator)
        for k in timed_keys:
            lo[k] = min(r[k] for r in lo_runs)
            hi[k] = min(r[k] for r in hi_runs)
        ratio = n_hi / n_lo
        eff_names = {"build_sec": "index_build", "query_sec": "batched_query",
                     "qld_sec": "qld_64q", "build_sqltok_sec": "build_sqltok"}
        eff = {eff_names[k]: round((lo[k] / hi[k]) / ratio, 3)
               for k in timed_keys}
        print(json.dumps({
            "metric": f"throughput scaling efficiency, local[{n_lo}] vs local[{n_hi}] (N vs 4N)",
            "sf": SF_DIR,
            f"local{n_lo}": lo,
            f"local{n_hi}": hi,
            "efficiency": eff,
            "machine_ceiling_control": _cpu_ceiling(n_lo, n_hi),
        }))
        return

    r = run_workload(CPUS, SF_DIR)
    print(json.dumps({
        "metric": "bm25s_spark headline: index build + shard/compress + top-k "
                  "(join + sharded batch) + minhash dedup + cosine knn",
        "value": r["total"],
        "unit": "sec",
        "queries": r["steps"],
        "cold_start_sec": r["cold_start_sec"],
        "sf": SF_DIR,
        "n_docs": r["n_docs"],
        "n_postings": r["n_postings"],
        "n_blocks": r["n_blocks"],
        "qps_sharded_batch": r["qps"],
        "build_docs_per_sec": r["build_docs_per_sec"],
        "ivf_cells_total": r["ivf_cells_total"],
        "ivf_scan_fraction": r["ivf_scan_fraction"],
        "postings_scored_prune_on": r["postings_scored_prune_on"],
        "postings_scored_prune_off": r["postings_scored_prune_off"],
        "prune_scan_reduction": r["prune_scan_reduction"],
        "prune_off_batch_sec": r["prune_off_batch_sec"],
        "ivf_recall_at_probe_1": r["ivf_recall_at_probe_1"],
        "ivf_recall_at_probe_2": r["ivf_recall_at_probe_2"],
        "ivf_recall_at_probe_4": r["ivf_recall_at_probe_4"],
        "lsh_recall_r1": r["lsh_recall_r1"],
        "cores": CPUS,
    }))


if __name__ == "__main__":
    main()
