#!/usr/bin/env python
"""Benchmark harness.

Default: runs the headline pipeline at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {...per-step seconds...}, "sf": ...} plus informational keys
(qps, corpus size).

--scaling: runs the same fixed workload at two parallelism levels
(local[8] vs local[32], standing in for N vs 4N executors) and reports
throughput at both plus scaling efficiency — the north_rule's
two-cluster-size criterion evidenced in-sandbox.
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
    """Deterministic query batch mixing index vocab + synthetic vocab."""
    from bm25s_spark.transcripts import _CONTENT_WORDS

    doc_words = [
        "fast", "key", "order", "sort", "table", "scan", "merge", "part",
        "window", "small", "hash", "join", "group", "query", "row", "data",
    ]
    vocab = doc_words + _CONTENT_WORDS
    rows = []
    for i in range(n):
        ws = [vocab[(i * 7 + j * 13) % len(vocab)] for j in range(3 + i % 5)]
        rows.append((f"q-{i:05d}", " ".join(ws)))
    return spark.createDataFrame(rows, "query_id string, text string")


def run_workload(cores: int, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    spark = _spark(cores)
    try:
        from bm25s_spark.indexer import build_index
        from bm25s_spark.shards import ensure_sharded
        import __spark_entry__ as entrymod

        steps: dict[str, float] = {}
        t0 = time.time()

        corpus = _bench_corpus(spark, sf_dir)

        t = time.time()
        idx = build_index(corpus, order_cols=["conv_id", "turn_idx"],
                          keep_doc_map=False)
        idx.postings = idx.postings.persist()
        n_postings = idx.postings.count()  # materialize the eager index
        steps["index_build"] = round(time.time() - t, 3)
        n_docs = idx.num_docs

        t = time.time()
        idx.docs_per_shard = 65536
        sharded = ensure_sharded(idx)
        n_blocks = sharded.count()
        steps["index_shard_compress"] = round(time.time() - t, 3)

        t = time.time()
        qdf = spark.createDataFrame(
            entrymod.GATE_QUERIES, "query_id string, text string"
        )
        idx.retrieve(qdf, k=10, strategy="join", pad=False).collect()
        steps["bm25_topk_join_8q"] = round(time.time() - t, 3)

        t = time.time()
        batch = _batch_queries(spark, N_BATCH_QUERIES)
        res = idx.retrieve(batch, k=10, strategy="sharded", pad=False)
        res.collect()
        steps["bm25_batch_sharded"] = round(time.time() - t, 3)
        qps = round(N_BATCH_QUERIES / max(steps["bm25_batch_sharded"], 1e-9), 2)

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

        total = round(time.time() - t0, 3)
        build_docs_per_sec = round(
            n_docs / max(steps["index_build"] + steps["index_shard_compress"], 1e-9), 1
        )
        return {
            "steps": steps,
            "total": total,
            "n_docs": n_docs,
            "n_postings": n_postings,
            "n_blocks": n_blocks,
            "qps": qps,
            "build_docs_per_sec": build_docs_per_sec,
        }
    finally:
        spark.stop()


def main():
    if "--scaling" in sys.argv:
        out = {}
        for cores in (8, 32):
            out[cores] = run_workload(cores, SF_DIR)
        lo, hi = out[8], out[32]
        # fixed workload: efficiency = speedup / core-ratio
        ratio = 32 / 8
        eff = {}
        for key in ("index_build", "bm25_batch_sharded"):
            t_lo, t_hi = lo["steps"][key], hi["steps"][key]
            eff[key] = round((t_lo / t_hi) / ratio, 3)
        eff["total"] = round((lo["total"] / hi["total"]) / ratio, 3)
        print(json.dumps({
            "metric": "scaling local[8] vs local[32] (N vs 4N)",
            "sf": SF_DIR,
            "local8": lo,
            "local32": hi,
            "efficiency": eff,
        }))
        return

    r = run_workload(CPUS, SF_DIR)
    print(json.dumps({
        "metric": "bm25s_spark headline: index build + shard/compress + top-k "
                  "(join + sharded batch) + minhash dedup + cosine knn",
        "value": r["total"],
        "unit": "sec",
        "queries": r["steps"],
        "sf": SF_DIR,
        "n_docs": r["n_docs"],
        "n_postings": r["n_postings"],
        "n_blocks": r["n_blocks"],
        "qps_sharded_batch": r["qps"],
        "build_docs_per_sec": r["build_docs_per_sec"],
        "cores": CPUS,
    }))


if __name__ == "__main__":
    main()
