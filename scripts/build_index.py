#!/usr/bin/env python
"""spark-submit entrypoint: build (or resume) a BM25 index.

    spark-submit --py-files bm25s_spark.zip scripts/build_index.py \
        --input <transcripts table/parquet> --output <index dir> \
        [--checkpoint <dir>] [--method-params k1=1.5,b=0.75,delta=0.5] \
        [--stemmer english] [--docs-per-shard N]

Input: the canonical transcripts shape (conv_id, turn_idx, role, text,
tool, ts).  On a cluster the SparkSession comes from spark-submit; this
script only falls back to a local session when run directly.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet path or table name")
    ap.add_argument("--output", required=True, help="index output directory")
    ap.add_argument("--checkpoint", default=None, help="stage-checkpoint dir (resumable)")
    ap.add_argument("--corpus-tag", default="default")
    ap.add_argument("--k1", type=float, default=1.5)
    ap.add_argument("--b", type=float, default=0.75)
    ap.add_argument("--delta", type=float, default=0.5)
    ap.add_argument("--stopwords", default="en")
    ap.add_argument("--stemmer", default=None)
    ap.add_argument("--docs-per-shard", type=int, default=None,
                    help="override the adaptive default (~one kernel "
                         "task per core, clamped to [4096, 65536])")
    ap.add_argument("--tokenizer-engine", default="pandas",
                    choices=["pandas", "sql"],
                    help="sql: tokenize with pure JVM column expressions "
                         "(no Python in the corpus scan; with --stemmer, "
                         "stemming folds into a vocab-sized pass)")
    ap.add_argument("--format", default="parquet", choices=["parquet", "iceberg"],
                    help="iceberg: --output is a catalog.db.name table prefix")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("bm25s_spark-build").getOrCreate()
    from bm25s_spark.index_io import save_index

    if args.input.endswith(".parquet") or "/" in args.input:
        docs = spark.read.parquet(args.input)
    else:
        docs = spark.read.table(args.input)

    if args.checkpoint:
        from bm25s_spark.checkpoint import build_index_checkpointed

        index, ck = build_index_checkpointed(
            docs, args.checkpoint, corpus_tag=args.corpus_tag,
            k1=args.k1, b=args.b, delta=args.delta,
            stopwords=args.stopwords, stemmer=args.stemmer,
            docs_per_shard=args.docs_per_shard,
            tokenizer_engine=args.tokenizer_engine,
        )
        print(json.dumps(ck.summary()))
    else:
        from bm25s_spark.indexer import build_index

        index = build_index(
            docs, order_cols=["conv_id", "turn_idx"],
            k1=args.k1, b=args.b, delta=args.delta,
            stopwords=args.stopwords, stemmer=args.stemmer,
            tokenizer_engine=args.tokenizer_engine,
        )
        if args.docs_per_shard is not None:
            index.docs_per_shard = args.docs_per_shard

    save_index(index, args.output, fmt=args.format)
    print(json.dumps({
        "num_docs": index.num_docs,
        "avg_doc_len": index.avg_doc_len,
        "output": args.output,
    }))


if __name__ == "__main__":
    sys.exit(main())
