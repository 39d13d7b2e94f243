#!/usr/bin/env python
"""spark-submit entrypoint: batched top-k retrieval from a saved index.

    spark-submit --py-files bm25s_spark.zip scripts/query.py \
        --index <index dir> --queries <parquet|inline text> --k 10 \
        [--method lucene] [--idf-method lucene] [--strategy sharded] \
        [--output results.parquet]

Queries: a parquet path with (query_id, text), or ``--text "..."`` for a
one-off query.  Results print as JSON lines (query_id, rank, doc_id,
score) or write to --output.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--queries", default=None)
    ap.add_argument("--text", default=None, help="single inline query")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--method", default="lucene",
                    help="BM25 variant, or 'qld' for Dirichlet "
                         "query-likelihood ranking")
    ap.add_argument("--mu", type=float, default=2000.0,
                    help="Dirichlet smoothing (method=qld only)")
    ap.add_argument("--idf-method", default=None)
    ap.add_argument("--strategy", default="sharded", choices=["join", "sharded"])
    ap.add_argument("--syntax", action="store_true",
                    help="parse queries with the mini query language "
                         "(+must -not term^boost; \"phrases\" need --docs)")
    ap.add_argument("--docs", default=None,
                    help="parquet of (doc_id, text) original docs — "
                         "required only for quoted-phrase clauses")
    ap.add_argument("--format", default="parquet", choices=["parquet", "iceberg"],
                    help="iceberg: --index is a catalog.db.name table prefix")
    ap.add_argument("--coverage", action="store_true",
                    help="emit the per-query index-coverage report "
                         "(OOV terms, candidate docs, zero-hit) instead "
                         "of retrieving")
    ap.add_argument("--output", default=None)
    args = ap.parse_args(argv)
    if not args.queries and not args.text:
        ap.error("need --queries or --text")

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("bm25s_spark-query").getOrCreate()
    from bm25s_spark.index_io import load_index

    index = load_index(spark, args.index, fmt=args.format)
    if args.queries:
        qdf = spark.read.parquet(args.queries)
    else:
        qdf = spark.createDataFrame(
            [("q-0", args.text)], "query_id string, text string"
        )
    if args.coverage:
        from bm25s_spark.operators.coverage import query_coverage

        rep = query_coverage(index, qdf)
        if args.output:
            rep.write.mode("overwrite").parquet(args.output)
            print(json.dumps({"output": args.output}))
        else:
            for r in rep.orderBy("query_id").collect():
                print(json.dumps(r.asDict()))
        return
    if args.syntax:
        from bm25s_spark.operators.querylang import retrieve_parsed

        docs_df = spark.read.parquet(args.docs) if args.docs else None
        res = retrieve_parsed(
            index, qdf, k=args.k, method=args.method,
            idf_method=args.idf_method, docs_df=docs_df,
        )
    elif args.method == "qld":
        from bm25s_spark.operators.qld import retrieve_qld

        res = retrieve_qld(index, qdf, k=args.k, mu=args.mu)
    else:
        res = index.retrieve(
            qdf, k=args.k, method=args.method, idf_method=args.idf_method,
            strategy=args.strategy,
        )
    if args.output:
        res.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"output": args.output}))
    else:
        for r in res.orderBy("query_id", "rank").collect():
            print(json.dumps(
                {"query_id": r["query_id"], "rank": r["rank"],
                 "doc_id": r["doc_id"], "score": r["score"]}
            ))


if __name__ == "__main__":
    sys.exit(main())
