"""Resumable, stage-checkpointed index builds with per-partition lineage
and metrics (north_rule requirement).

The build pipeline (SURVEY.md §3.1) is cut at its natural shuffle
boundaries into materialized stages:

    doc_ids → tokenized → tf → term_stats → postings → sharded

Each stage writes its output table plus a ``_MANIFEST.json`` recording:
status, a build fingerprint (parameters + corpus tag), total rows,
**per-file lineage** (output file → row count), stage metrics (docs
tokenized / postings emitted / blocks compressed), and wall time.  A
re-run with the same fingerprint skips every completed stage (reads its
table back) and recomputes only what's missing — killing the driver
after any stage and relaunching produces an identical index, which is
what "resumable from checkpoint" means for a batch build (the analog of
Iceberg snapshot-per-stage on a cluster; the reference has no such
facility — its index build is all-or-nothing in memory).

Determinism note: resume correctness rests on deterministic doc-id
assignment (dense rank under (conv_id, turn_idx) — ``ids.py``), never on
partition order (SURVEY.md §7 hard-part 6).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bm25s_spark.indexer import BM25Index, IMPACT_COLS, NNOC_COLS
from bm25s_spark.scoring import (
    DEFAULT_B, DEFAULT_DELTA, DEFAULT_K1, METHODS,
)
from bm25s_spark import scoring
from bm25s_spark.ids import assign_dense_ids, assign_doc_ids
from bm25s_spark.tokenization import make_tokenizer_udf

MANIFEST = "_MANIFEST.json"


@dataclass
class StageResult:
    name: str
    df: DataFrame
    resumed: bool
    rows: int
    manifest: dict


@dataclass
class Checkpointer:
    spark: SparkSession
    root: str
    fingerprint: str
    log: list[StageResult] = field(default_factory=list)

    def _paths(self, name: str) -> tuple[str, str]:
        d = os.path.join(self.root, name)
        return d, os.path.join(d, MANIFEST)

    def completed(self, name: str) -> dict | None:
        _, mpath = self._paths(name)
        if not os.path.exists(mpath):
            return None
        with open(mpath) as f:
            m = json.load(f)
        if m.get("status") == "complete" and m.get("fingerprint") == self.fingerprint:
            return m
        return None

    def stage(self, name: str, produce, metrics_fn=None) -> DataFrame:
        """Run ``produce()`` (→ DataFrame) unless this stage is already
        checkpointed under the current fingerprint; either way return the
        stage's table (read back from parquet, so downstream lineage cuts
        here)."""
        d, mpath = self._paths(name)
        m = self.completed(name)
        if m is not None:
            df = self.spark.read.parquet(os.path.join(d, "data"))
            self.log.append(StageResult(name, df, True, m["rows"], m))
            return df
        t0 = time.time()
        df = produce()
        data_dir = os.path.join(d, "data")
        df.write.mode("overwrite").parquet(data_dir)
        out = self.spark.read.parquet(data_dir)
        # per-file lineage: output file → row count (one metadata-light
        # aggregation over the freshly written table)
        lineage_rows = (
            out.groupBy(F.input_file_name().alias("file"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .collect()
        )
        rows = sum(r["rows"] for r in lineage_rows)
        manifest = {
            "stage": name,
            "status": "complete",
            "fingerprint": self.fingerprint,
            "rows": rows,
            "files": [
                {"file": os.path.basename(r["file"]), "rows": r["rows"]}
                for r in sorted(lineage_rows, key=lambda r: r["file"])
            ],
            "metrics": (metrics_fn(rows) if metrics_fn else {}),
            "wall_seconds": round(time.time() - t0, 3),
        }
        os.makedirs(d, exist_ok=True)
        with open(mpath, "w") as f:
            json.dump(manifest, f, indent=2)
        self.log.append(StageResult(name, out, False, rows, manifest))
        return out

    def summary(self) -> dict:
        return {
            "stages": [
                {
                    "name": s.name,
                    "resumed": s.resumed,
                    "rows": s.rows,
                    "wall_seconds": s.manifest.get("wall_seconds"),
                    "metrics": s.manifest.get("metrics", {}),
                }
                for s in self.log
            ]
        }


def build_index_checkpointed(
    docs: DataFrame,
    checkpoint_dir: str,
    corpus_tag: str = "default",
    text_col: str = "text",
    doc_id_col: str | None = None,
    order_cols: list[str] | None = None,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    delta: float = DEFAULT_DELTA,
    stopwords="en",
    stemmer: str | None = None,
    empty_fallback: bool = False,
    docs_per_shard: int | None = None,
    tokenizer_engine: str = "pandas",
) -> tuple[BM25Index, Checkpointer]:
    """Stage-checkpointed twin of ``indexer.build_index``.

    ``docs_per_shard=None`` (default) resolves adaptively once the doc
    count is known (``indexer.auto_docs_per_shard``); the resolved size
    is baked into the sharded stage's name, so a parallelism change
    rebuilds only that stage and never reloads a layout built under a
    different shard size.  ``tokenizer_engine`` is part of the stage
    fingerprint (it rides in the tokenizer kwargs), so switching engines
    rebuilds rather than reusing the other engine's tokenized stage."""
    spark = docs.sparkSession
    tok_kwargs = dict(stopwords=stopwords, stemmer=stemmer, empty_fallback=empty_fallback)
    if tokenizer_engine != "pandas":
        tok_kwargs["engine"] = tokenizer_engine
    fingerprint = json.dumps(
        {
            "corpus_tag": corpus_tag,
            "k1": k1, "b": b, "delta": delta,
            "tokenizer": {
                k: (sorted(v) if isinstance(v, (set, frozenset)) else v)
                for k, v in tok_kwargs.items()
            },
            # column mapping is part of stage identity: the same corpus
            # under a different text/doc-id/order mapping must not reuse
            # doc_ids/tokenized stages built under the old mapping
            "text_col": text_col,
            "doc_id_col": doc_id_col,
            "order_cols": order_cols,
            "docs_per_shard": "auto" if docs_per_shard is None else docs_per_shard,
            "version": 1,
        },
        sort_keys=True,
    )
    ck = Checkpointer(spark, checkpoint_dir, fingerprint)

    def s_docs():
        if doc_id_col is not None:
            return docs.withColumn("doc_id", F.col(doc_id_col).cast("long"))
        return assign_doc_ids(docs, order_cols)

    base = ck.stage("doc_ids", s_docs)

    # sql engine + stemmer: JVM scan over SURFACE tokens, stemming folds
    # into a vocab-sized stage (indexer.stem_tf) after TF — mirrors
    # build_index; the fingerprint already distinguishes the spec
    sql_stem = tokenizer_engine == "sql" and stemmer is not None
    if sql_stem:
        udf = make_tokenizer_udf(**dict(tok_kwargs, stemmer=None))
    else:
        udf = make_tokenizer_udf(**tok_kwargs)

    def s_tokenized():
        return base.select(
            "doc_id",
            udf(F.col(text_col)).alias("tokens"),
        ).select("doc_id", "tokens", F.size("tokens").alias("dl"))

    tokenized = ck.stage(
        "tokenized", s_tokenized,
        metrics_fn=lambda rows: {"docs_tokenized": rows},
    )
    doc_lens = tokenized.select("doc_id", "dl")

    agg = doc_lens.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl"),
        F.max("dl").alias("maxdl"),
    ).collect()[0]
    num_docs, avgdl = int(agg["n"]), float(agg["avgdl"] or 0.0)
    if docs_per_shard is None:
        from bm25s_spark.indexer import auto_docs_per_shard

        docs_per_shard = auto_docs_per_shard(
            num_docs, spark.sparkContext.defaultParallelism
        )
        sharded_stage = f"sharded_dps{docs_per_shard}"
    else:
        sharded_stage = "sharded"

    def s_tf():
        from bm25s_spark.indexer import narrow_tf, stem_tf

        # max(dl) is already known from the stats agg: skip the megadoc
        # union branch (double tokenized scan) when nothing needs it
        t = narrow_tf(tokenized, max_doc_len=int(agg["maxdl"] or 0))
        if sql_stem:
            t = stem_tf(t, stemmer)
        return t

    tf = ck.stage("tf", s_tf)

    def s_term_stats():
        dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        empty_row = spark.range(1).select(
        F.lit("").alias("term"), F.lit(0).cast("long").alias("df")
    )  # JVM-native one-row relation: createDataFrame(rows) would put a
    # Python-worker scan into every downstream postings/save plan
        vocab = dfreq.unionByName(empty_row).groupBy("term").agg(F.max("df").alias("df"))
        from bm25s_spark.indexer import VOCAB_LOCALIZE_MAX

        ts = assign_dense_ids(vocab, ["term"], "term_id",
                              localize_max=VOCAB_LOCALIZE_MAX)
        for m, col in NNOC_COLS.items():
            ts = ts.withColumn(
                col,
                F.when(
                    F.col("df") > 0,
                    scoring.nnoc_expr(m, m, F.col("df"), num_docs, avgdl, k1, b, delta),
                ).otherwise(F.lit(0.0)),
            )
        return ts

    term_stats = ck.stage("term_stats", s_term_stats)

    def s_postings():
        p = tf.join(term_stats.select("term", "term_id", "df"), "term")
        for m in METHODS:
            p = p.withColumn(
                IMPACT_COLS[m],
                scoring.impact_expr(
                    m, m, F.col("tf"), F.col("dl"), F.col("df"),
                    num_docs, avgdl, k1, b, delta,
                ).cast("double"),
            )
        return p

    postings = ck.stage(
        "postings", s_postings,
        metrics_fn=lambda rows: {"postings_emitted": rows},
    )

    index = BM25Index(
        spark=spark,
        postings=postings,
        term_stats=term_stats,
        doc_lens=doc_lens,
        doc_map=base.drop("tokens"),
        num_docs=num_docs,
        avg_doc_len=avgdl,
        k1=k1, b=b, delta=delta,
        tokenizer_kwargs=tok_kwargs,
        docs_per_shard=docs_per_shard,
    )

    def s_sharded():
        from bm25s_spark.shards import build_sharded_postings

        return build_sharded_postings(index, docs_per_shard)

    index.sharded = ck.stage(
        sharded_stage, s_sharded,
        metrics_fn=lambda rows: {"blocks_compressed": rows},
    )
    return index, ck
