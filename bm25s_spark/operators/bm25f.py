"""BM25F: multi-field BM25 ranking (Robertson & Zaragoza).

The reference engine scores a single text stream per document
(``reference/bm25s/__init__.py:326-438``).  BM25F is the published
multi-field extension (Robertson, Zaragoza & Taylor, CIKM 2004 "Simple
BM25 extension to multiple weighted fields"): per-field term
frequencies are length-normalized and weight-combined FIRST, and the
k1 saturation is applied once to the combined pseudo-frequency —
which is NOT equivalent to a weighted sum of per-field BM25 scores.

Transcript mapping: one document = one conversation, one field = one
turn ROLE (user / assistant / tool) — "search conversations, weighting
what the user said over tool output" is the natural transcript query.
Any (doc_key, field, text) frame works; turns of the same field
concatenate implicitly because tf and field length are additive.

Formulas (pinned, double precision):

- ``dl_{d,f}``   = token count of doc d in field f (0 when absent)
- ``avgdl_f``    = Σ_d dl_{d,f} / N  over ALL N docs (absent fields
  count as 0 — the convention must be fixed for cross-engine parity)
- ``tf~_{d,t}``  = Σ_f  w_f · tf_{d,f,t} / (1 − b_f + b_f·dl_{d,f}/avgdl_f)
- ``idf_t``      = lucene idf over df_t = #docs containing t in ANY field
- ``score(q,d)`` = Σ_t mult_t · idf_t · tf~_{d,t} / (k1 + tf~_{d,t})

Scale shape: one tokenizer pass over the turns, one partial+final
aggregation to per-(doc, field, term) counts, a 3-row broadcast of the
field parameters, one aggregation down to (doc, term) pseudo-
frequencies — the same two-shuffle skeleton as the single-field build;
query scoring broadcasts the query terms exactly like ``retrieve``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bm25s_spark.tokenization import make_tokenizer_udf

DEFAULT_FIELD_WEIGHT = 1.0
DEFAULT_FIELD_B = 0.75


@dataclass
class BM25FIndex:
    """Handle to the BM25F tables: combined pseudo-frequencies plus
    per-term document frequency."""

    spark: SparkSession
    tfw: DataFrame          # (doc_key, term, tfw double)
    term_stats: DataFrame   # (term, df)
    num_docs: int
    k1: float
    tokenizer_kwargs: dict = field(default_factory=dict)


def build_bm25f(
    turns: DataFrame,
    field_weights: dict[str, float],
    field_b: dict[str, float] | None = None,
    doc_col: str = "conv_id",
    field_col: str = "role",
    text_col: str = "text",
    k1: float = 1.5,
    stopwords="en",
    stemmer: str | None = None,
) -> BM25FIndex:
    """Build the BM25F pseudo-frequency index from (doc, field, text)
    rows (multiple rows per (doc, field) are fine — frequencies add).

    Fields absent from ``field_weights`` get weight 1.0 / b 0.75."""
    spark = turns.sparkSession
    tok_kwargs = dict(stopwords=stopwords, stemmer=stemmer)
    udf = make_tokenizer_udf(**tok_kwargs)
    field_b = field_b or {}

    tok = turns.select(
        F.col(doc_col).alias("doc_key"),
        F.col(field_col).alias("fld"),
        udf(F.col(text_col)).alias("tokens"),
    ).persist()
    num_docs = tok.select("doc_key").distinct().count()

    # per-(doc, field) token counts and per-field average length over
    # ALL docs (absent fields contribute 0 but every doc counts in N)
    dlf = tok.groupBy("doc_key", "fld").agg(
        F.sum(F.size("tokens")).cast("double").alias("dl")
    )
    avgf = dlf.groupBy("fld").agg(
        (F.sum("dl") / F.lit(float(num_docs))).alias("avgdl")
    )

    tff = (
        tok.select("doc_key", "fld", F.explode("tokens").alias("term"))
        .groupBy("doc_key", "fld", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )

    fields = sorted(
        set(field_weights) | set(field_b)
    ) or []
    params = spark.createDataFrame(
        [
            (
                f,
                float(field_weights.get(f, DEFAULT_FIELD_WEIGHT)),
                float(field_b.get(f, DEFAULT_FIELD_B)),
            )
            for f in fields
        ]
        or [("", DEFAULT_FIELD_WEIGHT, DEFAULT_FIELD_B)],
        "fld string, w double, b double",
    )
    norm = F.lit(1.0) - F.col("b") + F.col("b") * F.col("dl") / F.col("avgdl")
    tfw = (
        tff.join(dlf, ["doc_key", "fld"])
        .join(F.broadcast(avgf), "fld")
        .join(F.broadcast(params), "fld", "left")
        .withColumn("w", F.coalesce("w", F.lit(DEFAULT_FIELD_WEIGHT)))
        .withColumn("b", F.coalesce("b", F.lit(DEFAULT_FIELD_B)))
        .groupBy("doc_key", "term")
        .agg(F.sum(F.col("w") * F.col("tf") / norm).alias("tfw"))
    )
    term_stats = tfw.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    tok.unpersist()
    return BM25FIndex(
        spark=spark,
        tfw=tfw,
        term_stats=term_stats,
        num_docs=num_docs,
        k1=k1,
        tokenizer_kwargs=tok_kwargs,
    )


def bm25f_retrieve(
    index: BM25FIndex,
    queries_df: DataFrame,
    k: int = 10,
    round_to: int | None = None,
    query_id_col: str = "query_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k BM25F → (query_id, rank, doc_key, score); lucene idf, the
    single k1 saturation over the combined pseudo-frequency.
    ``round_to`` rounds scores before the rank cut (ties break
    doc_key-ascending), the gate-stability convention."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    udf = make_tokenizer_udf(**index.tokenizer_kwargs)
    qterms = (
        queries_df.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(udf(F.col(text_col))).alias("term"),
        )
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("mult"))
    )
    n = float(index.num_docs)
    idf = F.log(
        F.lit(1.0) + (F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    # resolve idf on the tiny query side FIRST (broadcast probe into the
    # vocab-sized term_stats), then broadcast the enriched query terms
    # into the corpus-sized tfw scan — never an SMJ on corpus rows
    qstats = F.broadcast(qterms).join(index.term_stats, "term")
    hits = (
        F.broadcast(qstats)
        .join(index.tfw, "term")
        .groupBy("query_id", "doc_key")
        .agg(
            F.sum(
                F.col("mult") * idf * F.col("tfw")
                / (F.lit(float(index.k1)) + F.col("tfw"))
            ).alias("score")
        )
    )
    if round_to is not None:
        hits = hits.withColumn("score", F.round("score", round_to))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_key").asc()
    )
    return (
        hits.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_key", "score")
    )
