"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship BM25 top-k over transcripts derived from
``documents`` at sf0.001.  ``queries()`` / ``oracle_sql()`` — one entry
per implemented operator (SURVEY.md §2 + training-pipeline extensions),
verified side-by-side against DuckDB at sf0.01.

The BM25 oracle SQL re-derives the *entire* scoring pipeline
relationally (tokenize → TF/DF → idf·tfc impacts → per-query sums →
top-k), with identical tokenization semantics (``\\w\\w+`` findall on the
lowercased text, Lucene English stopword removal) and identical rounding
/ tie rules, so the value-hash comparison is exact.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

K1, B, DELTA = 1.5, 0.75, 0.5
TOPK = 10

# Lucene English stopword list (public; same semantics as the engine's)
_SW = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
    "if", "in", "into", "is", "it", "no", "not", "of", "on", "or",
    "such", "that", "the", "their", "then", "there", "these", "they",
    "this", "to", "was", "will", "with",
)
_SW_SQL = ", ".join(f"'{w}'" for w in _SW)

# fixed gate query set (terms drawn from the synthetic documents vocab,
# plus OOV / stopword-only probes)
GATE_QUERIES = [
    ("q01", "fast key order sort"),
    ("q02", "spark group query merge"),
    ("q03", "join filter window row"),
    ("q04", "customer data stream batch"),
    ("q05", "merge sort hash zzqx"),
    ("q06", "the and a of"),
    ("q07", "slow small value vector"),
    ("q08", "big column dup scan table"),
]
_QUERIES_SQL = ", ".join(f"('{q}', '{t}')" for q, t in GATE_QUERIES)

# per-query NOT terms for the boolean-exclusion gate: q04 excludes
# nothing (empty), q05's positives include an OOV term, q06's positives
# are all stopwords (no rows either way), q07 mixes a real and an OOV
# negative
GATE_EXCLUDES = [
    ("q01", "table"),
    ("q02", "scan"),
    ("q03", "merge sort"),
    ("q04", ""),
    ("q05", "row"),
    ("q06", "fast"),
    ("q07", "spark zzqx"),
    ("q08", "join"),
]
_EXCLUDES_SQL = ", ".join(f"('{q}', '{t}')" for q, t in GATE_EXCLUDES)

# phrase/proximity gate queries: adjacency-sensitive (p02/p04 repeat a
# term, p03 is a trigram, p06 matches nothing) over the documents table
PHRASE_QUERIES = [
    ("p01", "fast key"),
    ("p02", "table table"),
    ("p03", "group value sort"),
    ("p04", "big big"),
    ("p05", "stream batch"),
    ("p06", "zzqx zzqx"),
]
_PHRASES_SQL = ", ".join(f"('{q}', '{t}')" for q, t in PHRASE_QUERIES)

# seed documents for the more-like-this gate (plain doc ids)
MLT_SEEDS = [0, 7, 42, 137, 256]
_SEEDS_SQL = ", ".join(f"({i})" for i in MLT_SEEDS)

# wildcard gate queries: prefix expansion (w01/w03), literals-only
# (w05), a pattern matching nothing (w04), and a term matched by BOTH a
# literal and a prefix (w06 — multiplicity 2)
WILDCARD_QUERIES = [
    ("w01", "sc* table"),
    ("w02", "st* gr*"),
    ("w03", "win* merge"),
    ("w04", "zzq*"),
    ("w05", "merge sort"),
    ("w06", "fast fa*"),
]
_WILDCARDS_SQL = ", ".join(f"('{q}', '{t}')" for q, t in WILDCARD_QUERIES)

# fuzzy gate queries: single-edit typos (deletion/substitution/
# insertion), an exact term riding along, a no-neighbor token, and the
# short-token exact-only guard (ke len<3; ket → key at distance 1)
FUZZY_QUERIES = [
    ("f01", "merg sort"),
    ("f02", "windoq"),
    ("f03", "faast batch"),
    ("f04", "zzzzz"),
    ("f05", "ke ket"),
]
_FUZZY_SQL = ", ".join(f"('{q}', '{t}')" for q, t in FUZZY_QUERIES)

# mini query language gate: +must / -not / term^boost composed — s06 is
# pure-negative after NOT-wins (no rows), s08 has an impossible must
# (OOV — no rows), s09's must operand is a stopword (vanishes → plain
# query)
QL_QUERIES = [
    ("s01", "fast key order"),
    ("s02", "spark +group merge"),
    ("s03", "join filter -window"),
    ("s04", "merge^2 sort"),
    ("s05", "+table +scan big"),
    ("s06", "fast -fast"),
    ("s07", "value^0.5 vector^3 slow"),
    ("s08", "+zzqx spark"),
    ("s09", "+the merge"),
]
_QL_SQL = ", ".join(f"('{q}', '{t}')" for q, t in QL_QUERIES)

# phrase-bearing query-language gate: quoted spans are MUST-adjacency
# constraints (positional, stopword-keeping) whose words also join the
# should bag; t04's phrase is OOV (no rows), t06's phrase reduces to a
# term the BM25 bag treats as a stopword (pure positional filter)
PQL_QUERIES = [
    ("t01", '"stream batch" customer'),
    ("t02", '"fast key" +order'),
    ("t03", '"merge sort"'),
    ("t04", '"zzqx zzqx" fast'),
    ("t05", 'big "table table"'),
    ("t06", '"the a" spark'),
]
_PQL_SQL = ", ".join(f"('{q}', '{t}')" for q, t in PQL_QUERIES)

# expansion query-language gate: wildcard (`word*`) and fuzzy
# (`word~`, `word~2`) clauses — e03's fuzzy word is OOV-adjacent, e04
# negates a wildcard, e06's fuzzy word is under the 3-char guard
# (exact-only, not in vocab → contributes nothing)
EQL_QUERIES = [
    ("e01", "merg* sort"),
    ("e02", "windoq~ batch"),
    ("e03", "zzqx~2 fast"),
    ("e04", "-st* table scan"),
    ("e05", "gr*^2 query"),
    ("e06", "ke~ merge"),
]
_EQL_SQL = ", ".join(f"('{q}', '{t}')" for q, t in EQL_QUERIES)

# field-scoped query-language gate: role/tool metadata filters (the
# _transcripts derivation: role cycles doc_id % 3, tool = 'search' on
# the tool turns) — g05 repeats an identical filter (collapses), g06's
# value matches nothing (no rows)
FQL_QUERIES = [
    ("g01", "role:user spark group"),
    ("g02", "merge sort -role:tool"),
    ("g03", "role:assistant +merge table"),
    ("g04", "tool:search stream batch"),
    ("g05", "role:user role:user fast"),
    ("g06", "role:zz fast"),
]
_FQL_SQL = ", ".join(f"('{q}', '{t}')" for q, t in FQL_QUERIES)

# range-filter gate queries: int + timestamp inclusive ranges, open
# bounds, a negated range, a range mixed with an equality filter, and
# an unsatisfiable range (turn_idx only reaches 3)
RQL_QUERIES = [
    ("t01", "spark group turn_idx:[0 TO 1]"),
    ("t02", "merge sort -turn_idx:[2 TO 3]"),
    ("t03", "fast key ts:[2026-01-01 00:10:00 TO 2026-01-01 03:20:00]"),
    ("t04", "stream batch ts:[* TO 2026-01-01 01:00:00]"),
    ("t05", "big table turn_idx:[1 TO *] -role:tool"),
    ("t06", "slow value turn_idx:[5 TO 9]"),
]
_RQL_SQL = ", ".join(f"('{q}', '{t}')" for q, t in RQL_QUERIES)

# regexp gate patterns: full-term match (Lucene RegexpQuery anchoring),
# alternation, quantifier, a no-match pattern, and a query with TWO
# patterns both matching the same term (multiplicity 2) — all inside
# the regex subset where Java and RE2 semantics agree
REGEX_QUERIES = [
    ("r01", "sc.n"),
    ("r02", "merge|sort"),
    ("r03", "tab.*"),
    ("r04", "zz.*"),
    ("r05", "gro+up"),
    ("r06", "fast"),
    ("r06", "fa.t"),
]
_REGEX_SQL = ", ".join(f"('{q}', '{p}')" for q, p in REGEX_QUERIES)

_IDF_SQL = {
    "robertson": "ln(greatest((s.n - d.df + 0.5) / (d.df + 0.5), 1.0))",
    # allow_negative=True: clamp dropped (reference/bm25s/scoring.py:184)
    "robertson-neg": "ln((s.n - d.df + 0.5) / (d.df + 0.5))",
    "lucene": "ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))",
    "atire": "ln(s.n / d.df)",
    "bm25l": "ln((s.n + 1.0) / (d.df + 0.5))",
    "bm25+": "ln((s.n + 1.0) / d.df)",
}
_NORM = "(0.25 + 0.75 * dl.dl / s.avgdl)"
_TFC_SQL = {
    "robertson": f"(tf.tf / (1.5 * {_NORM} + tf.tf))",
    "lucene": f"(tf.tf / (1.5 * {_NORM} + tf.tf))",
    "atire": f"((tf.tf * 2.5) / (tf.tf + 1.5 * {_NORM}))",
    "bm25l": f"((2.5 * ((tf.tf / {_NORM}) + 0.5)) / ((tf.tf / {_NORM}) + 2.0))",
    "bm25+": f"(((2.5 * tf.tf) / (1.5 * {_NORM} + tf.tf)) + 0.5)",
}
# nonoccurrence constant at tf=0, dl=avgdl (norm = 1)
_NNOC_FACTOR = {"robertson": None, "lucene": None, "atire": None,
                "bm25l": "0.625", "bm25+": "0.5"}

_SLUG = {"robertson": "robertson", "lucene": "lucene", "atire": "atire",
         "bm25l": "bm25l", "bm25+": "bm25plus"}


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

_INDEX_CACHE: dict = {}


def _rounded_topk(scores: DataFrame) -> DataFrame:
    """The gate's stable ordering, shared by every BM25 entry: rank by
    (round(score,4) desc, doc_id asc) so FP noise below the rounding
    granularity can never flip the cross-engine comparison."""
    rounded = scores.withColumn("score", F.round(F.col("score"), 4))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        rounded.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= TOPK)
        .select("query_id", "rank", "doc_id", "score")
    )


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the canonical transcripts shape (BASELINE.json input_hint)
    deterministically from the documents table: 4 turns per conversation,
    role cycling, doc order under (conv_id, turn_idx) == doc_id order."""
    d = _documents(spark, sf_dir)
    return d.select(
        F.format_string("conv-%06d", (F.col("doc_id") / 4).cast("long")).alias("conv_id"),
        (F.col("doc_id") % 4).cast("int").alias("turn_idx"),
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("role"),
        F.col("text"),
        F.when(F.col("doc_id") % 3 == 2, F.lit("search")).otherwise(F.lit("")).alias("tool"),
        (F.lit("2026-01-01 00:00:00").cast("timestamp")
         + F.make_interval(mins=F.col("doc_id"))).alias("ts"),
    )


def _index_for(spark: SparkSession, sf_dir: str):
    key = os.path.abspath(sf_dir)
    if key not in _INDEX_CACHE:
        from bm25s_spark.indexer import build_index

        tdf = _transcripts(spark, sf_dir)
        idx = build_index(tdf, order_cols=["conv_id", "turn_idx"]).persist()
        _INDEX_CACHE[key] = idx
    return _INDEX_CACHE[key]


def _gate_topk(spark: SparkSession, sf_dir: str, method: str,
               idf_method: str | None = None, mask: bool = False,
               allow_negative: bool = False) -> DataFrame:
    """Top-k with engine scoring but gate-stable ordering: rank by
    (round(score,4) desc, doc_id) so FP noise below the rounding
    granularity can never flip the cross-engine comparison."""
    from bm25s_spark.retrieval import score_all

    idx = _index_for(spark, sf_dir)
    qdf = spark.createDataFrame(GATE_QUERIES, "query_id string, text string")
    mask_df = None
    if mask:
        mask_df = idx.doc_lens.select(
            "doc_id", (F.col("doc_id") % 2).cast("double").alias("weight")
        )
    scores = score_all(idx, qdf, method=method, idf_method=idf_method,
                       weight_mask_df=mask_df, allow_negative=allow_negative)
    return _rounded_topk(scores)


def _gate_topk_sharded(spark: SparkSession, sf_dir: str, method: str,
                       mask: bool = False, chunk: int = 16384) -> DataFrame:
    """Same gate semantics, but through the *sharded scatter-gather
    kernel* (mapInPandas scatter-add + block-max pruning + final merge)
    with ``exact=True`` — float64 impacts recomputed from (tf, dl) so
    the kernel path is hash-comparable against the double-precision
    DuckDB oracle.  Retrieves 2k then re-ranks by (round(score,4), doc_id)
    so FP noise below the rounding granularity cannot flip the
    comparison at the top-k boundary."""
    from bm25s_spark.retrieval import retrieve

    idx = _index_for(spark, sf_dir)
    qdf = spark.createDataFrame(GATE_QUERIES, "query_id string, text string")
    mask_df = None
    if mask:
        mask_df = idx.doc_lens.select(
            "doc_id", (F.col("doc_id") % 2).cast("double").alias("weight")
        )
    # prune=False: MaxScore's theta ≥ remaining cutoff can drop docs whose
    # exact score TIES the in-shard kth bound — on the gate's tiny-vocab
    # corpora (many bit-identical impacts) that can evict the low-doc_id
    # tie members the oracle's (rounded score, doc_id) order puts in its
    # top-k.  Pruning equivalence has its own unrounded pytest
    # (tests/test_pruning_loaders_eval.py); the gate needs determinism.
    res = retrieve(
        idx, qdf, k=2 * TOPK, method=method, weight_mask_df=mask_df,
        strategy="sharded", exact=True, round_to=4, pad=False, prune=False,
        query_chunk_size=chunk,
    )
    return _rounded_topk(res)


def _gate_topk_pretokenized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene top-k over an index built from a *pre-tokenized* corpus
    (reference ``index()`` accepts token lists,
    ``reference/bm25s/__init__.py:517-560``): tokenize first with the
    standalone tokenizer, then build from the tokens column — must equal
    the text-path build against the same oracle."""
    from bm25s_spark.indexer import build_index_from_tokens
    from bm25s_spark.retrieval import score_all
    from bm25s_spark.tokenization import tokenize

    key = (os.path.abspath(sf_dir), "pretok")
    if key not in _INDEX_CACHE:
        tdf = tokenize(_transcripts(spark, sf_dir))
        idx = build_index_from_tokens(
            tdf, order_cols=["conv_id", "turn_idx"]
        ).persist()
        _INDEX_CACHE[key] = idx
    idx = _INDEX_CACHE[key]
    qdf = spark.createDataFrame(GATE_QUERIES, "query_id string, text string")
    scores = score_all(idx, qdf, method="lucene")
    return _rounded_topk(scores)


def _gate_topk_sqltok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene top-k over an index whose tokenization ran as pure JVM
    column expressions (``tokenizer_engine="sql"`` — ``lower`` →
    ``regexp_extract_all`` → stopword ``filter``, no Python in the
    corpus scan): the fast-path engine must be indistinguishable from
    the reference-exact pandas-UDF build against the same oracle.
    Queries tokenize JVM-side too (the engine travels in
    ``tokenizer_kwargs``)."""
    from bm25s_spark.indexer import build_index
    from bm25s_spark.retrieval import score_all

    key = (os.path.abspath(sf_dir), "sqltok")
    if key not in _INDEX_CACHE:
        idx = build_index(
            _transcripts(spark, sf_dir),
            order_cols=["conv_id", "turn_idx"],
            tokenizer_engine="sql",
        ).persist()
        _INDEX_CACHE[key] = idx
    idx = _INDEX_CACHE[key]
    qdf = spark.createDataFrame(GATE_QUERIES, "query_id string, text string")
    return _rounded_topk(score_all(idx, qdf, method="lucene"))


def _gate_topk_hf_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene top-k over an index built through the HF-tokenizer bridge
    (``make_hf_tokenizer_udf`` / ``tokenize_hf`` — the reference's
    ``batch_tokenize`` surface, ``reference/bm25s/hf.py:187-203``) with a
    deterministic in-process stand-in speaking the ``tokenizers``
    ``encode_batch`` → ``.tokens`` interface and reproducing the gate's
    reference tokenization (lower → ``\\w\\w+`` findall → Lucene-EN
    stopword filter).  Queries go through the same bridge and enter
    retrieval as array-typed token lists, so this exercises the
    executor-side loader, the Arrow bridge UDF, the pretokenized build,
    AND the token-list query path against the standard lucene oracle."""
    from bm25s_spark.indexer import build_index_from_tokens
    from bm25s_spark.retrieval import score_all
    from bm25s_spark.tokenization import tokenize_hf

    def _load_fake_hf_tokenizer():
        # defined in-closure so cloudpickle ships it by value (this
        # module is loaded from a file path, not importable on executors)
        import re

        from bm25s_spark.tokenization import STOPWORDS_EN

        class _Enc:
            __slots__ = ("tokens",)

            def __init__(self, tokens):
                self.tokens = tokens

        class _FakeHFTokenizer:
            _pat = re.compile(r"(?u)\b\w\w+\b")

            def encode_batch(self, texts):
                return [
                    _Enc([t for t in self._pat.findall(x.lower())
                          if t not in STOPWORDS_EN])
                    for x in texts
                ]

        return _FakeHFTokenizer()

    key = (os.path.abspath(sf_dir), "hfbridge")
    if key not in _INDEX_CACHE:
        tdf = tokenize_hf(_transcripts(spark, sf_dir), _load_fake_hf_tokenizer)
        idx = build_index_from_tokens(
            tdf, order_cols=["conv_id", "turn_idx"]
        ).persist()
        _INDEX_CACHE[key] = idx
    idx = _INDEX_CACHE[key]
    qdf = spark.createDataFrame(GATE_QUERIES, "query_id string, text string")
    qtok = tokenize_hf(qdf, _load_fake_hf_tokenizer)
    return _rounded_topk(
        score_all(idx, qtok, method="lucene", text_col="tokens")
    )


def _gate_topk_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage PRF retrieval: expand each gate query with the top-3
    new terms mined (by summed tf·idf) from its top-5 round-1 documents,
    then re-retrieve — proves the engine composes with itself (round-2
    queries re-enter through the reference's token-list query path).
    Both ranking boundaries are rounded before their cuts so the
    feedback set is engine-stable."""
    from bm25s_spark.operators.prf import prf_expand
    from bm25s_spark.retrieval import score_all

    idx = _index_for(spark, sf_dir)
    qdf = spark.createDataFrame(GATE_QUERIES, "query_id string, text string")
    q2 = prf_expand(
        idx, qdf, feedback_docs=5, expansion_terms=3, method="lucene",
        round_to=4, expansion_round_to=6,
    )
    scores = score_all(idx, q2, method="lucene")
    return _rounded_topk(scores)


def _gate_topk_prf_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same two-stage PRF semantics, but through the delta-scoring path
    (round 2 scores only the expansion terms and adds the retained
    round-1 scores — one fewer full postings pass).  Shares the full
    path's oracle: delta changes the plan and FP summation order, not
    the math, and the gate's round-to-4 absorbs the order."""
    from bm25s_spark.operators.prf import prf_score_delta

    idx = _index_for(spark, sf_dir)
    qdf = spark.createDataFrame(GATE_QUERIES, "query_id string, text string")
    scores = prf_score_delta(
        idx, qdf, feedback_docs=5, expansion_terms=3, method="lucene",
        round_to=4, expansion_round_to=6,
    )
    return _rounded_topk(scores)


def _gate_topk_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean-AND retrieval: only docs containing EVERY distinct query
    term, BM25-ranked (gate ordering).  q05 carries an OOV term and q06
    is all stopwords — both must return zero rows on both engines."""
    from bm25s_spark.retrieval import score_all

    idx = _index_for(spark, sf_dir)
    qdf = spark.createDataFrame(GATE_QUERIES, "query_id string, text string")
    scores = score_all(idx, qdf, method="lucene", require_all_terms=True)
    return _rounded_topk(scores)


def _gate_topk_excluding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean-NOT retrieval: each gate query carries its GATE_EXCLUDES
    negative text; docs containing any excluded term drop out before the
    (rounded, doc_id-tiebroken) rank cut."""
    from bm25s_spark.operators.boolean import retrieve_excluding

    idx = _index_for(spark, sf_dir)
    excl = dict(GATE_EXCLUDES)
    qdf = spark.createDataFrame(
        [(qid, text, excl[qid]) for qid, text in GATE_QUERIES],
        "query_id string, text string, exclude_text string",
    )
    return retrieve_excluding(idx, qdf, k=TOPK, round_to=4)


def _gate_facet_role(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Faceted search composition: lucene gate top-k → per-query hit
    counts by turn role (role cycles doc_id % 3 in the _transcripts
    derivation, which the oracle replays as a CASE)."""
    from bm25s_spark.operators.facets import facet_counts

    idx = _index_for(spark, sf_dir)
    res = _gate_topk(spark, sf_dir, "lucene")
    roles = idx.doc_lens.select(
        "doc_id",
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("role"),
    )
    return facet_counts(res, roles, "role")


def _gate_trending_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly trending terms over the transcript turns (ts = 2026-01-01
    + doc_id minutes in the _transcripts derivation, so each 1-hour
    window covers 60 docs), with previous-window counts."""
    from bm25s_spark.operators.trends import trending_terms

    tdf = _transcripts(spark, sf_dir)
    return trending_terms(tdf, "1 hour", top_n=5, with_previous=True)


def _gate_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversification over a brute-force cosine top-20 pool
    (λ=0.7, k=5).  Every pairwise cosine is rounded to 4 before the max
    and the objective re-rounded before each argmax (doc-ascending
    ties), so the DuckDB recursive-CTE twin selects the identical
    sequence; the (1 − λ) factor is written as ``1 - 0.7`` in BOTH
    engines so the IEEE constant matches bitwise."""
    from bm25s_spark.operators import similarity
    from bm25s_spark.operators.mmr import mmr_rerank

    emb = _embeddings(spark, sf_dir)
    qv = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    pool = similarity.brute_force_knn(emb, qv, k=20).select(
        "query_id", "vec_id", F.round("cosine", 4).alias("score")
    )
    out = mmr_rerank(pool, emb, k=5, lam=0.7, id_col="vec_id")
    return out.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("rank").cast("int").alias("rank"),
        "vec_id",
        F.round("relevance", 4).alias("relevance"),
        F.round("mmr_score", 4).alias("mmr_score"),
    )


def _gate_topk_conv_granularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene top-k over an index whose documents are whole
    CONVERSATIONS (``conversation_rollup`` output), not turns — doc ids
    are assigned in conv_id order, which the DuckDB twin reproduces as
    ``doc_id // 4`` (the _transcripts derivation packs 4 turns per
    conversation in id order)."""
    from bm25s_spark.indexer import build_index
    from bm25s_spark.retrieval import score_all
    from bm25s_spark.transcripts import conversation_rollup

    key = (os.path.abspath(sf_dir), "convidx")
    if key not in _INDEX_CACHE:
        conv = conversation_rollup(_transcripts(spark, sf_dir)).select(
            "conv_id", F.col("conv_text").alias("text")
        )
        idx = build_index(conv, order_cols=["conv_id"]).persist()
        _INDEX_CACHE[key] = idx
    idx = _INDEX_CACHE[key]
    qdf = spark.createDataFrame(GATE_QUERIES, "query_id string, text string")
    return _rounded_topk(score_all(idx, qdf, method="lucene"))


def _gate_topk_imported(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bm25l top-k through the reference-format interop round trip:
    export the standard index into the reference's CSC ``.npy`` save
    layout (``bm25s_spark/compat.py``; float64 so the trip is
    lossless), import it back (distributed mmap term-range scan, stored
    nnoc honored) and score — must hash-match the SAME bm25l oracle as
    the native build entries."""
    import tempfile

    from bm25s_spark.compat import export_bm25s, import_bm25s
    from bm25s_spark.retrieval import score_all

    key = (os.path.abspath(sf_dir), "bm25s_compat")
    if key not in _INDEX_CACHE:
        d = tempfile.mkdtemp(prefix="bm25s_compat_gate_")
        export_bm25s(_index_for(spark, sf_dir), d, method="bm25l",
                     dtype="float64", int_dtype="int64")
        _INDEX_CACHE[key] = import_bm25s(spark, d).persist()
    idx = _INDEX_CACHE[key]
    qdf = spark.createDataFrame(GATE_QUERIES, "query_id string, text string")
    return _rounded_topk(score_all(idx, qdf, method="bm25l"))


def _gate_topk_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene top-k through ``merge_indexes``: the corpus is split into
    three doc_id%3 slices, each indexed independently, then merged — the
    partitioned-ingest build path.  The merge recomputes every
    corpus-level statistic exactly, so the result must hash-match the
    same full-corpus oracle as the ordinary build entries."""
    from bm25s_spark.indexer import build_index, merge_indexes
    from bm25s_spark.ids import assign_doc_ids
    from bm25s_spark.retrieval import score_all

    key = (os.path.abspath(sf_dir), "merged")
    if key not in _INDEX_CACHE:
        docs = assign_doc_ids(
            _transcripts(spark, sf_dir), ["conv_id", "turn_idx"]
        )
        parts = [
            build_index(docs.where(F.col("doc_id") % 3 == i), doc_id_col="doc_id")
            for i in range(3)
        ]
        _INDEX_CACHE[key] = merge_indexes(*parts).persist()
    idx = _INDEX_CACHE[key]
    qdf = spark.createDataFrame(GATE_QUERIES, "query_id string, text string")
    return _rounded_topk(score_all(idx, qdf, method="lucene"))


_CONV_DOCS_CTE = """SELECT doc_id // 4 AS doc_id,
         lower(string_agg(text, ' ' ORDER BY doc_id % 4)) AS t
  FROM documents GROUP BY doc_id // 4"""


# tombstone set for the delete-lifecycle gates: every 7th doc (offset 3)
_TOMBSTONE_SQL_FILTER = "doc_id % 7 <> 3"


def _gate_tombstones(idx):
    return idx.doc_lens.where(F.col("doc_id") % 7 == 3).select("doc_id")


def _gate_topk_tombstoned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bm25l top-k through a ``with_tombstones`` live-docs view (every
    7th doc deleted): surviving docs keep their exact pre-delete scores
    — the oracle keeps ALL statistics corpus-wide and filters only the
    candidate set (Lucene deleted-docs semantics).  bm25l exercises the
    nonoccurrence add-back under deletes."""
    from bm25s_spark.operators.deletes import with_tombstones

    idx = _index_for(spark, sf_dir)
    view = with_tombstones(idx, _gate_tombstones(idx))
    qdf = spark.createDataFrame(GATE_QUERIES, "query_id string, text string")
    return _rounded_topk(view.get_scores(qdf, method="bm25l"))


def _gate_topk_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lucene top-k through ``compact_index`` (the merge phase of the
    delete lifecycle): statistics re-derived over survivors WITHOUT
    re-tokenizing — must equal a fresh build over the filtered corpus,
    which is exactly what the oracle computes."""
    from bm25s_spark.operators.deletes import compact_index

    key = (os.path.abspath(sf_dir), "compacted")
    if key not in _INDEX_CACHE:
        idx = _index_for(spark, sf_dir)
        _INDEX_CACHE[key] = compact_index(idx, _gate_tombstones(idx)).persist()
    idx = _INDEX_CACHE[key]
    qdf = spark.createDataFrame(GATE_QUERIES, "query_id string, text string")
    return _rounded_topk(idx.get_scores(qdf, method="lucene"))


def _gate_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-term contribution breakdown (Lucene ``explain()`` analog) for
    the lucene gate top-k hits: summing ``contribution`` per (query,
    doc) reproduces the hit's raw score — the oracle re-derives every
    row from the shared impacts CTE."""
    from bm25s_spark.operators.explain import explain_scores

    idx = _index_for(spark, sf_dir)
    qdf = spark.createDataFrame(GATE_QUERIES, "query_id string, text string")
    topk = _gate_topk(spark, sf_dir, "lucene")
    return explain_scores(idx, qdf, method="lucene", topk_df=topk, round_to=4)


# thesaurus for the synonym-expansion gate: vocab→vocab entries, one
# OOV source (zzqx — q05 carries it; its synonyms must still fire), and
# two sources sharing the target `join` (weights accumulate)
GATE_SYNONYMS = [
    ("sort", "order", 0.5),
    ("merge", "join", 0.5),
    ("zzqx", "join", 1.0),
    ("zzqx", "scan", 0.25),
    ("table", "row", 0.25),
    ("data", "batch", 0.5),
]
_SYNONYMS_SQL = ", ".join(
    f"('{a}', '{b}', {w})" for a, b, w in GATE_SYNONYMS
)


def _gate_topk_synonyms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thesaurus-expanded bm25+ top-k: fractional multiplicities flow
    through both the impact sum AND the multiplicity-weighted
    nonoccurrence add-back (bm25+ exercises the latter)."""
    from bm25s_spark.operators.synonyms import retrieve_with_synonyms

    idx = _index_for(spark, sf_dir)
    qdf = spark.createDataFrame(GATE_QUERIES, "query_id string, text string")
    syn = spark.createDataFrame(
        GATE_SYNONYMS, "term string, synonym string, weight double"
    )
    return retrieve_with_synonyms(
        idx, qdf, syn, k=TOPK, method="bm25+", round_to=4
    )


SUGGEST_PREFIXES = ["sc", "ta", "me", "zz", "qu", "s"]
_PREFIXES_SQL = ", ".join(f"('{p}')" for p in SUGGEST_PREFIXES)


def _gate_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix autocomplete over the index vocabulary, top-5 by
    (df desc, term asc); 'zz' completes nothing → zero rows on both
    engines."""
    from bm25s_spark.operators.suggest import suggest_terms

    idx = _index_for(spark, sf_dir)
    prefixes = spark.createDataFrame(
        [(p,) for p in SUGGEST_PREFIXES], "prefix string"
    )
    return suggest_terms(idx, prefixes, n=5).select(
        "prefix", "rank", "term", F.col("df").cast("long").alias("df")
    )


def _gate_knn_conv_pooled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-pooled conversation embeddings (vec_id // 4 — the
    _transcripts packing) → exact cosine top-5 among the pooled
    vectors: the dense-side granularity rollup composed with kNN."""
    from bm25s_spark.operators import similarity

    emb = _embeddings(spark, sf_dir)
    pooled = similarity.mean_pool_embeddings(
        emb, (F.col("vec_id") / 4).cast("long"), out_group="vec_id"
    )
    qv = pooled.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    res = similarity.brute_force_knn(pooled, qv, k=5, round_to=4)
    return res.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("rank").cast("int").alias("rank"),
        "vec_id",
        F.round("cosine", 4).alias("cosine"),
    )


# recency gate: now = 2026-01-02 00:00 (ts spans doc_id minutes from
# 2026-01-01), half-life 6 h — ages 15.7–24 h, decay factors 2^-4…2^-2.6
_RECENCY_NOW = "2026-01-02 00:00:00"
_RECENCY_HALF_LIFE_H = 6.0


def _gate_topk_recency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-boosted lucene top-k: text score × 2^(-age/half_life),
    age from the transcript turn's ts (= 2026-01-01 + doc_id minutes in
    the _transcripts derivation, which the oracle replays as pure
    doc_id arithmetic — no timezone in the twin at all)."""
    from bm25s_spark.ids import assign_doc_ids
    from bm25s_spark.operators.recency import retrieve_with_decay

    idx = _index_for(spark, sf_dir)
    qdf = spark.createDataFrame(GATE_QUERIES, "query_id string, text string")
    ts = assign_doc_ids(
        _transcripts(spark, sf_dir), ["conv_id", "turn_idx"]
    ).select("doc_id", "ts")
    return retrieve_with_decay(
        idx, qdf, ts, now=_RECENCY_NOW,
        half_life_hours=_RECENCY_HALF_LIFE_H, k=TOPK, round_to=4,
    )


def _gate_topk_filtered_role(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered lucene top-k: only `user` turns (doc_id % 3 ==
    0 in the _transcripts derivation) may rank; statistics stay
    corpus-wide, so surviving scores equal the unfiltered engine's —
    same oracle family as the tombstone view, different predicate."""
    from bm25s_spark.operators.filtered import retrieve_filtered

    idx = _index_for(spark, sf_dir)
    qdf = spark.createDataFrame(GATE_QUERIES, "query_id string, text string")
    return retrieve_filtered(
        idx, qdf, F.col("role") == "user", k=TOPK, round_to=4
    )


def _gate_collapse_conv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field collapse: per-turn lucene scores (rounded) collapse to one
    best turn per CONVERSATION (doc_id // 4 — the _transcripts packing),
    conversations ranked by their best turn.  The post-retrieval sibling
    of the conversation-granularity index."""
    from bm25s_spark.operators.collapse import collapse_results
    from bm25s_spark.retrieval import score_all

    idx = _index_for(spark, sf_dir)
    qdf = spark.createDataFrame(GATE_QUERIES, "query_id string, text string")
    scores = score_all(idx, qdf, method="lucene").withColumn(
        "score", F.round("score", 4)
    )
    groups = idx.doc_lens.select(
        "doc_id", (F.col("doc_id") / 4).cast("long").alias("conv")
    )
    return collapse_results(scores, groups, k=5, group_col="conv")


def _gate_percolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percolation (reverse search): every document matched against the
    stored gate queries; full boolean-AND matches only.  q05 (OOV term)
    and q06 (all stopwords) must fire on no document in both engines."""
    from bm25s_spark.operators.percolate import percolate

    docs = _documents(spark, sf_dir)
    qdf = spark.createDataFrame(GATE_QUERIES, "query_id string, text string")
    return percolate(docs, qdf)


def _gate_topk_page2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset pagination: page 2 via ``search_after`` cursors taken from
    the LAST row of each query's page 1 — must equal ranks k+1..2k of
    the rounded total order (which is exactly what the oracle selects).
    Queries with ≤k total hits (q05/q06) produce an empty page 2 on
    both engines."""
    from bm25s_spark.operators.paging import retrieve_after

    idx = _index_for(spark, sf_dir)
    qdf = spark.createDataFrame(GATE_QUERIES, "query_id string, text string")
    page1 = _gate_topk(spark, sf_dir, "lucene")
    wlast = Window.partitionBy("query_id").orderBy(F.col("rank").desc())
    cursors = (
        page1.withColumn("_r", F.row_number().over(wlast))
        .where(F.col("_r") == 1)
        .select("query_id", "score", "doc_id")
    )
    return retrieve_after(idx, qdf, cursors, k=TOPK, round_to=4)


def _gate_topk_chunk_granularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene top-k over an index whose documents are 32-token sliding
    WINDOWS (``chunk_documents`` output, overlap 8) — the RAG
    passage-retrieval composition.  Chunk doc ids are
    ``doc_id * 1000 + chunk_id`` (chunk counts are far below 1000 at
    gate scale), which the DuckDB twin reproduces arithmetically from
    the same stride formula."""
    from bm25s_spark.indexer import build_index
    from bm25s_spark.operators.chunking import chunk_documents
    from bm25s_spark.retrieval import score_all

    key = (os.path.abspath(sf_dir), "chunkidx")
    if key not in _INDEX_CACHE:
        chunks = chunk_documents(
            _documents(spark, sf_dir), chunk_size=32, overlap=8
        ).select(
            (F.col("doc_id") * 1000 + F.col("chunk_id")).alias("chunk_doc"),
            F.col("chunk_text").alias("text"),
        )
        idx = build_index(chunks, doc_id_col="chunk_doc").persist()
        _INDEX_CACHE[key] = idx
    idx = _INDEX_CACHE[key]
    qdf = spark.createDataFrame(GATE_QUERIES, "query_id string, text string")
    return _rounded_topk(score_all(idx, qdf, method="lucene"))


# chunk_documents(32, 8) as a docs source: stride 24, doc_id re-keyed
# as doc_id*1000 + chunk_id (nested WITH inside the docs CTE)
_CHUNK_DOCS_CTE = r"""WITH ct AS (
    SELECT doc_id,
           list_filter(string_split_regex(trim(text), '\s+'), x -> x != '') AS tk
    FROM documents
  ),
  cnz AS (
    SELECT doc_id, tk,
           greatest(CAST(ceil((len(tk) - 8) / 24.0) AS INT), 1) AS n_chunks
    FROM ct WHERE len(tk) > 0
  ),
  ce AS (
    SELECT doc_id, tk,
           unnest(generate_series(0, n_chunks - 1)) AS chunk_id
    FROM cnz
  )
  SELECT doc_id * 1000 + chunk_id AS doc_id,
         lower(array_to_string(tk[chunk_id*24+1 : chunk_id*24+32], ' ')) AS t
  FROM ce"""


def _bm25_common_cte(method: str, idf_method: str | None = None,
                     docs_cte: str | None = None) -> str:
    """The shared oracle prefix — tokenization, corpus stats, tf/df,
    gate queries, idf, impacts — used by both the single-stage BM25
    oracle and the two-stage PRF oracle so the scoring arithmetic can
    never drift between them."""
    idf_method = idf_method or method
    nnoc_f = _NNOC_FACTOR[method]
    idf = _IDF_SQL[idf_method]
    tfc = _TFC_SQL[method]
    nnoc_expr = f"({idf} * {nnoc_f})" if nnoc_f else "0.0"
    # ``docs_cte`` parameterizes the document source (doc_id, t) — the
    # default is per-turn granularity (one doc per documents row); the
    # conversation-granularity entry passes a rollup CTE instead
    docs_cte = docs_cte or "SELECT doc_id, lower(text) AS t FROM documents"
    return f"""
WITH docs AS (
  {docs_cte}
),
tok_raw AS (
  SELECT doc_id, unnest(regexp_extract_all(t, '\\w\\w+')) AS term FROM docs
),
toks AS (
  SELECT doc_id, term FROM tok_raw WHERE term NOT IN ({_SW_SQL})
),
dl AS (
  SELECT d.doc_id, CAST(count(tk.term) AS DOUBLE) AS dl
  FROM docs d LEFT JOIN toks tk USING (doc_id) GROUP BY d.doc_id
),
s AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
  FROM toks GROUP BY doc_id, term
),
dfreq AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term
),
queries(query_id, qtext) AS (VALUES {_QUERIES_SQL}),
qtok_raw AS (
  SELECT query_id, unnest(regexp_extract_all(lower(qtext), '\\w\\w+')) AS term
  FROM queries
),
qterms AS (
  SELECT query_id, term, CAST(count(*) AS DOUBLE) AS mult
  FROM qtok_raw WHERE term NOT IN ({_SW_SQL}) GROUP BY query_id, term
),
idf AS (
  SELECT d.term, d.df, {idf} AS idf, {nnoc_expr} AS nnoc
  FROM dfreq d CROSS JOIN s
),
impacts AS (
  SELECT tf.doc_id, tf.term, (i.idf * {tfc} - i.nnoc) AS impact
  FROM tf
  JOIN idf i USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN s
)"""


def _bm25_oracle_sql(method: str, idf_method: str | None = None,
                     mask: bool = False, shard_round: bool = False,
                     docs_cte: str | None = None,
                     conjunctive: bool = False,
                     exclude: bool = False,
                     live_filter: str | None = None) -> str:
    weight = "(r.doc_id % 2)" if mask else "1.0"
    # the sharded kernel's gate mode rounds the accumulated (masked) raw
    # score BEFORE the per-query nnoc add-back (which the final merge
    # adds in full precision, then the gate rounds once more) — mirror
    # that double-rounding exactly
    if shard_round:
        score_expr = f"round(round({weight} * r.raw, 4) + coalesce(ns.ns, 0.0), 4)"
    else:
        score_expr = f"round({weight} * r.raw + coalesce(ns.ns, 0.0), 4)"
    # boolean-AND: a (query, doc) group's row count over the term join is
    # its matched-distinct-term count (qterms is distinct per (query,
    # term), impacts unique per (term, doc)); requiring it to equal the
    # query's full post-tokenizer type count replays require_all_terms
    conj_filter = (
        "\nqn AS (SELECT query_id, count(*) AS qn FROM qterms GROUP BY query_id),"
        if conjunctive else ""
    )
    conj_having = (
        " HAVING count(*) = any_value(qn.qn)" if conjunctive else ""
    )
    conj_join = " JOIN qn ON qn.query_id = q.query_id" if conjunctive else ""
    # boolean NOT: docs containing ANY excluded term leave the candidate
    # set before ranking — the twin of operators/boolean.retrieve_excluding
    # (negterms go through the same tokenizer parse as the queries)
    excl_cte = f"""
negq(query_id, ntext) AS (VALUES {_EXCLUDES_SQL}),
negterms AS (
  SELECT DISTINCT query_id, term FROM (
    SELECT query_id,
           unnest(regexp_extract_all(lower(ntext), '\\w\\w+')) AS term
    FROM negq
  ) WHERE term NOT IN ({_SW_SQL})
),
negdocs AS (
  SELECT DISTINCT n.query_id, tf.doc_id FROM negterms n JOIN tf USING (term)
),""" if exclude else ""
    # tombstone live-docs view: deleted docs leave the CANDIDATE set
    # only — every statistic (n, avgdl, df, idf, nnoc) still counts
    # them, the Lucene deleted-docs semantics of operators/deletes
    wheres = []
    if exclude:
        wheres.append(
            """NOT EXISTS (
    SELECT 1 FROM negdocs nd
    WHERE nd.query_id = q.query_id AND nd.doc_id = im.doc_id
  )"""
        )
    if live_filter:
        wheres.append(f"({live_filter})")
    excl_where = ("\n  WHERE " + "\n    AND ".join(wheres)) if wheres else ""
    return _bm25_common_cte(method, idf_method, docs_cte) + f""",{conj_filter}{excl_cte}
raw AS (
  SELECT q.query_id, im.doc_id, sum(q.mult * im.impact) AS raw
  FROM qterms q JOIN impacts im USING (term){conj_join}{excl_where}
  GROUP BY q.query_id, im.doc_id{conj_having}
),
ns AS (
  SELECT q.query_id, sum(q.mult * i.nnoc) AS ns
  FROM qterms q JOIN idf i USING (term) GROUP BY q.query_id
),
scored AS (
  SELECT r.query_id, r.doc_id,
         {score_expr} AS score
  FROM raw r LEFT JOIN ns USING (query_id)
),
ranked AS (
  SELECT query_id, doc_id, score,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= {TOPK}
"""


def _bm25_prf_oracle_sql(method: str, m: int, t: int,
                         idf_method: str | None = None) -> str:
    """Two-stage PRF twin: round-1 top-``m`` per query (scores rounded
    to 4 before the cut, doc_id tiebreak — the gate contract), mine the
    top-``t`` new terms by summed tf·ln(N/df) (rounded to 6, term-asc
    tiebreak), append them with multiplicity 1, re-score, final top-k."""
    return _bm25_common_cte(method, idf_method) + f""",
raw1 AS (
  SELECT q.query_id, im.doc_id, sum(q.mult * im.impact) AS raw
  FROM qterms q JOIN impacts im USING (term)
  GROUP BY q.query_id, im.doc_id
),
ns1 AS (
  SELECT q.query_id, sum(q.mult * i.nnoc) AS ns
  FROM qterms q JOIN idf i USING (term) GROUP BY q.query_id
),
ranked1 AS (
  SELECT r.query_id, r.doc_id,
         row_number() OVER (
           PARTITION BY r.query_id
           ORDER BY round(r.raw + coalesce(ns.ns, 0.0), 4) DESC,
                    r.doc_id ASC
         ) AS rn
  FROM raw1 r LEFT JOIN ns1 ns USING (query_id)
),
hits AS (SELECT query_id, doc_id FROM ranked1 WHERE rn <= {m}),
fb AS (
  SELECT h.query_id, tf.term,
         round(sum(tf.tf * ln(s.n / d.df)), 6) AS escore
  FROM hits h
  JOIN tf ON tf.doc_id = h.doc_id
  JOIN dfreq d ON d.term = tf.term
  CROSS JOIN s
  GROUP BY h.query_id, tf.term
),
fbnew AS (
  SELECT f.* FROM fb f
  WHERE NOT EXISTS (
    SELECT 1 FROM qterms q
    WHERE q.query_id = f.query_id AND q.term = f.term
  )
),
expterms AS (
  SELECT query_id, term FROM (
    SELECT query_id, term,
           row_number() OVER (
             PARTITION BY query_id ORDER BY escore DESC, term ASC
           ) AS rn
    FROM fbnew
  ) WHERE rn <= {t}
),
qterms2 AS (
  SELECT query_id, term, mult FROM qterms
  UNION ALL
  SELECT query_id, term, 1.0 AS mult FROM expterms
),
raw2 AS (
  SELECT q.query_id, im.doc_id, sum(q.mult * im.impact) AS raw
  FROM qterms2 q JOIN impacts im USING (term)
  GROUP BY q.query_id, im.doc_id
),
ns2 AS (
  SELECT q.query_id, sum(q.mult * i.nnoc) AS ns
  FROM qterms2 q JOIN idf i USING (term) GROUP BY q.query_id
),
scored2 AS (
  SELECT r.query_id, r.doc_id,
         round(r.raw + coalesce(ns.ns, 0.0), 4) AS score
  FROM raw2 r LEFT JOIN ns2 ns USING (query_id)
),
ranked2 AS (
  SELECT query_id, doc_id, score,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored2
)
SELECT query_id, rank, doc_id, score FROM ranked2 WHERE rank <= {TOPK}
"""


_NORM_TEXT_SQL = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"
_SHINGLE_CTE = f"""
docs AS (
  SELECT doc_id, string_split({_NORM_TEXT_SQL}, ' ') AS l FROM documents
),
idx AS (
  SELECT doc_id, l, unnest(generate_series(1, greatest(len(l) - 2, 1))) AS i
  FROM docs
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(l[i:i+2], ' ') AS shingle FROM idx
)"""


def _minhash_sig_sql_cols(num_hashes: int) -> str:
    return ", ".join(
        f"min(CAST(('0x' || substr(md5('{i}:' || shingle), 1, 12)) AS BIGINT)) AS sig_{i}"
        for i in range(num_hashes)
    )


# ---------------------------------------------------------------------------
# the contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 lucene top-k over transcripts at sf0.001."""
    return _gate_topk(spark, "/root/testdata/sf0.001", "lucene")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from bm25s_spark.functions.text import (
        with_fingerprint, with_lang_id, with_normalized, with_quality,
        with_redacted, with_repetition, with_token_stats,
    )
    from bm25s_spark.operators import dedup, similarity

    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # ---- BM25 core (five variants + cross combo + mask) ----
    for m in ("robertson", "lucene", "atire", "bm25l", "bm25+"):
        q[f"bm25_topk_{_SLUG[m]}"] = (
            lambda spark, sf, m=m: _gate_topk(spark, sf, m)
        )
    q["bm25_topk_atire_robertson"] = (
        lambda spark, sf: _gate_topk(spark, sf, "atire", "robertson")
    )
    # allow_negative robertson: idf clamp dropped, terms with df > N/2
    # score negatively (reference/bm25s/scoring.py:178-187) — well
    # exercised here: most gate-query terms have df > N/2 on this corpus
    q["bm25_topk_robertson_negative"] = (
        lambda spark, sf: _gate_topk(spark, sf, "robertson",
                                     allow_negative=True)
    )
    q["bm25_topk_weight_mask"] = (
        lambda spark, sf: _gate_topk(spark, sf, "lucene", mask=True)
    )
    # the scale path itself (sharded mapInPandas kernel, block-max
    # pruning, distributed weight mask, final merge) against the same
    # double-precision oracle
    q["bm25_topk_lucene_sharded"] = (
        lambda spark, sf: _gate_topk_sharded(spark, sf, "lucene")
    )
    q["bm25_topk_bm25plus_sharded"] = (
        lambda spark, sf: _gate_topk_sharded(spark, sf, "bm25+")
    )
    q["bm25_topk_weight_mask_sharded"] = (
        lambda spark, sf: _gate_topk_sharded(spark, sf, "lucene", mask=True)
    )
    # chunked query streaming (3 queries per kernel pass) must be
    # indistinguishable from the single-broadcast run
    q["bm25_topk_lucene_sharded_chunked"] = (
        lambda spark, sf: _gate_topk_sharded(spark, sf, "lucene", chunk=3)
    )
    q["bm25_topk_lucene_pretokenized"] = _gate_topk_pretokenized
    # pure-JVM tokenizer engine (no Python in the corpus scan) must be
    # indistinguishable from the pandas-UDF build
    q["bm25_topk_lucene_sqltok"] = _gate_topk_sqltok
    # HF-tokenizer bridge (executor-side loader + encode_batch interface
    # + array-typed query path) must match the text path token-for-token
    q["bm25_topk_hf_bridge"] = _gate_topk_hf_bridge
    # boolean-AND retrieval: docs containing EVERY distinct query term
    # (require_all_terms=True); OOV / all-stopword queries → zero rows
    q["bm25_topk_conjunctive"] = _gate_topk_conjunctive
    q["bm25_topk_excluding"] = _gate_topk_excluding

    # minimum_should_match: docs matching ≥2 distinct query terms (the
    # middle ground between OR and the conjunctive gate)
    def min_match_gate(spark, sf):
        from bm25s_spark.operators.boolean import retrieve_min_match

        idx = _index_for(spark, sf)
        qdf = spark.createDataFrame(GATE_QUERIES, "query_id string, text string")
        return retrieve_min_match(idx, qdf, k=TOPK, min_match=2, round_to=4)

    q["bm25_topk_min_match"] = min_match_gate

    # Dirichlet query-likelihood ranking — the LM similarity family
    # (Lucene LMDirichletSimilarity analog) over the SAME index tables
    def qld_gate(spark, sf):
        from bm25s_spark.operators.qld import retrieve_qld

        idx = _index_for(spark, sf)
        qdf = spark.createDataFrame(GATE_QUERIES, "query_id string, text string")
        return retrieve_qld(idx, qdf, k=TOPK, mu=2000.0, round_to=4)

    q["lm_dirichlet_topk"] = qld_gate

    # regexp term query: anchored full-term vocabulary expansion
    def regexp_gate(spark, sf):
        from bm25s_spark.operators.wildcard import regexp_retrieve

        idx = _index_for(spark, sf)
        pdf = spark.createDataFrame(REGEX_QUERIES, "query_id string, pattern string")
        return regexp_retrieve(idx, pdf, k=TOPK, round_to=4)

    q["bm25_topk_regexp"] = regexp_gate

    # mini query language: +must / -not / term^boost in ONE scoring pass
    def querylang_gate(spark, sf):
        from bm25s_spark.operators.querylang import retrieve_parsed

        idx = _index_for(spark, sf)
        qdf = spark.createDataFrame(QL_QUERIES, "query_id string, text string")
        return retrieve_parsed(idx, qdf, k=TOPK, round_to=4)

    q["bm25_topk_querylang"] = querylang_gate

    # query language with wildcard/fuzzy expansion clauses
    def querylang_expand_gate(spark, sf):
        from bm25s_spark.operators.querylang import retrieve_parsed

        idx = _index_for(spark, sf)
        qdf = spark.createDataFrame(EQL_QUERIES, "query_id string, text string")
        return retrieve_parsed(idx, qdf, k=TOPK, round_to=4)

    q["bm25_topk_querylang_expand"] = querylang_expand_gate

    # query language with field:value metadata filters
    def querylang_fields_gate(spark, sf):
        from bm25s_spark.operators.querylang import retrieve_parsed

        idx = _index_for(spark, sf)
        qdf = spark.createDataFrame(FQL_QUERIES, "query_id string, text string")
        meta = idx.doc_lens.select(
            "doc_id",
            F.element_at(
                F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ).alias("role"),
            F.when(F.col("doc_id") % 3 == 2, F.lit("search"))
            .otherwise(F.lit("")).alias("tool"),
        )
        return retrieve_parsed(idx, qdf, k=TOPK, round_to=4, metadata_df=meta)

    q["bm25_topk_querylang_fields"] = querylang_fields_gate

    # query language with field:[lo TO hi] range filters (timestamps +
    # ints — the transcript time-filtering ask), incl. open bounds,
    # negation, and a mixed range + equality query
    def querylang_range_gate(spark, sf):
        from bm25s_spark.operators.querylang import retrieve_parsed

        idx = _index_for(spark, sf)
        qdf = spark.createDataFrame(RQL_QUERIES, "query_id string, text string")
        meta = idx.doc_lens.select(
            "doc_id",
            (F.col("doc_id") % 4).cast("int").alias("turn_idx"),
            (F.lit("2026-01-01 00:00:00").cast("timestamp")
             + F.make_interval(mins=F.col("doc_id"))).alias("ts"),
            F.element_at(
                F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ).alias("role"),
        )
        return retrieve_parsed(idx, qdf, k=TOPK, round_to=4, metadata_df=meta)

    q["bm25_topk_querylang_range"] = querylang_range_gate

    # query language with phrase clauses (positions come from the raw
    # documents table, not the index)
    def querylang_phrase_gate(spark, sf):
        from bm25s_spark.operators.querylang import retrieve_parsed

        idx = _index_for(spark, sf)
        qdf = spark.createDataFrame(PQL_QUERIES, "query_id string, text string")
        return retrieve_parsed(
            idx, qdf, k=TOPK, round_to=4, docs_df=_documents(spark, sf)
        )

    q["bm25_topk_querylang_phrase"] = querylang_phrase_gate

    # distributed retrieval eval: per-query NDCG/recall/precision/AP/RR
    # over the lucene top-k run against arithmetic qrels (grade 2 when
    # doc_id % 23 == query index, else 1 when doc_id % 17 == it)
    def eval_gate(spark, sf):
        from bm25s_spark.operators.evaldf import evaluate_per_query

        idx = _index_for(spark, sf)
        run = _gate_topk(spark, sf, "lucene")
        qi = spark.createDataFrame(
            [(f"q{i:02d}", i) for i in range(1, 9)], "query_id string, qi int"
        )
        qrels = (
            idx.doc_lens.select("doc_id")
            .crossJoin(qi)
            .select(
                "query_id", "doc_id",
                F.when(F.col("doc_id") % 23 == F.col("qi"), 2.0)
                .when(F.col("doc_id") % 17 == F.col("qi"), 1.0)
                .alias("grade"),
            )
            .where(F.col("grade").isNotNull())
        )
        return evaluate_per_query(run, qrels, k=TOPK, round_to=6)

    q["eval_per_query"] = eval_gate

    # one-row macro average of the same run/qrels (unrounded per-query
    # values averaged, rounded once — the driver-side evaluate contract)
    def eval_macro_gate(spark, sf):
        from bm25s_spark.operators.evaldf import evaluate_macro

        idx = _index_for(spark, sf)
        run = _gate_topk(spark, sf, "lucene")
        qi = spark.createDataFrame(
            [(f"q{i:02d}", i) for i in range(1, 9)], "query_id string, qi int"
        )
        qrels = (
            idx.doc_lens.select("doc_id")
            .crossJoin(qi)
            .select(
                "query_id", "doc_id",
                F.when(F.col("doc_id") % 23 == F.col("qi"), 2.0)
                .when(F.col("doc_id") % 17 == F.col("qi"), 1.0)
                .alias("grade"),
            )
            .where(F.col("grade").isNotNull())
        )
        return evaluate_macro(run, qrels, k=TOPK, round_to=6)

    q["eval_macro"] = eval_macro_gate

    # A/B run comparison: the lucene and bm25l gate runs compared at
    # depth TOPK — overlap/jaccard (set), truncated normalized RBO
    # (rank-weighted), Kendall tau over the intersection (order)
    def eval_compare_gate(spark, sf):
        from bm25s_spark.operators.evaldf import compare_runs

        run_a = _gate_topk(spark, sf, "lucene")
        run_b = _gate_topk(spark, sf, "bm25l")
        return compare_runs(run_a, run_b, k=TOPK, p=0.9)

    q["eval_compare_runs"] = eval_compare_gate
    q["search_facet_role"] = _gate_facet_role

    # date-histogram facet: hourly hit counts of the lucene top-k (the
    # _transcripts derivation pins ts = 2026-01-01 + doc_id minutes,
    # which the oracle replays arithmetically)
    def facet_hour_gate(spark, sf):
        from bm25s_spark.operators.facets import date_histogram

        idx = _index_for(spark, sf)
        res = _gate_topk(spark, sf, "lucene")
        docs = idx.doc_lens.select(
            "doc_id",
            (F.lit("2026-01-01 00:00:00").cast("timestamp")
             + F.make_interval(mins=F.col("doc_id"))).alias("ts"),
        )
        return date_histogram(res, docs, interval="hour")

    q["search_facet_hour"] = facet_hour_gate

    # numeric stats facet: doc-length summary of each query's hits
    def facet_stats_gate(spark, sf):
        from bm25s_spark.operators.facets import stats_facet

        idx = _index_for(spark, sf)
        res = _gate_topk(spark, sf, "lucene")
        return stats_facet(res, idx.doc_lens, "dl", round_to=6)

    q["search_facet_stats"] = facet_stats_gate

    # one-row index summary (IndexReader/_stats counters)
    def index_stats_gate(spark, sf):
        from bm25s_spark.indexer import index_stats

        return index_stats(_index_for(spark, sf))

    q["index_stats"] = index_stats_gate
    q["text_trending_terms"] = _gate_trending_terms
    q["knn_mmr_rerank"] = _gate_mmr_rerank

    # corpus taxonomy: cosine-argmax cluster assignment at FIXED
    # arithmetic centroids (the SQL-reproducible configuration — the
    # trained-k-means path is pytest-checked for determinism/purity in
    # tests/test_clustering.py, same split as LSH/IVF recall), plus the
    # per-cluster mix summary and tf-idf-lift keyword labels
    def _cluster_assign_gate(spark, sf):
        from bm25s_spark.operators.clustering import cluster_assign
        from bm25s_spark.operators.similarity import _arith_planes

        return cluster_assign(_embeddings(spark, sf), _arith_planes(64, 8))

    def _cluster_summary_gate(spark, sf):
        from bm25s_spark.operators.clustering import cluster_summary

        return cluster_summary(_cluster_assign_gate(spark, sf))

    def _cluster_keywords_gate(spark, sf):
        from bm25s_spark.operators.clustering import cluster_keywords

        return cluster_keywords(
            _cluster_assign_gate(spark, sf), _documents(spark, sf),
            top_t=5, min_cluster_df=2,
        )

    q["cluster_assign"] = _cluster_assign_gate
    q["cluster_summary"] = _cluster_summary_gate
    q["cluster_keywords"] = _cluster_keywords_gate

    # more-like-this: seed docs → mined top-tf-idf terms → BM25 re-rank
    # (doc→docs composition through the index's own statistics)
    def mlt_gate(spark, sf):
        from bm25s_spark.operators.mlt import more_like_this

        idx = _index_for(spark, sf)
        seeds = spark.createDataFrame(
            [(i,) for i in MLT_SEEDS], "doc_id long"
        )
        return more_like_this(idx, seeds, m_terms=5, k=TOPK, round_to=4)

    q["bm25_topk_more_like_this"] = mlt_gate

    # wildcard retrieval: prefix patterns expand against the vocabulary,
    # the expanded bag re-enters standard BM25 scoring
    def wildcard_gate(spark, sf):
        from bm25s_spark.operators.wildcard import wildcard_retrieve

        idx = _index_for(spark, sf)
        qdf = spark.createDataFrame(
            WILDCARD_QUERIES, "query_id string, text string"
        )
        return wildcard_retrieve(idx, qdf, k=TOPK, round_to=4)

    q["bm25_topk_wildcard"] = wildcard_gate

    # fuzzy retrieval: Levenshtein-1 vocabulary expansion (typo
    # tolerance), expanded bag through standard scoring
    def fuzzy_gate(spark, sf):
        from bm25s_spark.operators.fuzzy import fuzzy_retrieve

        idx = _index_for(spark, sf)
        qdf = spark.createDataFrame(
            FUZZY_QUERIES, "query_id string, text string"
        )
        return fuzzy_retrieve(idx, qdf, k=TOPK, max_edits=1, round_to=4)

    q["bm25_topk_fuzzy"] = fuzzy_gate

    # BM25F multi-field ranking: one doc = one conversation, one field =
    # one turn role, user turns weighted 2.0 / assistant 1.0 / tool 0.5;
    # per-field length normalization combines BEFORE the single k1
    # saturation (NOT a weighted sum of per-field BM25 scores)
    def bm25f_gate(spark, sf):
        from bm25s_spark.operators.bm25f import bm25f_retrieve, build_bm25f

        tdf = _transcripts(spark, sf)
        fidx = build_bm25f(
            tdf,
            field_weights={"user": 2.0, "assistant": 1.0, "tool": 0.5},
        )
        qdf = spark.createDataFrame(GATE_QUERIES, "query_id string, text string")
        return bm25f_retrieve(fidx, qdf, k=TOPK, round_to=4)

    q["bm25f_topk_fields"] = bm25f_gate
    # two-stage pseudo-relevance-feedback retrieval (expand from top-5
    # feedback docs, +3 terms, re-retrieve) — the composition gate for
    # prf_expand + score_all
    q["bm25_topk_prf_expanded"] = _gate_topk_prf
    q["bm25_topk_prf_delta"] = _gate_topk_prf_delta
    # granularity flip: conversation_rollup → build_index → top-k — one
    # document = one CONVERSATION (the input hint's per-turn granularity
    # inverted, which transcript pipelines run both ways); proves the
    # rollup composes with the engine end-to-end
    q["bm25_topk_conv_granularity"] = _gate_topk_conv_granularity
    q["bm25_topk_chunk_granularity"] = _gate_topk_chunk_granularity
    # partitioned build: three independent per-slice indexes merged into
    # one (merge_indexes recomputes df/N/avgdl-dependent impacts exactly)
    # must be indistinguishable from the full-corpus build → same oracle
    q["bm25_topk_merged_index"] = _gate_topk_merged
    # reference-format interop: export to the bm25s CSC .npy layout and
    # import it back — the migration path for existing reference users —
    # must be indistinguishable from the native bm25l build
    q["bm25_topk_imported_roundtrip"] = _gate_topk_imported
    # delete lifecycle: tombstone view (stats frozen, candidates
    # filtered) and compaction (stats re-derived, no re-tokenize)
    q["bm25_topk_tombstoned"] = _gate_topk_tombstoned
    q["bm25_topk_compacted"] = _gate_topk_compacted
    # Lucene explain() analog: per-term contribution rows for the top-k
    q["explain_contributions"] = _gate_explain
    # thesaurus expansion with fractional multiplicities (bm25+ nnoc)
    q["bm25_topk_synonyms"] = _gate_topk_synonyms
    # prefix autocomplete over the vocabulary
    q["search_suggest"] = _gate_suggest

    # did-you-mean: closest vocabulary term per query token (distance
    # asc, df desc, term asc), NULL when nothing within 2 edits
    def dym_gate(spark, sf):
        from bm25s_spark.operators.spell import did_you_mean

        idx = _index_for(spark, sf)
        qdf = spark.createDataFrame(
            FUZZY_QUERIES, "query_id string, text string"
        )
        return did_you_mean(idx, qdf, max_edits=2, min_token_len=3)

    q["search_did_you_mean"] = dym_gate
    # mean-pooled conversation embeddings → exact cosine top-k
    q["knn_conv_pooled"] = _gate_knn_conv_pooled
    # recency boost: score × 2^(-age/half_life) from the turn ts
    q["bm25_topk_recency"] = _gate_topk_recency
    # metadata filter: only user turns may rank, stats corpus-wide
    q["bm25_topk_filtered_role"] = _gate_topk_filtered_role
    # field collapse: best turn per conversation, groups ranked by it
    q["search_collapse_conv"] = _gate_collapse_conv
    # percolation: documents matched against stored queries (alerting)
    q["search_percolate"] = _gate_percolate
    # keyset pagination: page 2 via search_after == ranks k+1..2k
    q["bm25_topk_page2"] = _gate_topk_page2

    # significant terms (ES significant_terms / JLH): which vocabulary
    # terms are over-represented in each query's top-k hit set relative
    # to the whole corpus — foreground df from the hits joined against
    # the postings, background df from term_stats
    def sigterms_gate(spark, sf):
        from bm25s_spark.operators.sigterms import significant_terms

        idx = _index_for(spark, sf)
        res = _gate_topk(spark, sf, "lucene")
        return significant_terms(idx, res, top_n=5, round_to=6)

    q["search_significant_terms"] = sigterms_gate

    # ---- index internals ----
    def term_stats(spark, sf):
        idx = _index_for(spark, sf)
        n = idx.num_docs
        from bm25s_spark import scoring

        ts = idx.term_stats.where(F.col("df") > 0)
        out = ts.select(
            "term",
            F.col("df").cast("long").alias("df"),
            *[
                F.round(
                    scoring.idf_expr(m, F.col("df"), n), 6
                ).alias(f"idf_{_SLUG[m]}")
                for m in ("robertson", "lucene", "atire", "bm25l", "bm25+")
            ],
        )
        return out

    q["term_stats_idf"] = term_stats

    def doc_lengths(spark, sf):
        idx = _index_for(spark, sf)
        return idx.doc_lens.select("doc_id", F.col("dl").cast("long").alias("dl"))

    q["doc_lengths"] = doc_lengths

    def corpus_stats(spark, sf):
        idx = _index_for(spark, sf)
        return spark.createDataFrame(
            [(idx.num_docs, round(idx.avg_doc_len, 6))],
            "num_docs long, avgdl double",
        )

    q["corpus_stats"] = corpus_stats

    def doc_tf(spark, sf):
        idx = _index_for(spark, sf)
        return idx.postings.select(
            "doc_id", "term", F.col("tf").cast("long").alias("tf")
        )

    q["doc_term_frequencies"] = doc_tf

    # keyword extraction: per-doc top-3 terms by tf·ln(N/df), reusing
    # the postings table's (tf, df) — deterministic (rounded score,
    # term-asc ties), so the DuckDB twin replays it exactly
    def top_terms(spark, sf):
        from bm25s_spark.operators.keywords import top_terms_per_doc

        idx = _index_for(spark, sf)
        return top_terms_per_doc(idx, k=3).select(
            "doc_id", "rank", "term",
            F.col("tf").cast("long").alias("tf"), "tfidf",
        )

    q["index_top_terms"] = top_terms

    # term vectors (ES _termvectors): the doc-major view of the index
    # for the MLT seed docs — per-(doc, term) tf, corpus df, lucene idf
    def termvec_gate(spark, sf):
        from bm25s_spark.operators.termvectors import term_vectors

        idx = _index_for(spark, sf)
        return term_vectors(idx, MLT_SEEDS, idf_method="lucene", round_to=6)

    q["index_term_vectors"] = termvec_gate

    # ---- dedup family ----
    q["dedup_exact_groups"] = lambda spark, sf: dedup.exact_duplicates(
        _documents(spark, sf)
    )
    q["dedup_minhash_signatures"] = lambda spark, sf: dedup.minhash_signatures(
        _documents(spark, sf), num_hashes=8
    )
    q["dedup_minhash_lsh_pairs"] = lambda spark, sf: dedup.minhash_lsh_candidates(
        _documents(spark, sf), num_hashes=8, bands=4
    ).select("doc_a", "doc_b", F.col("band").cast("int").alias("band"))
    q["dedup_ngram_jaccard"] = lambda spark, sf: dedup.ngram_jaccard_pairs(
        _documents(spark, sf), n=3, threshold=0.5
    ).select(
        "doc_a", "doc_b",
        F.col("common").cast("long").alias("common"),
        F.col("size_a").cast("long").alias("size_a"),
        F.col("size_b").cast("long").alias("size_b"),
        F.round("jaccard", 4).alias("jaccard"),
    )
    # pairwise hits → duplicate GROUPS: iterative min-label propagation
    # (deterministic fixpoint), oracle-checked against a recursive-CTE
    # transitive closure
    q["dedup_components"] = lambda spark, sf: dedup.duplicate_components(
        dedup.minhash_lsh_candidates(_documents(spark, sf), num_hashes=8, bands=4)
    )
    # the end-to-end composition a pipeline actually calls: LSH pairs →
    # components → one left_anti dropping non-canonical cluster members
    q["dedup_near_end_to_end"] = lambda spark, sf: dedup.deduplicate_near(
        _documents(spark, sf), num_hashes=8, bands=4
    ).select("doc_id")

    q["dedup_simhash"] = lambda spark, sf: dedup.simhash_signatures(
        _documents(spark, sf), bits=16
    )
    # simhash near-dup pairs: the banded join is fully deterministic, so
    # it gets a full DuckDB oracle (banding + hamming twin)
    q["dedup_simhash_pairs"] = lambda spark, sf: dedup.simhash_near_duplicates(
        _documents(spark, sf), max_hamming=3, bits=48, bands=4
    ).select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming"))
    # the 64-bit DEFAULT configuration (seed-8 high bits 48-63, sign-bit
    # packing): oracle-checks the second-hash bit layout end-to-end
    q["dedup_simhash_pairs64"] = lambda spark, sf: dedup.simhash_near_duplicates(
        _documents(spark, sf), max_hamming=3, bits=64, bands=4
    ).select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming"))

    # paragraph-granularity dedup (CCNet keep-first): disjoint 3-token
    # windows stand in for paragraphs on the newline-free synthetic
    # corpus (the sf0.01 table has ~1.7k duplicated trigram windows, so
    # the keep/drop machinery is genuinely exercised); newline splitting
    # is pytest-covered (`test_dedup_lines`)
    q["dedup_paragraphs"] = lambda spark, sf: dedup.dedup_chunk_windows(
        _documents(spark, sf), chunk_size=3, keep="first"
    )

    # ---- phrase / proximity search (positional index) ----
    def phrase_gate(spark, sf):
        from bm25s_spark.operators.phrase import phrase_topk

        qdf = spark.createDataFrame(
            PHRASE_QUERIES, "query_id string, text string"
        )
        return phrase_topk(_documents(spark, sf), qdf, k=TOPK)

    q["phrase_match_topk"] = phrase_gate

    def prox_gate(spark, sf):
        from bm25s_spark.operators.phrase import proximity_match

        qdf = spark.createDataFrame(
            PHRASE_QUERIES, "query_id string, text string"
        )
        return proximity_match(_documents(spark, sf), qdf, window=5)

    q["phrase_proximity"] = prox_gate

    def snippets_gate(spark, sf):
        from bm25s_spark.operators.snippets import snippets

        qdf = spark.createDataFrame(
            PHRASE_QUERIES, "query_id string, text string"
        )
        return snippets(_documents(spark, sf), qdf, window=6)

    q["search_snippets"] = snippets_gate

    # ---- similarity search ----
    # round_to=4 ranks on the ROUNDED cosine (the oracle's own order:
    # round(...) feeds its row_number window), so a rounded tie group
    # spanning the k boundary resolves by vec_id asc on both engines —
    # at sf0.001 the unrounded Spark ranking picked different tie
    # members than the oracle (pre-existing in round 5; fixed here)
    def knn_brute(spark, sf):
        emb = _embeddings(spark, sf)
        qv = emb.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), F.col("embedding")
        )
        res = similarity.brute_force_knn(emb, qv, k=5, round_to=4)
        return res.select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("rank").cast("int").alias("rank"),
            "vec_id",
            F.round("cosine", 4).alias("cosine"),
        )

    q["knn_cosine_brute"] = knn_brute

    # LSH ANN through the *full* machinery (multi-table hashing, probe
    # expansion, bucket join, dedup, exact re-score, top-k) at a
    # provably-complete probe radius (multiprobe = n_planes probes every
    # bucket), so the result equals brute force BY CONSTRUCTION and the
    # exact-top-k SQL oracle hash-checks the whole pipeline.  Recall at
    # non-trivial radii is pytest-asserted vs brute force
    # (tests/test_operators.py::test_lsh_knn_recall).
    def knn_lsh(spark, sf):
        emb = _embeddings(spark, sf)
        qv = emb.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), F.col("embedding")
        )
        res = similarity.lsh_knn(
            emb, qv, k=5, n_planes=4, n_tables=2, multiprobe=4,
            round_to=4,
        )
        return res.select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("rank").cast("int").alias("rank"),
            "vec_id",
            F.round("cosine", 4).alias("cosine"),
        )

    q["knn_cosine_lsh"] = knn_lsh

    # IVF through the full machinery (k-means training on the hashed
    # sample, Arrow matmul assignment, probe join, re-score) probing ALL
    # cells — candidate coverage complete by construction, result equals
    # brute force, oracle-checkable.  Non-trivial n_probe recall is
    # pytest-asserted (tests/test_operators.py::test_ivf_knn_recall).
    def knn_ivf(spark, sf):
        emb = _embeddings(spark, sf)
        qv = emb.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), F.col("embedding")
        )
        res = similarity.ivf_knn(emb, qv, k=5, n_centroids=16, n_probe=16,
                                 round_to=4)
        return res.select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("rank").cast("int").alias("rank"),
            "vec_id",
            F.round("cosine", 4).alias("cosine"),
        )

    q["knn_cosine_ivf"] = knn_ivf

    # int8 scalar-quantized brute kNN: the quantizer (floor(x/s + 0.5)
    # clamp) and the integer-exact cosine are bit-reproducible in SQL,
    # so the full quantized ranking gets its own DuckDB twin (exact-
    # rescore recall is pytest-asserted: test_quantized_knn_rescore)
    def knn_quantized(spark, sf):
        emb = _embeddings(spark, sf)
        qv = emb.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), F.col("embedding")
        )
        res = similarity.quantized_knn(emb, qv, k=5)
        return res.select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("rank").cast("int").alias("rank"),
            "vec_id",
            F.round("cosine", 4).alias("cosine"),
        )

    q["knn_cosine_quantized"] = knn_quantized

    # banded-LSH embedding near-duplicates: deterministic arithmetic
    # hyperplanes make the banding reproducible in SQL, so candidate
    # generation + exact-cosine filter get a full DuckDB twin
    q["dedup_cosine_near_dup"] = lambda spark, sf: similarity.cosine_near_duplicates(
        _embeddings(spark, sf), threshold=0.4, n_planes=16, bands=4
    ).select("vec_a", "vec_b", F.round("cosine", 4).alias("cosine"))

    # ---- hybrid retrieval (RRF fusion of BM25 ⊕ cosine kNN) ----
    # gate query vectors: embeddings vec_id<8 stand in for the dense
    # encodings of GATE_QUERIES (vec_id i ↔ q%02d), matching the knn
    # entries' convention; both sides use the rounded-rank contract so
    # the fused order is FP-stable cross-engine
    def hybrid_rrf(spark, sf):
        from bm25s_spark.operators.hybrid import rrf_fuse

        bm25 = _gate_topk(spark, sf, "lucene").select("query_id", "doc_id", "rank")
        emb = _embeddings(spark, sf)
        qv = emb.where(F.col("vec_id") < 8).select(
            F.format_string("q%02d", (F.col("vec_id") + 1).cast("int")).alias("query_id"),
            F.col("embedding"),
        )
        kn = similarity.brute_force_knn(emb, qv, k=2 * TOPK)
        kw = Window.partitionBy("query_id").orderBy(
            F.round(F.col("cosine"), 4).desc(), F.col("vec_id").asc()
        )
        kn = (
            kn.withColumn("rank", F.row_number().over(kw).cast("int"))
            .where(F.col("rank") <= TOPK)
            .select("query_id", F.col("vec_id").alias("doc_id"), "rank")
        )
        return rrf_fuse([bm25, kn], k=TOPK, rrf_k=60, round_to=6)

    q["retrieval_hybrid_rrf"] = hybrid_rrf

    # score-based hybrid: min-max-normalize each system's (rounded)
    # scores per query, fuse 0.7·BM25 + 0.3·cosine — same query/vector
    # pairing as the RRF entry, but magnitudes survive the fusion
    def hybrid_linear(spark, sf):
        from bm25s_spark.operators.hybrid import linear_fuse

        bm25 = _gate_topk(spark, sf, "lucene").select(
            "query_id", "doc_id", "score"
        )
        emb = _embeddings(spark, sf)
        qv = emb.where(F.col("vec_id") < 8).select(
            F.format_string("q%02d", (F.col("vec_id") + 1).cast("int")).alias("query_id"),
            F.col("embedding"),
        )
        kn = similarity.brute_force_knn(emb, qv, k=TOPK)
        kw = Window.partitionBy("query_id").orderBy(
            F.round(F.col("cosine"), 4).desc(), F.col("vec_id").asc()
        )
        kn = (
            kn.withColumn("rank", F.row_number().over(kw).cast("int"))
            .where(F.col("rank") <= TOPK)
            .select(
                "query_id", F.col("vec_id").alias("doc_id"),
                F.round("cosine", 4).alias("score"),
            )
        )
        return linear_fuse([bm25, kn], k=TOPK, weights=[0.7, 0.3], round_to=6)

    q["retrieval_hybrid_linear"] = hybrid_linear

    # ---- text analysis ----
    q["text_token_stats"] = lambda spark, sf: with_token_stats(
        _documents(spark, sf)
    ).select("doc_id", "n_chars_text", "n_ws_tokens", "n_regex_tokens",
             "n_bpe_tokens")
    q["text_quality"] = lambda spark, sf: with_quality(
        _documents(spark, sf)
    ).select(
        "doc_id", F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round("stopword_ratio", 4).alias("stopword_ratio"),
        F.round("alpha_ratio", 4).alias("alpha_ratio"),
        F.round("mean_token_len", 4).alias("mean_token_len"),
        F.round("quality_score", 4).alias("quality_score"),
    )
    q["text_lang_id"] = lambda spark, sf: with_lang_id(
        _documents(spark, sf)
    ).select("doc_id", "lang_guess")
    q["text_fingerprint"] = lambda spark, sf: with_fingerprint(
        _documents(spark, sf)
    ).select("doc_id", "fp_md5", "fp_head")

    # per-document cross-entropy under the add-0.5-smoothed corpus
    # unigram model (CCNet-style LM quality signal); the DuckDB twin
    # replays the identical tokenization + arithmetic
    def text_lm(spark, sf):
        from bm25s_spark.operators.lm import with_lm_score

        return with_lm_score(_documents(spark, sf), round_to=4).select(
            "doc_id",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            "cross_entropy",
        )

    q["text_lm_score"] = text_lm

    # top-20 PMI collocations (adjacent-bigram association mining);
    # PMI rounded before ranking so the top-k boundary is FP-stable
    def text_pmi(spark, sf):
        from bm25s_spark.operators.collocations import pmi_collocations

        return pmi_collocations(
            _documents(spark, sf), min_count=5, k=20, round_to=4
        )

    q["text_pmi_collocations"] = text_pmi

    # Gopher-style repetition signals over a deterministic multi-line
    # rebuild of documents.text (5-token lines + the first line repeated,
    # so line-duplication signals are non-trivially nonzero); the DuckDB
    # twin regenerates the identical text and replays every signal
    def text_repetition(spark, sf):
        d = _documents(spark, sf).withColumn("_t", F.split(F.col("text"), " "))
        n_l = F.ceil(F.size(F.col("_t")) / F.lit(5.0)).cast("int")
        lines = F.transform(
            F.sequence(F.lit(0), n_l - F.lit(1)),
            lambda i: F.array_join(
                F.slice(F.col("_t"), i * F.lit(5) + F.lit(1), F.lit(5)), " "
            ),
        )
        d = (
            d.withColumn("_ls", lines)
            .withColumn(
                "text2",
                F.concat(
                    F.array_join(F.col("_ls"), "\n"), F.lit("\n"),
                    F.element_at(F.col("_ls"), 1),
                ),
            )
            .select("doc_id", "text2")
        )
        r = with_repetition(d, text_col="text2")
        return r.select(
            "doc_id",
            F.col("n_lines").cast("int").alias("n_lines"),
            F.round("dup_line_frac", 4).alias("dup_line_frac"),
            F.round("dup_line_char_frac", 4).alias("dup_line_char_frac"),
            F.round("dup_word_frac", 4).alias("dup_word_frac"),
            "top_2gram",
            F.col("top_2gram_cnt").cast("int").alias("top_2gram_cnt"),
            F.round("top_2gram_char_frac", 4).alias("top_2gram_char_frac"),
            "top_3gram",
            F.col("top_3gram_cnt").cast("int").alias("top_3gram_cnt"),
            F.round("top_3gram_char_frac", 4).alias("top_3gram_char_frac"),
        )

    q["text_repetition"] = text_repetition

    # Gopher quality-filter composition over the same multi-line rebuild
    # with deterministic anomaly injections (doc_id%5 → bullet lines,
    # %7 → ellipsis line endings, %11 → an appended symbol-only line) so
    # every rule family fires on some slice of the corpus; thresholds
    # loosened (min_words=20, min_stop_word_hits=1) to split this
    # 10-99-token synthetic corpus non-trivially.  All ratios are exact
    # integer divisions → threshold comparisons are FP-identical in the
    # DuckDB twin; drop_reasons is emitted comma-joined in the fixed
    # rule order
    def text_gopher(spark, sf):
        from bm25s_spark.functions.text import gopher_filter

        d = _documents(spark, sf).withColumn("_t", F.split(F.col("text"), " "))
        n_l = F.ceil(F.size(F.col("_t")) / F.lit(5.0)).cast("int")
        lines = F.transform(
            F.sequence(F.lit(0), n_l - F.lit(1)),
            lambda i: F.array_join(
                F.slice(F.col("_t"), i * F.lit(5) + F.lit(1), F.lit(5)), " "
            ),
        )
        d = d.withColumn("_ls", lines)
        d = d.withColumn(
            "_ls",
            F.when(
                F.col("doc_id") % 5 == 0,
                F.transform(F.col("_ls"), lambda l: F.concat(F.lit("- "), l)),
            ).otherwise(F.col("_ls")),
        )
        d = d.withColumn(
            "_ls",
            F.when(
                F.col("doc_id") % 7 == 0,
                F.transform(F.col("_ls"), lambda l: F.concat(l, F.lit("..."))),
            ).otherwise(F.col("_ls")),
        )
        d = d.withColumn(
            "text2",
            F.concat(
                F.array_join(F.col("_ls"), "\n"), F.lit("\n"),
                F.element_at(F.col("_ls"), 1),
            ),
        )
        d = d.withColumn(
            "text2",
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(F.col("text2"), F.lit("\n### ### ### … ... … ...")),
            ).otherwise(F.col("text2")),
        ).select("doc_id", "text2")
        g = gopher_filter(
            d, text_col="text2", min_words=20, min_stop_word_hits=1
        )
        return g.select(
            "doc_id",
            F.col("keep").cast("int").alias("keep"),
            F.array_join(F.col("drop_reasons"), ",").alias("drop_reasons"),
            F.col("n_words").cast("int").alias("n_words"),
            F.round("mean_word_len", 4).alias("mean_word_len"),
            F.round("symbol_word_ratio", 4).alias("symbol_word_ratio"),
            F.round("bullet_start_frac", 4).alias("bullet_start_frac"),
            F.round("ellipsis_end_frac", 4).alias("ellipsis_end_frac"),
            F.round("alpha_word_frac", 4).alias("alpha_word_frac"),
            F.col("stop_word_hits").cast("int").alias("stop_word_hits"),
        )

    q["text_gopher_filter"] = text_gopher

    # PII redaction + whitespace normalization over documents.text with
    # deterministically injected e-mail / URL / digit-run / messy
    # whitespace (regexes are RE2-compatible, so the DuckDB twin runs
    # the exact same patterns)
    def text_redact(spark, sf):
        d = _documents(spark, sf).withColumn(
            "text2",
            F.concat(
                F.lit("contact user"), F.col("doc_id").cast("string"),
                F.lit("@example.com or see https://ex.org/d/"),
                F.col("doc_id").cast("string"),
                F.lit("?sid=55555555 \t id 123456789 and  "), F.col("text"),
            ),
        ).select("doc_id", "text2")
        d = with_redacted(d, text_col="text2")
        d = with_normalized(d, text_col="text2_redacted", out_col="text_clean")
        return d.select(
            "doc_id", F.col("text2_redacted").alias("text_redacted"),
            "text_clean",
        )

    q["text_redact"] = text_redact

    # ---- decontamination: n-gram collision vs a derived benchmark ----
    # benchmark = every 97th document truncated to its first 12
    # normalized tokens (a deterministic stand-in for an eval set);
    # a doc is contaminated if it shares >= 1 distinct 5-gram
    def _bench(spark, sf):
        from bm25s_spark.operators.dedup import normalize_text

        return (
            _documents(spark, sf)
            .where(F.col("doc_id") % 97 == 0)
            .select(
                F.col("doc_id").alias("bench_id"),
                F.array_join(
                    F.slice(
                        F.split(normalize_text(F.col("text")), " "),
                        1, 12,
                    ),
                    " ",
                ).alias("text"),
            )
        )

    def decontam_report(spark, sf):
        from bm25s_spark.operators.decontam import contamination_report

        return contamination_report(
            _documents(spark, sf), _bench(spark, sf), n=5, min_hits=1
        ).select("doc_id", "n_shared_ngrams", "n_bench_docs")

    q["decontam_report"] = decontam_report

    def decontam_kept(spark, sf):
        from bm25s_spark.operators.decontam import decontaminate

        return decontaminate(
            _documents(spark, sf), _bench(spark, sf), n=5, min_hits=1
        ).select("doc_id")

    q["decontam_kept"] = decontam_kept

    # ---- deterministic hash split (content-stable train/val/test) ----
    def sample_hash_split(spark, sf):
        from bm25s_spark.operators.sampling import hash_bucket, hash_split

        d = _documents(spark, sf).select("doc_id")
        return hash_split(
            d, {"train": 8, "val": 1, "test": 1}, seed="gate"
        ).withColumn("bucket", hash_bucket("doc_id", seed="gate")).select(
            "doc_id", "bucket", "split"
        )

    q["sample_hash_split"] = sample_hash_split

    # ---- end-to-end curation pipeline (filter → exact dedup →
    # decontaminate → split); each stage's oracle already exists and the
    # twin composes them in the same order.  Raw documents.text (no
    # injections): the line-shaped rules are replayed but trivially
    # non-firing on this single-line corpus
    def curate_pipeline(spark, sf):
        from bm25s_spark.operators.curate import curate_corpus

        out = curate_corpus(
            _documents(spark, sf),
            quality_kwargs=dict(min_words=20, min_stop_word_hits=1),
            dedup="exact",
            benchmark=_bench(spark, sf),
            decontam_kwargs=dict(n=5, min_hits=1),
            splits={"train": 8, "val": 1, "test": 1},
            split_seed="gate",
        )
        return out.select("doc_id", "split")

    q["curate_pipeline"] = curate_pipeline

    # ---- stratified mixing: per-language deterministic keep fraction ----
    # epoch-weighted upsampling: stratum "0" → 2.5 epochs, "1" → 1,
    # "2" → 0.25; the fractional extra copy is the same keyed-md5 bucket
    # the split/sample family uses, so DuckDB replays it exactly
    def sample_upsample(spark, sf):
        from bm25s_spark.operators.sampling import upsample_corpus

        d = _documents(spark, sf).withColumn(
            "stratum", (F.col("doc_id") % 3).cast("string")
        )
        return upsample_corpus(
            d, {"0": 2.5, "1": 1.0, "2": 0.25}, "stratum"
        ).select("doc_id", "stratum", F.col("epoch").cast("int").alias("epoch"))

    q["sample_upsample"] = sample_upsample

    def sample_stratified(spark, sf):
        from bm25s_spark.operators.sampling import stratified_hash_sample

        d = _documents(spark, sf).select("doc_id", "lang")
        return stratified_hash_sample(
            d, {"en": 1.0, "es": 0.5, "de": 0.25}, "lang",
            seed="mix", default_fraction=0.1,
        )

    q["sample_stratified"] = sample_stratified

    # ---- context-window chunking (32-token windows, 8-token overlap) ----
    def chunk_docs(spark, sf):
        from bm25s_spark.operators.chunking import chunk_documents

        return chunk_documents(
            _documents(spark, sf), chunk_size=32, overlap=8
        )

    q["chunk_documents"] = chunk_docs

    # ---- sequence packing (128-token bins, 8 hash groups) ----
    def pack_docs(spark, sf):
        from bm25s_spark.operators.packing import pack_sequences

        return pack_sequences(
            _documents(spark, sf), max_tokens=128, n_groups=8
        )

    q["pack_sequences"] = pack_docs

    # ---- transcripts: conversation-level rollup (granularity flip) ----
    def conv_rollup(spark, sf):
        from bm25s_spark.transcripts import conversation_rollup

        t = _transcripts(spark, sf)
        return conversation_rollup(t).select(
            "conv_id", "conv_text",
            F.col("n_turns").cast("long").alias("n_turns"),
            F.col("n_user_turns").cast("long").alias("n_user_turns"),
            F.col("n_assistant_turns").cast("long").alias("n_assistant_turns"),
            F.col("n_chars").cast("long").alias("n_chars"),
            F.col("first_turn").cast("int").alias("first_turn"),
            F.col("last_turn").cast("int").alias("last_turn"),
        )

    q["transcripts_conv_rollup"] = conv_rollup

    # ---- events: gap sessionization (one shuffle, window prefix-scan) ----
    def events_sessions(spark, sf):
        from bm25s_spark.operators.events import session_summary

        ev = spark.read.parquet(os.path.join(sf, "events.parquet"))
        s = session_summary(ev, gap_minutes=30)
        return s.select(
            "user_id",
            F.col("session_idx").cast("int").alias("session_idx"),
            "session_start", "session_end",
            F.col("n_events").cast("long").alias("n_events"),
            F.round("sum_value", 4).alias("sum_value"),
            F.col("duration_us").cast("long").alias("duration_us"),
        )

    q["events_sessionize"] = events_sessions

    # the streaming sessionizer's batch form (session_window grouping):
    # same gap semantics as the lag-based operator (exactly-gap merges),
    # session keyed by (user, window_start) instead of a running index
    def events_session_window(spark, sf):
        from bm25s_spark.streaming.sessions import session_window_rollup

        ev = spark.read.parquet(os.path.join(sf, "events.parquet"))
        s = session_window_rollup(ev, gap="30 minutes")
        return s.select(
            "user_id", "window_start", "window_end",
            "session_start", "session_end",
            F.col("n_events").cast("long").alias("n_events"),
            F.round("sum_value", 4).alias("sum_value"),
        )

    q["events_session_window"] = events_session_window

    # ---- events: as-of join (click ← latest preceding view per user);
    # the DuckDB twin is its NATIVE ASOF LEFT JOIN, an independent
    # implementation of the same published semantics.  gap_us as integer
    # micros (timestampdiff on NTZ — no float seconds, no tz cast)
    def events_asof(spark, sf):
        from bm25s_spark.operators.asof import asof_join

        ev = spark.read.parquet(os.path.join(sf, "events.parquet"))
        clicks = ev.where(F.col("event_type") == "click").select(
            "event_id", "ts", "user_id", "value"
        )
        views = ev.where(F.col("event_type") == "view").select(
            "ts", "user_id", "event_id", "value"
        )
        out = asof_join(
            clicks, views, on="ts", by=["user_id"],
            right_cols=["event_id", "value"],
        )
        return out.select(
            "event_id",
            "user_id",
            "ts",
            F.col("ts_right").alias("view_ts"),
            F.col("event_id_right").alias("view_event_id"),
            F.round("value_right", 4).alias("view_value"),
            F.expr(
                "timestampdiff(MICROSECOND, ts_right, ts)"
            ).cast("long").alias("gap_us"),
        )

    q["events_asof_join"] = events_asof

    # ---- events: tumbling-window rollup (streaming-shaped agg) ----
    def events_hourly(spark, sf):
        ev = spark.read.parquet(os.path.join(sf, "events.parquet"))
        return (
            ev.groupBy(
                F.date_trunc("hour", F.col("ts")).alias("hour"),
                "event_type",
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 4).alias("sum_value"),
            )
        )

    q["events_hourly_rollup"] = events_hourly

    # ---- transcripts: per-speaker turn-taking analytics ----
    def speaker_stats_gate(spark, sf):
        from bm25s_spark.transcripts import speaker_stats

        return speaker_stats(_transcripts(spark, sf))

    q["transcripts_speaker_stats"] = speaker_stats_gate

    # ---- corpus drift: term movers + divergence summary between two
    # snapshot halves (even vs odd doc ids — deterministic split) ----
    def term_drift_gate(spark, sf):
        from bm25s_spark.operators.drift import term_drift

        d = _documents(spark, sf)
        return term_drift(
            d.where(F.col("doc_id") % 2 == 0),
            d.where(F.col("doc_id") % 2 == 1),
            top_t=20,
        )

    q["corpus_term_drift"] = term_drift_gate

    def drift_summary_gate(spark, sf):
        from bm25s_spark.operators.drift import distribution_divergence

        d = _documents(spark, sf)
        return distribution_divergence(
            d.where(F.col("doc_id") % 2 == 0),
            d.where(F.col("doc_id") % 2 == 1),
        )

    q["corpus_drift_summary"] = drift_summary_gate

    # ---- search ops: per-query index-coverage report (OOV + zero-hit) ----
    def query_coverage_gate(spark, sf):
        from bm25s_spark.operators.coverage import query_coverage

        idx = _index_for(spark, sf)
        qdf = spark.createDataFrame(GATE_QUERIES, "query_id string, text string")
        return query_coverage(idx, qdf)

    q["search_query_coverage"] = query_coverage_gate

    return q


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}
    for m in ("robertson", "lucene", "atire", "bm25l", "bm25+"):
        o[f"bm25_topk_{_SLUG[m]}"] = _bm25_oracle_sql(m)
    o["bm25_topk_atire_robertson"] = _bm25_oracle_sql("atire", "robertson")
    o["bm25_topk_robertson_negative"] = _bm25_oracle_sql(
        "robertson", "robertson-neg"
    )
    o["bm25_topk_weight_mask"] = _bm25_oracle_sql("lucene", mask=True)
    o["bm25_topk_lucene_sharded"] = _bm25_oracle_sql("lucene", shard_round=True)
    o["bm25_topk_bm25plus_sharded"] = _bm25_oracle_sql("bm25+", shard_round=True)
    o["bm25_topk_weight_mask_sharded"] = _bm25_oracle_sql(
        "lucene", mask=True, shard_round=True
    )
    o["bm25_topk_lucene_sharded_chunked"] = _bm25_oracle_sql(
        "lucene", shard_round=True
    )
    o["bm25_topk_lucene_pretokenized"] = _bm25_oracle_sql("lucene")
    o["bm25_topk_lucene_sqltok"] = _bm25_oracle_sql("lucene")
    o["bm25_topk_hf_bridge"] = _bm25_oracle_sql("lucene")
    # the interop round trip is lossless at float64, so the imported
    # index must reproduce the native bm25l ranking exactly
    o["bm25_topk_imported_roundtrip"] = _bm25_oracle_sql("bm25l")
    o["bm25_topk_conjunctive"] = _bm25_oracle_sql("lucene", conjunctive=True)
    o["bm25_topk_excluding"] = _bm25_oracle_sql("lucene", exclude=True)
    # hourly trending terms with previous-window counts (the _transcripts
    # ts derivation replayed: 2026-01-01 + doc_id minutes)
    o["text_trending_terms"] = f"""
WITH docs AS (
  SELECT TIMESTAMP '2026-01-01 00:00:00'
           + CAST(doc_id AS INT) * INTERVAL 1 MINUTE AS ts,
         lower(text) AS t
  FROM documents
),
tok_raw AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
         unnest(regexp_extract_all(t, '\\w\\w+')) AS term
  FROM docs
),
counts AS (
  SELECT window_start, term, count(*) AS n
  FROM tok_raw WHERE term NOT IN ({_SW_SQL})
  GROUP BY 1, 2
),
ranked AS (
  SELECT window_start, term, n,
         CAST(row_number() OVER (
           PARTITION BY window_start ORDER BY n DESC, term ASC
         ) AS INTEGER) AS rank
  FROM counts
)
SELECT r.window_start, r.term, r.n,
       coalesce(p.n, 0) AS prev_n, r.rank
FROM ranked r
LEFT JOIN counts p
  ON p.window_start + INTERVAL 1 HOUR = r.window_start AND p.term = r.term
WHERE r.rank <= 5
"""
    # faceted composition: counts of the lucene top-k by turn role
    o["search_facet_role"] = f"""
SELECT query_id, facet, n_docs,
       CAST(row_number() OVER (
         PARTITION BY query_id ORDER BY n_docs DESC, facet ASC
       ) AS INTEGER) AS rank
FROM (
  SELECT query_id,
         CASE CAST(doc_id % 3 AS INT)
           WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool'
         END AS facet,
         count(*) AS n_docs
  FROM ({_bm25_oracle_sql("lucene")})
  GROUP BY 1, 2
)
"""
    # date-histogram twin: ts regenerated from doc_id arithmetic, the
    # same calendar truncation, sparse buckets only
    o["search_facet_hour"] = f"""
WITH hits AS (
  SELECT query_id, doc_id FROM ({_bm25_oracle_sql("lucene")})
)
SELECT query_id,
       date_trunc('hour', TIMESTAMP '2026-01-01 00:00:00'
                  + doc_id * INTERVAL 1 MINUTE) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs
FROM hits GROUP BY 1, 2
"""
    # stats-facet twin: dl summary per query over the hit set (dl from
    # the shared tokenization CTEs)
    o["search_facet_stats"] = _bm25_common_cte("lucene") + f""",
hits AS (
  SELECT query_id, doc_id FROM ({_bm25_oracle_sql("lucene")})
)
SELECT h.query_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(dl.dl) AS min, max(dl.dl) AS max,
       round(sum(dl.dl), 6) AS sum, round(avg(dl.dl), 6) AS avg
FROM hits h JOIN dl ON dl.doc_id = h.doc_id
GROUP BY h.query_id
"""
    # index-stats twin: the same counters off the shared tokenization
    # CTEs (num_terms excludes the "" OOV patch by construction)
    o["index_stats"] = _bm25_common_cte("lucene") + """
SELECT (SELECT CAST(count(*) AS BIGINT) FROM dl) AS num_docs,
       (SELECT CAST(count(*) AS BIGINT) FROM dfreq) AS num_terms,
       (SELECT CAST(count(*) AS BIGINT) FROM tf) AS num_postings,
       (SELECT CAST(sum(tf) AS BIGINT) FROM tf) AS sum_tf,
       (SELECT CAST(max(dl) AS BIGINT) FROM dl) AS max_dl,
       (SELECT CAST(max(df) AS BIGINT) FROM dfreq) AS max_df,
       (SELECT round(avg(dl), 6) FROM dl) AS avgdl
"""
    # significant-terms twin: lucene top-k as the foreground doc set,
    # per-term foreground df vs corpus df, JLH lift rounded to 6 before
    # the (score desc, term asc) rank cut — identical double arithmetic
    # on both engines (same integer-derived inputs)
    o["search_significant_terms"] = _bm25_common_cte("lucene") + f""",
hits AS (
  SELECT query_id, doc_id FROM ({_bm25_oracle_sql("lucene")})
),
fgsz AS (
  SELECT query_id, CAST(count(*) AS DOUBLE) AS fg_size
  FROM hits GROUP BY query_id
),
fg AS (
  SELECT h.query_id, tf.term, CAST(count(*) AS DOUBLE) AS fg_df
  FROM hits h JOIN tf USING (doc_id) GROUP BY h.query_id, tf.term
),
sig AS (
  SELECT fg.query_id, fg.term, fg.fg_df, d.df,
         round(((fg.fg_df / z.fg_size) - (d.df / s.n))
               * ((fg.fg_df / z.fg_size) / (d.df / s.n)), 6) AS score
  FROM fg
  JOIN fgsz z USING (query_id)
  JOIN dfreq d USING (term)
  CROSS JOIN s
),
ranked_sig AS (
  SELECT query_id, term, CAST(fg_df AS BIGINT) AS fg_df,
         CAST(df AS BIGINT) AS df, score,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, term ASC
         ) AS INTEGER) AS rank
  FROM sig
)
SELECT query_id, term, fg_df, df, score, rank
FROM ranked_sig WHERE rank <= 5
"""
    # more-like-this twin: mined terms replay keywords' tf·ln(N/df)
    # (rounded-before-rank, term-asc ties), then standard lucene scoring
    # over the mined bag (mult=1 per term), self excluded, round(.,4)
    # before the rank cut — the same two-boundary stability contract as
    # the PRF oracle
    o["bm25_topk_more_like_this"] = _bm25_common_cte("lucene") + f""",
seeds(seed) AS (VALUES {_SEEDS_SQL}),
mined AS (
  SELECT tf.doc_id AS seed, tf.term,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY round(tf.tf * ln(s.n / d.df), 6) DESC, tf.term ASC
         ) AS trank
  FROM tf
  JOIN dfreq d USING (term)
  CROSS JOIN s
  JOIN seeds ON seeds.seed = tf.doc_id
),
mq AS (SELECT seed, term FROM mined WHERE trank <= 5),
raw2 AS (
  SELECT mq.seed, im.doc_id, sum(im.impact) AS raw
  FROM mq JOIN impacts im USING (term)
  GROUP BY mq.seed, im.doc_id
),
scored2 AS (
  SELECT seed AS seed_doc_id, doc_id, round(raw, 4) AS score
  FROM raw2 WHERE doc_id != seed
),
ranked2 AS (
  SELECT seed_doc_id, doc_id, score,
         CAST(row_number() OVER (
           PARTITION BY seed_doc_id ORDER BY score DESC, doc_id ASC
         ) AS INT) AS rank
  FROM scored2
)
SELECT seed_doc_id, rank, doc_id, score FROM ranked2 WHERE rank <= {TOPK}
"""
    o["bm25_topk_prf_expanded"] = _bm25_prf_oracle_sql("lucene", m=5, t=3)
    o["bm25_topk_prf_delta"] = _bm25_prf_oracle_sql("lucene", m=5, t=3)
    o["bm25_topk_conv_granularity"] = _bm25_oracle_sql(
        "lucene", docs_cte=_CONV_DOCS_CTE
    )
    o["bm25_topk_chunk_granularity"] = _bm25_oracle_sql(
        "lucene", docs_cte=_CHUNK_DOCS_CTE
    )
    # a merged partitioned build must equal the full-corpus build exactly
    o["bm25_topk_merged_index"] = _bm25_oracle_sql("lucene")
    # tombstone view: stats corpus-wide, candidates filtered (Lucene
    # deleted-docs semantics)
    o["bm25_topk_tombstoned"] = _bm25_oracle_sql(
        "bm25l", live_filter=f"im.{_TOMBSTONE_SQL_FILTER}"
    )
    # compaction: a fresh derivation over the surviving corpus
    o["bm25_topk_compacted"] = _bm25_oracle_sql(
        "lucene",
        docs_cte=(
            "SELECT doc_id, lower(text) AS t FROM documents "
            f"WHERE {_TOMBSTONE_SQL_FILTER}"
        ),
    )
    # explain twin: re-derive each top-k hit's per-term contribution
    # rows from the shared impacts CTE (mult is the query-token
    # multiplicity; contribution = mult · impact, rounded like the gate)
    o["explain_contributions"] = _bm25_common_cte("lucene") + f""",
raw AS (
  SELECT q.query_id, im.doc_id, sum(q.mult * im.impact) AS raw
  FROM qterms q JOIN impacts im USING (term)
  GROUP BY q.query_id, im.doc_id
),
ranked AS (
  SELECT query_id, doc_id,
         row_number() OVER (
           PARTITION BY query_id ORDER BY round(raw, 4) DESC, doc_id ASC
         ) AS rn
  FROM raw
)
SELECT q.query_id, im.doc_id, im.term,
       tf.tf AS tf, q.mult AS mult,
       round(q.mult * im.impact, 4) AS contribution
FROM qterms q
JOIN impacts im USING (term)
JOIN tf ON tf.doc_id = im.doc_id AND tf.term = im.term
JOIN ranked r ON r.query_id = q.query_id AND r.doc_id = im.doc_id
WHERE r.rn <= {TOPK}
"""
    # synonym expansion twin: the weighted bag (base mult + Σ mult·w per
    # thesaurus row) drives both the impact sum and the mult-weighted
    # nonoccurrence add-back (bm25+)
    o["bm25_topk_synonyms"] = _bm25_common_cte("bm25+") + f""",
thesaurus(src, syn, w) AS (VALUES {_SYNONYMS_SQL}),
qexp AS (
  SELECT query_id, term, sum(mult) AS mult FROM (
    SELECT query_id, term, mult FROM qterms
    UNION ALL
    SELECT b.query_id, t.syn AS term, b.mult * t.w AS mult
    FROM qterms b JOIN thesaurus t ON t.src = b.term
  ) GROUP BY 1, 2
),
raws AS (
  SELECT q.query_id, im.doc_id, sum(q.mult * im.impact) AS raw
  FROM qexp q JOIN impacts im USING (term)
  GROUP BY 1, 2
),
nss AS (
  SELECT q.query_id, sum(q.mult * i.nnoc) AS ns
  FROM qexp q JOIN idf i USING (term) GROUP BY q.query_id
),
scoredsyn AS (
  SELECT r.query_id, r.doc_id,
         round(r.raw + coalesce(ns.ns, 0.0), 4) AS score
  FROM raws r LEFT JOIN nss ns USING (query_id)
),
rankedsyn AS (
  SELECT query_id, doc_id, score,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scoredsyn
)
SELECT query_id, rank, doc_id, score FROM rankedsyn WHERE rank <= {TOPK}
"""
    # autocomplete twin: vocabulary = dfreq, top-5 by (df desc, term asc)
    o["search_suggest"] = _bm25_common_cte("lucene") + f""",
prefixes(prefix) AS (VALUES {_PREFIXES_SQL}),
matched AS (
  SELECT p.prefix, d.term, CAST(d.df AS BIGINT) AS df,
         CAST(row_number() OVER (
           PARTITION BY p.prefix ORDER BY d.df DESC, d.term ASC
         ) AS INT) AS rank
  FROM prefixes p JOIN dfreq d ON starts_with(d.term, p.prefix)
)
SELECT prefix, rank, term, df FROM matched WHERE rank <= 5
"""
    # recency twin: age replayed as doc_id arithmetic (ts = 2026-01-01 +
    # doc_id minutes; now = +86400 s), same clamp + round-4-before-rank
    o["bm25_topk_recency"] = _bm25_common_cte("lucene") + f""",
raw AS (
  SELECT q.query_id, im.doc_id, sum(q.mult * im.impact) AS raw
  FROM qterms q JOIN impacts im USING (term)
  GROUP BY q.query_id, im.doc_id
),
decayed AS (
  SELECT query_id, doc_id,
         round(raw, 4) AS score,
         round(raw * pow(2.0, -greatest((86400 - doc_id * 60) / 3600.0, 0.0)
                              / {_RECENCY_HALF_LIFE_H}), 4) AS decayed_score
  FROM raw
),
rankedr AS (
  SELECT query_id, doc_id, score, decayed_score,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY decayed_score DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM decayed
)
SELECT query_id, rank, doc_id, score, decayed_score
FROM rankedr WHERE rank <= {TOPK}
"""
    # metadata filter twin: candidate-set predicate only, stats
    # corpus-wide (role = user ⇔ doc_id % 3 = 0 in _transcripts)
    o["bm25_topk_filtered_role"] = _bm25_oracle_sql(
        "lucene", live_filter="im.doc_id % 3 = 0"
    )
    # field-collapse twin: per-turn rounded lucene scores → best turn
    # per conversation (score desc, doc asc), conversations ranked by
    # (best score desc, conv asc), n_hits over the full candidate set
    o["search_collapse_conv"] = _bm25_common_cte("lucene") + f""",
raw AS (
  SELECT q.query_id, im.doc_id, sum(q.mult * im.impact) AS raw
  FROM qterms q JOIN impacts im USING (term)
  GROUP BY q.query_id, im.doc_id
),
hits AS (
  SELECT query_id, doc_id, doc_id // 4 AS group_id,
         round(raw, 4) AS score
  FROM raw
),
bestg AS (
  SELECT query_id, group_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id, group_id
           ORDER BY score DESC, doc_id ASC
         ) AS gr,
         count(*) OVER (PARTITION BY query_id, group_id) AS n_hits
  FROM hits
),
rankedc AS (
  SELECT query_id, group_id, doc_id, score, n_hits,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, group_id ASC
         ) AS INTEGER) AS rank
  FROM bestg WHERE gr = 1
)
SELECT query_id, rank, group_id, doc_id, score, n_hits
FROM rankedc WHERE rank <= 5
"""
    # keyset-pagination twin: page 2 IS ranks k+1..2k of the rounded
    # total order, re-numbered from 1
    o["bm25_topk_page2"] = _bm25_common_cte("lucene") + f""",
raw AS (
  SELECT q.query_id, im.doc_id, sum(q.mult * im.impact) AS raw
  FROM qterms q JOIN impacts im USING (term)
  GROUP BY q.query_id, im.doc_id
),
rankedpg AS (
  SELECT query_id, doc_id, round(raw, 4) AS score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY round(raw, 4) DESC, doc_id ASC
         ) AS rn
  FROM raw
)
SELECT query_id, CAST(rn - {TOPK} AS INTEGER) AS rank, doc_id, score
FROM rankedpg WHERE rn > {TOPK} AND rn <= {2 * TOPK}
"""
    # percolation twin: distinct (doc, term) pairs = the tf CTE keys;
    # a doc fires a stored query iff it covers all the query's distinct
    # post-tokenizer terms
    o["search_percolate"] = _bm25_common_cte("lucene") + """,
qdist AS (SELECT DISTINCT query_id, term FROM qterms),
qlen AS (
  SELECT query_id, CAST(count(*) AS BIGINT) AS n_terms
  FROM qdist GROUP BY query_id
),
pm AS (
  SELECT tf.doc_id, q.query_id, CAST(count(*) AS BIGINT) AS n_matched
  FROM qdist q JOIN tf USING (term)
  GROUP BY 1, 2
)
SELECT pm.doc_id, pm.query_id, pm.n_matched, ql.n_terms
FROM pm JOIN qlen ql USING (query_id)
WHERE pm.n_matched >= ql.n_terms
"""
    # pooled-conversation kNN twin: element-wise mean per vec_id//4
    # group (both engines widen float→double before averaging), cosine
    # via a positional join, round-4 before the rank
    o["knn_conv_pooled"] = """
WITH e AS (
  SELECT vec_id // 4 AS grp,
         unnest(embedding::DOUBLE[]) AS x,
         generate_subscripts(embedding, 1) AS pos
  FROM embeddings
),
pooled AS (SELECT grp, pos, avg(x) AS v FROM e GROUP BY grp, pos),
norms AS (SELECT grp, sqrt(sum(v * v)) AS nrm FROM pooled GROUP BY grp),
dots AS (
  SELECT q.grp AS query_id, c.grp AS vec_id, sum(q.v * c.v) AS dot
  FROM pooled q JOIN pooled c USING (pos)
  WHERE q.grp < 3
  GROUP BY 1, 2
),
cos AS (
  SELECT d.query_id, d.vec_id,
         round(d.dot / (nq.nrm * nc.nrm), 4) AS cosine
  FROM dots d
  JOIN norms nq ON nq.grp = d.query_id
  JOIN norms nc ON nc.grp = d.vec_id
),
rankedp AS (
  SELECT query_id, vec_id, cosine,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
         ) AS INTEGER) AS rank
  FROM cos
)
SELECT query_id, rank, vec_id, cosine FROM rankedp WHERE rank <= 5
"""

    # wildcard twin: the same regex parse, literal + starts_with prefix
    # expansion against the vocabulary (dfreq), pattern-count
    # multiplicity, then standard lucene scoring over the expanded bag
    o["bm25_topk_wildcard"] = _bm25_common_cte("lucene") + f""",
wq(query_id, qtext) AS (VALUES {_WILDCARDS_SQL}),
wpat AS (
  SELECT query_id, unnest(regexp_extract_all(lower(qtext), '\\w\\w+\\*?')) AS pat
  FROM wq
),
wlit AS (
  SELECT p.query_id, d.term FROM wpat p
  JOIN dfreq d ON d.term = p.pat
  WHERE right(p.pat, 1) != '*'
),
wpre AS (
  SELECT p.query_id, d.term FROM wpat p
  JOIN dfreq d ON starts_with(d.term, rtrim(p.pat, '*'))
  WHERE right(p.pat, 1) = '*' AND rtrim(p.pat, '*') != ''
),
wterms AS (
  SELECT query_id, term, CAST(count(*) AS DOUBLE) AS mult
  FROM (SELECT * FROM wlit UNION ALL SELECT * FROM wpre)
  GROUP BY 1, 2
),
raw3 AS (
  SELECT q.query_id, im.doc_id, sum(q.mult * im.impact) AS raw
  FROM wterms q JOIN impacts im USING (term)
  GROUP BY 1, 2
),
scored3 AS (
  SELECT query_id, doc_id, round(raw, 4) AS score FROM raw3
),
ranked3 AS (
  SELECT query_id, doc_id, score,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS INT) AS rank
  FROM scored3
)
SELECT query_id, rank, doc_id, score FROM ranked3 WHERE rank <= {TOPK}
"""

    # BM25F twin: the full multi-field pipeline replayed — per-(conv,
    # role) lengths, per-field avgdl over ALL conversations, weighted
    # length-normalized pseudo-frequencies combined before ONE k1
    # saturation, lucene idf over any-field df; the (conv, role)
    # derivation mirrors _transcripts exactly
    o["bm25f_topk_fields"] = f"""
WITH turns AS (
  SELECT printf('conv-%06d', CAST(doc_id // 4 AS INT)) AS doc_key,
         CASE CAST(doc_id % 3 AS INT)
           WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool'
         END AS fld,
         lower(text) AS t
  FROM documents
),
tok_raw AS (
  SELECT doc_key, fld, unnest(regexp_extract_all(t, '\\w\\w+')) AS term
  FROM turns
),
toks AS (SELECT * FROM tok_raw WHERE term NOT IN ({_SW_SQL})),
n AS (SELECT CAST(count(DISTINCT doc_key) AS DOUBLE) AS n FROM turns),
dlf AS (
  SELECT doc_key, fld, CAST(count(*) AS DOUBLE) AS dl
  FROM toks GROUP BY 1, 2
),
avgf AS (
  SELECT fld, sum(dl) / (SELECT n FROM n) AS avgdl FROM dlf GROUP BY fld
),
tff AS (
  SELECT doc_key, fld, term, CAST(count(*) AS DOUBLE) AS tf
  FROM toks GROUP BY 1, 2, 3
),
params(fld, w, b) AS (
  VALUES ('user', 2.0, 0.75), ('assistant', 1.0, 0.75), ('tool', 0.5, 0.75)
),
tfw AS (
  SELECT tff.doc_key, tff.term,
         sum(p.w * tff.tf / (1.0 - p.b + p.b * dlf.dl / af.avgdl)) AS tfw
  FROM tff
  JOIN dlf USING (doc_key, fld)
  JOIN avgf af USING (fld)
  JOIN params p USING (fld)
  GROUP BY 1, 2
),
dfx AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tfw GROUP BY term),
queries(query_id, qtext) AS (VALUES {_QUERIES_SQL}),
qtok_raw AS (
  SELECT query_id, unnest(regexp_extract_all(lower(qtext), '\\w\\w+')) AS term
  FROM queries
),
qterms AS (
  SELECT query_id, term, CAST(count(*) AS DOUBLE) AS mult
  FROM qtok_raw WHERE term NOT IN ({_SW_SQL}) GROUP BY 1, 2
),
idf AS (
  SELECT term, ln(1.0 + ((SELECT n FROM n) - df + 0.5) / (df + 0.5)) AS idf
  FROM dfx
),
raw AS (
  SELECT q.query_id, t.doc_key,
         sum(q.mult * i.idf * t.tfw / (1.5 + t.tfw)) AS raw
  FROM qterms q JOIN tfw t USING (term) JOIN idf i USING (term)
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_key, round(raw, 4) AS score,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY round(raw, 4) DESC, doc_key ASC
         ) AS INT) AS rank
  FROM raw
)
SELECT query_id, rank, doc_key, score FROM ranked WHERE rank <= {TOPK}
"""

    # fuzzy twin: tokenizer parse (stopwords applied), exact-or-
    # Levenshtein≤1 expansion over dfreq with the identical length band
    # and short-token guard, occurrence-summed multiplicity, standard
    # lucene scoring
    o["bm25_topk_fuzzy"] = _bm25_common_cte("lucene") + f""",
fq(query_id, qtext) AS (VALUES {_FUZZY_SQL}),
ftok_raw AS (
  SELECT query_id, unnest(regexp_extract_all(lower(qtext), '\\w\\w+')) AS qterm
  FROM fq
),
ftok AS (
  SELECT query_id, qterm, CAST(count(*) AS DOUBLE) AS mult
  FROM ftok_raw WHERE qterm NOT IN ({_SW_SQL}) GROUP BY 1, 2
),
fex AS (
  SELECT t.query_id, d.term, t.mult
  FROM ftok t JOIN dfreq d
    ON d.term = t.qterm
    OR (length(t.qterm) >= 3
        AND abs(length(d.term) - length(t.qterm)) <= 1
        AND levenshtein(d.term, t.qterm) <= 1)
),
fterms AS (
  SELECT query_id, term, sum(mult) AS mult FROM fex GROUP BY 1, 2
),
raw4 AS (
  SELECT q.query_id, im.doc_id, sum(q.mult * im.impact) AS raw
  FROM fterms q JOIN impacts im USING (term)
  GROUP BY 1, 2
),
scored4 AS (
  SELECT query_id, doc_id, round(raw, 4) AS score FROM raw4
),
ranked4 AS (
  SELECT query_id, doc_id, score,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS INT) AS rank
  FROM scored4
)
SELECT query_id, rank, doc_id, score FROM ranked4 WHERE rank <= {TOPK}
"""

    # expansion query-language twin: the same clause parse, wildcard via
    # starts_with and fuzzy via native levenshtein with the length band
    # and 3-char exact-only guard, matched vocab terms entering the bag
    # at the clause boost (per occurrence — repeated clauses add)
    o["bm25_topk_querylang_expand"] = _bm25_common_cte("lucene") + f""",
eq(query_id, qtext) AS (VALUES {_EQL_SQL}),
etokq AS (
  SELECT query_id,
         unnest(regexp_extract_all(lower(qtext),
                '[+-]?\\w\\w+(~\\d?|\\*)(\\^\\d+(\\.\\d+)?)?', 0)) AS tok
  FROM eq
),
eparsed AS (
  SELECT query_id,
         regexp_extract(tok, '\\w\\w+') AS word,
         CASE WHEN contains(tok, '*') THEN 1 ELSE 0 END AS wild,
         CAST(coalesce(nullif(regexp_extract(tok, '~(\\d)', 1), ''), '1')
              AS INTEGER) AS edits,
         CASE WHEN left(tok, 1) = '-' THEN 1 ELSE 0 END AS neg,
         CAST(coalesce(nullif(regexp_extract(tok, '\\^(\\d+(\\.\\d+)?)', 1), ''),
                       '1') AS DOUBLE) AS boost
  FROM etokq
),
eexp AS (
  SELECT p.query_id, d.term AS word, 0 AS must, p.neg, p.boost
  FROM eparsed p JOIN dfreq d ON
       (p.wild = 1 AND starts_with(d.term, p.word))
    OR (p.wild = 0 AND d.term = p.word)
    OR (p.wild = 0 AND length(p.word) >= 3
        AND abs(length(d.term) - length(p.word)) <= p.edits
        AND levenshtein(d.term, p.word) <= p.edits)
),
etok AS (
  SELECT query_id,
         unnest(regexp_extract_all(
           regexp_replace(lower(qtext),
                          '[+-]?\\w\\w+(~\\d?|\\*)(\\^\\d+(\\.\\d+)?)?',
                          ' ', 'g'),
           '[+-]?\\w\\w+(\\^\\d+(\\.\\d+)?)?', 0)) AS tok
  FROM eq
),
eplain AS (
  SELECT query_id,
         regexp_extract(tok, '\\w\\w+') AS word,
         CASE WHEN left(tok, 1) = '+' THEN 1 ELSE 0 END AS must,
         CASE WHEN left(tok, 1) = '-' THEN 1 ELSE 0 END AS neg,
         CAST(coalesce(nullif(regexp_extract(tok, '\\^(\\d+(\\.\\d+)?)', 1), ''),
                       '1') AS DOUBLE) AS boost
  FROM etok
),
eall AS (
  SELECT query_id, word, must, neg, boost FROM eplain
  UNION ALL
  SELECT query_id, word, must, neg, boost FROM eexp
),
eterms AS (
  SELECT query_id, word AS term,
         CASE WHEN max(neg) = 1 THEN 0.0
              ELSE sum(CASE WHEN neg = 0 THEN boost ELSE 0.0 END)
         END AS weight,
         CASE WHEN max(neg) = 1 THEN 0
              ELSE max(CASE WHEN neg = 0 THEN must ELSE 0 END)
         END AS must,
         max(neg) AS neg
  FROM eall WHERE word NOT IN ({_SW_SQL})
  GROUP BY query_id, word
),
eneed AS (SELECT query_id, sum(must) AS nmust FROM eterms GROUP BY query_id),
enegdocs AS (
  SELECT DISTINCT l.query_id, tf.doc_id
  FROM eterms l JOIN tf USING (term) WHERE l.neg = 1
),
eraw AS (
  SELECT l.query_id, im.doc_id,
         sum(CASE WHEN l.neg = 0 THEN l.weight * im.impact ELSE 0.0 END) AS raw
  FROM eterms l
  JOIN impacts im USING (term)
  JOIN eneed n ON n.query_id = l.query_id
  WHERE NOT EXISTS (
    SELECT 1 FROM enegdocs nd
    WHERE nd.query_id = l.query_id AND nd.doc_id = im.doc_id
  )
  GROUP BY l.query_id, im.doc_id
  HAVING sum(CASE WHEN l.neg = 0 THEN l.must ELSE 0 END) = any_value(n.nmust)
),
escored AS (
  SELECT query_id, doc_id, round(raw, 4) AS score FROM eraw
),
eranked AS (
  SELECT query_id, doc_id, score,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM escored
)
SELECT query_id, rank, doc_id, score FROM eranked WHERE rank <= {TOPK}
"""

    # field-filter query-language twin: filter clauses parsed with the
    # same regex, metadata replayed as doc_id-arithmetic CASEs, positive
    # clauses as NOT EXISTS(mismatch), bans as NOT EXISTS(match)
    o["bm25_topk_querylang_fields"] = _bm25_common_cte("lucene") + f""",
gq(query_id, qtext) AS (VALUES {_FQL_SQL}),
gflt AS (
  SELECT DISTINCT query_id,
         regexp_extract(tok, '(\\w\\w+):', 1) AS field,
         regexp_extract(tok, ':(\\w\\w+)', 1) AS value,
         CASE WHEN left(tok, 1) = '-' THEN 1 ELSE 0 END AS neg
  FROM (
    SELECT query_id,
           unnest(regexp_extract_all(lower(qtext),
                  '[+-]?\\w\\w+:\\w\\w+', 0)) AS tok
    FROM gq
  )
),
gmeta AS (
  SELECT doc_id,
         CASE CAST(doc_id % 3 AS INT)
           WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool'
         END AS role,
         CASE WHEN doc_id % 3 = 2 THEN 'search' ELSE '' END AS tool
  FROM dl
),
gtok AS (
  SELECT query_id,
         unnest(regexp_extract_all(
           regexp_replace(lower(qtext), '[+-]?\\w\\w+:\\w\\w+', ' ', 'g'),
           '[+-]?\\w\\w+(\\^\\d+(\\.\\d+)?)?', 0)) AS tok
  FROM gq
),
gparsed AS (
  SELECT query_id,
         regexp_extract(tok, '\\w\\w+') AS word,
         CASE WHEN left(tok, 1) = '+' THEN 1 ELSE 0 END AS must,
         CASE WHEN left(tok, 1) = '-' THEN 1 ELSE 0 END AS neg,
         CAST(coalesce(nullif(regexp_extract(tok, '\\^(\\d+(\\.\\d+)?)', 1), ''),
                       '1') AS DOUBLE) AS boost
  FROM gtok
),
gterms AS (
  SELECT query_id, word AS term,
         CASE WHEN max(neg) = 1 THEN 0.0
              ELSE sum(CASE WHEN neg = 0 THEN boost ELSE 0.0 END)
         END AS weight,
         CASE WHEN max(neg) = 1 THEN 0
              ELSE max(CASE WHEN neg = 0 THEN must ELSE 0 END)
         END AS must,
         max(neg) AS neg
  FROM gparsed WHERE word NOT IN ({_SW_SQL})
  GROUP BY query_id, word
),
gneed AS (SELECT query_id, sum(must) AS nmust FROM gterms GROUP BY query_id),
gnegdocs AS (
  SELECT DISTINCT l.query_id, tf.doc_id
  FROM gterms l JOIN tf USING (term) WHERE l.neg = 1
),
graw AS (
  SELECT l.query_id, im.doc_id,
         sum(CASE WHEN l.neg = 0 THEN l.weight * im.impact ELSE 0.0 END) AS raw
  FROM gterms l
  JOIN impacts im USING (term)
  JOIN gneed n ON n.query_id = l.query_id
  WHERE NOT EXISTS (
    SELECT 1 FROM gnegdocs nd
    WHERE nd.query_id = l.query_id AND nd.doc_id = im.doc_id
  )
  GROUP BY l.query_id, im.doc_id
  HAVING sum(CASE WHEN l.neg = 0 THEN l.must ELSE 0 END) = any_value(n.nmust)
),
gfiltered AS (
  SELECT r.query_id, r.doc_id, r.raw
  FROM graw r JOIN gmeta m ON m.doc_id = r.doc_id
  WHERE NOT EXISTS (
    SELECT 1 FROM gflt f
    WHERE f.query_id = r.query_id AND f.neg = 0
      AND ((f.field = 'role' AND m.role != f.value)
        OR (f.field = 'tool' AND m.tool != f.value))
  )
  AND NOT EXISTS (
    SELECT 1 FROM gflt f
    WHERE f.query_id = r.query_id AND f.neg = 1
      AND ((f.field = 'role' AND m.role = f.value)
        OR (f.field = 'tool' AND m.tool = f.value))
  )
),
gscored AS (
  SELECT query_id, doc_id, round(raw, 4) AS score FROM gfiltered
),
granked AS (
  SELECT query_id, doc_id, score,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM gscored
)
SELECT query_id, rank, doc_id, score FROM granked WHERE rank <= {TOPK}
"""

    # range-filter twin: replay the parse order exactly (strip ranges,
    # then equality filters, then the term grammar), build the same
    # (turn_idx, ts, role) metadata arithmetically, and apply inclusive
    # casted-bound range keeps/bans on the candidate set
    _RGX_RANGE = "[+-]?\\w\\w+:\\[[^\\]]+? to [^\\]]+?\\]"
    _RANGE_SAT = """CASE f.field
            WHEN 'turn_idx' THEN
              (f.lo IS NULL OR m.turn_idx >= CAST(f.lo AS INT))
              AND (f.hi IS NULL OR m.turn_idx <= CAST(f.hi AS INT))
            WHEN 'ts' THEN
              (f.lo IS NULL OR m.ts >= CAST(f.lo AS TIMESTAMP))
              AND (f.hi IS NULL OR m.ts <= CAST(f.hi AS TIMESTAMP))
          END"""
    o["bm25_topk_querylang_range"] = _bm25_common_cte("lucene") + f""",
gq(query_id, qtext) AS (VALUES {_RQL_SQL}),
grange AS (
  SELECT DISTINCT query_id,
         regexp_extract(tok, '(\\w\\w+):\\[', 1) AS field,
         nullif(trim(regexp_extract(tok, '\\[([^\\]]+?) to ', 1)), '*') AS lo,
         nullif(trim(regexp_extract(tok, ' to ([^\\]]+?)\\]', 1)), '*') AS hi,
         CASE WHEN left(tok, 1) = '-' THEN 1 ELSE 0 END AS neg
  FROM (
    SELECT query_id,
           unnest(regexp_extract_all(lower(qtext), '{_RGX_RANGE}', 0)) AS tok
    FROM gq
  )
),
gstripped AS (
  SELECT query_id,
         regexp_replace(lower(qtext), '{_RGX_RANGE}', ' ', 'g') AS t1
  FROM gq
),
gflt AS (
  SELECT DISTINCT query_id,
         regexp_extract(tok, '(\\w\\w+):', 1) AS field,
         regexp_extract(tok, ':(\\w\\w+)', 1) AS value,
         CASE WHEN left(tok, 1) = '-' THEN 1 ELSE 0 END AS neg
  FROM (
    SELECT query_id,
           unnest(regexp_extract_all(t1, '[+-]?\\w\\w+:\\w\\w+', 0)) AS tok
    FROM gstripped
  )
),
gmeta AS (
  SELECT doc_id,
         CAST(doc_id % 4 AS INT) AS turn_idx,
         TIMESTAMP '2026-01-01 00:00:00'
           + CAST(doc_id AS BIGINT) * INTERVAL 1 MINUTE AS ts,
         CASE CAST(doc_id % 3 AS INT)
           WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool'
         END AS role
  FROM dl
),
gtok AS (
  SELECT query_id,
         unnest(regexp_extract_all(
           regexp_replace(t1, '[+-]?\\w\\w+:\\w\\w+', ' ', 'g'),
           '[+-]?\\w\\w+(\\^\\d+(\\.\\d+)?)?', 0)) AS tok
  FROM gstripped
),
gparsed AS (
  SELECT query_id,
         regexp_extract(tok, '\\w\\w+') AS word,
         CASE WHEN left(tok, 1) = '+' THEN 1 ELSE 0 END AS must,
         CASE WHEN left(tok, 1) = '-' THEN 1 ELSE 0 END AS neg,
         CAST(coalesce(nullif(regexp_extract(tok, '\\^(\\d+(\\.\\d+)?)', 1), ''),
                       '1') AS DOUBLE) AS boost
  FROM gtok
),
gterms AS (
  SELECT query_id, word AS term,
         CASE WHEN max(neg) = 1 THEN 0.0
              ELSE sum(CASE WHEN neg = 0 THEN boost ELSE 0.0 END)
         END AS weight,
         CASE WHEN max(neg) = 1 THEN 0
              ELSE max(CASE WHEN neg = 0 THEN must ELSE 0 END)
         END AS must,
         max(neg) AS neg
  FROM gparsed WHERE word NOT IN ({_SW_SQL})
  GROUP BY query_id, word
),
gneed (query_id, nmust) AS (
  SELECT query_id, sum(must) FROM gterms GROUP BY query_id
),
gnegdocs AS (
  SELECT DISTINCT l.query_id, tf.doc_id
  FROM gterms l JOIN tf USING (term) WHERE l.neg = 1
),
graw AS (
  SELECT l.query_id, im.doc_id,
         sum(CASE WHEN l.neg = 0 THEN l.weight * im.impact ELSE 0.0 END) AS raw
  FROM gterms l
  JOIN impacts im USING (term)
  JOIN gneed n ON n.query_id = l.query_id
  WHERE NOT EXISTS (
    SELECT 1 FROM gnegdocs nd
    WHERE nd.query_id = l.query_id AND nd.doc_id = im.doc_id
  )
  GROUP BY l.query_id, im.doc_id
  HAVING sum(CASE WHEN l.neg = 0 THEN l.must ELSE 0 END) = any_value(n.nmust)
),
gfiltered AS (
  SELECT r.query_id, r.doc_id, r.raw
  FROM graw r JOIN gmeta m ON m.doc_id = r.doc_id
  WHERE NOT EXISTS (
    SELECT 1 FROM gflt f
    WHERE f.query_id = r.query_id AND f.neg = 0
      AND (f.field = 'role' AND m.role != f.value)
  )
  AND NOT EXISTS (
    SELECT 1 FROM gflt f
    WHERE f.query_id = r.query_id AND f.neg = 1
      AND (f.field = 'role' AND m.role = f.value)
  )
  AND NOT EXISTS (
    SELECT 1 FROM grange f
    WHERE f.query_id = r.query_id AND f.neg = 0
      AND NOT coalesce({_RANGE_SAT}, FALSE)
  )
  AND NOT EXISTS (
    SELECT 1 FROM grange f
    WHERE f.query_id = r.query_id AND f.neg = 1
      AND coalesce({_RANGE_SAT}, FALSE)
  )
),
gscored AS (
  SELECT query_id, doc_id, round(raw, 4) AS score FROM gfiltered
),
granked AS (
  SELECT query_id, doc_id, score,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM gscored
)
SELECT query_id, rank, doc_id, score FROM granked WHERE rank <= {TOPK}
"""

    # phrase-query-language twin: positional CTEs over documents, the
    # pigeonhole start aggregation per (query, phrase), phrase words
    # merged into the should bag, and the same must/not/phrase coverage
    # filters before the rounded rank
    o["bm25_topk_querylang_phrase"] = _bm25_common_cte("lucene") + f""",
pdocs AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\w\\w+') AS arr
  FROM documents
),
ppos AS (
  SELECT doc_id, unnest(arr) AS term,
         generate_subscripts(arr, 1) - 1 AS pos
  FROM pdocs
),
plq(query_id, qtext) AS (VALUES {_PQL_SQL}),
phr AS (
  SELECT query_id,
         unnest(regexp_extract_all(lower(qtext), '"([^"]*)"', 1)) AS phrase,
         generate_subscripts(
           regexp_extract_all(lower(qtext), '"([^"]*)"', 1), 1) AS pidx
  FROM plq
),
phtok AS (
  SELECT query_id, pidx,
         unnest(regexp_extract_all(phrase, '\\w\\w+')) AS term,
         generate_subscripts(regexp_extract_all(phrase, '\\w\\w+'), 1) - 1 AS j
  FROM phr
),
phlen AS (
  SELECT query_id, pidx, count(*) AS plen FROM phtok GROUP BY 1, 2
),
phstarts AS (
  SELECT t.query_id, t.pidx, p.doc_id, p.pos - t.j AS start,
         count(*) AS n_off
  FROM phtok t JOIN ppos p USING (term)
  GROUP BY 1, 2, 3, 4
),
phhit AS (
  SELECT DISTINCT s.query_id, s.pidx, s.doc_id
  FROM phstarts s
  JOIN phlen l ON l.query_id = s.query_id AND l.pidx = s.pidx
  WHERE s.n_off = l.plen
),
phneed AS (
  SELECT query_id, CAST(count(*) AS BIGINT) AS nphr FROM phlen GROUP BY 1
),
phok AS (
  SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS nhit
  FROM phhit GROUP BY 1, 2
),
ptok AS (
  SELECT query_id,
         unnest(regexp_extract_all(
           regexp_replace(lower(qtext), '"[^"]*"', ' ', 'g'),
           '[+-]?\\w\\w+(\\^\\d+(\\.\\d+)?)?', 0)) AS tok
  FROM plq
),
pparsed AS (
  SELECT query_id,
         regexp_extract(tok, '\\w\\w+') AS word,
         CASE WHEN left(tok, 1) = '+' THEN 1 ELSE 0 END AS must,
         CASE WHEN left(tok, 1) = '-' THEN 1 ELSE 0 END AS neg,
         CAST(coalesce(nullif(regexp_extract(tok, '\\^(\\d+(\\.\\d+)?)', 1), ''),
                       '1') AS DOUBLE) AS boost
  FROM ptok
),
phwords AS (
  SELECT query_id, term AS word, 0 AS must, 0 AS neg, 1.0 AS boost
  FROM phtok
),
pall AS (
  SELECT query_id, word, must, neg, boost FROM pparsed
  UNION ALL
  SELECT query_id, word, must, neg, boost FROM phwords
),
pterms AS (
  SELECT query_id, word AS term,
         CASE WHEN max(neg) = 1 THEN 0.0
              ELSE sum(CASE WHEN neg = 0 THEN boost ELSE 0.0 END)
         END AS weight,
         CASE WHEN max(neg) = 1 THEN 0
              ELSE max(CASE WHEN neg = 0 THEN must ELSE 0 END)
         END AS must,
         max(neg) AS neg
  FROM pall WHERE word NOT IN ({_SW_SQL})
  GROUP BY query_id, word
),
pneed AS (SELECT query_id, sum(must) AS nmust FROM pterms GROUP BY query_id),
pnegdocs AS (
  SELECT DISTINCT l.query_id, tf.doc_id
  FROM pterms l JOIN tf USING (term) WHERE l.neg = 1
),
praw AS (
  SELECT l.query_id, im.doc_id,
         sum(CASE WHEN l.neg = 0 THEN l.weight * im.impact ELSE 0.0 END) AS raw
  FROM pterms l
  JOIN impacts im USING (term)
  JOIN pneed n ON n.query_id = l.query_id
  WHERE NOT EXISTS (
    SELECT 1 FROM pnegdocs nd
    WHERE nd.query_id = l.query_id AND nd.doc_id = im.doc_id
  )
  GROUP BY l.query_id, im.doc_id
  HAVING sum(CASE WHEN l.neg = 0 THEN l.must ELSE 0 END) = any_value(n.nmust)
),
pfiltered AS (
  SELECT r.query_id, r.doc_id, r.raw
  FROM praw r
  LEFT JOIN phneed pn ON pn.query_id = r.query_id
  LEFT JOIN phok po ON po.query_id = r.query_id AND po.doc_id = r.doc_id
  WHERE pn.nphr IS NULL OR coalesce(po.nhit, 0) = pn.nphr
),
pscored AS (
  SELECT query_id, doc_id, round(raw, 4) AS score FROM pfiltered
),
pranked AS (
  SELECT query_id, doc_id, score,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM pscored
)
SELECT query_id, rank, doc_id, score FROM pranked WHERE rank <= {TOPK}
"""

    # distributed-eval twin: arithmetic qrels regenerated, the same
    # linear-gain DCG / map_cut / full-run RR denominators, zeros for
    # judged queries the run never returns (q06)
    _QI_SQL = ", ".join(f"('q{i:02d}', {i})" for i in range(1, 9))
    o["eval_per_query"] = f"""
WITH run AS (
  SELECT query_id, rank, doc_id FROM ({_bm25_oracle_sql("lucene")})
),
qi(query_id, qi) AS (VALUES {_QI_SQL}),
qrels AS (
  SELECT q.query_id, d.doc_id,
         CASE WHEN d.doc_id % 23 = q.qi THEN 2.0
              WHEN d.doc_id % 17 = q.qi THEN 1.0 END AS grade
  FROM documents d CROSS JOIN qi q
  WHERE d.doc_id % 23 = q.qi OR d.doc_id % 17 = q.qi
),
base AS (
  SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel
  FROM qrels WHERE grade > 0 GROUP BY query_id
),
ideal AS (
  SELECT query_id, sum(grade / log2(ipos + 1)) AS idcg FROM (
    SELECT query_id, grade,
           row_number() OVER (
             PARTITION BY query_id ORDER BY grade DESC, doc_id ASC
           ) AS ipos
    FROM qrels WHERE grade > 0
  ) WHERE ipos <= {TOPK} GROUP BY query_id
),
joined AS (
  SELECT r.query_id, r.rank, coalesce(qr.grade, 0.0) AS gain,
         CASE WHEN coalesce(qr.grade, 0.0) > 0 THEN 1 ELSE 0 END AS is_rel
  FROM run r LEFT JOIN qrels qr
    ON qr.query_id = r.query_id AND qr.doc_id = r.doc_id
),
scanned AS (
  SELECT *, sum(is_rel) OVER (PARTITION BY query_id ORDER BY rank) AS seen
  FROM joined
),
per_run AS (
  SELECT query_id,
         sum(CASE WHEN rank <= {TOPK} THEN gain / log2(rank + 1)
                  ELSE 0.0 END) AS dcg,
         CAST(sum(CASE WHEN rank <= {TOPK} THEN is_rel ELSE 0 END)
              AS BIGINT) AS hits,
         sum(CASE WHEN rank <= {TOPK} AND is_rel = 1
                  THEN CAST(seen AS DOUBLE) / rank ELSE 0.0 END) AS ap_num,
         min(CASE WHEN is_rel = 1 THEN rank END) AS first_rel
  FROM scanned GROUP BY query_id
)
SELECT b.query_id, b.n_rel,
       CAST(coalesce(p.hits, 0) AS BIGINT) AS hits,
       round(coalesce(p.dcg, 0.0) / i.idcg, 6) AS ndcg,
       round(CAST(coalesce(p.hits, 0) AS DOUBLE) / b.n_rel, 6) AS recall,
       round(CAST(coalesce(p.hits, 0) AS DOUBLE) / {float(TOPK)}, 6) AS precision,
       round(coalesce(p.ap_num, 0.0) / b.n_rel, 6) AS ap,
       round(coalesce(1.0 / p.first_rel, 0.0), 6) AS rr
FROM base b
JOIN ideal i USING (query_id)
LEFT JOIN per_run p USING (query_id)
"""

    # macro twin: UNROUNDED per-query metrics averaged over judged
    # queries, rounded once at the end — the evaluate_macro contract
    # (mirrors eval.evaluate's round-at-the-end behavior)
    _eval_macro_cut = o["eval_per_query"].rindex("\nSELECT b.query_id")
    o["eval_macro"] = o["eval_per_query"][:_eval_macro_cut] + f""",
perq AS (
  SELECT b.query_id,
         coalesce(p.dcg, 0.0) / i.idcg AS ndcg,
         CAST(coalesce(p.hits, 0) AS DOUBLE) / b.n_rel AS recall,
         CAST(coalesce(p.hits, 0) AS DOUBLE) / {float(TOPK)} AS precision,
         coalesce(p.ap_num, 0.0) / b.n_rel AS ap,
         coalesce(1.0 / p.first_rel, 0.0) AS rr
  FROM base b
  JOIN ideal i USING (query_id)
  LEFT JOIN per_run p USING (query_id)
)
SELECT CAST(count(*) AS BIGINT) AS n_queries,
       round(avg(ndcg), 6) AS ndcg,
       round(avg(recall), 6) AS recall,
       round(avg(precision), 6) AS precision,
       round(avg(ap), 6) AS map,
       round(avg(rr), 6) AS mrr
FROM perq
"""

    # A/B run-comparison twin: the two BM25 oracles (lucene ⊕ bm25l)
    # composed verbatim, set/rank/order agreement per query.  The RBO
    # weight table is generated by the SAME Python function the Spark
    # plan inlines (bm25s_spark/operators/evaldf.py rbo_weights), so
    # both engines share bit-identical IEEE weights; float repr is
    # round-trip exact, so the SQL literals parse back to the same
    # doubles
    from bm25s_spark.operators.evaldf import rbo_weights as _rbo_w

    _w, _den = _rbo_w(TOPK, 0.9)
    _w_vals = ", ".join(f"({m}, {w!r})" for m, w in enumerate(_w, 1))
    o["eval_compare_runs"] = f"""
WITH ra AS (SELECT query_id, doc_id, rank FROM ({_bm25_oracle_sql("lucene")})),
rb AS (SELECT query_id, doc_id, rank FROM ({_bm25_oracle_sql("bm25l")})),
w(m, wv) AS (VALUES {_w_vals}),
mt AS (
  SELECT ra.query_id, ra.doc_id, ra.rank AS rank_a, rb.rank AS rank_b
  FROM ra JOIN rb ON ra.query_id = rb.query_id AND ra.doc_id = rb.doc_id
),
agg AS (
  SELECT mt.query_id, count(*) AS overlap, sum(w.wv) AS rbo_raw
  FROM mt JOIN w ON w.m = greatest(mt.rank_a, mt.rank_b)
  GROUP BY mt.query_id
),
pairs AS (
  SELECT x.query_id,
         CASE WHEN (x.rank_a - y.rank_a) * (x.rank_b - y.rank_b) > 0
              THEN 1 ELSE -1 END AS s
  FROM mt x JOIN mt y ON x.query_id = y.query_id AND x.doc_id < y.doc_id
),
tau AS (
  SELECT query_id, sum(s) * 1.0 / count(*) AS tau FROM pairs GROUP BY query_id
),
na AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_a FROM ra GROUP BY query_id),
nb AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_b FROM rb GROUP BY query_id)
SELECT na.query_id, na.n_a, nb.n_b,
       CAST(coalesce(agg.overlap, 0) AS BIGINT) AS overlap,
       round(coalesce(agg.overlap, 0) * 1.0
             / (na.n_a + nb.n_b - coalesce(agg.overlap, 0)), 6) AS jaccard,
       round(coalesce(agg.rbo_raw, 0.0) / {_den!r}, 6) AS rbo,
       round(tau.tau, 6) AS tau
FROM na
JOIN nb ON na.query_id = nb.query_id
LEFT JOIN agg ON agg.query_id = na.query_id
LEFT JOIN tau ON tau.query_id = na.query_id
"""

    # query-language twin: the identical parse (operator prefix, boost
    # suffix, stopword filter), NOT-wins collapse, weighted scoring with
    # must-coverage HAVING and negdoc NOT EXISTS — lucene, so nnoc = 0
    o["bm25_topk_querylang"] = _bm25_common_cte("lucene") + f""",
lq(query_id, qtext) AS (VALUES {_QL_SQL}),
ltok AS (
  SELECT query_id,
         unnest(regexp_extract_all(lower(qtext),
                '[+-]?\\w\\w+(\\^\\d+(\\.\\d+)?)?', 0)) AS tok
  FROM lq
),
lparsed AS (
  SELECT query_id,
         regexp_extract(tok, '\\w\\w+') AS word,
         CASE WHEN left(tok, 1) = '+' THEN 1 ELSE 0 END AS must,
         CASE WHEN left(tok, 1) = '-' THEN 1 ELSE 0 END AS neg,
         CAST(coalesce(nullif(regexp_extract(tok, '\\^(\\d+(\\.\\d+)?)', 1), ''),
                       '1') AS DOUBLE) AS boost
  FROM ltok
),
lterms AS (
  SELECT query_id, word AS term,
         CASE WHEN max(neg) = 1 THEN 0.0
              ELSE sum(CASE WHEN neg = 0 THEN boost ELSE 0.0 END)
         END AS weight,
         CASE WHEN max(neg) = 1 THEN 0
              ELSE max(CASE WHEN neg = 0 THEN must ELSE 0 END)
         END AS must,
         max(neg) AS neg
  FROM lparsed WHERE word NOT IN ({_SW_SQL})
  GROUP BY query_id, word
),
lneed AS (
  SELECT query_id, sum(must) AS nmust FROM lterms GROUP BY query_id
),
lnegdocs AS (
  SELECT DISTINCT l.query_id, tf.doc_id
  FROM lterms l JOIN tf USING (term) WHERE l.neg = 1
),
lraw AS (
  SELECT l.query_id, im.doc_id,
         sum(CASE WHEN l.neg = 0 THEN l.weight * im.impact ELSE 0.0 END) AS raw
  FROM lterms l
  JOIN impacts im USING (term)
  JOIN lneed n ON n.query_id = l.query_id
  WHERE NOT EXISTS (
    SELECT 1 FROM lnegdocs nd
    WHERE nd.query_id = l.query_id AND nd.doc_id = im.doc_id
  )
  GROUP BY l.query_id, im.doc_id
  HAVING sum(CASE WHEN l.neg = 0 THEN l.must ELSE 0 END) = any_value(n.nmust)
),
lscored AS (
  SELECT query_id, doc_id, round(raw, 4) AS score FROM lraw
),
lranked AS (
  SELECT query_id, doc_id, score,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM lscored
)
SELECT query_id, rank, doc_id, score FROM lranked WHERE rank <= {TOPK}
"""

    # minimum_should_match twin: the standard scoring CTEs with a
    # HAVING ≥ 2 distinct-match floor (group row count == matched
    # distinct terms, the conjunctive-oracle argument)
    o["bm25_topk_min_match"] = _bm25_common_cte("lucene") + f""",
rawm AS (
  SELECT q.query_id, im.doc_id, sum(q.mult * im.impact) AS raw
  FROM qterms q JOIN impacts im USING (term)
  GROUP BY q.query_id, im.doc_id
  HAVING count(*) >= 2
),
nsm AS (
  SELECT q.query_id, sum(q.mult * i.nnoc) AS ns
  FROM qterms q JOIN idf i USING (term) GROUP BY q.query_id
),
scoredm AS (
  SELECT r.query_id, r.doc_id,
         round(r.raw + coalesce(ns.ns, 0.0), 4) AS score
  FROM rawm r LEFT JOIN nsm ns USING (query_id)
),
rankedm AS (
  SELECT query_id, doc_id, score,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scoredm
)
SELECT query_id, rank, doc_id, score FROM rankedm WHERE rank <= {TOPK}
"""

    # Dirichlet query-likelihood twin: collection frequencies + total
    # tokens from the shared tf CTE, matched-term sum of
    # mult·ln(1 + tf·T/(μ·cf)) plus the qlen·ln(μ/(μ+dl)) length prior
    # (in-vocab qlen only — OOV drops on both engines); ln(1 + x) is
    # written identically to the Spark side's F.log(1 + x)
    o["lm_dirichlet_topk"] = _bm25_common_cte("lucene") + f""",
cf AS (SELECT term, CAST(sum(tf) AS DOUBLE) AS cf FROM tf GROUP BY term),
tot AS (SELECT CAST(sum(cf) AS DOUBLE) AS t FROM cf),
qv AS (
  SELECT q.query_id, q.term, q.mult, c.cf
  FROM qterms q JOIN cf c USING (term)
),
qlenq AS (SELECT query_id, sum(mult) AS qlen FROM qv GROUP BY query_id),
matchedq AS (
  SELECT qv.query_id, tf.doc_id,
         sum(qv.mult * ln(1 + tf.tf * tot.t / (2000.0 * qv.cf))) AS msum
  FROM qv JOIN tf USING (term) CROSS JOIN tot
  GROUP BY qv.query_id, tf.doc_id
),
scoredq AS (
  SELECT m.query_id, m.doc_id,
         round(m.msum + ql.qlen * ln(2000.0 / (2000.0 + d.dl)), 4) AS score
  FROM matchedq m JOIN dl d USING (doc_id) JOIN qlenq ql USING (query_id)
),
rankedq AS (
  SELECT query_id, doc_id, score,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scoredq
)
SELECT query_id, rank, doc_id, score FROM rankedq WHERE rank <= {TOPK}
"""

    # regexp twin: anchored full-match expansion over the vocabulary
    # (regexp_full_match == the engine's ^(?:…)$ anchoring), mult =
    # number of the query's patterns matching the term
    o["bm25_topk_regexp"] = _bm25_common_cte("lucene") + f""",
rq(query_id, pat) AS (VALUES {_REGEX_SQL}),
rex AS (
  SELECT r.query_id, d.term, CAST(count(*) AS DOUBLE) AS mult
  FROM rq r JOIN dfreq d ON regexp_full_match(d.term, r.pat)
  GROUP BY r.query_id, d.term
),
rawr AS (
  SELECT q.query_id, im.doc_id, sum(q.mult * im.impact) AS raw
  FROM rex q JOIN impacts im USING (term)
  GROUP BY q.query_id, im.doc_id
),
scoredr AS (
  SELECT query_id, doc_id, round(raw, 4) AS score FROM rawr
),
rankedr AS (
  SELECT query_id, doc_id, score,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scoredr
)
SELECT query_id, rank, doc_id, score FROM rankedr WHERE rank <= {TOPK}
"""

    # did-you-mean twin: the same (distance asc, df desc, term asc)
    # argmin over the vocabulary, short tokens exact-only, LEFT JOIN
    # keeping no-candidate tokens as NULL rows
    o["search_did_you_mean"] = _bm25_common_cte("lucene") + f""",
fq(query_id, qtext) AS (VALUES {_FUZZY_SQL}),
ftok AS (
  SELECT DISTINCT query_id, qterm AS token FROM (
    SELECT query_id,
           unnest(regexp_extract_all(lower(qtext), '\\w\\w+')) AS qterm
    FROM fq
  ) WHERE qterm NOT IN ({_SW_SQL})
),
cands AS (
  SELECT t.query_id, t.token, d.term AS suggestion,
         CAST(CASE WHEN d.term = t.token THEN 0
              ELSE levenshtein(d.term, t.token) END AS INTEGER) AS distance,
         CAST(d.df AS BIGINT) AS df
  FROM ftok t JOIN dfreq d
    ON d.term = t.token
    OR (length(t.token) >= 3
        AND abs(length(d.term) - length(t.token)) <= 2
        AND levenshtein(d.term, t.token) <= 2)
),
best AS (
  SELECT query_id, token, suggestion, distance, df,
         row_number() OVER (
           PARTITION BY query_id, token
           ORDER BY distance ASC, df DESC, suggestion ASC
         ) AS rn
  FROM cands
)
SELECT t.query_id, t.token, b.suggestion, b.distance, b.df
FROM ftok t LEFT JOIN best b
  ON b.query_id = t.query_id AND b.token = t.token AND b.rn = 1
"""

    # positional-index twins: DuckDB rebuilds (doc_id, pos, term) via
    # regexp_extract_all + generate_subscripts and replays the
    # start = pos - j pigeonhole count (phrase) / anchored-window
    # distinct-term count (proximity) exactly — all-integer outputs,
    # so the hash comparison is FP-noise-free by construction
    _POS_CTE = rf"""
WITH docs AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w\w+') AS arr FROM documents
),
pos AS (
  SELECT doc_id, unnest(arr) AS term,
         generate_subscripts(arr, 1) - 1 AS pos
  FROM docs
),
pq(query_id, qtext) AS (VALUES {_PHRASES_SQL}),
qarr AS (
  SELECT query_id, regexp_extract_all(lower(qtext), '\w\w+') AS arr FROM pq
)"""
    o["phrase_match_topk"] = _POS_CTE + r""",
qtok AS (
  SELECT query_id, unnest(arr) AS term,
         generate_subscripts(arr, 1) - 1 AS j
  FROM qarr
),
qlen AS (SELECT query_id, count(*) AS qlen FROM qtok GROUP BY query_id),
starts AS (
  SELECT t.query_id, p.doc_id, p.pos - t.j AS start, count(*) AS n_off
  FROM qtok t JOIN pos p USING (term)
  GROUP BY 1, 2, 3
),
m AS (
  SELECT s.query_id, s.doc_id, s.start
  FROM starts s JOIN qlen q USING (query_id)
  WHERE s.n_off = q.qlen
),
agg AS (
  SELECT query_id, doc_id,
         CAST(count(*) AS INT) AS n_matches,
         CAST(min(start) AS INT) AS first_pos
  FROM m GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id, n_matches, first_pos,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY n_matches DESC, doc_id ASC
         ) AS INT) AS rank
  FROM agg
)
SELECT query_id, rank, doc_id, n_matches, first_pos
FROM ranked WHERE rank <= """ + str(TOPK)
    o["phrase_proximity"] = _POS_CTE + r""",
qdist AS (SELECT DISTINCT query_id, unnest(arr) AS term FROM qarr),
nt AS (SELECT query_id, count(*) AS nt FROM qdist GROUP BY query_id),
hits AS (
  SELECT q.query_id, p.doc_id, p.term, p.pos
  FROM qdist q JOIN pos p USING (term)
),
spans AS (
  SELECT a.query_id, a.doc_id, a.pos AS anchor,
         count(DISTINCT b.term) AS seen
  FROM hits a JOIN hits b
    ON a.query_id = b.query_id AND a.doc_id = b.doc_id
   AND b.pos >= a.pos AND b.pos < a.pos + 5
  GROUP BY 1, 2, 3
),
ok AS (
  SELECT s.query_id, s.doc_id, s.anchor
  FROM spans s JOIN nt USING (query_id)
  WHERE s.seen = nt.nt
)
SELECT query_id, doc_id, CAST(count(*) AS INT) AS n_windows,
       CAST(min(anchor) AS INT) AS first_window
FROM ok GROUP BY 1, 2
"""
    # snippet twin: argmax anchored window (seen desc, anchor asc), then
    # the render itself — slice, per-token highlight, space-join —
    # replayed with DuckDB list functions so the STRING output is
    # hash-compared byte-for-byte
    o["search_snippets"] = _POS_CTE + r""",
qdist AS (SELECT DISTINCT query_id, unnest(arr) AS term FROM qarr),
hits AS (
  SELECT q.query_id, p.doc_id, p.term, p.pos
  FROM qdist q JOIN pos p USING (term)
),
spans AS (
  SELECT a.query_id, a.doc_id, a.pos AS anchor,
         count(DISTINCT b.term) AS seen
  FROM hits a JOIN hits b
    ON a.query_id = b.query_id AND a.doc_id = b.doc_id
   AND b.pos >= a.pos AND b.pos < a.pos + 6
  GROUP BY 1, 2, 3
),
best AS (
  SELECT query_id, doc_id, seen, anchor,
         row_number() OVER (
           PARTITION BY query_id, doc_id ORDER BY seen DESC, anchor ASC
         ) AS rn
  FROM spans
),
qa AS (SELECT query_id, list(term) AS qterms FROM qdist GROUP BY query_id)
SELECT b.query_id, b.doc_id, CAST(b.seen AS INT) AS n_hit_terms,
       CAST(b.anchor AS INT) AS anchor,
       array_to_string(
         list_transform(d.arr[b.anchor + 1 : b.anchor + 6],
           x -> CASE WHEN list_contains(qa.qterms, x)
                THEN '**' || x || '**' ELSE x END),
         ' ') AS snippet
FROM best b JOIN docs d USING (doc_id) JOIN qa USING (query_id)
WHERE b.rn = 1
"""

    # twin of dedup_chunk_windows(chunk_size=3, keep='first'): disjoint
    # trigram windows, keep the globally-first occurrence of each
    # distinct window text, reassemble in chunk order
    o["dedup_paragraphs"] = r"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\s+'), x -> x != '') AS tk
  FROM documents
),
nz AS (
  SELECT doc_id, tk,
         greatest(CAST(ceil(len(tk) / 3.0) AS INT), 1) AS n_chunks
  FROM t WHERE len(tk) > 0
),
e AS (
  SELECT doc_id, tk,
         unnest(generate_series(0, n_chunks - 1)) AS piece_id
  FROM nz
),
p AS (
  SELECT doc_id, piece_id,
         array_to_string(tk[piece_id*3+1 : piece_id*3+3], ' ') AS piece
  FROM e
),
k AS (
  SELECT doc_id, piece_id, piece,
         row_number() OVER (
           PARTITION BY piece ORDER BY doc_id, piece_id
         ) AS rn
  FROM p
)
SELECT doc_id,
       CAST(count(*) AS INT) AS n_pieces,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS INT) AS n_kept,
       coalesce(string_agg(CASE WHEN rn = 1 THEN piece END, ' '
                           ORDER BY piece_id), '') AS text
FROM k GROUP BY doc_id
"""

    o["term_stats_idf"] = f"""
WITH docs AS (SELECT doc_id, lower(text) AS t FROM documents),
tok_raw AS (SELECT doc_id, unnest(regexp_extract_all(t, '\\w\\w+')) AS term FROM docs),
toks AS (SELECT doc_id, term FROM tok_raw WHERE term NOT IN ({_SW_SQL})),
tf AS (SELECT doc_id, term FROM toks GROUP BY doc_id, term),
dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
s AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM docs)
SELECT d.term, CAST(d.df AS BIGINT) AS df,
  round(ln(greatest((s.n - d.df + 0.5)/(d.df + 0.5), 1.0)), 6) AS idf_robertson,
  round(ln(1.0 + (s.n - d.df + 0.5)/(d.df + 0.5)), 6) AS idf_lucene,
  round(ln(s.n / d.df), 6) AS idf_atire,
  round(ln((s.n + 1.0)/(d.df + 0.5)), 6) AS idf_bm25l,
  round(ln((s.n + 1.0)/d.df), 6) AS idf_bm25plus
FROM dfreq d CROSS JOIN s
"""

    o["doc_lengths"] = f"""
WITH docs AS (SELECT doc_id, lower(text) AS t FROM documents),
tok_raw AS (SELECT doc_id, unnest(regexp_extract_all(t, '\\w\\w+')) AS term FROM docs),
toks AS (SELECT doc_id, term FROM tok_raw WHERE term NOT IN ({_SW_SQL}))
SELECT d.doc_id, CAST(count(tk.term) AS BIGINT) AS dl
FROM docs d LEFT JOIN toks tk USING (doc_id) GROUP BY d.doc_id
"""

    o["corpus_stats"] = f"""
WITH docs AS (SELECT doc_id, lower(text) AS t FROM documents),
tok_raw AS (SELECT doc_id, unnest(regexp_extract_all(t, '\\w\\w+')) AS term FROM docs),
toks AS (SELECT doc_id, term FROM tok_raw WHERE term NOT IN ({_SW_SQL})),
dl AS (SELECT d.doc_id, CAST(count(tk.term) AS DOUBLE) AS dl
       FROM docs d LEFT JOIN toks tk USING (doc_id) GROUP BY d.doc_id)
SELECT CAST(count(*) AS BIGINT) AS num_docs, round(avg(dl), 6) AS avgdl FROM dl
"""

    o["doc_term_frequencies"] = f"""
WITH docs AS (SELECT doc_id, lower(text) AS t FROM documents),
tok_raw AS (SELECT doc_id, unnest(regexp_extract_all(t, '\\w\\w+')) AS term FROM docs),
toks AS (SELECT doc_id, term FROM tok_raw WHERE term NOT IN ({_SW_SQL}))
SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY doc_id, term
"""

    o["index_top_terms"] = f"""
WITH docs AS (SELECT doc_id, lower(text) AS t FROM documents),
tok_raw AS (SELECT doc_id, unnest(regexp_extract_all(t, '\\w\\w+')) AS term FROM docs),
toks AS (SELECT doc_id, term FROM tok_raw WHERE term NOT IN ({_SW_SQL})),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
s AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM docs),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         round(tf.tf * ln(s.n / d.df), 6) AS tfidf
  FROM tf JOIN dfreq d USING (term) CROSS JOIN s
),
ranked AS (
  SELECT doc_id, term, tf, tfidf,
         CAST(row_number() OVER (
           PARTITION BY doc_id ORDER BY tfidf DESC, term ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT doc_id, rank, term, CAST(tf AS BIGINT) AS tf, tfidf
FROM ranked WHERE rank <= 3
"""

    # term-vectors twin: tf/df from the shared tokenization CTEs, lucene
    # idf recomputed with the identical formula, seeds from MLT_SEEDS
    o["index_term_vectors"] = _bm25_common_cte("lucene") + f""",
seeds(seed) AS (VALUES {_SEEDS_SQL})
SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf,
       CAST(d.df AS BIGINT) AS df,
       round({_IDF_SQL["lucene"]}, 6) AS idf
FROM tf
JOIN seeds ON seeds.seed = tf.doc_id
JOIN dfreq d USING (term)
CROSS JOIN s
"""

    o["dedup_exact_groups"] = f"""
SELECT md5({_NORM_TEXT_SQL}) AS digest,
       min(doc_id) AS canonical_id,
       CAST(count(*) AS BIGINT) AS n_dupes
FROM documents GROUP BY 1 HAVING count(*) >= 2
"""

    o["dedup_minhash_signatures"] = f"""
WITH {_SHINGLE_CTE}
SELECT doc_id, {_minhash_sig_sql_cols(8)} FROM sh GROUP BY doc_id
"""

    o["dedup_minhash_lsh_pairs"] = f"""
WITH {_SHINGLE_CTE},
sigs AS (SELECT doc_id, {_minhash_sig_sql_cols(8)} FROM sh GROUP BY doc_id),
banded AS (
  SELECT doc_id, 0 AS band, md5(sig_0::VARCHAR || '|' || sig_1::VARCHAR) AS bucket FROM sigs
  UNION ALL
  SELECT doc_id, 1, md5(sig_2::VARCHAR || '|' || sig_3::VARCHAR) FROM sigs
  UNION ALL
  SELECT doc_id, 2, md5(sig_4::VARCHAR || '|' || sig_5::VARCHAR) FROM sigs
  UNION ALL
  SELECT doc_id, 3, md5(sig_6::VARCHAR || '|' || sig_7::VARCHAR) FROM sigs
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(a.band AS INTEGER) AS band
FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
WHERE a.doc_id < b.doc_id
"""

    # transitive closure of the LSH pair graph via recursive CTE; the
    # component id is the minimum reachable doc id — the same fixpoint
    # the Spark min-label propagation converges to
    o["dedup_components"] = f"""
WITH RECURSIVE {_SHINGLE_CTE.lstrip()},
sigs AS (SELECT doc_id, {_minhash_sig_sql_cols(8)} FROM sh GROUP BY doc_id),
banded AS (
  SELECT doc_id, 0 AS band, md5(sig_0::VARCHAR || '|' || sig_1::VARCHAR) AS bucket FROM sigs
  UNION ALL
  SELECT doc_id, 1, md5(sig_2::VARCHAR || '|' || sig_3::VARCHAR) FROM sigs
  UNION ALL
  SELECT doc_id, 2, md5(sig_4::VARCHAR || '|' || sig_5::VARCHAR) FROM sigs
  UNION ALL
  SELECT doc_id, 3, md5(sig_6::VARCHAR || '|' || sig_7::VARCHAR) FROM sigs
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.doc_id < b.doc_id
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
)
SELECT u AS doc_id, least(u, min(v)) AS component FROM reach GROUP BY u
"""

    # end-to-end near-dedup twin: the components closure above + an
    # anti-join dropping every non-canonical (component < doc_id) member
    o["dedup_near_end_to_end"] = o["dedup_components"].replace(
        "SELECT u AS doc_id, least(u, min(v)) AS component FROM reach GROUP BY u",
        """, comp AS (
  SELECT u AS doc_id, least(u, min(v)) AS component FROM reach GROUP BY u
)
SELECT d.doc_id FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM comp WHERE component < doc_id)""",
    )

    o["dedup_ngram_jaccard"] = f"""
WITH {_SHINGLE_CTE},
sizes AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
rare AS (
  SELECT shingle FROM sh GROUP BY shingle
  HAVING count(*) BETWEEN 2 AND 1000
),
shr AS (SELECT sh.* FROM sh JOIN rare USING (shingle)),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS common
  FROM shr a JOIN shr b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT c.doc_a, c.doc_b, c.common,
       CAST(sa.n_shingles AS BIGINT) AS size_a,
       CAST(sb.n_shingles AS BIGINT) AS size_b,
       round(CAST(c.common AS DOUBLE) / (sa.n_shingles + sb.n_shingles - c.common), 4) AS jaccard
FROM common c
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b
WHERE CAST(c.common AS DOUBLE) / (sa.n_shingles + sb.n_shingles - c.common) >= 0.5
"""

    bit_votes = ", ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(16)
    )
    bit_pack = " + ".join(
        f"CASE WHEN b{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END"
        for i in range(16)
    )
    o["dedup_simhash"] = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({_NORM_TEXT_SQL}, ' ')) AS tok FROM documents
),
hashed AS (
  SELECT doc_id, CAST(('0x' || substr(md5('7:' || tok), 1, 12)) AS BIGINT) AS h FROM toks
),
votes AS (SELECT doc_id, {bit_votes} FROM hashed GROUP BY doc_id)
SELECT doc_id, CAST({bit_pack} AS BIGINT) AS simhash FROM votes
"""

    bit_votes48 = ", ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(48)
    )
    bit_pack48 = " + ".join(
        f"CASE WHEN b{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END"
        for i in range(48)
    )
    # banding: bits=48, bands=4 → 12-bit chunks; pairs agreeing on ≥1
    # chunk with hamming(sig_a, sig_b) ≤ 3 — the exact twin of
    # bm25s_spark/operators/dedup.py simhash_near_duplicates
    o["dedup_simhash_pairs"] = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({_NORM_TEXT_SQL}, ' ')) AS tok FROM documents
),
hashed AS (
  SELECT doc_id, CAST(('0x' || substr(md5('7:' || tok), 1, 12)) AS BIGINT) AS h FROM toks
),
votes AS (SELECT doc_id, {bit_votes48} FROM hashed GROUP BY doc_id),
sig AS (SELECT doc_id, CAST({bit_pack48} AS BIGINT) AS simhash FROM votes),
chunks AS (
  SELECT s.doc_id, s.simhash, b.band,
         (s.simhash >> (b.band * 12)) & 4095 AS chunk
  FROM sig s CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) b
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.simhash AS sa, b.simhash AS sb
  FROM chunks a JOIN chunks b ON a.band = b.band AND a.chunk = b.chunk
  WHERE a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
FROM pairs WHERE bit_count(xor(sa, sb)) <= 3
"""

    # 64-bit twin: bits 0-47 from the seed-7 hash, 48-63 from seed 8;
    # bit 63 lands in the sign via two's-complement addition (DuckDB
    # raises on 1<<63, so min-BIGINT is added explicitly); >> is
    # arithmetic in both engines and the &-mask cancels the sign fill
    bit_votes64 = ", ".join(
        f"sum(CASE WHEN ({'h' if i < 48 else 'h2'} >> {i if i < 48 else i - 48}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(64)
    )
    bit_pack64 = " + ".join(
        f"CASE WHEN b{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END"
        for i in range(63)
    ) + " + CASE WHEN b63 > 0 THEN CAST(-9223372036854775807 - 1 AS BIGINT) ELSE 0 END"
    o["dedup_simhash_pairs64"] = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({_NORM_TEXT_SQL}, ' ')) AS tok FROM documents
),
hashed AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('7:' || tok), 1, 12)) AS BIGINT) AS h,
         CAST(('0x' || substr(md5('8:' || tok), 1, 12)) AS BIGINT) AS h2
  FROM toks
),
votes AS (SELECT doc_id, {bit_votes64} FROM hashed GROUP BY doc_id),
sig AS (SELECT doc_id, CAST({bit_pack64} AS BIGINT) AS simhash FROM votes),
chunks AS (
  SELECT s.doc_id, s.simhash, b.band,
         (s.simhash >> (b.band * 16)) & 65535 AS chunk
  FROM sig s CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) b
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.simhash AS sa, b.simhash AS sb
  FROM chunks a JOIN chunks b ON a.band = b.band AND a.chunk = b.chunk
  WHERE a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
FROM pairs WHERE bit_count(xor(sa, sb)) <= 3
"""

    _knn_exact_sql = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id, embedding AS cv FROM embeddings),
scored AS (
  SELECT q.query_id, c.vec_id,
         round(list_cosine_similarity(q.qv::DOUBLE[], c.cv::DOUBLE[]), 4) AS cosine
  FROM q CROSS JOIN c
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, rank, vec_id, cosine FROM ranked WHERE rank <= 5
"""
    o["knn_cosine_brute"] = _knn_exact_sql
    # MMR diversification twin: the recursive CTE replays the greedy
    # argmax — pairwise cosines rounded to 4 BEFORE the max, objective
    # rounded before each pick, vec_id-ascending ties, (1 - 0.7) spelled
    # identically so the IEEE constant matches the kernel's (1.0 - lam)
    o["knn_mmr_rerank"] = """
WITH RECURSIVE
q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
scored AS (
  SELECT q.query_id, c.vec_id, c.cv,
         round(list_cosine_similarity(q.qv, c.cv), 4) AS rel
  FROM q CROSS JOIN c
),
pool AS (
  SELECT query_id, vec_id, cv, rel FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY rel DESC, vec_id ASC
    ) AS rn
    FROM scored
  ) WHERE rn <= 20
),
sel AS (
  SELECT query_id, vec_id, 1 AS rank, rel AS relevance,
         round(0.7 * rel, 4) AS mmr_score,
         [vec_id] AS picked_ids, [cv] AS picked_vecs
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY round(0.7 * rel, 4) DESC, vec_id ASC
    ) AS rn
    FROM pool
  ) WHERE rn = 1
  UNION ALL
  SELECT query_id, vec_id, rank, relevance, mmr_score,
         list_append(picked_ids, vec_id) AS picked_ids,
         list_append(picked_vecs, cv) AS picked_vecs
  FROM (
    SELECT s.query_id, p.vec_id, s.rank + 1 AS rank, p.rel AS relevance,
           round(0.7 * p.rel - (1 - 0.7) * list_max(
             list_transform(s.picked_vecs,
               v -> round(list_cosine_similarity(p.cv, v), 4))), 4) AS mmr_score,
           s.picked_ids, s.picked_vecs, p.cv,
           row_number() OVER (
             PARTITION BY s.query_id
             ORDER BY round(0.7 * p.rel - (1 - 0.7) * list_max(
               list_transform(s.picked_vecs,
                 v -> round(list_cosine_similarity(p.cv, v), 4))), 4) DESC,
               p.vec_id ASC
           ) AS rn
    FROM sel s JOIN pool p
      ON p.query_id = s.query_id AND NOT list_contains(s.picked_ids, p.vec_id)
    WHERE s.rank < 5
  ) WHERE rn = 1
)
SELECT query_id, CAST(rank AS INTEGER) AS rank, vec_id,
       relevance, mmr_score
FROM sel
"""
    # LSH with multiprobe = n_planes and IVF with n_probe = n_centroids
    # have provably complete candidate coverage → both must reproduce
    # the exact top-k bit-for-bit
    o["knn_cosine_lsh"] = _knn_exact_sql
    o["knn_cosine_ivf"] = _knn_exact_sql

    # cluster-assignment twin: the 8×64 centroid matrix regenerated from
    # the same small-prime integer formula as the Spark side
    # (similarity._arith_planes — the arithmetic-hyperplane trick the
    # cosine-near-dup oracle already uses), cosine rounded to 6 BEFORE
    # the argmax (rounded-before-argmax determinism contract), ties to
    # the lowest cluster id
    _cluster_assign_sql_body = """e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
pw AS (
  SELECT p.range AS cluster, d.range AS dim,
         ((p.range * 73856093 + d.range * 19349663) % 1000003) / 1000003.0 * 2.0 - 1.0 AS w
  FROM range(8) p CROSS JOIN range(64) d
),
cent AS (SELECT cluster, list(w ORDER BY dim) AS cv FROM pw GROUP BY cluster),
sims AS (
  SELECT e.vec_id, c.cluster,
         round(CASE WHEN list_dot_product(e.v, e.v) > 0
               THEN list_dot_product(e.v, c.cv)
                    / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv)))
               ELSE 0.0 END, 6) AS sim
  FROM e CROSS JOIN cent c
),
best AS (
  SELECT vec_id, CAST(cluster AS INTEGER) AS cluster, sim,
         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cluster ASC) AS rn
  FROM sims
),
assign AS (SELECT vec_id, cluster, sim FROM best WHERE rn = 1)"""
    o["cluster_assign"] = f"""
WITH {_cluster_assign_sql_body}
SELECT vec_id, cluster, sim FROM assign
"""
    o["cluster_summary"] = f"""
WITH {_cluster_assign_sql_body}
SELECT cluster, CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(sim), 6) AS avg_sim, round(min(sim), 6) AS min_sim
FROM assign GROUP BY cluster
"""
    # keyword-label twin: identical tokenizer replay (lowercase →
    # \\w\\w+ → stopword filter, distinct per doc), integer counts into
    # the same (coverage · smoothed-idf) double expression — exact, like
    # the JLH significant-terms oracle
    o["cluster_keywords"] = f"""
WITH {_cluster_assign_sql_body},
tok AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\w\\w+')) AS term
    FROM documents
  ) WHERE term NOT IN ({_SW_SQL})
),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tok GROUP BY term),
nd AS (SELECT count(*) AS n FROM documents),
sizes AS (SELECT cluster, count(*) AS n_c FROM assign GROUP BY cluster),
cdf AS (
  SELECT a.cluster, tok.term, CAST(count(*) AS BIGINT) AS cluster_df
  FROM tok JOIN assign a ON a.vec_id = tok.doc_id
  GROUP BY a.cluster, tok.term
  HAVING count(*) >= 2
),
scored AS (
  SELECT cdf.cluster, cdf.term, cdf.cluster_df,
         round((cdf.cluster_df * 1.0 / s.n_c)
               * ln((nd.n + 1.0) / (dfreq.df + 1.0)), 6) AS score
  FROM cdf
  JOIN sizes s ON s.cluster = cdf.cluster
  JOIN dfreq ON dfreq.term = cdf.term
  CROSS JOIN nd
),
ranked AS (
  SELECT cluster, term, cluster_df, score,
         CAST(row_number() OVER (
           PARTITION BY cluster ORDER BY score DESC, term ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT cluster, rank, term, cluster_df, score FROM ranked WHERE rank <= 5
"""

    # int8 quantizer twin: floor(x/s + 0.5) clamp to ±127 (round-half-up
    # spelled as floor so Spark and DuckDB agree bitwise), then the
    # integer-exact cosine — products and partial sums are small ints,
    # so the double arithmetic matches the Spark kernel bit for bit
    o["knn_cosine_quantized"] = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sc AS (
  SELECT vec_id, v,
         CASE WHEN list_max(list_transform(v, x -> abs(x))) > 0
              THEN list_max(list_transform(v, x -> abs(x))) / 127.0
              ELSE 1.0 END AS s
  FROM e
),
qz AS (
  SELECT vec_id,
         list_transform(v, x -> greatest(least(floor(x / s + 0.5), 127.0), -127.0)) AS q
  FROM sc
),
qs AS (SELECT vec_id AS query_id, q AS qq FROM qz WHERE vec_id < 5),
cs AS (SELECT vec_id, q AS cq FROM qz),
scored AS (
  SELECT qs.query_id, cs.vec_id,
         CASE WHEN list_dot_product(qs.qq, qs.qq) > 0 AND list_dot_product(cs.cq, cs.cq) > 0
              THEN list_dot_product(qs.qq, cs.cq)
                   / (sqrt(list_dot_product(qs.qq, qs.qq)) * sqrt(list_dot_product(cs.cq, cs.cq)))
              ELSE 0.0 END AS cosine
  FROM qs CROSS JOIN cs
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, rank, vec_id, round(cosine, 4) AS cosine
FROM ranked WHERE rank <= 5
"""

    # RRF fusion twin: BM25 lucene top-10 (the full relational scoring
    # pipeline, nested WITH) ⊕ exact-cosine top-10 at the rounded-rank
    # contract, fused as sum(1/(60+rank)) and re-ranked (score desc,
    # doc_id asc) — DuckDB supports WITH inside a subquery, so the two
    # existing oracles compose verbatim
    o["retrieval_hybrid_rrf"] = f"""
WITH bm AS (
  SELECT query_id, doc_id, rank FROM ({_bm25_oracle_sql("lucene")})
),
kn AS (
  SELECT printf('q%02d', query_id + 1) AS query_id, vec_id AS doc_id, rank
  FROM (
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
    c AS (SELECT vec_id, embedding AS cv FROM embeddings),
    scored AS (
      SELECT q.query_id, c.vec_id,
             round(list_cosine_similarity(q.qv::DOUBLE[], c.cv::DOUBLE[]), 4) AS cosine
      FROM q CROSS JOIN c
    )
    SELECT query_id, vec_id,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
           ) AS INTEGER) AS rank
    FROM scored QUALIFY rank <= {TOPK}
  )
),
contrib AS (
  SELECT query_id, doc_id, 1.0 / (60.0 + rank) AS c FROM bm
  UNION ALL
  SELECT query_id, doc_id, 1.0 / (60.0 + rank) AS c FROM kn
),
fused AS (
  SELECT query_id, doc_id, round(sum(c), 6) AS rrf_score
  FROM contrib GROUP BY query_id, doc_id
)
SELECT query_id,
       CAST(row_number() OVER (
         PARTITION BY query_id ORDER BY rrf_score DESC, doc_id ASC
       ) AS INTEGER) AS rank,
       doc_id, rrf_score
FROM fused
QUALIFY rank <= {TOPK}
"""

    # linear-fusion twin: identical min-max normalization (degenerate
    # slate → 1.0) over the same rounded per-system scores, 0.7/0.3
    # weights as literals so the IEEE arithmetic matches bitwise
    o["retrieval_hybrid_linear"] = f"""
WITH bm AS (
  SELECT query_id, doc_id, score FROM ({_bm25_oracle_sql("lucene")})
),
kn AS (
  SELECT printf('q%02d', query_id + 1) AS query_id, vec_id AS doc_id, cosine AS score
  FROM (
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
    c AS (SELECT vec_id, embedding AS cv FROM embeddings),
    scored AS (
      SELECT q.query_id, c.vec_id,
             round(list_cosine_similarity(q.qv::DOUBLE[], c.cv::DOUBLE[]), 4) AS cosine
      FROM q CROSS JOIN c
    )
    SELECT query_id, vec_id, cosine,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
           ) AS INTEGER) AS rank
    FROM scored QUALIFY rank <= {TOPK}
  )
),
bmn AS (
  SELECT query_id, doc_id,
         CASE WHEN max(score) OVER w = min(score) OVER w THEN 1.0
              ELSE (score - min(score) OVER w)
                   / (max(score) OVER w - min(score) OVER w) END AS nrm
  FROM bm WINDOW w AS (PARTITION BY query_id)
),
knn_n AS (
  SELECT query_id, doc_id,
         CASE WHEN max(score) OVER w = min(score) OVER w THEN 1.0
              ELSE (score - min(score) OVER w)
                   / (max(score) OVER w - min(score) OVER w) END AS nrm
  FROM kn WINDOW w AS (PARTITION BY query_id)
),
contrib AS (
  SELECT query_id, doc_id, 0.7 * nrm AS c FROM bmn
  UNION ALL
  SELECT query_id, doc_id, 0.3 * nrm AS c FROM knn_n
),
fused AS (
  SELECT query_id, doc_id, round(sum(c), 6) AS fused_score
  FROM contrib GROUP BY query_id, doc_id
)
SELECT query_id,
       CAST(row_number() OVER (
         PARTITION BY query_id ORDER BY fused_score DESC, doc_id ASC
       ) AS INTEGER) AS rank,
       doc_id, fused_score
FROM fused
QUALIFY rank <= {TOPK}
"""

    # DuckDB twin of the banded sign-bit LSH near-dup pipeline: the
    # arithmetic hyperplanes (operators/similarity.py::_arith_planes)
    # regenerate from range(), then banding + exact cosine filter
    o["dedup_cosine_near_dup"] = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
planes AS (
  SELECT p.range AS plane, d.range AS dim,
         ((p.range * 73856093 + d.range * 19349663) % 1000003) / 1000003.0 * 2.0 - 1.0 AS w
  FROM range(16) p CROSS JOIN range(64) d
),
proj AS (
  SELECT e.vec_id, pl.plane, sum(e.v[pl.dim + 1] * pl.w) AS dot
  FROM e CROSS JOIN planes pl
  GROUP BY e.vec_id, pl.plane
),
bits AS (
  SELECT vec_id, plane // 4 AS band,
         CASE WHEN dot >= 0 THEN 1 << (plane % 4) ELSE 0 END AS bitval
  FROM proj
),
chunks AS (
  SELECT vec_id, band, sum(bitval) AS chunk FROM bits GROUP BY vec_id, band
),
pairs AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM chunks a JOIN chunks b ON a.band = b.band AND a.chunk = b.chunk
  WHERE a.vec_id < b.vec_id
),
cos AS (
  SELECT p.vec_a, p.vec_b, list_cosine_similarity(ea.v, eb.v) AS craw
  FROM pairs p
  JOIN e ea ON ea.vec_id = p.vec_a
  JOIN e eb ON eb.vec_id = p.vec_b
)
SELECT vec_a, vec_b, round(craw, 4) AS cosine FROM cos WHERE craw >= 0.4
"""

    from bm25s_spark.functions.text import BPE_SPLIT_PATTERN

    _bpe_pat = BPE_SPLIT_PATTERN.replace("'", "''")
    o["text_token_stats"] = f"""
SELECT doc_id,
       CAST(length(text) AS INTEGER) AS n_chars_text,
       CAST(len(list_filter(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '), x -> x != '')) AS INTEGER) AS n_ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '\\w\\w+')) AS INTEGER) AS n_regex_tokens,
       CAST(len(regexp_extract_all(text, '{_bpe_pat}')) AS INTEGER) AS n_bpe_tokens
FROM documents
"""

    o["text_quality"] = f"""
WITH base AS (
  SELECT doc_id, text,
         list_filter(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' '), x -> x != '') AS toks,
         greatest(length(text), 1) AS n_chars
  FROM documents
),
m AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         CAST(len(list_filter(toks, t -> t IN ({_SW_SQL}))) AS DOUBLE)
           / greatest(len(toks), 1) AS stopword_ratio,
         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / n_chars AS alpha_ratio,
         CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
           / greatest(len(toks), 1) AS mean_token_len
  FROM base
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       round(stopword_ratio, 4) AS stopword_ratio,
       round(alpha_ratio, 4) AS alpha_ratio,
       round(mean_token_len, 4) AS mean_token_len,
       round(0.4 * least(n_tokens / 20.0, 1.0)
             + 0.3 * greatest(1.0 - abs(stopword_ratio - 0.3) / 0.7, 0.0)
             + 0.3 * alpha_ratio, 4) AS quality_score
FROM m
"""

    o["text_lm_score"] = """
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' '), x -> x != '') AS toks
  FROM documents
),
ex AS (SELECT doc_id, unnest(toks) AS w FROM tok),
cnt AS (SELECT w, CAST(count(*) AS DOUBLE) AS c FROM ex GROUP BY w),
tot AS (SELECT sum(c) AS T, CAST(count(*) AS DOUBLE) AS V FROM cnt)
SELECT e.doc_id,
       CAST(count(*) AS INTEGER) AS n_tokens,
       round(-avg(ln((c + 0.5) / (T + 0.5 * V))), 4) AS cross_entropy
FROM ex e JOIN cnt USING (w) CROSS JOIN tot
GROUP BY e.doc_id
"""

    o["text_pmi_collocations"] = """
WITH tok AS (
  SELECT list_filter(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' '), x -> x != '') AS toks
  FROM documents
),
ex AS (SELECT unnest(toks) AS w FROM tok),
ucnt AS (SELECT w, CAST(count(*) AS DOUBLE) AS c FROM ex GROUP BY w),
bi AS (
  SELECT toks[i] AS w1, toks[i + 1] AS w2
  FROM (SELECT toks, unnest(range(1, greatest(len(toks), 1))) AS i FROM tok)
),
bcnt AS (SELECT w1, w2, count(*) AS pair_count FROM bi GROUP BY w1, w2),
tots AS (
  SELECT (SELECT CAST(sum(pair_count) AS DOUBLE) FROM bcnt) AS tb,
         (SELECT sum(c) FROM ucnt) AS tu
),
scored AS (
  SELECT b.w1, b.w2, b.pair_count,
         round(ln(CAST(b.pair_count AS DOUBLE) * tu * tu
                  / (tb * u1.c * u2.c)), 4) AS pmi
  FROM bcnt b
  JOIN ucnt u1 ON b.w1 = u1.w
  JOIN ucnt u2 ON b.w2 = u2.w
  CROSS JOIN tots
  WHERE b.pair_count >= 5
)
SELECT CAST(row_number() OVER (ORDER BY pmi DESC, w1, w2) AS INTEGER) AS rank,
       w1, w2, CAST(pair_count AS INTEGER) AS pair_count, pmi
FROM scored
ORDER BY pmi DESC, w1, w2
LIMIT 20
"""

    langs = {
        "en": _SW,
        "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von"),
        "fr": ("le", "la", "les", "et", "est", "une", "des", "dans", "pour", "que"),
        "es": ("el", "la", "los", "las", "es", "una", "del", "para", "que", "con"),
    }
    lang_rows = " UNION ALL ".join(
        f"SELECT doc_id, '{lg}' AS lang, CAST(len(list_filter(toks, t -> t IN ({', '.join(repr(w) for w in ws)}))) AS DOUBLE) / greatest(len(toks),1) AS share FROM base"
        for lg, ws in langs.items()
    )
    o["text_lang_id"] = f"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' '), x -> x != '') AS toks
  FROM documents
),
shares AS ({lang_rows}),
best AS (
  SELECT doc_id, lang, share,
         row_number() OVER (PARTITION BY doc_id ORDER BY share DESC, lang DESC) AS rn
  FROM shares
)
SELECT doc_id, CASE WHEN share > 0 THEN lang ELSE 'unk' END AS lang_guess
FROM best WHERE rn = 1
"""

    o["text_fingerprint"] = f"""
WITH n AS (
  SELECT doc_id, {_NORM_TEXT_SQL} AS norm FROM documents
)
SELECT doc_id, md5(norm) AS fp_md5,
       md5(array_to_string((string_split(norm, ' '))[1:5], ' ')) AS fp_head
FROM n
"""

    # twin of with_repetition over the same deterministic multi-line
    # rebuild (5-token lines + first line repeated); lines/words via
    # list functions, top n-gram via unnest + group + row_number with
    # the operator's tie rule (cnt DESC, gram ASC)
    o["text_repetition"] = """
WITH b AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
built AS (
  SELECT doc_id,
         list_transform(
           generate_series(0, CAST(ceil(len(tk) / 5.0) AS INT) - 1),
           i -> array_to_string(tk[i*5+1 : i*5+5], ' ')
         ) AS ls
  FROM b
),
t AS (
  SELECT doc_id,
         array_to_string(ls, chr(10)) || chr(10) || ls[1] AS text
  FROM built
),
rep AS (
  SELECT doc_id, text,
         list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)), l -> l != '') AS lines,
         list_filter(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' '), x -> x != '') AS toks
  FROM t
),
base AS (
  SELECT doc_id, text, toks,
         len(lines) AS n_lines,
         len(list_distinct(lines)) AS n_dlines,
         coalesce(list_sum(list_transform(lines, l -> length(l))), 0) AS line_chars,
         coalesce(list_sum(list_transform(list_distinct(lines), l -> length(l))), 0) AS dline_chars,
         len(toks) AS n_toks,
         len(list_distinct(toks)) AS n_dtoks
  FROM rep
),
g2 AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(toks) - 1, 0)), i -> toks[i] || ' ' || toks[i+1])) AS g
  FROM rep
),
top2 AS (
  SELECT doc_id, g, cnt FROM (
    SELECT doc_id, g, count(*) AS cnt,
           row_number() OVER (PARTITION BY doc_id ORDER BY count(*) DESC, g ASC) AS rn
    FROM g2 GROUP BY doc_id, g
  ) WHERE rn = 1
),
g3 AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(toks) - 2, 0)), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g
  FROM rep
),
top3 AS (
  SELECT doc_id, g, cnt FROM (
    SELECT doc_id, g, count(*) AS cnt,
           row_number() OVER (PARTITION BY doc_id ORDER BY count(*) DESC, g ASC) AS rn
    FROM g3 GROUP BY doc_id, g
  ) WHERE rn = 1
)
SELECT base.doc_id,
       CAST(n_lines AS INTEGER) AS n_lines,
       round(CAST(n_lines - n_dlines AS DOUBLE) / greatest(n_lines, 1), 4) AS dup_line_frac,
       round(CAST(line_chars - dline_chars AS DOUBLE) / greatest(line_chars, 1), 4) AS dup_line_char_frac,
       round(CAST(n_toks - n_dtoks AS DOUBLE) / greatest(n_toks, 1), 4) AS dup_word_frac,
       coalesce(top2.g, '') AS top_2gram,
       CAST(coalesce(top2.cnt, 0) AS INTEGER) AS top_2gram_cnt,
       round(CAST(coalesce(top2.cnt, 0) * length(coalesce(top2.g, '')) AS DOUBLE) / greatest(length(base.text), 1), 4) AS top_2gram_char_frac,
       coalesce(top3.g, '') AS top_3gram,
       CAST(coalesce(top3.cnt, 0) AS INTEGER) AS top_3gram_cnt,
       round(CAST(coalesce(top3.cnt, 0) * length(coalesce(top3.g, '')) AS DOUBLE) / greatest(length(base.text), 1), 4) AS top_3gram_char_frac
FROM base
LEFT JOIN top2 ON top2.doc_id = base.doc_id
LEFT JOIN top3 ON top3.doc_id = base.doc_id
"""

    # twin of gopher_filter over the same rebuild + injections: replay
    # every rule as exact integer-ratio comparisons (FP-identical to
    # Spark) and assemble drop_reasons in the operator's fixed rule
    # order; thresholds mirror the gate call (min_words=20,
    # min_stop_word_hits=1, rest at Gopher defaults)
    o["text_gopher_filter"] = """
WITH b AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
built AS (
  SELECT doc_id,
         list_transform(
           generate_series(0, CAST(ceil(len(tk) / 5.0) AS INT) - 1),
           i -> array_to_string(tk[i*5+1 : i*5+5], ' ')
         ) AS ls
  FROM b
),
inj1 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN list_transform(ls, l -> '- ' || l) ELSE ls END AS ls
  FROM built
),
inj2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN list_transform(ls, l -> l || '...') ELSE ls END AS ls
  FROM inj1
),
t AS (
  SELECT doc_id,
         array_to_string(ls, chr(10)) || chr(10) || ls[1] AS t0
  FROM inj2
),
t2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 0
              THEN t0 || chr(10) || '### ### ### … ... … ...'
              ELSE t0 END AS text
  FROM t
),
rep AS (
  SELECT doc_id, text,
         list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)), l -> l != '') AS lines,
         list_filter(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '), x -> x != '') AS ws,
         list_filter(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' '), x -> x != '') AS toks
  FROM t2
),
base AS (
  SELECT doc_id, text, ws, toks, lines,
         len(lines) AS n_lines,
         len(list_distinct(lines)) AS n_dlines,
         coalesce(list_sum(list_transform(lines, l -> length(l))), 0) AS line_chars,
         coalesce(list_sum(list_transform(list_distinct(lines), l -> length(l))), 0) AS dline_chars,
         len(ws) AS n_words,
         CAST(coalesce(list_sum(list_transform(ws, w -> length(w))), 0) AS DOUBLE)
           / greatest(len(ws), 1) AS mean_word_len,
         CAST(len(regexp_extract_all(text, '#|\\.\\.\\.|…')) AS DOUBLE)
           / greatest(len(ws), 1) AS symbol_word_ratio,
         CAST(len(list_filter(lines, l -> l[1:1] IN ('•', '‣', '▶', '-', '*'))) AS DOUBLE)
           / greatest(len(lines), 1) AS bullet_start_frac,
         CAST(len(list_filter(lines, l -> ends_with(l, '...') OR ends_with(l, '…'))) AS DOUBLE)
           / greatest(len(lines), 1) AS ellipsis_end_frac,
         CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
           / greatest(len(ws), 1) AS alpha_word_frac,
         len(list_filter(['the','be','to','of','and','that','have','with'],
                         s -> list_contains(toks, s))) AS stop_word_hits
  FROM rep
),
g2 AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(toks) - 1, 0)), i -> toks[i] || ' ' || toks[i+1])) AS g
  FROM rep
),
top2 AS (
  SELECT doc_id, g, cnt FROM (
    SELECT doc_id, g, count(*) AS cnt,
           row_number() OVER (PARTITION BY doc_id ORDER BY count(*) DESC, g ASC) AS rn
    FROM g2 GROUP BY doc_id, g
  ) WHERE rn = 1
),
g3 AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(toks) - 2, 0)), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g
  FROM rep
),
top3 AS (
  SELECT doc_id, g, cnt FROM (
    SELECT doc_id, g, count(*) AS cnt,
           row_number() OVER (PARTITION BY doc_id ORDER BY count(*) DESC, g ASC) AS rn
    FROM g3 GROUP BY doc_id, g
  ) WHERE rn = 1
),
sig AS (
  SELECT base.*,
         CAST(n_lines - n_dlines AS DOUBLE) / greatest(n_lines, 1) AS dup_line_frac,
         CAST(line_chars - dline_chars AS DOUBLE) / greatest(line_chars, 1) AS dup_line_char_frac,
         CAST(coalesce(top2.cnt, 0) * length(coalesce(top2.g, '')) AS DOUBLE)
           / greatest(length(base.text), 1) AS top_2gram_char_frac,
         CAST(coalesce(top3.cnt, 0) * length(coalesce(top3.g, '')) AS DOUBLE)
           / greatest(length(base.text), 1) AS top_3gram_char_frac
  FROM base
  LEFT JOIN top2 ON top2.doc_id = base.doc_id
  LEFT JOIN top3 ON top3.doc_id = base.doc_id
),
reasons AS (
  SELECT doc_id, n_words, mean_word_len, symbol_word_ratio,
         bullet_start_frac, ellipsis_end_frac, alpha_word_frac,
         stop_word_hits,
         list_filter([
           CASE WHEN n_words < 20 OR n_words > 100000 THEN 'word_count' END,
           CASE WHEN mean_word_len < 3.0 OR mean_word_len > 10.0 THEN 'mean_word_length' END,
           CASE WHEN symbol_word_ratio > 0.1 THEN 'symbol_ratio' END,
           CASE WHEN bullet_start_frac > 0.9 THEN 'bullet_lines' END,
           CASE WHEN ellipsis_end_frac > 0.3 THEN 'ellipsis_lines' END,
           CASE WHEN alpha_word_frac < 0.8 THEN 'alpha_words' END,
           CASE WHEN stop_word_hits < 1 THEN 'stop_words' END,
           CASE WHEN dup_line_frac > 0.3 THEN 'dup_line_frac' END,
           CASE WHEN dup_line_char_frac > 0.2 THEN 'dup_line_char_frac' END,
           CASE WHEN top_2gram_char_frac > 0.2 THEN 'top_2gram_char_frac' END,
           CASE WHEN top_3gram_char_frac > 0.18 THEN 'top_3gram_char_frac' END
         ], x -> x IS NOT NULL) AS dr
  FROM sig
)
SELECT doc_id,
       CAST(CASE WHEN len(dr) = 0 THEN 1 ELSE 0 END AS INTEGER) AS keep,
       coalesce(array_to_string(dr, ','), '') AS drop_reasons,
       CAST(n_words AS INTEGER) AS n_words,
       round(mean_word_len, 4) AS mean_word_len,
       round(symbol_word_ratio, 4) AS symbol_word_ratio,
       round(bullet_start_frac, 4) AS bullet_start_frac,
       round(ellipsis_end_frac, 4) AS ellipsis_end_frac,
       round(alpha_word_frac, 4) AS alpha_word_frac,
       CAST(stop_word_hits AS INTEGER) AS stop_word_hits
FROM reasons
"""

    # twin of with_redacted + with_normalized over the same injected
    # PII text; identical RE2-safe patterns, applied in the same order
    # (URL, then e-mail, then digit runs >= 6; then control-char strip,
    # whitespace collapse, trim)
    o["text_redact"] = r"""
WITH t AS (
  SELECT doc_id,
         'contact user' || CAST(doc_id AS VARCHAR)
           || '@example.com or see https://ex.org/d/'
           || CAST(doc_id AS VARCHAR)
           || '?sid=55555555 ' || chr(9) || ' id 123456789 and  ' || text
           AS text2
  FROM documents
),
red AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(text2, 'https?://[^\s]+', '<URL>', 'g'),
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+', '<EMAIL>', 'g'),
           '\d{6,}', '<NUM>', 'g') AS text_redacted
  FROM t
)
SELECT doc_id, text_redacted,
       trim(regexp_replace(regexp_replace(text_redacted, '[\x00-\x1f\x7f]', ' ', 'g'), '\s+', ' ', 'g')) AS text_clean
FROM red
"""

    # twin of contamination_report(n=5) vs the derived benchmark (every
    # 97th doc, first 12 normalized tokens); same short-doc shingle rule
    # as the operator (docs shorter than n yield one whole-text shingle)
    _DECONTAM_CTE = f"""
docs5 AS (
  SELECT doc_id, string_split({_NORM_TEXT_SQL}, ' ') AS l FROM documents
),
dsh5 AS (
  SELECT DISTINCT doc_id, array_to_string(l[i:i+4], ' ') AS shingle
  FROM (SELECT doc_id, l,
               unnest(generate_series(1, greatest(len(l) - 4, 1))) AS i
        FROM docs5)
),
bench AS (
  SELECT doc_id AS bench_id, l[1:12] AS l FROM docs5 WHERE doc_id % 97 = 0
),
bsh5 AS (
  SELECT DISTINCT bench_id, array_to_string(l[i:i+4], ' ') AS shingle
  FROM (SELECT bench_id, l,
               unnest(generate_series(1, greatest(len(l) - 4, 1))) AS i
        FROM bench)
),
rep AS (
  SELECT d.doc_id,
         CAST(count(DISTINCT d.shingle) AS BIGINT) AS n_shared_ngrams,
         CAST(count(DISTINCT b.bench_id) AS BIGINT) AS n_bench_docs
  FROM dsh5 d JOIN bsh5 b USING (shingle)
  GROUP BY d.doc_id
)"""

    o["decontam_report"] = f"""
WITH {_DECONTAM_CTE}
SELECT doc_id, n_shared_ngrams, n_bench_docs FROM rep
"""

    o["decontam_kept"] = f"""
WITH {_DECONTAM_CTE}
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM rep)
"""

    # twin of curate_corpus(filter → exact dedup → decontam → split):
    # the gopher rules replayed on RAW single-line text (thresholds
    # min_words=20, min_stop_word_hits=1, rest Gopher defaults), then
    # keep-lowest-id per normalized-md5 digest, then NOT IN the
    # decontamination report (rep, from _DECONTAM_CTE), then the
    # seed='gate' md5 split buckets
    o["curate_pipeline"] = f"""
WITH {_DECONTAM_CTE},
gq AS (
  SELECT doc_id, text,
         list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)), l -> l != '') AS lines,
         list_filter(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '), x -> x != '') AS ws,
         list_filter(string_split({_NORM_TEXT_SQL}, ' '), x -> x != '') AS toks
  FROM documents
),
gbase AS (
  SELECT doc_id, text, toks,
         len(lines) AS n_lines,
         len(list_distinct(lines)) AS n_dlines,
         coalesce(list_sum(list_transform(lines, l -> length(l))), 0) AS line_chars,
         coalesce(list_sum(list_transform(list_distinct(lines), l -> length(l))), 0) AS dline_chars,
         len(ws) AS n_words,
         CAST(coalesce(list_sum(list_transform(ws, w -> length(w))), 0) AS DOUBLE)
           / greatest(len(ws), 1) AS mean_word_len,
         CAST(len(regexp_extract_all(text, '#|\\.\\.\\.|…')) AS DOUBLE)
           / greatest(len(ws), 1) AS symbol_word_ratio,
         CAST(len(list_filter(lines, l -> l[1:1] IN ('•', '‣', '▶', '-', '*'))) AS DOUBLE)
           / greatest(len(lines), 1) AS bullet_start_frac,
         CAST(len(list_filter(lines, l -> ends_with(l, '...') OR ends_with(l, '…'))) AS DOUBLE)
           / greatest(len(lines), 1) AS ellipsis_end_frac,
         CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
           / greatest(len(ws), 1) AS alpha_word_frac,
         len(list_filter(['the','be','to','of','and','that','have','with'],
                         s -> list_contains(toks, s))) AS stop_word_hits
  FROM gq
),
gg2 AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(toks) - 1, 0)), i -> toks[i] || ' ' || toks[i+1])) AS g
  FROM gq
),
gtop2 AS (
  SELECT doc_id, g, cnt FROM (
    SELECT doc_id, g, count(*) AS cnt,
           row_number() OVER (PARTITION BY doc_id ORDER BY count(*) DESC, g ASC) AS rn
    FROM gg2 GROUP BY doc_id, g
  ) WHERE rn = 1
),
gg3 AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(toks) - 2, 0)), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g
  FROM gq
),
gtop3 AS (
  SELECT doc_id, g, cnt FROM (
    SELECT doc_id, g, count(*) AS cnt,
           row_number() OVER (PARTITION BY doc_id ORDER BY count(*) DESC, g ASC) AS rn
    FROM gg3 GROUP BY doc_id, g
  ) WHERE rn = 1
),
gsig AS (
  SELECT gbase.*,
         CAST(n_lines - n_dlines AS DOUBLE) / greatest(n_lines, 1) AS dup_line_frac,
         CAST(line_chars - dline_chars AS DOUBLE) / greatest(line_chars, 1) AS dup_line_char_frac,
         CAST(coalesce(gtop2.cnt, 0) * length(coalesce(gtop2.g, '')) AS DOUBLE)
           / greatest(length(gbase.text), 1) AS top_2gram_char_frac,
         CAST(coalesce(gtop3.cnt, 0) * length(coalesce(gtop3.g, '')) AS DOUBLE)
           / greatest(length(gbase.text), 1) AS top_3gram_char_frac
  FROM gbase
  LEFT JOIN gtop2 ON gtop2.doc_id = gbase.doc_id
  LEFT JOIN gtop3 ON gtop3.doc_id = gbase.doc_id
),
gkept AS (
  SELECT doc_id FROM gsig
  WHERE NOT (n_words < 20 OR n_words > 100000)
    AND NOT (mean_word_len < 3.0 OR mean_word_len > 10.0)
    AND symbol_word_ratio <= 0.1
    AND bullet_start_frac <= 0.9
    AND ellipsis_end_frac <= 0.3
    AND alpha_word_frac >= 0.8
    AND stop_word_hits >= 1
    AND dup_line_frac <= 0.3
    AND dup_line_char_frac <= 0.2
    AND top_2gram_char_frac <= 0.2
    AND top_3gram_char_frac <= 0.18
),
dd AS (
  SELECT d.doc_id,
         row_number() OVER (
           PARTITION BY md5({_NORM_TEXT_SQL}) ORDER BY d.doc_id
         ) AS rn
  FROM documents d JOIN gkept USING (doc_id)
),
kept2 AS (SELECT doc_id FROM dd WHERE rn = 1),
kept3 AS (
  SELECT doc_id FROM kept2
  WHERE doc_id NOT IN (SELECT doc_id FROM rep)
)
SELECT doc_id,
       CASE WHEN bucket < 8000 THEN 'train'
            WHEN bucket < 9000 THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id,
         CAST(('0x' || substr(md5('gate:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS bucket
  FROM kept3
)
"""

    # twin of hash_split(seed='gate', buckets=10000, 8/1/1) + hash_bucket
    o["sample_hash_split"] = """
WITH b AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('gate:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS bucket
  FROM documents
)
SELECT doc_id, bucket,
       CASE WHEN bucket < 8000 THEN 'train'
            WHEN bucket < 9000 THEN 'val'
            ELSE 'test' END AS split
FROM b
"""

    # twin of stratified_hash_sample(seed='mix', en 1.0 / es 0.5 /
    # de 0.25 / default 0.1)
    o["sample_stratified"] = """
WITH b AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS bucket
  FROM documents
)
SELECT doc_id, lang FROM b
WHERE bucket < CASE lang WHEN 'en' THEN 10000
                         WHEN 'es' THEN 5000
                         WHEN 'de' THEN 2500
                         ELSE 1000 END
"""

    # twin of upsample_corpus({"0": 2.5, "1": 1.0, "2": 0.25}): floor(w)
    # copies + one more iff the keyed-md5 bucket < frac(w)·buckets
    o["sample_upsample"] = """
WITH d AS (
  SELECT doc_id, CAST(doc_id % 3 AS VARCHAR) AS stratum,
         CAST(('0x' || substr(md5('upsample:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS b
  FROM documents
),
n AS (
  SELECT doc_id, stratum,
         CASE stratum WHEN '0' THEN 2 WHEN '1' THEN 1 WHEN '2' THEN 0 ELSE 1 END
         + CASE WHEN b < CASE stratum WHEN '0' THEN 5000 WHEN '1' THEN 0
                              WHEN '2' THEN 2500 ELSE 0 END
                THEN 1 ELSE 0 END AS n
  FROM d
)
SELECT doc_id, stratum,
       CAST(unnest(generate_series(0, n - 1)) AS INTEGER) AS epoch
FROM n WHERE n > 0
"""

    # twin of chunk_documents(chunk_size=32, overlap=8): stride 24,
    # n_chunks = max(1, ceil((n-8)/24)), window i = tokens
    # [i*24+1, i*24+32]; zero-token docs emit no rows
    o["chunk_documents"] = r"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\s+'), x -> x != '') AS tk
  FROM documents
),
nz AS (
  SELECT doc_id, tk,
         greatest(CAST(ceil((len(tk) - 8) / 24.0) AS INT), 1) AS n_chunks
  FROM t WHERE len(tk) > 0
),
e AS (
  SELECT doc_id, tk, n_chunks,
         unnest(generate_series(0, n_chunks - 1)) AS chunk_id
  FROM nz
)
SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id, n_chunks,
       CAST(len(tk[chunk_id*24+1 : chunk_id*24+32]) AS INT) AS n_tokens,
       array_to_string(tk[chunk_id*24+1 : chunk_id*24+32], ' ') AS chunk_text
FROM e
"""

    # twin of pack_sequences(max_tokens=128, n_groups=8): the keyed-md5
    # group mirrors hash_bucket(seed="pack") exactly, then a recursive
    # CTE replays the greedy scan in lockstep across groups (rn joins
    # advance every group one document per iteration); "group" quoted —
    # reserved word in DuckDB
    o["pack_sequences"] = r"""
WITH RECURSIVE d0 AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x != '')) AS INT) AS n_tokens,
         CAST(('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS INT) AS grp
  FROM documents
),
d AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY grp ORDER BY doc_id) AS INT) AS rn
  FROM d0
),
s AS (
  SELECT grp, rn, doc_id, n_tokens, 0 AS seq, n_tokens AS acc
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.grp, d.rn, d.doc_id, d.n_tokens,
         CASE WHEN s.acc + d.n_tokens <= 128 THEN s.seq ELSE s.seq + 1 END,
         CASE WHEN s.acc + d.n_tokens <= 128 THEN s.acc + d.n_tokens ELSE d.n_tokens END
  FROM s JOIN d ON d.grp = s.grp AND d.rn = s.rn + 1
)
SELECT CAST(grp AS INT) AS "group",
       CAST(seq AS INT) AS seq,
       CAST(row_number() OVER (PARTITION BY grp, seq ORDER BY doc_id) - 1 AS INT) AS pos,
       doc_id,
       n_tokens,
       CAST(sum(n_tokens) OVER (PARTITION BY grp, seq) AS INT) AS seq_tokens
FROM s
"""

    # twin of transcripts.conversation_rollup over the derived
    # transcripts shape (same doc_id → conv/turn/role mapping as
    # _transcripts); string_agg ORDER BY turn_idx = the sort_array join
    o["transcripts_conv_rollup"] = """
WITH t AS (
  SELECT printf('conv-%06d', doc_id // 4) AS conv_id,
         CAST(doc_id % 4 AS INTEGER) AS turn_idx,
         CASE CAST(doc_id % 3 AS INTEGER)
           WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool'
         END AS role,
         text
  FROM documents
)
SELECT conv_id,
       string_agg(text, ' ' ORDER BY turn_idx) AS conv_text,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(count(*) FILTER (role = 'user') AS BIGINT) AS n_user_turns,
       CAST(count(*) FILTER (role = 'assistant') AS BIGINT) AS n_assistant_turns,
       CAST(sum(length(text)) AS BIGINT) AS n_chars,
       CAST(min(turn_idx) AS INTEGER) AS first_turn,
       CAST(max(turn_idx) AS INTEGER) AS last_turn
FROM t GROUP BY conv_id
"""

    # microsecond-exact twin of operators/events.py::session_summary
    o["events_sessionize"] = """
WITH lagged AS (
  SELECT user_id, event_id, ts, value,
         lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS prev_us
  FROM events
),
flagged AS (
  SELECT *, CASE
      WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000 THEN 1
      ELSE 0 END AS is_new
  FROM lagged
),
sess AS (
  SELECT *, sum(is_new) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING
         ) AS session_idx
  FROM flagged
)
SELECT user_id, CAST(session_idx AS INTEGER) AS session_idx,
       min(ts) AS session_start, max(ts) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 4) AS sum_value,
       CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) AS duration_us
FROM sess GROUP BY 1, 2
"""

    # twin of streaming/sessions.py::session_window_rollup in batch
    # mode: same lag/boundary construction as events_sessionize (Spark's
    # session window merges at EXACTLY the gap, matching `> gap` splits),
    # window_end = last event + gap
    # twin of asof_join via DuckDB's NATIVE ASOF LEFT JOIN (>= tie
    # inclusion = the operator's equal-ts match rule); gap in exact
    # integer micros
    o["events_asof_join"] = """
SELECT l.event_id,
       l.user_id,
       l.ts,
       r.ts AS view_ts,
       r.event_id AS view_event_id,
       round(r.value, 4) AS view_value,
       CAST(epoch_us(l.ts) - epoch_us(r.ts) AS BIGINT) AS gap_us
FROM (SELECT event_id, ts, user_id, value FROM events WHERE event_type = 'click') l
ASOF LEFT JOIN (SELECT ts, user_id, event_id, value FROM events WHERE event_type = 'view') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""

    o["events_session_window"] = """
WITH lagged AS (
  SELECT user_id, event_id, ts, value,
         lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS prev_us
  FROM events
),
flagged AS (
  SELECT *, CASE
      WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000 THEN 1
      ELSE 0 END AS is_new
  FROM lagged
),
sess AS (
  SELECT *, sum(is_new) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING
         ) AS session_idx
  FROM flagged
)
SELECT user_id,
       min(ts) AS window_start,
       max(ts) + INTERVAL 30 MINUTE AS window_end,
       min(ts) AS session_start, max(ts) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 4) AS sum_value
FROM sess GROUP BY user_id, session_idx
"""

    o["events_hourly_rollup"] = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""

    # twin of transcripts.speaker_stats over the derived transcripts
    # shape: same lag window as events_sessionize, token counts via the
    # engine tokenizer's pre-stopword \w\w+ replay, latency in exact
    # integer micros (ts regenerated from doc_id arithmetic — gaps are
    # timezone-invariant so the naive-vs-instant flavor cannot matter)
    o["transcripts_speaker_stats"] = """
WITH t AS (
  SELECT printf('conv-%06d', doc_id // 4) AS conv_id,
         CAST(doc_id % 4 AS INTEGER) AS turn_idx,
         CASE CAST(doc_id % 3 AS INTEGER)
           WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool'
         END AS role,
         text,
         TIMESTAMP '2026-01-01 00:00:00'
           + to_microseconds(doc_id * 60000000) AS ts
  FROM documents
),
l AS (
  SELECT conv_id, role,
         CAST(length(regexp_extract_all(lower(text), '\\w\\w+')) AS BIGINT) AS nt,
         lag(role) OVER w AS prev_role,
         epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
  FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
f AS (
  SELECT *, (prev_role IS NOT NULL AND prev_role <> role) AS is_resp FROM l
)
SELECT conv_id, role,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(nt) AS BIGINT) AS n_tokens,
       round(sum(nt) / count(*), 6) AS avg_tokens,
       CAST(count(*) FILTER (is_resp) AS BIGINT) AS n_responses,
       CAST(coalesce(sum(gap_us) FILTER (is_resp), 0) AS BIGINT) AS sum_response_us,
       CASE WHEN count(*) FILTER (is_resp) > 0
            THEN round(sum(gap_us) FILTER (is_resp)
                       / count(*) FILTER (is_resp) / 1000000.0, 6)
       END AS avg_response_sec
FROM f GROUP BY conv_id, role
"""

    # twins of operators/drift.py: engine-tokenizer replay on the two
    # snapshot halves, Laplace smoothing over the union vocab — every
    # probability is one IEEE division of exact integers, so only ln's
    # last ulp differs cross-engine and the rounding absorbs it
    _drift_dist_sql = f"""
ta AS (
  SELECT unnest(regexp_extract_all(lower(text), '\\w\\w+')) AS term
  FROM documents WHERE doc_id % 2 = 0
),
tb AS (
  SELECT unnest(regexp_extract_all(lower(text), '\\w\\w+')) AS term
  FROM documents WHERE doc_id % 2 = 1
),
fa AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cnt_a FROM ta
  WHERE term NOT IN ({_SW_SQL}) GROUP BY term
),
fb AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cnt_b FROM tb
  WHERE term NOT IN ({_SW_SQL}) GROUP BY term
),
j AS (
  SELECT coalesce(fa.term, fb.term) AS term,
         CAST(coalesce(cnt_a, 0) AS BIGINT) AS cnt_a,
         CAST(coalesce(cnt_b, 0) AS BIGINT) AS cnt_b
  FROM fa FULL OUTER JOIN fb ON fa.term = fb.term
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS v,
         CAST(sum(cnt_a) AS BIGINT) AS n_a,
         CAST(sum(cnt_b) AS BIGINT) AS n_b,
         CAST(count(*) FILTER (cnt_a > 0) AS BIGINT) AS vocab_a,
         CAST(count(*) FILTER (cnt_b > 0) AS BIGINT) AS vocab_b
  FROM j
),
p AS (
  SELECT term, cnt_a, cnt_b, v, n_a, n_b, vocab_a, vocab_b,
         (cnt_a + 1.0) / (n_a + v) AS pa,
         (cnt_b + 1.0) / (n_b + v) AS pb
  FROM j CROSS JOIN tot
)"""

    o["corpus_term_drift"] = f"""
WITH {_drift_dist_sql},
s AS (
  SELECT term, cnt_a, cnt_b,
         round(pa, 9) AS p_a, round(pb, 9) AS p_b,
         round(ln(pa / pb), 9) AS log_ratio,
         round((pa - pb) * ln(pa / pb), 9) AS score
  FROM p
),
r AS (
  SELECT *, CAST(row_number() OVER (ORDER BY score DESC, term ASC) AS INTEGER) AS rank
  FROM s
)
SELECT rank, term, cnt_a, cnt_b, p_a, p_b, log_ratio, score
FROM r WHERE rank <= 20
"""

    o["corpus_drift_summary"] = f"""
WITH {_drift_dist_sql}
SELECT CAST(max(n_a) AS BIGINT) AS n_tokens_a,
       CAST(max(n_b) AS BIGINT) AS n_tokens_b,
       CAST(max(vocab_a) AS BIGINT) AS vocab_a,
       CAST(max(vocab_b) AS BIGINT) AS vocab_b,
       CAST(max(v) AS BIGINT) AS vocab_union,
       round(sum(pa * ln(pa / pb)), 6) AS kl_ab,
       round(sum(-pb * ln(pa / pb)), 6) AS kl_ba,
       round(sum((pa - pb) * ln(pa / pb)), 6) AS jeffreys
FROM p
"""

    # twin of operators/coverage.py::query_coverage — corpus vocab and
    # query tokenization replayed with the engine tokenizer's rules;
    # matched-via-postings == matched-via-vocab because every vocab term
    # has >= 1 posting and queries never produce the "" patch term
    o["search_query_coverage"] = f"""
WITH tok_raw AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\w\\w+')) AS term
  FROM documents
),
toks AS (SELECT doc_id, term FROM tok_raw WHERE term NOT IN ({_SW_SQL})),
queries(query_id, qtext) AS (VALUES {_QUERIES_SQL}),
qtok_raw AS (
  SELECT query_id, unnest(regexp_extract_all(lower(qtext), '\\w\\w+')) AS term
  FROM queries
),
qterms AS (
  SELECT query_id, term, CAST(count(*) AS BIGINT) AS mult
  FROM qtok_raw WHERE term NOT IN ({_SW_SQL}) GROUP BY query_id, term
),
qstats AS (
  SELECT query_id, CAST(sum(mult) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_unique_terms
  FROM qterms GROUP BY query_id
),
vocab AS (SELECT DISTINCT term FROM toks),
oov AS (
  SELECT q.query_id, q.term FROM qterms q
  LEFT JOIN vocab v ON v.term = q.term WHERE v.term IS NULL
),
oov_agg AS (
  SELECT query_id, CAST(count(*) AS BIGINT) AS n_oov_terms,
         string_agg(term, ',' ORDER BY term) AS oov_terms
  FROM oov GROUP BY query_id
),
cand AS (
  SELECT q.query_id,
         CAST(count(DISTINCT t.doc_id) AS BIGINT) AS n_candidate_docs
  FROM (SELECT DISTINCT query_id, term FROM qterms) q
  JOIN toks t USING (term) GROUP BY q.query_id
)
SELECT qu.query_id,
       coalesce(n_tokens, 0) AS n_tokens,
       coalesce(n_unique_terms, 0) AS n_unique_terms,
       coalesce(n_oov_terms, 0) AS n_oov_terms,
       coalesce(oov_terms, '') AS oov_terms,
       coalesce(n_candidate_docs, 0) AS n_candidate_docs,
       CAST(coalesce(n_candidate_docs, 0) = 0 AS INTEGER) AS zero_hit
FROM queries qu
LEFT JOIN qstats USING (query_id)
LEFT JOIN oov_agg USING (query_id)
LEFT JOIN cand USING (query_id)
"""

    return o
