"""Index construction: the "eager sparse BM25 index" as Spark tables.

The reference builds a CSC sparse matrix of precomputed BM25 impacts
(``reference/bm25s/__init__.py:326-438``).  Our equivalent index is a set
of DataFrames/tables:

- ``doc_lens``   (doc_id, dl)                       — per-doc token count
- ``term_stats`` (term, term_id, df, nnoc_*)        — vocab + doc freq
- ``postings``   (term, doc_id, tf, dl, impact_*)   — the flat inverted
  index with **eagerly precomputed float32 impacts for all five variants**
  (north_star requirement), equivalent to the reference's CSC ``data``/
  ``indices`` arrays (``reference/bm25s/__init__.py:432-438``)
- ``stats``      scalars: num_docs, avg_doc_len, k1, b, delta

The build is a pure DataFrame pipeline (SURVEY.md §3.1 lifecycle):

1. tokenize (Arrow pandas UDF, narrow)
2. TF per (doc, term) as a narrow per-row array computation — a doc's
   tokens sit in one row, so the per-doc ``Counter``
   (``reference/bm25s/scoring.py:238-243``) is array_distinct + filter
   counts + explode; ``dl`` rides along.  NO posting-size shuffle.
3. DF per term via ``count`` (map-side partial aggregation bounds each
   reducer's input at n_partitions rows per term — no skew)
   (reference: ``reference/bm25s/scoring.py:28-57``)
4. join TF × term_stats (vocab-sized → broadcast/AQE) + the impact
   column expressions (reference: ``reference/bm25s/scoring.py:246-309``)

``k1/b/delta`` are pinned at index time like the reference
(``reference/bm25s/__init__.py:144-152``); ``method``/``idf_method`` stay
query-time choices because every variant's impact is stored (and arbitrary
``method × idf_method`` cross-combinations are recoverable exactly from
``tf``/``dl``/``df``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from bm25s_spark import scoring
from bm25s_spark.ids import assign_dense_ids, assign_doc_ids
from bm25s_spark.scoring import (
    DEFAULT_B,
    DEFAULT_DELTA,
    DEFAULT_K1,
    METHOD_SLUGS,
    METHODS,
)
from bm25s_spark.tokenization import make_tokenizer_udf


IMPACT_COLS = {m: f"impact_{METHOD_SLUGS[m]}" for m in METHODS}
NNOC_COLS = {m: f"nnoc_{METHOD_SLUGS[m]}" for m in scoring.METHODS_REQUIRING_NNOC}

# docs_per_shard clamp for auto_docs_per_shard: the cap keeps the query
# kernel's dense per-shard score vector cache-bounded (65536 float32 =
# 256 KiB) and bounds the build's collect_list group size; the floor
# stops tiny corpora from paying per-shard overhead (posting lists split
# across shards, per-shard top-k merges) that outweighs the extra tasks.
SHARD_SIZE_FLOOR = 4096
SHARD_SIZE_CAP = 65536

# assign_dense_ids localize cap for the vocab table (term, df): ≤1M
# terms (~tens of MB) assign term_ids on the driver in one bounded
# Arrow pull; larger vocabularies keep the distributed range partitioner
VOCAB_LOCALIZE_MAX = 1_000_000


def auto_docs_per_shard(num_docs: int, parallelism: int,
                        floor: int = SHARD_SIZE_FLOOR,
                        cap: int = SHARD_SIZE_CAP) -> int:
    """Shard size targeting ~one query-kernel task per core.

    One kernel task scores one shard (``shards.retrieve_sharded``), so
    too few shards strand cores: at 205k docs a fixed 65536 yields 4
    shards — 4 busy tasks on a 32-core host (measured 4.0 s for a
    256-query batch vs 2.7 s at 26 shards).  Pick the smallest power of
    two ≥ ``num_docs / parallelism``, clamped to
    ``[SHARD_SIZE_FLOOR, SHARD_SIZE_CAP]``.

    Corpora ≥ cap·parallelism docs keep the cap and already get far
    more shards than cores (10M docs / 32 cores → 65536, 153 shards —
    identical to the old fixed value); on a 1000-executor cluster the
    cap likewise yields shards ≫ cores, where wave scheduling absorbs
    shard skew.  The knob only moves for small/medium corpora, where
    parallelism — not per-shard overhead — is the binding constraint.
    """
    parallelism = max(int(parallelism), 1)
    target = max(1, -(-int(num_docs) // parallelism))  # ceil div
    dps = 1 << (target - 1).bit_length()
    return min(max(dps, floor), cap)


@dataclass
class BM25Index:
    """Handle to the index tables plus the global scalars."""

    spark: SparkSession
    postings: DataFrame          # (term, doc_id, tf, dl, impact_* ×5 float32)
    term_stats: DataFrame        # (term, term_id, df, nnoc_bm25l, nnoc_bm25plus)
    doc_lens: DataFrame          # (doc_id, dl)
    doc_map: DataFrame | None    # (doc_id, <original key/payload columns>)
    num_docs: int
    avg_doc_len: float
    k1: float = DEFAULT_K1
    b: float = DEFAULT_B
    delta: float = DEFAULT_DELTA
    tokenizer_kwargs: dict = field(default_factory=dict)
    sharded: DataFrame | None = None   # blocked layout (see postings_blocks)
    docs_per_shard: int = 65536
    # build-internal cached stages (tokenized, tf) — released by unpersist()
    aux_persisted: list = field(default_factory=list)

    def persist(self) -> "BM25Index":
        self.postings = self.postings.persist()
        self.term_stats = self.term_stats.persist()
        self.doc_lens = self.doc_lens.persist()
        return self

    def unpersist(self) -> None:
        for df in (self.postings, self.term_stats, self.doc_lens,
                   *self.aux_persisted):
            try:
                df.unpersist()
            except Exception:
                pass

    # ---- query API (delegates) -------------------------------------
    def retrieve(self, queries_df: DataFrame, k: int = 10, **kw) -> DataFrame:
        from bm25s_spark.retrieval import retrieve

        return retrieve(self, queries_df, k=k, **kw)

    def get_scores(self, queries_df: DataFrame, **kw) -> DataFrame:
        from bm25s_spark.retrieval import score_all

        return score_all(self, queries_df, **kw)

    def save(self, path: str, fmt: str = "parquet") -> None:
        from bm25s_spark.index_io import save_index

        save_index(self, path, fmt=fmt)


def narrow_tf(tokenized: DataFrame, tokens_col: str = "tokens",
              max_narrow_len: int = 4096,
              max_doc_len: int | None = None) -> DataFrame:
    """TF per (doc, term) WITHOUT a shuffle → (doc_id, dl, term, tf).

    A doc's tokens already sit in one row, so the reference's per-doc
    ``Counter`` (``reference/bm25s/scoring.py:238-243``) is a narrow
    per-row array computation: count each distinct token inside the
    array and explode the (term, tf) pairs; ``dl`` rides along instead
    of being joined back from doc_lens.  This removes two posting-size
    shuffles (the groupBy(doc_id, term) and the doc_lens join) from the
    build — the only remaining big shuffle is the sharded groupBy, i.e.
    the index layout itself.

    The narrow computation is O(distinct × len) per doc — trivial for
    turn-sized texts vs any shuffle, but quadratic-ish for megadocs, so
    docs longer than ``max_narrow_len`` take the classic
    explode → groupBy path instead (a shuffle bounded by the megadoc
    slice only; both branches read the same persisted tokenized stage).
    When the caller already knows the corpus max doc length
    (``max_doc_len``, free from the stats agg) and it fits the narrow
    path, the two-branch union — which would scan the cached tokens
    twice per downstream job, a measured ~25% flat-build tax — is
    skipped entirely.
    """
    toks = F.col(tokens_col)
    if max_doc_len is not None and max_doc_len <= max_narrow_len:
        short = tokenized
    else:
        short = tokenized.where(F.size(toks) <= max_narrow_len)
    tf_pairs = F.transform(
        F.array_distinct(toks),
        lambda t: F.struct(
            t.alias("term"),
            F.size(F.filter(toks, lambda x: x == t)).alias("tf"),
        ),
    )
    narrow = short.select(
        "doc_id",
        F.size(toks).alias("dl"),
        F.explode(tf_pairs).alias("p"),
    ).select("doc_id", "dl", F.col("p.term").alias("term"), F.col("p.tf").alias("tf"))
    if max_doc_len is not None and max_doc_len <= max_narrow_len:
        return narrow
    long_docs = tokenized.where(F.size(toks) > max_narrow_len)
    wide = (
        long_docs.select(
            "doc_id", F.size(toks).alias("dl"), F.explode(toks).alias("term")
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return narrow.unionByName(wide)


def stem_tf(tf_surface: DataFrame, stemmer,
            broadcast_max_terms: int = 2_000_000) -> DataFrame:
    """Fold surface-form TF rows into stemmed-term TF rows.

    Stemming is deterministic per token TYPE, so it never needs to run
    per occurrence: stem the distinct surface terms once (a vocab-sized
    pandas pass — the only Python in the whole build when the corpus
    scan used the JVM tokenizer), then join the ``(surface, stem)`` map
    back onto the TF table and re-aggregate ``(doc_id, stem)``.  Exactly
    equal to stemming every occurrence: tf sums over the surface forms
    of a stem, and ``dl`` is stem-invariant (stemming maps token→token
    after the stopword filter, preserving count).

    Scale shape: the map is checkpointed (it feeds one join; the stem
    UDF runs once), counted, and broadcast only while its term count is
    ≤ ``broadcast_max_terms`` — web-scale vocabularies (10⁸ surface
    forms) fall back to a shuffle join, which AQE plans alongside the
    groupBy's own posting-sized exchange.  The re-aggregation is
    map-side combinable and bounded by the postings themselves.

    MEASURED tradeoff (bench steps ``index_build_stemmed`` vs
    ``index_build_sqlstem``, 205k docs / ~31k surface forms): the fold
    is break-even to slightly SLOWER than the pandas engine's
    per-occurrence stemming — the tokenizer UDF memoizes stems per
    task, so each occurrence costs one dict hit, while the fold pays
    two posting-sized exchanges (the distinct and the re-aggregation).
    Choose this path when Python worker capacity is the constrained
    resource (it removes Python from the corpus scan entirely; the
    stem UDF touches only the vocab), not for single-host speed.
    """
    from bm25s_spark.tokenization import make_stem_udf
    from bm25s_spark.util import eager_checkpoint

    stem_udf = make_stem_udf(stemmer)
    mapping = eager_checkpoint(
        tf_surface.select("term").distinct().select(
            "term", stem_udf(F.col("term")).alias("_stem")
        ),
        reliable=True,
    )
    m = F.broadcast(mapping) if mapping.count() <= broadcast_max_terms \
        else mapping
    return (
        tf_surface.join(m, "term")
        .select("doc_id", "dl", F.col("_stem").alias("term"), "tf")
        .groupBy("doc_id", "dl", "term")
        .agg(F.sum("tf").cast("long").alias("tf"))
    )


def build_index(
    docs: DataFrame,
    text_col: str = "text",
    doc_id_col: str | None = None,
    order_cols: list[str] | None = None,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    delta: float = DEFAULT_DELTA,
    stopwords="en",
    stemmer: str | None = None,
    token_pattern: str | None = None,
    empty_fallback: bool = False,
    keep_doc_map: bool = True,
    tokenizer_engine: str = "pandas",
) -> BM25Index:
    """Build the eager BM25 index from a document DataFrame.

    ``doc_id_col``: use an existing integer doc id column; otherwise dense
    ids are assigned by rank under ``order_cols`` (default
    ``(conv_id, turn_idx)`` — the transcripts doc-identity rule).

    ``tokenizer_engine="sql"`` tokenizes with pure JVM column
    expressions — same output as the default Arrow-UDF path for
    ASCII/ordinary-Unicode text, no Python in the corpus scan; the
    engine travels in ``tokenizer_kwargs`` so queries tokenize
    identically at retrieve time.  WITH a stemmer, the corpus scan is
    still pure-JVM (surface tokens) and stemming folds into a
    vocab-sized pass (:func:`stem_tf` — Python cost O(distinct terms),
    not O(corpus tokens); see its docstring for the measured tradeoff);
    query batches stem through the pandas twin ``make_tokenizer_udf``
    returns for this spec.  Engine asymmetry caveat for ``sql`` +
    stemmer: the CORPUS tokenizes under Java regex, the QUERY side
    under Python ``re`` (the pandas twin) — the engines differ on
    exotic Unicode word characters (superscript digits and the like),
    so corpus terms containing such characters can be unreachable from
    text queries.  Stemmer-less ``sql`` keeps both sides JVM and has no
    such asymmetry.
    """
    spark = docs.sparkSession
    tok_kwargs = dict(
        stopwords=stopwords,
        stemmer=stemmer,
        empty_fallback=empty_fallback,
    )
    if token_pattern is not None:
        tok_kwargs["token_pattern"] = token_pattern
    if tokenizer_engine != "pandas":
        tok_kwargs["engine"] = tokenizer_engine

    build_caches: list = []
    if doc_id_col is not None:
        base = docs.withColumn("doc_id", F.col(doc_id_col).cast("long"))
    else:
        base = assign_doc_ids(docs, order_cols, persisted_out=build_caches)

    sql_stem = tokenizer_engine == "sql" and stemmer is not None
    if sql_stem:
        # JVM scan over SURFACE tokens; the stemmer spec stays in
        # tok_kwargs (query side + stem_tf fold), but never in the scan
        udf = make_tokenizer_udf(**dict(tok_kwargs, stemmer=None))
    else:
        udf = make_tokenizer_udf(**tok_kwargs)
    # persist: tokenization (the one Python stage) must run exactly once
    # even though three downstream branches (stats, TF, DF) consume it;
    # the checkpointed builder materializes this stage as a table instead
    from pyspark.storagelevel import StorageLevel

    tokenized = base.select(
        "doc_id", udf(F.col(text_col)).alias("tokens")
    ).persist(StorageLevel.MEMORY_AND_DISK)

    doc_map = base if keep_doc_map else None
    return _index_from_tokenized(
        spark, tokenized, doc_map, k1, b, delta, tok_kwargs,
        stem_with=stemmer if sql_stem else None,
        aux_persisted=build_caches,
    )


def _index_from_tokenized(
    spark: SparkSession,
    tokenized: DataFrame,
    doc_map: DataFrame | None,
    k1: float,
    b: float,
    delta: float,
    tok_kwargs: dict,
    stem_with=None,
    aux_persisted: list | None = None,
) -> BM25Index:
    """Shared back half of the build: (doc_id, tokens) → BM25Index.

    ``stem_with``: stemmer spec when ``tokenized`` carries SURFACE
    tokens that still need the vocab-sized stemming fold
    (:func:`stem_tf` — the ``tokenizer_engine="sql"`` + stemmer path).
    ``dl`` and the corpus scalars are stem-invariant, so they are
    computed before the fold."""
    doc_lens = tokenized.select(
        "doc_id", F.size("tokens").alias("dl")
    ).persist()

    # one tiny action for the global scalars (reference does the same
    # single pass for avg_doc_len, reference/bm25s/__init__.py:357);
    # max(dl) rides along for free and lets narrow_tf skip the megadoc
    # union branch when the corpus has no megadocs
    agg = doc_lens.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl"),
        F.max("dl").alias("maxdl"),
    ).collect()[0]
    num_docs, avgdl = int(agg["n"]), float(agg["avgdl"] or 0.0)

    tf = narrow_tf(tokenized, max_doc_len=int(agg["maxdl"] or 0))
    aux = list(aux_persisted or [])
    aux.append(tokenized)
    if stem_with is not None:
        # the surface-form TF is consumed twice by the fold (distinct-term
        # mapping + the re-aggregation join) — cache it so the explode
        # runs once
        tf = tf.persist(StorageLevel.MEMORY_AND_DISK)
        aux.append(tf)
        tf = stem_tf(tf, stem_with)
    return _index_from_tf(
        spark, tf, doc_lens, doc_map, num_docs, avgdl, k1, b, delta,
        tok_kwargs, aux_persisted=aux,
    )


def _index_from_tf(
    spark: SparkSession,
    tf: DataFrame,
    doc_lens: DataFrame,
    doc_map: DataFrame | None,
    num_docs: int,
    avgdl: float,
    k1: float,
    b: float,
    delta: float,
    tok_kwargs: dict,
    dfreq: DataFrame | None = None,
    aux_persisted: list | None = None,
) -> BM25Index:
    """(doc_id, dl, term, tf) rows → the eager index tables.

    ``dfreq`` (term, df), when given, skips the posting-sized DF
    aggregation — :func:`merge_indexes` passes the vocab-sized sum of
    the sides' document frequencies instead."""
    # cache the TF table: it is consumed by THREE separate jobs (the
    # vocab range-partitioner's sample, the vocab id-assignment
    # materialization, and the final postings join) — without the cache
    # each of those re-runs the narrow explode over the whole corpus
    # (measured ~3× the per-pass cost on the bench build).  Postings-
    # sized but compact (4 narrow columns); MEMORY_AND_DISK spills at
    # scale, and unpersist() releases it with the index.
    tf = tf.persist(StorageLevel.MEMORY_AND_DISK)
    aux_persisted = list(aux_persisted or [])
    aux_persisted.append(tf)
    # DF per term: reference/bm25s/scoring.py:28-57 — map-side partial
    # aggregation bounds the shuffle at one row per term per partition
    if dfreq is None:
        dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    # vocab with the empty-token patch (reference/bm25s/__init__.py:562-564):
    # "" joins the vocab (df=0 → contributes nothing, but OOV lookups hit it)
    empty_row = spark.range(1).select(
        F.lit("").alias("term"), F.lit(0).cast("long").alias("df")
    )  # JVM-native one-row relation: createDataFrame(rows) would put a
    # Python-worker scan into every downstream postings/save plan
    # max() dedups against a real "" term (possible when empty_fallback
    # inserted "" into documents — its true df>0 wins over the patch's 0)
    vocab = (
        dfreq.unionByName(empty_row).groupBy("term").agg(F.max("df").alias("df"))
    )
    # vocab-sized and narrow (term, df): ids assign driver-locally up to
    # VOCAB_LOCALIZE_MAX terms (one bounded Arrow pull + a pandas sort →
    # pure-JVM local relation) instead of the 3-job range-partitioner
    # path; web-scale vocabularies past the cap stay distributed
    term_stats = assign_dense_ids(vocab, ["term"], "term_id",
                                  persisted_out=aux_persisted,
                                  localize_max=VOCAB_LOCALIZE_MAX)
    for m, col in NNOC_COLS.items():
        term_stats = term_stats.withColumn(
            col,
            F.when(
                F.col("df") > 0,
                scoring.nnoc_expr(m, m, F.col("df"), num_docs, avgdl, k1, b, delta),
            ).otherwise(F.lit(0.0)),
        )
    term_stats = term_stats.persist()

    # impacts: reference/bm25s/scoring.py:246-309 — idf*tfc (− nnoc for
    # bm25l/bm25+). Kept at float64 in the flat layout (exact-arithmetic
    # oracle comparisons); the sharded/saved layout downcasts to float32,
    # the reference's storage dtype (reference/bm25s/scoring.py:265).
    # term_stats is vocab-sized → broadcast when small; Catalyst/AQE
    # picks the strategy.
    postings = tf.join(term_stats.select("term", "term_id", "df"), "term")
    for m in METHODS:
        postings = postings.withColumn(
            IMPACT_COLS[m],
            scoring.impact_expr(
                m, m,
                F.col("tf"), F.col("dl"), F.col("df"),
                num_docs, avgdl, k1, b, delta,
            ).cast("double"),
        )

    return BM25Index(
        spark=spark,
        postings=postings,
        term_stats=term_stats,
        doc_lens=doc_lens,
        doc_map=doc_map,
        num_docs=num_docs,
        avg_doc_len=avgdl,
        k1=k1,
        b=b,
        delta=delta,
        tokenizer_kwargs=tok_kwargs,
        docs_per_shard=auto_docs_per_shard(
            num_docs, spark.sparkContext.defaultParallelism
        ),
        aux_persisted=aux_persisted,
    )


def build_index_from_tokens(
    docs: DataFrame,
    tokens_col: str = "tokens",
    doc_id_col: str | None = None,
    order_cols: list[str] | None = None,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    delta: float = DEFAULT_DELTA,
    keep_doc_map: bool = True,
    query_tokenizer_kwargs: dict | None = None,
) -> BM25Index:
    """Build from a *pre-tokenized* corpus: (…, tokens: array<string>).

    The reference's ``index()`` accepts already-tokenized input —
    token-string lists, ``Tokenized`` tuples, or id lists
    (``reference/bm25s/__init__.py:517-560``) — so users with an existing
    tokenization pipeline can reuse it.  Tokens are taken verbatim (no
    lowercasing/stopwords/stemming applied).

    ``query_tokenizer_kwargs``: tokenizer config applied to *query text*
    at retrieve time (defaults to the standard config); pass the config
    that produced the corpus tokens for consistent retrieval.
    """
    spark = docs.sparkSession
    if doc_id_col is not None:
        base = docs.withColumn("doc_id", F.col(doc_id_col).cast("long"))
    else:
        base = assign_doc_ids(docs, order_cols)
    tokenized = base.select(
        "doc_id", F.col(tokens_col).alias("tokens")
    ).persist()
    doc_map = base.drop(tokens_col) if keep_doc_map else None
    return _index_from_tokenized(
        spark, tokenized, doc_map, k1, b, delta,
        dict(query_tokenizer_kwargs or {}),
    )


def build_index_from_token_ids(
    ids_df: DataFrame,
    vocab_df: DataFrame,
    ids_col: str = "token_ids",
    doc_id_col: str | None = None,
    order_cols: list[str] | None = None,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    delta: float = DEFAULT_DELTA,
    keep_doc_map: bool = True,
    query_tokenizer_kwargs: dict | None = None,
) -> BM25Index:
    """Build from integer token ids + a vocab table — the reference's
    ``Tokenized(ids, vocab)`` input (``reference/bm25s/__init__.py:517-547``).

    ``ids_df``: (…, token_ids: array<int>); ``vocab_df``: (term, term_id).
    TF is computed from the exploded ids (one groupBy on (doc_id, id) —
    bounded by per-doc distinct terms) and the vocab join is vocab-sized
    (broadcast), so no token-array rebuild is needed.
    """
    spark = ids_df.sparkSession
    if doc_id_col is not None:
        base = ids_df.withColumn("doc_id", F.col(doc_id_col).cast("long"))
    else:
        base = assign_doc_ids(ids_df, order_cols)
    base = base.persist()
    doc_lens = base.select("doc_id", F.size(ids_col).alias("dl")).persist()
    agg = doc_lens.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    num_docs, avgdl = int(agg["n"]), float(agg["avgdl"] or 0.0)
    tf = (
        base.select(
            "doc_id", F.size(ids_col).alias("dl"),
            F.explode(ids_col).alias("tid"),
        )
        .groupBy("doc_id", "dl", "tid")
        .agg(F.count(F.lit(1)).alias("tf"))
        .join(
            F.broadcast(
                vocab_df.select(F.col("term_id").alias("tid"), "term")
            ),
            "tid",
        )
        .select("doc_id", "dl", "term", "tf")
    )
    doc_map = base.drop(ids_col) if keep_doc_map else None
    return _index_from_tf(
        spark, tf, doc_lens, doc_map, num_docs, avgdl, k1, b, delta,
        dict(query_tokenizer_kwargs or {}),
    )


def merge_indexes(
    *indexes: BM25Index, check_disjoint: bool = True
) -> BM25Index:
    """Merge independently built indexes over DISJOINT doc-id sets into
    one index **exactly equal** to a single build over the union corpus.

    The reference rebuilds from scratch when the corpus grows; at 100 TB
    the natural pattern is instead *partitioned builds* — index each
    ingest batch (or each corpus partition) independently, then merge.
    The merge is cheap because the per-(doc, term) facts (``tf``, ``dl``)
    are corpus-independent: only the corpus-level statistics (``df``,
    ``num_docs``, ``avg_doc_len`` → idf/impacts) change, and those are
    recomputed exactly:

    - ``df``       = sum of the sides' per-term df (vocab-sized shuffle,
      NOT a posting re-aggregation — doc sets are disjoint so the counts
      add)
    - ``num_docs`` / ``avg_doc_len`` = one tiny agg over the unioned
      ``doc_lens`` (integer token counts sum exactly, so the mean is
      bit-identical to the full build's)
    - impacts      = the standard impact expressions over the unioned
      (doc_id, dl, term, tf) rows with the merged scalars — deterministic
      double arithmetic, so every posting matches a from-scratch build
      bit for bit (asserted in tests)

    Scale shape: no tokenization re-run, no posting-sized groupBy; the
    only posting-sized work is the narrow union + the vocab join that
    every build already does.  ``check_disjoint`` (one doc-sized
    aggregation) guards against overlapping doc ids — disable it when
    the partitioning scheme guarantees disjointness.

    Reference scope: the reference has no index merge (a corpus change
    re-runs ``index()``, ``reference/bm25s/__init__.py:326-438``); this
    implements the beyond-reference incremental-build mandate.
    """
    if not indexes:
        raise ValueError("merge_indexes needs at least one index")
    if len(indexes) == 1:
        return indexes[0]
    head = indexes[0]
    for i, idx in enumerate(indexes[1:], start=1):
        if (idx.k1, idx.b, idx.delta) != (head.k1, head.b, head.delta):
            raise ValueError(
                f"index {i} has (k1, b, delta)=({idx.k1}, {idx.b}, {idx.delta}) "
                f"!= index 0's ({head.k1}, {head.b}, {head.delta}); impacts "
                "would be inconsistent"
            )
        if idx.tokenizer_kwargs != head.tokenizer_kwargs:
            raise ValueError(
                f"index {i} was built with tokenizer_kwargs="
                f"{idx.tokenizer_kwargs!r} != index 0's "
                f"{head.tokenizer_kwargs!r}; query tokenization would be "
                "ambiguous"
            )

    spark = head.spark
    from functools import reduce

    doc_lens = reduce(
        lambda a, b: a.unionByName(b), (i.doc_lens for i in indexes)
    ).persist()
    if check_disjoint:
        clash = (
            doc_lens.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > 1)
            .take(1)
        )
        if clash:
            doc_lens.unpersist()
            raise ValueError(
                f"doc_id {clash[0]['doc_id']} appears in more than one "
                "index; merge_indexes requires disjoint doc-id sets"
            )

    agg = doc_lens.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    num_docs, avgdl = int(agg["n"]), float(agg["avgdl"] or 0.0)

    tf = reduce(
        lambda a, b: a.unionByName(b),
        (i.postings.select("doc_id", "dl", "term", "tf") for i in indexes),
    )
    # disjoint doc sets → per-term df adds; the "" vocab patch rows carry
    # df=0 (or the true count when empty_fallback produced real "" tokens)
    # on every side, so the sum is the union corpus's df for "" too
    dfreq = reduce(
        lambda a, b: a.unionByName(b),
        (i.term_stats.select("term", "df") for i in indexes),
    ).groupBy("term").agg(F.sum("df").alias("df"))

    doc_maps = [i.doc_map for i in indexes]
    doc_map = None
    if all(m is not None for m in doc_maps) and all(
        set(m.columns) == set(doc_maps[0].columns) for m in doc_maps
    ):
        doc_map = reduce(lambda a, b: a.unionByName(b), doc_maps)

    return _index_from_tf(
        spark, tf, doc_lens, doc_map, num_docs, avgdl,
        head.k1, head.b, head.delta, dict(head.tokenizer_kwargs),
        dfreq=dfreq,
    )


class SparkBM25:
    """Facade mirroring the reference's ``BM25`` class API
    (``reference/bm25s/__init__.py:143-1411``): ``index`` / ``retrieve`` /
    ``get_scores`` / ``save`` / ``load`` — but over DataFrames."""

    def __init__(
        self,
        k1: float = DEFAULT_K1,
        b: float = DEFAULT_B,
        delta: float = DEFAULT_DELTA,
        method: str = "lucene",
        idf_method: str | None = None,
    ):
        if method not in METHODS:
            raise ValueError(f"Invalid method {method!r}. Choose from {METHODS}.")
        self.k1, self.b, self.delta = k1, b, delta
        self.method = method
        self.idf_method = idf_method or method
        self.index_: BM25Index | None = None

    def index(self, docs: DataFrame, **kw) -> BM25Index:
        self.index_ = build_index(
            docs, k1=self.k1, b=self.b, delta=self.delta, **kw
        ).persist()
        return self.index_

    def retrieve(self, queries_df: DataFrame, k: int = 10, **kw) -> DataFrame:
        assert self.index_ is not None, "call index() first"
        kw.setdefault("method", self.method)
        kw.setdefault("idf_method", self.idf_method)
        return self.index_.retrieve(queries_df, k=k, **kw)

    def get_scores(self, queries_df: DataFrame, **kw) -> DataFrame:
        assert self.index_ is not None, "call index() first"
        kw.setdefault("method", self.method)
        kw.setdefault("idf_method", self.idf_method)
        return self.index_.get_scores(queries_df, **kw)


def index_stats(index: BM25Index) -> DataFrame:
    """One-row index summary → (num_docs, num_terms, num_postings,
    sum_tf, max_dl, max_df, avgdl) — the Lucene ``IndexReader`` /
    Elasticsearch ``_stats`` counters, derived from the index's own
    tables (the reference exposes the same facts as array shapes:
    ``reference/bm25s/__init__.py:275-305``).

    ``num_terms`` counts only real vocabulary (the df=0 ``""``
    OOV-patch row is excluded); ``sum_tf`` is the total token count
    (equals Σ dl by construction).  Three single-row aggregations
    (map-side partial, one tiny shuffle each) cross-joined — nothing
    is collected and nothing scales worse than one scan per table.
    """
    t = index.term_stats.where(F.col("df") > 0).agg(
        F.count(F.lit(1)).cast("long").alias("num_terms"),
        F.max("df").cast("long").alias("max_df"),
    )
    p = index.postings.agg(
        F.count(F.lit(1)).cast("long").alias("num_postings"),
        F.sum("tf").cast("long").alias("sum_tf"),
    )
    d = index.doc_lens.agg(
        F.count(F.lit(1)).cast("long").alias("num_docs"),
        F.max("dl").cast("long").alias("max_dl"),
    )
    return d.crossJoin(t).crossJoin(p).select(
        "num_docs", "num_terms", "num_postings", "sum_tf", "max_dl",
        "max_df", F.lit(round(index.avg_doc_len, 6)).alias("avgdl"),
    )
