"""Deduplication operators for large-scale training-data pipelines.

All operators are pure DataFrame pipelines (JVM-side expressions; no
Python in the hot path) designed so every shuffle key is bounded:

- exact:      hash-groupBy on a normalized-text digest
- ngram-jaccard: shared-shingle candidate generation with a max-df cutoff
  on shingles (the classic bound that keeps the self-join from exploding
  on boilerplate shingles), then exact Jaccard on the candidates
- minhash-LSH: md5-derived hash family → per-band bucket join; only
  bucket collisions are verified — the standard sub-quadratic near-dup
  pipeline
- simhash:    64-bit sign-aggregated token hashes; near-dups = small
  Hamming distance within bucket
- embedding near-dup: cosine ≥ threshold via LSH-ish bucketing or
  brute-force for small sides (see operators/similarity.py)

Determinism: every hash is derived from md5/xxhash of the content —
stable across runs, partitions, and engines (md5 also exists in DuckDB,
which the correctness oracle exploits).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bm25s_spark.util import eager_checkpoint as _eager_checkpoint

_log = logging.getLogger(__name__)


def normalize_text(col):
    """Lowercase, trim, collapse internal whitespace."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per duplicate *group* (≥2 docs with identical normalized
    text): (digest, canonical_id = min id, n_dupes).  Scale: single hash
    aggregation on a 32-byte key."""
    return (
        df.select(
            F.md5(normalize_text(F.col(text_col))).alias("digest"),
            F.col(id_col).alias("doc_id"),
        )
        .groupBy("digest")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_dupes"),
        )
        .where(F.col("n_dupes") >= 2)
    )


def deduplicate_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id doc of each exact-duplicate group."""
    w = Window.partitionBy(F.md5(normalize_text(F.col(text_col)))).orderBy(F.col(id_col))
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def word_shingles(df: DataFrame, n: int = 3, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shingle) — distinct word n-grams of the normalized text.

    The token array is projected to a column first: slicing an *inline*
    split-expression inside the transform lambda would re-evaluate the
    split per element (O(len²) per doc); slicing the materialized column
    is O(n) per shingle."""
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("_toks"),
    )
    toks = F.col("_toks")
    idxs = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    shingle_at = F.transform(
        idxs, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")
    )
    return base.select(
        "doc_id", F.explode(F.array_distinct(shingle_at)).alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: int = 1000,
) -> DataFrame:
    """Candidate pairs by shared shingles, then exact Jaccard ≥ threshold.

    ``max_shingle_df`` drops boilerplate shingles (appearing in more than
    that many docs) before the self-join — the blow-up bound that makes
    this viable at scale (the pair count of a shingle is df², so one
    boilerplate shingle at df=10^6 would alone emit 10^12 pairs).
    Returns (doc_a, doc_b, common, size_a, size_b, jaccard) with
    doc_a < doc_b.
    """
    sh = word_shingles(df, n, text_col, id_col)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    rare = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("sdf"))
        .where((F.col("sdf") >= 2) & (F.col("sdf") <= max_shingle_df))
        .select("shingle")
    )
    sh_r = sh.join(rare, "shingle")
    common = (
        sh_r.alias("a")
        .join(sh_r.alias("b"), "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    out = (
        common.join(sizes.withColumnRenamed("doc_id", "doc_a")
                    .withColumnRenamed("n_shingles", "size_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("n_shingles", "size_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("size_a") + F.col("size_b") - F.col("common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "common", "size_a", "size_b", "jaccard")
    )
    return out


def _md5_hash64(col, seed: int):
    """Deterministic 48-bit integer hash from md5(seed || value) — stable
    across engines (DuckDB can reproduce it for the oracle; 12 hex chars
    keep it inside exact double range there)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(str(seed) + ":"), col)), 1, 12), 16, 10
    ).cast("long")


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, sig_0..sig_{H-1}): min over shingles of H md5-derived
    hash functions — the standard MinHash estimator of Jaccard."""
    from bm25s_spark.util import spread_small_scan

    # H md5 hashes per shingle is per-row expensive: spread a
    # low-parallelism input (e.g. one small parquet file) before it
    sh = word_shingles(spread_small_scan(df), n, text_col, id_col)
    aggs = [
        F.min(_md5_hash64(F.col("shingle"), i)).alias(f"sig_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_band_buckets(
    df: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, band, bucket): each doc's LSH band digests — the
    bucketing half of :func:`minhash_lsh_candidates`, exposed separately
    so the streaming dedup can accumulate a bucket *store* instead of
    self-joining (the signatures and digests are deterministic md5
    arithmetic, so batch and streaming buckets can never drift)."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, num_hashes, n, text_col, id_col)
    band_cols = []
    for bi in range(bands):
        cols = [F.col(f"sig_{bi * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(
                F.lit(bi).alias("band"),
                F.md5(F.concat_ws("|", *[c.cast("string") for c in cols])).alias("bucket"),
            )
        )
    return sigs.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_lsh_candidates(
    df: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH banding: docs agreeing on all rows of ≥1 band become candidate
    pairs (doc_a < doc_b, with the matching band id).  Sub-quadratic: the
    join key is (band, band-digest)."""
    banded = minhash_band_buckets(df, num_hashes, bands, n, text_col, id_col)
    pairs = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bucket"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            "band",
        )
        .distinct()
    )
    return pairs


def duplicate_components(
    pairs_df: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 25,
    info: dict | None = None,
) -> DataFrame:
    """Candidate pairs → connected components: (doc_id, component) with
    ``component`` = the smallest doc id reachable through the pair graph
    — the step that turns pairwise near-dup hits into dedup GROUPS (keep
    one doc per component, drop the rest).

    Alternating large-star / small-star (the published MapReduce
    connected-components algorithm of Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC 2014): each round
    re-attaches every node's larger neighbors (large-star) then its
    smaller neighbors (small-star) to the neighborhood minimum,
    preserving connectivity while collapsing path length geometrically —
    convergence in O(log n) rounds even on pathological chains, where
    plain min-label propagation needs O(diameter) rounds.  A round is
    two shuffles (groupBy-min + join, twice); the converged edge set is
    a star forest rooted at each component's minimum id.

    ``max_iter`` still bounds the loop and non-convergence raises rather
    than returning silently-wrong components (at log-convergence, 25
    rounds covers any graph that fits in any cluster).  Per-round
    results are persisted and the previous round unpersisted; the final
    output is checkpointed eagerly so no cache outlives the call.
    ``info``, if given, is filled with {"rounds": n}.

    Only docs that appear in ≥1 pair are returned (singletons have no
    duplicate group).  The in-component canonical doc is simply
    ``component`` itself — the reference keep-lowest-id convention of
    ``deduplicate_exact``.  Deterministic: the star-forest fixpoint of
    min-attachment is unique for a fixed graph.
    """
    # materialize the bare pair projection ONCE: the input plan is often
    # expensive (an LSH candidate pipeline), and both the edge set and
    # the final node labeling consume it — unmaterialized, the whole
    # candidate generation would execute twice
    base = _eager_checkpoint(
        pairs_df.select(F.col(id_a).alias("a"), F.col(id_b).alias("b")),
        reliable=False,
    )
    # canonical oriented edges u > v; self-pairs carry no connectivity
    # (their nodes re-enter via the final node join).  Each round's edge
    # set is checkpointed eagerly — lineage MUST be cut per round (see
    # util.eager_checkpoint) — with reliable=False: loop-internal
    # intermediates never outlive the call, and writing every round to
    # a reliable checkpoint dir would accumulate disk without bound.
    edges = _eager_checkpoint(
        base.select(
            F.greatest(F.col("a"), F.col("b")).alias("u"),
            F.least(F.col("a"), F.col("b")).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct(),
        reliable=False,
    )
    n_edges = edges.count()
    rounds = 0
    converged = n_edges == 0
    for _ in range(max_iter):
        if converged:
            break
        rounds += 1
        # ---- large-star: (v, min(N⁺(u))) for every neighbor v > u ----
        sym = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
        mins = mins.select("u", F.least("u", "mn").alias("m"))
        # persist ls: the small-star plan consumes it three times (join
        # left side + twice via mins2) — unpersisted, the large-star
        # shuffles would re-execute per consumer and "a round is two
        # shuffles" would silently become six
        ls = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .persist()
        )
        # ---- small-star: attach u and its smaller neighbors to their
        # minimum (ls edges are already oriented u > v) ----
        mins2 = ls.groupBy("u").agg(F.min("v").alias("mn"))
        ss = _eager_checkpoint(
            ls.join(mins2, "u")
            .where(F.col("v") != F.col("mn"))
            .select(F.col("v").alias("u"), F.col("mn").alias("v"))
            .unionByName(mins2.select("u", F.col("mn").alias("v")))
            .distinct(),
            reliable=False,
        )
        ls.unpersist()
        n_new = ss.count()
        # fixpoint ⇔ ss ⊆ edges with equal cardinality (one anti-join
        # probe; both sets are oriented+distinct)
        if n_new == n_edges:
            grew = (
                ss.join(edges, ["u", "v"], "left_anti").limit(1).count() > 0
            )
            converged = not grew
        edges = ss
        n_edges = n_new
    if not converged:
        raise RuntimeError(
            f"duplicate_components did not converge in {max_iter} rounds "
            "(unexpected at O(log n) convergence — corrupt edge input?)"
        )
    if info is not None:
        info["rounds"] = rounds
    # converged star forest: u → root; roots appear only on the v side
    labels = edges.select(
        F.col("u").alias("doc_id"), F.col("v").alias("component")
    )
    nodes = (
        base.select(F.col("a").alias("doc_id"))
        .unionByName(base.select(F.col("b").alias("doc_id")))
        .distinct()
    )
    out = nodes.join(labels, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("component"),
    )
    # materialize the (small) fixpoint so the per-round checkpoint blocks
    # can be released as soon as their DataFrames go out of scope — no
    # cache or lineage outlives the call
    return _eager_checkpoint(out)


def deduplicate_near(
    df: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """End-to-end near-dedup: MinHash-LSH candidate pairs → connected
    components → keep ONE doc per duplicate cluster (the minimum id,
    the reference keep-lowest convention).  Docs with no near-duplicate
    pass through untouched.

    The scale path composes the bounded pieces: banded LSH join (never
    all-pairs), large-star/small-star components (O(log n) rounds, not
    diameter-bounded), and one left_anti join to drop the non-canonical
    cluster members."""
    pairs = minhash_lsh_candidates(df, num_hashes, bands, n, text_col, id_col)
    comp = duplicate_components(pairs, max_iter=max_iter)
    losers = comp.where(F.col("doc_id") != F.col("component")).select(
        F.col("doc_id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def simhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """(doc_id, simhash:long) over ``bits`` ≤ 64 bits.

    Bits 0-47 come from one md5-derived integer (seed 7); bits 48-63
    from a second (seed 8) — each md5 digest yields 48 exactly-
    representable bits, so two cover the full 64-bit signature while
    staying engine-reproducible (DuckDB regenerates both for the
    oracle).  Packing is bitwise-OR of shifted bit flags, so bit 63
    lands in the long's sign position without any 2^63 literal."""
    if not 1 <= bits <= 64:
        raise ValueError(f"bits={bits} must be in [1, 64]")
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"),
    )
    h_lo = _md5_hash64(F.col("tok"), 7)
    h_hi = _md5_hash64(F.col("tok"), 8) if bits > 48 else None

    def bit_at(i):
        src, off = (h_lo, i) if i < 48 else (h_hi, i - 48)
        return F.shiftright(src, off).bitwiseAND(F.lit(1))

    votes = toks.select(
        "doc_id",
        *[
            (F.when(bit_at(i) == 1, 1).otherwise(-1)).alias(f"b{i}")
            for i in range(bits)
        ],
    ).groupBy("doc_id").agg(*[F.sum(f"b{i}").alias(f"b{i}") for i in range(bits)])
    from functools import reduce

    packed_bits = [
        F.shiftleft(
            F.when(F.col(f"b{i}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long"), i
        )
        for i in range(bits)
    ]
    packed = votes.select(
        "doc_id",
        reduce(lambda a, c: a.bitwiseOR(c), packed_bits).alias("simhash"),
    )
    return packed


def simhash_near_duplicates(df: DataFrame, max_hamming: int = 3,
                            text_col: str = "text", id_col: str = "doc_id",
                            bits: int = 64, bands: int = 4,
                            max_bucket_size: int | None = None) -> DataFrame:
    """Banded simhash join: split the fingerprint into ``bands`` chunks —
    any pair within ``max_hamming < bands`` distance agrees exactly on ≥1
    chunk (pigeonhole), so the join key is (band, chunk).

    Scale shape: the per-band bucket space is 2^(bits/bands) — the
    64/4 default gives 2^16 buckets per band, so random (non-duplicate)
    collisions on a 10^9-doc corpus stay ~10^4 per bucket instead of the
    ~10^5 a 12-bit chunk would give.  Even so, a corpus where one chunk
    value is hot (boilerplate shells, empty docs) makes within-bucket
    pair generation quadratic; ``max_bucket_size`` drops oversized
    (band, chunk) buckets from candidate generation and LOGS the dropped
    bucket/row counts (never a silent cap) — the same contract as
    ``similarity.cosine_near_duplicates``.  Pairs confined to dropped
    buckets are not reported.
    """
    if not 1 <= bands <= bits:
        raise ValueError(f"bands={bands} must be in [1, bits={bits}]")
    if bits % bands != 0:
        # a remainder would silently exclude the top bits from candidate
        # generation (they'd belong to no chunk)
        raise ValueError(f"bands={bands} must divide bits={bits}")
    sig = simhash_signatures(df, text_col, id_col, bits)
    per = bits // bands
    mask = (1 << per) - 1
    chunks = sig.select(
        "doc_id", "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bi).alias("band"),
                    F.shiftright(F.col("simhash"), bi * per).bitwiseAND(F.lit(mask)).alias("chunk"),
                )
                for bi in range(bands)
            ])
        ).alias("bb"),
    ).select("doc_id", "simhash", F.col("bb.band").alias("band"), F.col("bb.chunk").alias("chunk"))
    # materialize the hashed chunks once: the pair self-join scans them
    # twice (and the bucket-size scan a third time when capped); the
    # cache is released via an eager checkpoint so repeated calls in a
    # long-lived session don't accumulate pinned datasets
    chunks_cached = chunks.persist()
    if max_bucket_size is not None:
        # oversized keys are ≤ total_rows / max_bucket_size — driver-safe
        big_rows = (
            chunks_cached.groupBy("band", "chunk")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > max_bucket_size)
            .collect()
        )
        if big_rows:
            _log.warning(
                "simhash_near_duplicates: dropping %d oversized (band, chunk) "
                "buckets (> %d members, %d rows total) from candidate "
                "generation; pairs confined to those buckets are NOT reported",
                len(big_rows), max_bucket_size,
                sum(r["_n"] for r in big_rows),
            )
            from bm25s_spark.util import local_relation

            big_df = local_relation(
                chunks_cached.sparkSession,
                [(int(r["band"]), int(r["chunk"])) for r in big_rows],
                "band int, chunk long",
            )
            chunks = chunks_cached.join(
                F.broadcast(big_df), ["band", "chunk"], "left_anti"
            )
        else:
            chunks = chunks_cached
    else:
        chunks = chunks_cached
    chunks = _eager_checkpoint(chunks)
    chunks_cached.unpersist()
    pairs = (
        chunks.alias("a").join(chunks.alias("b"), ["band", "chunk"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"), F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    xor = F.col("sh_a").bitwiseXOR(F.col("sh_b"))
    hamming = F.bit_count(xor)
    return (
        pairs.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def _dedup_pieces(
    pieces: DataFrame, joiner: str, keep: str, min_count: int
) -> DataFrame:
    """Shared core of line/window dedup over ``(doc_id, piece_id,
    piece_text)`` rows: decide which pieces survive, then reassemble
    one row per document.

    ``keep="first"`` keeps the globally first occurrence (by
    ``(doc_id, piece_id)``) of every distinct piece and drops the rest
    (the CCNet paragraph-dedup convention); ``keep="none"`` drops EVERY
    occurrence of a piece seen ``>= min_count`` times corpus-wide (the
    RefinedWeb boilerplate-removal convention — a header duplicated a
    million times should not survive even once).

    Scale shape: per-piece stats come from ``groupBy(hash)`` with
    map-side partial aggregation, so a boilerplate piece duplicated
    10^9 times combines down to one row per input partition BEFORE the
    shuffle — a window function over the hash would instead ship every
    occurrence of the hot key to a single task.  The join back to the
    pieces is a plain shuffle join AQE can skew-split.  Reassembly is
    one more ``groupBy(doc_id)``.  Documents whose every piece was
    dropped still emit a row (empty ``text``); zero-piece documents
    emit nothing (same contract as ``chunk_documents``).
    """
    if keep not in ("first", "none"):
        raise ValueError(f"keep must be 'first' or 'none', got {keep!r}")
    if keep == "none" and min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    marked = pieces.withColumn("_h", F.md5("piece_text"))
    stats = marked.groupBy("_h").agg(
        F.min(F.struct("doc_id", "piece_id")).alias("_first"),
        F.count(F.lit(1)).alias("_cnt"),
    )
    joined = marked.join(stats, "_h")
    if keep == "first":
        kept = F.struct("doc_id", "piece_id") == F.col("_first")
    else:
        kept = F.col("_cnt") < min_count
    return (
        joined.withColumn("_keep", kept)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_pieces"),
            F.sum(F.col("_keep").cast("int")).cast("int").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.when(F.col("_keep"),
                               F.struct("piece_id", "piece_text"))
                    )),
                    lambda s: s["piece_text"],
                ),
                joiner,
            ).alias("text"),
        )
    )


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    keep: str = "first",
    min_count: int = 2,
) -> DataFrame:
    """Corpus-wide line/paragraph deduplication (CCNet keeps the first
    occurrence of each paragraph; RefinedWeb drops lines repeated
    across documents — ``keep="none"`` with ``min_count``).  Splits
    ``text_col`` on ``sep``, drops empty pieces, and returns
    ``(doc_id, n_pieces, n_kept, text)`` with surviving pieces
    rejoined by ``sep`` in original order."""
    pieces = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(F.col(text_col), F.lit(sep), -1))
            .alias("piece_id", "piece_text"),
        )
        .where(F.trim("piece_text") != "")
    )
    return _dedup_pieces(pieces, sep, keep, min_count)


def dedup_chunk_windows(
    df: DataFrame,
    chunk_size: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: str = "first",
    min_count: int = 2,
) -> DataFrame:
    """Window-granularity dedup for corpora without newline structure:
    slice each document into disjoint ``chunk_size``-token windows
    (``chunk_documents`` with ``overlap=0``), dedup the windows
    corpus-wide, and reassemble (``(doc_id, n_pieces, n_kept, text)``,
    space-joined).  The sliding-window twin of ``dedup_lines`` — the
    training-pipeline primitive for stripping duplicated boilerplate
    spans out of otherwise-distinct documents."""
    from bm25s_spark.operators.chunking import chunk_documents

    pieces = chunk_documents(
        df, chunk_size=chunk_size, overlap=0,
        text_col=text_col, id_col=id_col,
    ).select(
        "doc_id", F.col("chunk_id").alias("piece_id"),
        F.col("chunk_text").alias("piece_text"),
    )
    return _dedup_pieces(pieces, " ", keep, min_count)
