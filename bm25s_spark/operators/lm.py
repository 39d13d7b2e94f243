"""Unigram language-model scoring for corpus quality filtering.

A standard training-data quality signal (used alongside the Gopher
rules in CCNet/RedPajama-style pipelines) is each document's
cross-entropy under a language model — documents whose token
distribution is far from the corpus norm (boilerplate, gibberish,
wrong-language text) score high and are filtered or bucketed.  The
reference engine (a retrieval library) has no LM-scoring surface; this
module implements the beyond-reference training-data-pipeline mandate
with the simplest honest model: a corpus-level unigram MLE with add-k
smoothing.

Scale shape (designed for a 100 TB corpus):

- ``unigram_counts`` is one explode + hash aggregation with map-side
  partial combine — the shuffle carries one row per *distinct* term
  per map partition, i.e. vocab-bounded, not corpus-bounded.
- The model totals (``T`` tokens, ``V`` vocab) are two scalars
  collected to the driver; the per-term table itself is vocab-sized
  and **broadcast** back to the exploded corpus, so scoring shuffles
  only the per-document partial aggregates (one row per doc after
  map-side combine).
- The corpus is scanned twice (once for counts, once for scoring)
  rather than persisting the exploded token stream — at 100 TB a
  columnar re-scan of one string column is far cheaper than caching
  an exploded intermediate.  Pass a pre-persisted ``docs`` frame to
  amortize if the upstream plan is expensive.

Determinism: tokenization is the same whitespace split used by the
text-quality family (`functions/text.py`), no hashing, no RNG — the
DuckDB correctness oracle replays the identical arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bm25s_spark.functions.text import _ws_tokens


def unigram_counts(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(token, cnt) — corpus-wide unigram counts over the lowercased
    whitespace tokenization.  One explode + one hash agg; the result
    is vocab-sized."""
    return (
        docs.select(
            F.explode(_ws_tokens(F.lower(F.col(text_col)))).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def with_lm_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 0.5,
    counts: DataFrame | None = None,
    round_to: int | None = None,
) -> DataFrame:
    """(id_col, n_tokens, cross_entropy) — per-document mean negative
    log-probability under the add-``k``-smoothed corpus unigram model::

        p(t) = (c_t + k) / (T + k * V)
        H(d) = -(1 / |d|) * sum_{t in d} ln p(t)

    Lower is "more typical of the corpus".  ``counts`` lets callers
    score one corpus under another's model (e.g. held-out shards under
    a trusted-reference model); default is self-scoring, where every
    token is in-vocabulary and smoothing only tempers rare terms.

    Documents with zero tokens are kept with ``n_tokens = 0`` and a
    NULL ``cross_entropy``.  ``round_to`` rounds the entropy for
    cross-engine comparison; pass None for the raw double.
    """
    if counts is None:
        # vocab-bounded; checkpointed eagerly because both the totals
        # collect and the scoring join consume it — each would otherwise
        # re-tokenize the whole corpus.  A caller-supplied model is NOT
        # checkpointed: the caller owns its materialization (it may
        # already be persisted) and forcing a copy here would duplicate
        # executor storage for nothing.
        from bm25s_spark.util import eager_checkpoint as _eager_checkpoint

        counts = _eager_checkpoint(unigram_counts(docs, text_col),
                                   reliable=True)
    totals = counts.agg(
        F.sum("cnt").alias("T"), F.count(F.lit(1)).alias("V")
    ).collect()[0]
    t_total = float(totals["T"] or 0.0)
    v_total = float(totals["V"] or 0.0)
    denom = t_total + add_k * v_total

    tok = docs.select(
        F.col(id_col),
        F.explode(_ws_tokens(F.lower(F.col(text_col)))).alias("token"),
    )
    # OOV tokens (possible only with an external `counts` model) get
    # the pure-smoothing mass k / denom.
    logp = F.log(
        (F.coalesce(F.col("cnt"), F.lit(0.0)) + F.lit(add_k))
        / F.lit(denom)
    )
    scored = (
        tok.join(F.broadcast(counts), "token", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            (-F.avg(logp)).alias("cross_entropy"),
        )
    )
    if round_to is not None:
        scored = scored.withColumn(
            "cross_entropy", F.round("cross_entropy", round_to)
        )
    # left join keeps token-less documents (explode drops them).
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .withColumn("n_tokens", F.coalesce("n_tokens", F.lit(0)))
    )
