"""PMI collocation mining: the corpus's most-associated word bigrams.

Pointwise mutual information over adjacent word pairs is the classic
collocation / multi-word-expression detector (Church & Hanks 1990) and
a standard corpus-analytics step in training-data pipelines (vocabulary
auditing, boilerplate phrase discovery).  The reference engine exposes
no collocation surface; this implements the beyond-reference
corpus-analytics mandate.

Scale shape (designed for a 100 TB corpus):

- Bigrams are built **inside the row** with ``zip_with`` over the token
  array and its shift — no self-join, no positional explode-join.  The
  only corpus-sized shuffle is the bigram ``groupBy`` count, which
  map-side-combines to one row per distinct bigram per map partition
  (bounded by vocab^2, in practice by the Zipf head).
- Unigram counts are vocab-sized and **broadcast** into the bigram
  table twice (left and right word).
- The final top-k runs as ``orderBy(...).limit(k)`` — Spark executes
  this as TakeOrdered (per-partition heap + driver merge of k rows),
  never a full sort shuffle.

Determinism: scores are rounded *before* ranking and ties break on
``(w1, w2)`` ascending, so the top-k set is stable across partition
counts and engines — the DuckDB oracle replays the identical
arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bm25s_spark.functions.text import _ws_tokens
from bm25s_spark.util import eager_checkpoint as _eager_checkpoint


def _bigrams(toks_col, keep_tail: bool = False):
    """Adjacent (w1, w2) pairs from a materialized token-array column.

    ``zip_with`` of the array against its 1-shift pads the shorter side
    with NULL; the trailing (last_token, NULL) pair is filtered out
    unless ``keep_tail`` — with it kept, EVERY token appears exactly
    once as ``w1``, which lets unigram counts derive from the
    aggregated pair table instead of a second corpus scan.  0- and
    1-token documents yield an empty / tail-only pair array with no
    negative-length slice edge cases.
    """
    shifted = F.slice(
        toks_col, 2, F.greatest(F.size(toks_col) - 1, F.lit(1))
    )
    pairs = F.zip_with(
        toks_col,
        shifted,
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    if keep_tail:
        return pairs
    return F.filter(pairs, lambda s: s["w2"].isNotNull())


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 20,
    round_to: int | None = 4,
) -> DataFrame:
    """(rank, w1, w2, pair_count, pmi) — the ``k`` adjacent word pairs
    with the highest pointwise mutual information::

        pmi(x, y) = ln( p(x, y) / (p(x) * p(y)) )
                  = ln( c_xy * T_uni^2 / (T_bi * c_x * c_y) )

    where ``c_xy`` counts adjacent occurrences, ``c_x``/``c_y`` unigram
    occurrences, ``T_bi``/``T_uni`` the respective totals.  Pairs seen
    fewer than ``min_count`` times are dropped first (raw PMI over-
    rewards hapax pairs).  ``round_to`` rounds PMI *before* ranking so
    the top-k boundary is FP-stable; ties break on (w1, w2) asc.
    """
    toks = docs.select(
        _ws_tokens(F.lower(F.col(text_col))).alias("toks")
    )
    # ONE corpus scan: pairs with the tail (last_token, NULL) kept mean
    # every token occurs exactly once as w1, so the aggregated pair
    # table (vocab²-bounded — in practice the Zipf head) carries both
    # the bigram AND the unigram statistics; uni/bi/totals all derive
    # from its eager checkpoint instead of re-tokenizing the corpus
    # (the previous shape scanned the corpus four times: uni, bi, and
    # one full recompute per totals collect)
    bi_all = _eager_checkpoint(
        toks.select(
            F.explode(_bigrams(F.col("toks"), keep_tail=True)).alias("p")
        )
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_count")),
        reliable=True,
    )
    uni = bi_all.groupBy(F.col("w1").alias("w")).agg(
        F.sum("pair_count").alias("c")
    )
    bi = bi_all.where(F.col("w2").isNotNull())
    # both totals in ONE aggregation job over the checkpointed pair
    # table: tu sums every (w1, *) pair (each token occurs exactly once
    # as w1 — the kept-tail construction), tb only real bigrams
    totals = bi_all.agg(
        F.sum("pair_count").alias("tu"),
        F.sum(
            F.when(F.col("w2").isNotNull(), F.col("pair_count"))
        ).alias("tb"),
    ).collect()[0]
    t_bi = float(totals["tb"] or 0.0)
    t_uni = float(totals["tu"] or 0.0)

    scored = (
        bi.filter(F.col("pair_count") >= min_count)
        .join(
            F.broadcast(uni.select(F.col("w").alias("w1"),
                                   F.col("c").alias("c1"))),
            "w1",
        )
        .join(
            F.broadcast(uni.select(F.col("w").alias("w2"),
                                   F.col("c").alias("c2"))),
            "w2",
        )
        .withColumn(
            "pmi",
            F.log(
                F.col("pair_count")
                * F.lit(t_uni)
                * F.lit(t_uni)
                / (F.lit(t_bi) * F.col("c1") * F.col("c2"))
            ),
        )
    )
    if round_to is not None:
        scored = scored.withColumn("pmi", F.round("pmi", round_to))
    top = scored.orderBy(
        F.desc("pmi"), F.asc("w1"), F.asc("w2")
    ).limit(k)
    # k rows at this point — the single-partition window is trivial.
    return top.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        ),
    ).select("rank", "w1", "w2",
             F.col("pair_count").cast("int").alias("pair_count"), "pmi")
