"""End-to-end corpus curation: the standard LLM training-data pipeline
as one composition — quality filter → deduplication → benchmark
decontamination → deterministic split assignment.

Each stage is an already-tested operator (`gopher_filter`,
`deduplicate_exact`/`deduplicate_near`, `decontaminate`, `hash_split`);
this module pins the canonical order and the plumbing between them so a
pipeline author calls one function instead of re-deriving the
composition.  Order rationale: filter first (cheapest, narrow, shrinks
everything downstream), dedup before decontamination (fewer docs to
shingle), split last (assignment must see the final population —
although the md5 bucket is content-stable, so earlier placement would
assign identical labels).

Scale shape is the sum of its parts: one narrow pass (filter), one
hash-agg shuffle (exact dedup) or the banded LSH pipeline (near), one
broadcast join against the benchmark shingles, one pure-expression
split column.  Nothing here adds a shuffle beyond what the stages
themselves need.

Reference scope: beyond-reference training-pipeline mandate; the
reference engine curates nothing.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame

from pyspark.sql import functions as F


def curate_corpus(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    quality: bool = True,
    quality_kwargs: Mapping | None = None,
    dedup: str | None = "exact",
    dedup_kwargs: Mapping | None = None,
    benchmark: DataFrame | None = None,
    decontam_kwargs: Mapping | None = None,
    splits: Mapping[str, float] | None = None,
    split_seed: str = "split",
    stats: dict | None = None,
) -> DataFrame:
    """Run the curation pipeline; returns the surviving documents with
    the original columns (plus ``split`` when ``splits`` is given).

    - ``quality``: apply :func:`~bm25s_spark.functions.text.gopher_filter`
      (``quality_kwargs`` forwarded) and keep only passing docs; signal
      columns are dropped from the output.
    - ``dedup``: ``"exact"`` (normalized-md5 keep-lowest-id), ``"near"``
      (MinHash-LSH + connected components,
      :func:`~bm25s_spark.operators.dedup.deduplicate_near`,
      ``dedup_kwargs`` forwarded), or ``None``.
    - ``benchmark``: when given, drop docs sharing n-gram shingles with
      it (:func:`~bm25s_spark.operators.decontam.decontaminate`,
      ``decontam_kwargs`` forwarded).
    - ``splits``: label → weight; appends a content-stable ``split``
      column (:func:`~bm25s_spark.operators.sampling.hash_split`).
    - ``stats``: a dict to fill with per-stage surviving counts.  Each
      count is a Spark job over the unpersisted lineage (recomputation,
      not caching — nothing is left pinned in the session); omit for
      a single-pass lazy plan.
    """
    if dedup not in (None, "exact", "near"):
        raise ValueError(f"dedup must be None, 'exact' or 'near', got {dedup!r}")

    from bm25s_spark.functions.text import gopher_filter
    from bm25s_spark.operators.decontam import decontaminate
    from bm25s_spark.operators.dedup import deduplicate_exact, deduplicate_near
    from bm25s_spark.operators.sampling import hash_split

    cur = docs
    if stats is not None:
        stats["input"] = cur.count()

    if quality:
        cur = (
            gopher_filter(cur, text_col=text_col, **dict(quality_kwargs or {}))
            .where(F.col("keep"))
            .select(*docs.columns)
        )
        if stats is not None:
            stats["after_quality"] = cur.count()

    if dedup == "exact":
        cur = deduplicate_exact(cur, text_col=text_col, id_col=id_col)
    elif dedup == "near":
        cur = deduplicate_near(
            cur, text_col=text_col, id_col=id_col, **dict(dedup_kwargs or {})
        )
    if dedup is not None and stats is not None:
        stats["after_dedup"] = cur.count()

    if benchmark is not None:
        cur = decontaminate(
            cur, benchmark, text_col=text_col, id_col=id_col,
            **dict(decontam_kwargs or {}),
        )
        if stats is not None:
            stats["after_decontam"] = cur.count()

    if splits is not None:
        cur = hash_split(cur, splits, id_col=id_col, seed=split_seed)
    return cur
