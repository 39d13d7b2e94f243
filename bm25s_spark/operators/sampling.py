"""Deterministic hash-based splitting and sampling.

Training-data pipelines need *content-stable* corpus partitioning:
train/val/test splits and subsampling that (a) never change when the
corpus is re-partitioned, re-ordered, or incrementally re-processed,
(b) need no stored assignment table, and (c) reproduce bit-identically
on any engine.  Spark's ``df.sample``/``randomSplit`` give none of
that (they are partition-order-dependent RNG).  The standard fix is a
keyed-hash bucket:

    bucket(id) = int(md5(seed ":" id)[:8 hex], 16) mod buckets

and assignment by cumulative bucket ranges.  md5 exists in every
engine (DuckDB included — the correctness oracle replays the exact
formula), is uniform on the low bytes, and is keyed by ``seed`` so
independent splits/samples decorrelate.

Scale shape: pure column expressions — one md5 + modulo per row, no
shuffle, no UDF, whole-stage codegen; filters push down past the
operator since it only *adds* a column.

Nesting property: ``hash_sample(f1)`` ⊆ ``hash_sample(f2)`` whenever
``f1 <= f2`` (same seed), because both are prefix ranges of the same
bucket value — useful for growing a sample without resampling.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(
    id_col: Column | str, seed: str = "split", buckets: int = 10_000
) -> Column:
    """Deterministic uniform bucket in ``[0, buckets)`` keyed by
    ``seed`` — ``conv`` of the first 8 md5 hex chars (32 bits, so the
    value fits a BIGINT exactly and the modulo is bias-free for any
    ``buckets`` ≪ 2^32)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.md5(F.concat(F.lit(f"{seed}:"), c.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % buckets)


def hash_split(
    df: DataFrame,
    weights: Mapping[str, float] | None = None,
    id_col: str = "doc_id",
    seed: str = "split",
    buckets: int = 10_000,
    out_col: str = "split",
) -> DataFrame:
    """Append ``out_col``: a deterministic split label per row.

    ``weights`` maps label → relative weight in iteration order
    (insertion-ordered dict); they are normalized, so ``{"train": 8,
    "val": 1, "test": 1}`` and ``{"train": .8, "val": .1, "test": .1}``
    are identical.  Boundaries are ``round(cum_fraction * buckets)``,
    so label populations are exact bucket counts, not RNG draws.
    """
    if weights is None:
        weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    weights = dict(weights)
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be a non-empty map of >=0 weights")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to > 0")

    b = hash_bucket(id_col, seed=seed, buckets=buckets)
    names = list(weights)
    cum, bounds = 0.0, []
    for name in names:
        cum += weights[name] / total
        bounds.append(round(cum * buckets))
    bounds[-1] = buckets  # absorb float rounding: last label is the catch-all

    expr = F.lit(names[-1])
    for name, bound in zip(reversed(names[:-1]), reversed(bounds[:-1])):
        expr = F.when(b < bound, F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    seed: str = "sample",
    buckets: int = 10_000,
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows (same schema).  Exact
    bucket-prefix filter, so repeated runs, different partitionings,
    and incremental reprocessing all keep the identical row set, and
    samples nest across fractions (see module docstring)."""
    if not (0.0 <= fraction <= 1.0):
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    bound = round(fraction * buckets)
    return df.where(hash_bucket(id_col, seed=seed, buckets=buckets) < bound)


def upsample_corpus(
    df: DataFrame,
    weights: Mapping[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    seed: str = "upsample",
    buckets: int = 10_000,
    default_weight: float = 1.0,
    copy_col: str = "epoch",
) -> DataFrame:
    """Emit each row ``weight``-many times (fractional weights allowed)
    — the *epoch-weighted mixing* primitive of a training pipeline
    ("2.5 epochs of source A, 0.3 of source B"), the ≥1 counterpart of
    :func:`stratified_hash_sample`'s keep-fractions.

    A row in stratum with weight ``w`` gets ``floor(w)`` copies plus one
    more iff its keyed md5 bucket falls under ``frac(w)`` — so expected
    copy counts are exact, the extra-copy set is content-stable (same
    rows on every run/partitioning/engine), and it NESTS: the rows
    upsampled at w=2.3 contain those at w=2.2.  Copies are labeled
    ``copy_col`` = 0..n-1 so downstream shuffles (e.g. a pack/shuffle
    stage) can keep copies apart; weight 0 drops the stratum.

    Scale shape: the weight table is pipeline config → a literal CASE;
    one md5 + one ``explode(sequence(...))`` per row — narrow, no join,
    no shuffle, output size = Σ w_s·|stratum_s| exactly.
    """
    for k, w in weights.items():
        if w < 0:
            raise ValueError(f"weight for {k!r} must be >= 0, got {w}")
    if default_weight < 0:
        raise ValueError(f"default_weight must be >= 0, got {default_weight}")

    def _parts(w: float) -> tuple[int, int]:
        base = int(w)
        return base, round((w - base) * buckets)

    d_base, d_bound = _parts(default_weight)
    base = F.lit(d_base)
    bound = F.lit(d_bound)
    for k, w in weights.items():
        k_base, k_bound = _parts(w)
        is_k = F.col(strata_col) == F.lit(k)
        base = F.when(is_k, F.lit(k_base)).otherwise(base)
        bound = F.when(is_k, F.lit(k_bound)).otherwise(bound)
    n = base + F.when(
        hash_bucket(id_col, seed=seed, buckets=buckets) < bound, F.lit(1)
    ).otherwise(F.lit(0))
    # sequence(0, n-1) would COUNT DOWN for n=0 (Spark generates
    # descending sequences when start > stop) — guard with an empty array
    copies = F.when(n > 0, F.sequence(F.lit(0), n - F.lit(1))).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn(copy_col, F.explode(copies))


def stratified_hash_sample(
    df: DataFrame,
    fractions: Mapping[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    seed: str = "stratified",
    buckets: int = 10_000,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows — the
    data-mixing primitive (up/down-weight languages, sources, quality
    tiers) of a training pipeline.  ``fractions`` maps stratum value →
    keep fraction; strata not listed keep ``default_fraction``.

    The fraction table is pipeline *config* (a handful of entries), so
    it compiles to a literal CASE expression — no join, no shuffle, no
    UDF; rows are filtered by the same keyed md5 bucket as
    ``hash_sample`` (content-stable, nests across fractions per
    stratum).  Spark's ``sampleBy`` is the RNG-based analog; this is
    its deterministic, engine-portable twin.
    """
    for k, f in fractions.items():
        if not (0.0 <= f <= 1.0):
            raise ValueError(f"fraction for {k!r} must be in [0, 1], got {f}")
    if not (0.0 <= default_fraction <= 1.0):
        raise ValueError(f"default_fraction must be in [0, 1], got {default_fraction}")
    bound = F.lit(round(default_fraction * buckets))
    for k, f in fractions.items():
        bound = F.when(
            F.col(strata_col) == F.lit(k), F.lit(round(f * buckets))
        ).otherwise(bound)
    return df.where(hash_bucket(id_col, seed=seed, buckets=buckets) < bound)
