"""As-of (point-in-time) join — the time-series primitive Spark's
DataFrame API lacks as a built-in.

For every left row, attach the single right row with the nearest
event time at-or-before it (``direction="backward"``, the default —
DuckDB ``ASOF JOIN`` / pandas ``merge_asof`` semantics) or at-or-after
it (``"forward"``), matching within the same ``by`` keys.  The
canonical uses in an events pipeline: attach the last-seen profile /
model-version / price to each interaction, or the preceding impression
to each click.

Implementation is a *composition of built-in operators*, not a UDF:
tag and union both sides, then one per-key event-time sort (a window)
carries the latest right payload forward onto each left row —
``last(payload, ignorenulls=True)`` over rows-unbounded-preceding.
Ties (right.ts == left.ts) match, because the right row sorts before
the left row at equal timestamps.

Scale shape: ONE shuffle, keyed by ``by`` — the same partitioning any
per-key time-series operator needs — followed by an in-partition
Tungsten sort; no driver collect, no Python.  A hot key serializes
into one task exactly as it would for sessionization; salt upstream if
one entity carries a material fraction of the corpus.  The plan is
join-free: at 100 TB this beats the range-join explosion of the naive
``l JOIN r ON key AND r.ts <= l.ts`` + argmax formulation, which
produces O(|l|·|r|) intermediate rows per key before aggregating.

Reference scope: no counterpart in the reference engine (lexical
retrieval only); part of the beyond-reference events/training-pipeline
mandate.  The DuckDB correctness oracle uses its native ``ASOF LEFT
JOIN`` — an independent implementation of the same published
semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] = ("user_id",),
    right_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance_us: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the nearest ``right``
    row's columns (nulls when no right row qualifies).

    - ``on``: the event-time column, present in both sides.
    - ``by``: equality keys (both sides).
    - ``right_cols``: right columns to attach (default: all except
      ``on``/``by``); each is emitted as ``<name><suffix>`` alongside
      ``<on><suffix>``, the matched right timestamp.
    - ``direction``: ``"backward"`` (right.on <= left.on, nearest) or
      ``"forward"`` (right.on >= left.on, nearest).
    - ``tolerance_us``: optional match window in microseconds —
      a match farther than this from the left timestamp is nulled out
      (pandas ``merge_asof(tolerance=...)``).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    if tolerance_us is not None and tolerance_us < 0:
        raise ValueError(f"tolerance_us must be >= 0, got {tolerance_us}")
    by = list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*by, on)]
    right_cols = list(right_cols)

    from bm25s_spark.operators.events import _ts_micros

    lcols = left.columns
    # right payload rides the union as one struct (matched ts, its
    # epoch-micros for the tolerance check — NTZ/DST-safe via the
    # events helper — and the carried columns)
    rpay = F.struct(
        F.col(on).alias("_on"),
        _ts_micros(right, on).cast("long").alias("_on_us"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    r_tagged = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias("_t"),
        F.lit(0).alias("_is_left"),
        rpay.alias("_rpay"),
        F.lit(None).cast("long").alias("_lus"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in lcols],
    )
    l_tagged = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(r_tagged.schema["_rpay"].dataType).alias("_rpay"),
        _ts_micros(left, on).cast("long").alias("_lus"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    u = r_tagged.unionByName(l_tagged)

    # at equal timestamps the right row (is_left=0) precedes the left
    # row, so an exact-tie right row IS visible to last() — the >= / <=
    # tie-inclusion of ASOF semantics
    if direction == "backward":
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("_t").desc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    matched = u.withColumn("_m", F.last("_rpay", ignorenulls=True).over(w)).where(
        F.col("_is_left") == 1
    )

    if tolerance_us is not None:
        gap = F.abs(F.col("_lus") - F.col("_m._on_us"))
        matched = matched.withColumn(
            "_m", F.when(gap <= tolerance_us, F.col("_m"))
        )

    out = [F.col(f"_l_{c}").alias(c) for c in lcols]
    out.append(F.col("_m._on").alias(f"{on}{suffix}"))
    out.extend(F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in right_cols)
    return matched.select(*out)
