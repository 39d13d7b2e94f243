"""Stateful streaming sessionization via ``session_window``.

The streaming twin of ``operators.events.sessionize`` /
``session_summary`` (batch: lag-based prefix scan).  A real event
pipeline runs sessionization *continuously*; Spark's native session
window gives exactly that: per-key session state merges events whose
windows overlap, the watermark bounds state and closes sessions, and in
append mode each session is emitted exactly once when the watermark
passes its end.  The SAME function body serves batch DataFrames (the
session window is an ordinary grouping expression there), so
batch/stream parity is testable by construction.

Semantics vs the batch lag-based operator:

- **Gap boundary**: both split a session exactly when
  ``next - prev > gap`` — Spark's session window treats its ``[t,
  t + gap]`` extent as inclusive at the end, so an event landing at
  EXACTLY the gap merges in both operators (pinned by
  ``test_session_window_gap_boundary_semantics``).
- **Equal timestamps** always merge in both, so the batch operator's
  event-id tiebreak has no analog here — it orders events *within* a
  session, which a rollup doesn't observe.
- **Session identity**: streaming state has no per-user running index,
  so sessions are keyed by ``(user, window_start)`` — globally unique
  and stable — instead of the batch 1-based ``session_idx``.

Scale shape: one shuffle on the grouping keys; session merging runs in
the stateful operator with state bounded by (open sessions × users
in-flight behind the watermark).  No Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_window_rollup(
    events_df: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = "2 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """(user, window_start, window_end, session_start, session_end,
    n_events, sum_value) — one row per closed session.

    ``window_start`` is the first event's timestamp, ``window_end`` the
    last event's timestamp + gap (the earliest instant the session could
    close); ``session_end`` is the last event actually seen.
    ``watermark`` applies only to streaming inputs: it bounds session
    state and, in append mode, defines when a session is final.
    """
    df = events_df
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"),
            F.col(user_col),
        )
        .agg(
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(
            user_col,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col("w.start").alias("session_start"),
            "session_end",
            "n_events",
            "sum_value",
        )
    )
