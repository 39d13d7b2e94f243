"""Event-stream operators for transcript/behavior pipelines.

Gap-based sessionization — the canonical event-pipeline primitive the
reference has no analog for (its corpus is static), expressed as pure
window functions so Catalyst plans one shuffle per call:

- partition by user, order by (ts, event_id) — the event id breaks
  equal-timestamp ties so the session assignment is deterministic;
- a session boundary is a gap > ``gap_minutes`` from the previous event
  (microsecond-exact comparison via ``unix_micros`` — truncating to
  seconds would disagree with a microsecond-precision oracle);
- the running sum of boundary flags is the per-user session index.

Scale shape: ONE hash shuffle on user_id; per-user work is sequential
by construction (sessionization is a prefix scan), so the skew bound is
max-events-per-user — the same bound any engine has for this operator.
No driver collection, no Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType


def _ts_micros(df: DataFrame, ts_col: str):
    """Microseconds-since-epoch column for either timestamp flavor.

    TIMESTAMP (instant) → ``unix_micros`` directly.  TIMESTAMP_NTZ
    (wall clock) → pure calendar arithmetic via ``timestampdiff`` from
    the NTZ epoch — NO session-timezone conversion, so NTZ events in a
    DST zone can never have a gap distorted by an offset transition (a
    cast to TIMESTAMP would re-interpret the wall time in the session
    zone and shift gaps across DST boundaries by the transition amount).
    """
    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', `{ts_col}`)"
        )
    return F.unix_micros(F.col(ts_col))


def sessionize(
    events_df: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak_col: str = "event_id",
) -> DataFrame:
    """Events → events + (session_idx, session_id).

    ``session_idx`` is 1-based per user in time order; ``session_id`` is
    the globally unique string ``"<user>-<idx>"``.
    """
    gap_us = int(gap_minutes) * 60_000_000
    ts_us = _ts_micros(events_df, ts_col)
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak_col)
    prev_us = F.lag(ts_us).over(w)
    is_new = (
        prev_us.isNull()
        | ((ts_us - prev_us) > gap_us)
    ).cast("int")
    sess_idx = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ).cast("int")
    return events_df.withColumn("session_idx", sess_idx).withColumn(
        "session_id",
        F.concat_ws("-", F.col(user_col).cast("string"), F.col("session_idx")),
    )


def session_summary(
    events_df: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak_col: str = "event_id",
) -> DataFrame:
    """One row per (user, session): start/end timestamps, event count,
    value sum, duration.  The downstream shape a training pipeline joins
    against transcripts (sessions ≈ conversations)."""
    s = sessionize(events_df, gap_minutes, user_col, ts_col, order_tiebreak_col)
    s = s.withColumn("_ts_us", _ts_micros(s, ts_col))
    return s.groupBy(user_col, "session_idx").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(value_col).alias("sum_value"),
        # exact integer microseconds: a float seconds division lands on
        # round-half boundaries that engines resolve differently
        (F.max("_ts_us") - F.min("_ts_us")).alias("duration_us"),
    )
