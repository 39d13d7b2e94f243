"""Event-time windowed aggregation with watermarking.

The Structured Streaming operator family the batch ``events_hourly``
rollup mirrors: ``readStream`` → ``withWatermark`` → ``groupBy(window)``
→ agg.  The SAME function body serves batch DataFrames (``window()`` is
an ordinary grouping expression there and the watermark is a no-op), so
batch/stream parity is testable by construction — the streaming result
in complete mode must equal the batch result on the same input.

Late-data semantics come from the engine: with a watermark of W, a row
older than ``max(event_time) - W`` arriving in a later micro-batch is
dropped before the stateful aggregation, and in append mode a window is
emitted exactly once, when the watermark passes its end.  State size is
bounded by (windows in flight × group keys) — the property that keeps a
10^12-event stream's state finite.

Scale shape: one shuffle on (window, keys); partial aggregation runs
map-side before the shuffle exactly as in the batch plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_rollup(
    events_df: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str | None = "2 hours",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """(window_start, window_end, *keys, n_events, sum_value).

    ``slide`` turns the tumbling window into a sliding one; ``watermark``
    applies only when ``events_df`` is streaming (bounds state + drops
    late rows), and must be None for batch inputs.
    """
    df = events_df
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window, slide or window)
    return (
        df.groupBy(win.alias("w"), *[F.col(k) for k in keys])
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n_events",
            "sum_value",
        )
    )
