"""Event sessionization: split each user's event stream into sessions at
inactivity gaps — the classic behavioral-data shaping step (and the unit a
training pipeline samples "conversations"/"visits" by).

Batch tier is gaps-and-islands with window functions: ONE shuffle on the
user key, then lag/cumulative-sum inside each user's sorted partition —
exactly SQL-expressible, so the DuckDB oracle replays it verbatim.
Streaming tier uses Spark's native ``session_window`` aggregation (state
merges windows within the watermark horizon).

100 TB shape: the only exchange is the partitionBy(user) shuffle any
per-user analysis needs; rows carry (user, ts, value) — no payload
columns.  Skewed power users bound their own partition's sort, not the
whole stage (windows sort per partition-key run, not globally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(df: DataFrame, user_col: str = "user_id", ts_col: str = "ts",
               gap_minutes: int = 30) -> DataFrame:
    """Assign a per-user session index to every event: a new session
    starts when the gap since the user's previous event exceeds
    ``gap_minutes``.  Returns the input columns plus ``session_idx``
    (0-based per user, ordered by event time)."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    # ntz timestamps reject a direct bigint cast — go via timestamp
    ts_long = F.col(ts_col).cast("timestamp").cast("long")
    gap = ts_long - F.lag(ts_long).over(w)
    new_session = F.when(gap.isNull() | (gap <= gap_minutes * 60), 0) \
        .otherwise(1)
    return df.withColumn(
        "session_idx",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))


def session_stats(df: DataFrame, user_col: str = "user_id",
                  ts_col: str = "ts", gap_minutes: int = 30,
                  value_col: str | None = None) -> DataFrame:
    """Per-session aggregates: (user, session_idx, session_start,
    session_end, n_events[, value_sum]) — one extra map-side-combined
    aggregation on top of ``sessionize``'s single shuffle (the groupBy
    keys are a prefix extension of the window's partition key, so AQE
    keeps the data where the window left it)."""
    aggs = [F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("value_sum"))
    return (sessionize(df, user_col, ts_col, gap_minutes)
            .groupBy(user_col, "session_idx").agg(*aggs))


def session_window_stream(stream_df: DataFrame, user_col: str = "user_id",
                          ts_col: str = "ts", gap_minutes: int = 30,
                          watermark: str = "1 hour") -> DataFrame:
    """Streaming sessionization via Spark's native ``session_window``:
    per (user, session-window) event counts, session windows merging as
    long as events arrive within ``gap_minutes`` of each other; state for
    a session is dropped once the watermark passes its close.  The
    streaming counterpart of ``session_stats`` (session identity is the
    window struct rather than an index — streams cannot know a session's
    ordinal without total history)."""
    return (stream_df
            .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
            .withWatermark(ts_col, watermark)
            .groupBy(F.col(user_col),
                     F.session_window(F.col(ts_col), f"{gap_minutes} minutes")
                     .alias("session"))
            .agg(F.count("*").alias("n_events"))
            .select(user_col, F.col("session.start").alias("session_start"),
                    F.col("session.end").alias("session_end"), "n_events"))
