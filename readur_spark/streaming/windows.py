"""Event-time windowed aggregation and custom stateful operators.

The reference has no stream engine (SURVEY.md §2 streaming note) — its
hourly `ocr_metrics` rollup (migrations/20250620100001:33-46) and
daily `ocr_analytics` view are periodic batch GROUP BYs. On Spark the
same accounting runs continuously:

  - `windowed_event_counts`: tumbling event-time windows with a
    watermark — late rows inside the watermark update their window;
    rows later than the watermark are dropped (the batch reference
    never drops, so the watermark is the explicit, documented knob a
    continuous deployment adds).
  - `sessionize`: gap-based session windows per key via
    applyInPandasWithState — the custom-stateful-operator pattern for
    semantics Spark's built-in windows can't express (readur's analog
    is "a burst of OCR activity per user", which it approximates with
    day buckets).

Scale notes: state is partitioned by the grouping key; the watermark
bounds state size (windows older than watermark are finalized and
evicted). Skewed keys → the same salting rules as batch aggregation.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window counts + value sums per key (streaming or
    batch DataFrame — same expression works for both, which is how
    the tests pin streaming output against the batch oracle)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(
        F.window(F.col(ts_col), window_duration).alias("win"),
        F.col(key_col),
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    ).select(
        F.col("win.start").alias("window_start"),
        key_col,
        "n_events",
        "total_value",
    )


def dedup_events_stream(
    events: DataFrame,
    key_cols: list[str],
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exactly-once-per-key dedup: keep the first arrival per
    key, with state bounded by the watermark
    (`dropDuplicatesWithinWatermark` — re-deliveries inside the
    watermark are suppressed, state for keys older than it is evicted).
    On a batch frame this degrades to plain dropDuplicates, whose
    per-key representative is arbitrary — use `first_event_per_key`
    when determinism matters."""
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            key_cols
        )
    return events.dropDuplicates(key_cols)


def first_event_per_key(
    events: DataFrame, key_cols: list[str], id_col: str = "event_id"
) -> DataFrame:
    """Deterministic batch twin of the stream dedup: the minimum-id
    event per key plus the suppressed-duplicate count. One map-side-
    combinable aggregate — the scale-safe shape of 'pick a winner per
    key' (same contract as the ingest dedup winner subtree)."""
    return events.groupBy(*key_cols).agg(
        F.min(id_col).alias("first_" + id_col),
        (F.count("*") - 1).alias("n_suppressed"),
    )


SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp,"
    " n_events int"
)
_STATE_SCHEMA = "start long, end long, n int"


def _sessionize_group(
    key: Tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
    gap_seconds: int,
) -> Iterator[pd.DataFrame]:
    """Merge a user's events into gap-separated sessions. Emits closed
    sessions; the open session rides in state until the gap passes
    (processing-time timeout closes it)."""
    ts_us = []
    for pdf in batches:
        # Timestamp.value is nanoseconds → epoch seconds
        ts_us.extend(int(t.value // 1_000_000_000) for t in pd.to_datetime(pdf["ts"]))

    if state.hasTimedOut:
        start, end, n = state.get
        state.remove()
        yield pd.DataFrame(
            [
                {
                    "user_id": key[0],
                    "session_start": pd.Timestamp(start, unit="s"),
                    "session_end": pd.Timestamp(end, unit="s"),
                    "n_events": n,
                }
            ]
        )
        return

    ts_us.sort()
    if state.exists:
        start, end, n = state.get
    else:
        start, end, n = None, None, 0

    closed = []
    for t in ts_us:
        if start is None:
            start, end, n = t, t, 1
        elif t - end <= gap_seconds:
            end, n = t, n + 1
        else:
            closed.append((start, end, n))
            start, end, n = t, t, 1
    if start is not None:
        state.update((int(start), int(end), int(n)))
        state.setTimeoutDuration(gap_seconds * 1000)
    if closed:
        yield pd.DataFrame(
            [
                {
                    "user_id": key[0],
                    "session_start": pd.Timestamp(s, unit="s"),
                    "session_end": pd.Timestamp(e, unit="s"),
                    "n_events": c,
                }
                for s, e, c in closed
            ]
        )


def sessionize(
    events: DataFrame, gap_seconds: int = 1800, ts_col: str = "ts"
) -> DataFrame:
    """Gap-based sessionization per user via applyInPandasWithState
    (streaming input required)."""

    def fn(key, batches, state):
        yield from _sessionize_group(key, batches, state, gap_seconds)

    return (
        events.select("user_id", ts_col)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def sessionize_batch(
    events: DataFrame, gap_seconds: int = 1800, ts_col: str = "ts"
) -> DataFrame:
    """Batch twin of `sessionize` (the oracle for tests): classic
    gaps-and-islands — a window lag marks session starts, a running
    sum numbers them, then one agg per (user, session)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(ts_col)
    # unix_timestamp, not cast("long"): TIMESTAMP_NTZ forbids the cast
    # in Spark 4, and only differences matter so tz offsets cancel
    epoch = F.unix_timestamp(F.col(ts_col))
    marked = events.select("user_id", ts_col).withColumn(
        "_new",
        (epoch - F.lag(epoch, 1).over(w) > gap_seconds).cast("int"),
    ).fillna({"_new": 1})
    numbered = marked.withColumn("_sid", F.sum("_new").over(w))
    return (
        numbered.groupBy("user_id", "_sid")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").cast("int").alias("n_events"),
        )
        .drop("_sid")
    )
