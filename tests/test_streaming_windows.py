"""Windowed aggregation and stateful sessionization: streaming output
pinned against the batch twin."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from readur_spark.streaming.windows import (
    sessionize,
    sessionize_batch,
    windowed_event_counts,
)

UTC = dt.timezone.utc


def _events_table():
    base = dt.datetime(2024, 3, 1, tzinfo=UTC)
    rows = []
    # user 1: two sessions (gap > 600 s); user 2: one session
    for i, off in enumerate([0, 100, 200, 2000, 2100]):
        rows.append((i, base + dt.timedelta(seconds=off), 1, "click", 10.0))
    for i, off in enumerate([50, 150]):
        rows.append((10 + i, base + dt.timedelta(seconds=off), 2, "click", 5.0))
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us", tz="UTC")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )


@pytest.fixture()
def few_shuffle_partitions(spark):
    """Streaming state stores create one store per shuffle partition
    per operator — 8 partitions over a 7-row test corpus is pure
    overhead (~minutes). Scope the conf down for these tests."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", old)


def test_windowed_counts_stream_equals_batch(spark, tmp_path, few_shuffle_partitions):
    src = tmp_path / "events_in"
    os.makedirs(src)
    pq.write_table(_events_table(), str(src / "part0.parquet"))

    batch_df = spark.read.parquet(str(src))
    expected = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in windowed_event_counts(batch_df).collect()
    }

    stream = (
        spark.readStream.schema(batch_df.schema).parquet(str(src))
    )
    out = windowed_event_counts(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("select * from win_counts").collect()
    }
    assert got == expected and len(got) > 0


def test_sessionize_batch_gaps():
    pass  # covered via spark fixture variant below


def test_sessionize_batch_oracle(spark, tmp_path):
    src = tmp_path / "ev"
    os.makedirs(src)
    pq.write_table(_events_table(), str(src / "p.parquet"))
    events = spark.read.parquet(str(src))
    sessions = {
        (r.user_id, r.n_events)
        for r in sessionize_batch(events, gap_seconds=600).collect()
    }
    assert sessions == {(1, 3), (1, 2), (2, 2)}


def test_sessionize_stream_emits_closed_sessions(spark, tmp_path, few_shuffle_partitions):
    src = tmp_path / "ev_stream"
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    pq.write_table(_events_table(), str(src / "p.parquet"))
    schema = spark.read.parquet(str(src)).schema

    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        sessionize(stream, gap_seconds=600)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.user_id, r.n_events)
        for r in spark.sql("select * from sessions").collect()
    }
    # one trigger emits sessions CLOSED by a later event in the same
    # batch; each user's open tail session stays in state (closed by
    # the processing-time timeout in a long-running deployment)
    assert got == {(1, 3)}


def test_stream_dedup_suppresses_redeliveries(spark, tmp_path, few_shuffle_partitions):
    from readur_spark.streaming.windows import (
        dedup_events_stream,
        first_event_per_key,
    )

    src = tmp_path / "dedup_in"
    os.makedirs(src)
    pq.write_table(_events_table(), str(src / "part0.parquet"))

    batch_df = spark.read.parquet(str(src))
    # batch corpus: user 1 has 5 'click' rows, user 2 has 2 — the
    # stream must emit exactly one row per (user_id, event_type)
    expected_keys = {
        (r.user_id, r.event_type)
        for r in first_event_per_key(
            batch_df, ["user_id", "event_type"]
        ).collect()
    }

    stream = spark.readStream.schema(batch_df.schema).parquet(str(src))
    out = dedup_events_stream(stream, ["user_id", "event_type"])
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("select user_id, event_type from dedup_out").collect()
    assert {(r.user_id, r.event_type) for r in got} == expected_keys
    assert len(got) == len(expected_keys)  # no duplicate emissions


def test_first_event_per_key_counts(spark):
    from readur_spark.streaming.windows import first_event_per_key

    df = spark.createDataFrame(
        [(1, 7, "a"), (2, 7, "a"), (3, 8, "b")],
        "event_id long, user_id long, event_type string",
    )
    got = {
        (r.user_id, r.event_type): (r.first_event_id, r.n_suppressed)
        for r in first_event_per_key(df, ["user_id", "event_type"]).collect()
    }
    assert got == {(7, "a"): (1, 1), (8, "b"): (3, 0)}
