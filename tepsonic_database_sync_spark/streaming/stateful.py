"""Custom stateful streaming — ``applyInPandasWithState`` (SURVEY.md §2.7
extension; the engine's escape hatch for operators Structured Streaming's
built-in windows can't express).

Demo operator: per-user running event totals with arbitrary user state
(count + value-cents sum) maintained across micro-batches. The state is a
tuple per key, updated from Arrow batches — the canonical shape for
session-scoped feature accumulation in a training-data pipeline.

Scale notes: state lives in the executor state store partitioned by the
group key; a watermark + timeout (``GroupStateTimeout``) bounds it. Keys
here (user_id) are high-cardinality and uniform — no hot partitions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_cents", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int(round(float(pdf["value"].sum()) * 100))
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "value_cents": [cents]}
    )


def streaming_user_totals(
    spark: SparkSession, events_dir: str, schema: T.StructType
) -> DataFrame:
    """readStream → per-user arbitrary-state accumulation. Caller attaches
    a sink (tests: memory + processAllAvailable)."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    return stream.groupBy("user_id").applyInPandasWithState(
        _update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_ms", T.LongType()),
        T.StructField("session_end_ms", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_cents", T.LongType()),
        T.StructField("closed_by", T.StringType()),
    ]
)

# (session_start_ms, session_end_ms, n_events, value_cents)
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("end_ms", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
    ]
)

SESSION_GAP_MS = 5 * 60 * 1000


def _session_row(
    user_id: int, start_ms: int, end_ms: int, n: int, cents: int, how: str
) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start_ms": [start_ms],
            "session_end_ms": [end_ms],
            "n_events": [n],
            "value_cents": [cents],
            "closed_by": [how],
        }
    )


def _session_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Session TTL semantics — a session CLOSES (and only then is emitted,
    append-mode) on either path:

    - ``gap``: a new event for the key arrives more than SESSION_GAP_MS
      after the session's last event — the old session is emitted in the
      same micro-batch that starts the new one;
    - ``timeout``: no event arrives and the WATERMARK passes
      session_end + gap — Spark invokes this function with
      ``state.hasTimedOut`` and no rows, the state-store entry is
      removed, and the closed session is emitted.

    The timeout is EVENT-time (``setTimeoutTimestamp`` + watermark), not
    processing-time: deterministic under replay/backfill, and the state
    store stays bounded by the watermark — exactly the TTL contract a
    100 TB backfill needs (wall-clock TTL would close every session
    instantly when replaying historical data; event-time TTL closes them
    at the same data positions as the live run)."""
    if state.hasTimedOut:
        start_ms, end_ms, n, cents = state.get
        state.remove()
        yield _session_row(key[0], start_ms, end_ms, n, cents, "timeout")
        return

    rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
    ts_ms = rows["ts"].to_numpy().astype("datetime64[ms]").astype("int64")
    cents_arr = [int(round(float(v) * 100)) for v in rows["value"]]

    if state.exists:
        start_ms, end_ms, n, cents = state.get
    else:
        start_ms = end_ms = -1
        n = cents = 0

    closed = []
    for t, c in zip(ts_ms, cents_arr):
        t = int(t)
        if start_ms < 0:
            start_ms = end_ms = t
            n, cents = 1, c
        elif t - end_ms > SESSION_GAP_MS:
            closed.append(_session_row(key[0], start_ms, end_ms, n, cents, "gap"))
            start_ms = end_ms = t
            n, cents = 1, c
        else:
            end_ms = max(end_ms, t)
            n += 1
            cents += c
    state.update((start_ms, end_ms, n, cents))
    state.setTimeoutTimestamp(end_ms + SESSION_GAP_MS)
    if closed:
        yield pd.concat(closed, ignore_index=True)


def streaming_sessions_ttl(
    spark: SparkSession,
    events_dir: str,
    schema: T.StructType,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """readStream → per-user TTL sessionization with event-time timeouts.

    ``session_window`` (streaming/windows.py) covers the declarative gap
    case; this is the ESCAPE HATCH shape for session state that built-in
    windows can't express (arbitrary per-key accumulators, custom close
    conditions, side outputs) — while keeping the state store bounded by
    the same watermark mechanics."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    return (
        stream.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_update,
            SESSION_OUTPUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
