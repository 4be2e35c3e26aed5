"""Custom stateful streaming operator: gap-based sessionization.

The reference has no streaming at all (SURVEY §2.4); this is the
Spark-native stateful surface a continuous event pipeline needs —
``applyInPandasWithState`` keyed by user, with processing-time timeout to
flush idle sessions. The batch-equivalent window formulation lives in
__spark_entry__._events_sessionize (oracle-checked); this operator is the
unbounded-input version of the same semantics.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_GAP_SECONDS = 1800

SESSION_OUTPUT = StructType([
    StructField("user_id", LongType(), False),
    StructField("session_idx", LongType(), False),
    StructField("n_events", LongType(), False),
    StructField("session_start", TimestampType(), False),
    StructField("session_end", TimestampType(), False),
    StructField("sum_value", DoubleType(), False),
    StructField("closed", StringType(), False),  # open|closed
])

STATE_SCHEMA = StructType([
    StructField("session_idx", LongType(), False),
    StructField("n_events", LongType(), False),
    StructField("start_s", LongType(), False),
    StructField("end_s", LongType(), False),
    StructField("sum_value", DoubleType(), False),
])


def make_sessionize_fn(use_timeout: bool):
    """Build the per-user session accumulator.

    Emits a row per session transition: 'closed' rows when a gap (or, in
    continuous mode, a processing-time timeout) ends a session, plus one
    'open' row reflecting current state. Downstream consumers must key
    on (user_id, session_idx, session_start) and keep the latest:
    session_start disambiguates index reuse after a timeout close frees
    the state (the counter restarts at 0 for that user, but no two
    sessions of one user can share a start timestamp).

    ``use_timeout`` must be False in availableNow/drain mode: registering
    ProcessingTimeTimeout makes the availableNow trigger spin empty
    micro-batches forever waiting to service timeouts (observed: 146+
    batches over a static directory).
    """

    def sessionize_fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]

        if state.hasTimedOut:
            if state.exists:
                idx, n, s0, s1, sv = state.get
                state.remove()
                yield _frame(user_id, idx, n, s0, s1, sv, "closed")
            return

        events = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        if state.exists:
            idx, n, s0, s1, sv = state.get
        else:
            idx, n, s0, s1, sv = 0, 0, None, None, 0.0

        out = []
        for ts, value in zip(events["ts"], events["value"]):
            t = int(ts.value)  # ns precision: batch/stream must agree
            if n > 0 and t - s1 > SESSION_GAP_SECONDS * 1_000_000_000:
                out.append(_frame(user_id, idx, n, s0, s1, sv, "closed"))
                idx, n, s0, sv = idx + 1, 0, None, 0.0
            if n == 0:
                s0 = t
            n += 1
            s1 = t
            sv += float(value)

        state.update((idx, n, s0, s1, sv))
        if use_timeout:
            state.setTimeoutDuration(SESSION_GAP_SECONDS * 1000)
        out.append(_frame(user_id, idx, n, s0, s1, sv, "open"))
        yield from out

    return sessionize_fn


def _frame(user_id, idx, n, s0, s1, sv, status) -> pd.DataFrame:
    return pd.DataFrame([
        {
            "user_id": user_id,
            "session_idx": idx,
            "n_events": n,
            "session_start": pd.Timestamp(s0),
            "session_end": pd.Timestamp(s1),
            "sum_value": round(sv, 4),
            "closed": status,
        }
    ])


def start_sessionize_stream(
    spark,
    events_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    events_schema: StructType,
    available_now: bool = True,
):
    """File stream of events -> stateful sessionization -> append sink.

    availableNow (drain/backfill) mode runs with NoTimeout; a perpetual
    tail run uses ProcessingTimeTimeout so idle sessions flush as
    'closed' after the gap elapses in processing time.
    """
    stream = spark.readStream.schema(events_schema).parquet(events_dir)
    timeout = (
        GroupStateTimeout.NoTimeout
        if available_now
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    sessions = (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            make_sessionize_fn(use_timeout=not available_now),
            outputStructType=SESSION_OUTPUT,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
    writer = (
        sessions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
