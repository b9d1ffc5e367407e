"""Custom stateful streaming operator: event-time sessionization via
``applyInPandasWithState`` (the extension slot SURVEY §2.9 reserves for
operators Spark's built-in windows can't express).

Semantics match the batch twin (``plans.queries.events_sessionize``):
a session is a run of events per user with < `gap` seconds between
consecutive events. Sessions are emitted when the event-time watermark
passes their close (EventTimeTimeout), so results are deterministic
under replay.

Scale: state is per-user (a few numbers), partitioned by the group key —
the same shuffle key as the batch twin; watermark bounds state size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .incremental import ensure_event_time

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)

GAP_SECONDS = 1800


def _us(ts: pd.Series) -> pd.Series:
    return ts.astype("int64") // 1000  # ns -> us


def sessionize_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user session accumulator. Emits every CLOSED session: a gap
    within the batch closes one immediately; the watermark timeout closes
    the trailing one."""
    (user_id,) = key
    out: list[tuple] = []

    def emit(start_us: int, end_us: int, n: int, total: float) -> None:
        out.append(
            (
                user_id,
                pd.Timestamp(start_us, unit="us"),
                pd.Timestamp(end_us, unit="us"),
                n,
                round(total, 2),
            )
        )

    if state.hasTimedOut:
        if state.exists:
            s, e, n, total = state.get
            emit(s, e, n, total)
            state.remove()
    else:
        events = pd.concat(list(pdfs)).sort_values("ts")
        ts_us = _us(events["ts"]).tolist()
        vals = events["value"].tolist()
        if state.exists:
            start, end, n, total = state.get
        else:
            start, end, n, total = ts_us[0], ts_us[0], 0, 0.0
        for t, v in zip(ts_us, vals):
            if n > 0 and t - end > GAP_SECONDS * 1_000_000:
                emit(start, end, n, total)
                start, n, total = t, 0, 0.0
            end = max(end, t)
            n += 1
            total += v
        state.update((start, end, n, total))
        # close the open session once the watermark passes its end + gap
        state.setTimeoutTimestamp(end // 1000 + GAP_SECONDS * 1000)

    yield pd.DataFrame(out, columns=[f.name for f in SESSION_SCHEMA.fields])


def sessionize_stream(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """events stream (user_id, ts, value, ...) -> closed sessions."""
    return (
        ensure_event_time(events, "ts")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            sessionize_fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Spark 4 transformWithState variant (the applyInPandasWithState successor)
# ---------------------------------------------------------------------------

try:  # Spark >= 4.0 only
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    class SessionizeProcessor(StatefulProcessor):
        """Per-user sessionizer on the ``transformWithStateInPandas``
        API — identical semantics to :func:`sessionize_fn`, re-expressed
        with explicit ValueState + event-time timers (the Spark-4 model:
        state primitives and timers are first-class instead of one opaque
        tuple + one implicit timeout).

        Scale: same shuffle key (user_id) and O(1) state per key as the
        legacy variant; transformWithState runs on the RocksDB state
        store, which keeps hot state off-heap and checkpoint increments
        small — the knob that matters when key cardinality reaches 10^9.
        """

        def init(self, handle: StatefulProcessorHandle) -> None:
            self.handle = handle
            self.state = handle.getValueState("sess", STATE_SCHEMA)

        def _emit(self, user_id, s, e, n, total) -> pd.DataFrame:
            return pd.DataFrame(
                [
                    (
                        user_id,
                        pd.Timestamp(s, unit="us"),
                        pd.Timestamp(e, unit="us"),
                        n,
                        round(total, 2),
                    )
                ],
                columns=[f.name for f in SESSION_SCHEMA.fields],
            )

        def handleInputRows(self, key, rows, timerValues: TimerValues):
            (user_id,) = key
            events = pd.concat(list(rows)).sort_values("ts")
            ts_us = _us(events["ts"]).tolist()
            vals = events["value"].tolist()
            if self.state.exists():
                start, end, n, total = self.state.get()
            else:
                start, end, n, total = ts_us[0], ts_us[0], 0, 0.0
            for t, v in zip(ts_us, vals):
                if n > 0 and t - end > GAP_SECONDS * 1_000_000:
                    yield self._emit(user_id, start, end, n, total)
                    start, n, total = t, 0, 0.0
                end = max(end, t)
                n += 1
                total += v
            self.state.update((start, end, n, total))
            # one timer per key at the session's close; re-registering on
            # extension supersedes conceptually — stale expiries are
            # filtered in handleExpiredTimer against current state
            self.handle.registerTimer(end // 1000 + GAP_SECONDS * 1000)

        def handleExpiredTimer(
            self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
        ):
            (user_id,) = key
            expiry_ms = expiredTimerInfo.getExpiryTimeInMs()
            if self.state.exists():
                s, e, n, total = self.state.get()
                if e // 1000 + GAP_SECONDS * 1000 <= expiry_ms:
                    self.state.clear()
                    yield self._emit(user_id, s, e, n, total)
                # else: the session was extended after this timer was set —
                # a fresher timer exists; ignore the stale one

        def close(self) -> None:
            pass

    def sessionize_stream_tws(
        events: DataFrame, watermark: str = "30 minutes"
    ) -> DataFrame:
        """Spark-4-native sessionization: ``transformWithStateInPandas``
        with event-time timers. Requires (a) the RocksDB state store
        provider (``spark.sql.streaming.stateStore.providerClass``) and
        (b) the ``protobuf`` Python package — the TWS driver worker
        speaks protobuf to the JVM. Both are cluster-standard; this
        container lacks protobuf, so the equivalence test skips and the
        ``applyInPandasWithState`` twin pins the semantics."""
        return (
            ensure_event_time(events, "ts")
            .withWatermark("ts", watermark)
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=SessionizeProcessor(),
                outputStructType=SESSION_SCHEMA,
                outputMode="Append",
                timeMode="EventTime",
            )
        )

except ImportError:  # pragma: no cover - pre-4.0 Spark
    sessionize_stream_tws = None
