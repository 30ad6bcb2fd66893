"""Custom stateful streaming operators (SURVEY §2.9 surface).

Two operators a continuously-ingesting tile pipeline needs and batch Spark
can't express:

- :func:`first_seen` — streaming exact-dedup across micro-batches: emit a
  key's row the first time it is ever seen, drop every later arrival
  (re-crawled pages, replayed WARC segments).  ``applyInPandasWithState``
  keeps one boolean per key in the state store; at scale the state is
  hash-partitioned by key across executors like any shuffle, and eviction is
  the caller's choice of ``GroupStateTimeout`` (processing-time timeout for
  bounded re-crawl horizons; NoTimeout when the key space is bounded).
- :func:`windowed_tile_counts` — event-time feature counts per (window,
  tile) with a watermark for late data: pure built-in window aggregation
  (partial-agg map-side, one shuffle on the group key), the declarative
  path Catalyst optimizes — no custom state needed.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def first_seen(
    stream: DataFrame,
    key_col: str,
    timeout: str = GroupStateTimeout.NoTimeout,
    timeout_duration_ms: int = 24 * 3600 * 1000,
) -> DataFrame:
    """Streaming first-occurrence filter: one output row per distinct key,
    from the micro-batch where the key first appeared.

    Within a single micro-batch the winner is the first row in the group's
    Arrow batches (micro-batch-deterministic sources -> deterministic
    output).  State per key is a single boolean — the smallest possible
    state row; for unbounded key spaces pass
    ``timeout=GroupStateTimeout.ProcessingTimeTimeout`` and the store evicts
    a key ``timeout_duration_ms`` after its last arrival (sliding horizon:
    every sighting re-arms the timer, so eviction happens only once
    re-deliveries have gone quiet — after which a re-crawl is treated as new).
    """
    schema = stream.schema
    out_type = schema
    evict = timeout == GroupStateTimeout.ProcessingTimeTimeout
    dedup = _make_first_seen_fn(evict, timeout_duration_ms)

    # append-mode operator: each key's row is emitted exactly once and never
    # revised -> compatible with append-only sinks (files) AND recoverable
    # from a checkpoint (memory sink cannot recover)
    return stream.groupBy(key_col).applyInPandasWithState(
        dedup, out_type, "seen boolean", "append", timeout
    )


def _make_first_seen_fn(evict: bool, timeout_duration_ms: int):
    """The applyInPandasWithState handler for :func:`first_seen`, exposed for
    unit-testing the timeout contract against a fake GroupState."""

    def dedup(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if evict and state.hasTimedOut:
            # timer fired: drop the key's state so the store stays bounded
            state.remove()
            return
        if state.exists:
            if evict:  # re-arm on every sighting (sliding re-delivery horizon)
                state.setTimeoutDuration(timeout_duration_ms)
            return
        for pdf in pdfs:
            if len(pdf):
                state.update((True,))
                if evict:
                    state.setTimeoutDuration(timeout_duration_ms)
                yield pdf.iloc[:1]
                return

    return dedup


def _make_session_processor(gap_ms: int):
    # imports inside the factory so the module still loads on Spark builds
    # without transformWithState
    from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    class SessionProcessor(StatefulProcessor):
        """Per-key state: (start_ms, last_ms, n) of the open session.  An
        event within ``gap_ms`` of ``last`` extends the session; a later
        event closes it (emitted immediately) and opens a new one; the
        event-time timer at ``last + gap`` closes sessions the stream went
        quiet on (emitted when the watermark passes)."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._state = handle.getValueState(
                "session", "start_ms long, last_ms long, n long"
            )

        def _emit(self, key, start, last, n):
            return pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start_ms": [start],
                    "session_end_ms": [last],
                    "n_events": [n],
                }
            )

        def handleInputRows(self, key, rows, timerValues: "TimerValues"):
            if self._state.exists():
                start, last, n = self._state.get()
            else:
                start = last = None
                n = 0
            out = []
            ts_all = []
            for pdf in rows:
                ts_all.extend(int(t) for t in pdf["ts_ms"])
            for t in sorted(ts_all):
                if start is None:
                    start, last, n = t, t, 1
                elif t - last <= gap_ms:
                    last, n = max(last, t), n + 1
                else:
                    out.append(self._emit(key, start, last, n))
                    start, last, n = t, t, 1
            if start is not None:
                self._state.update((start, last, n))
                for old in self._handle.listTimers():
                    self._handle.deleteTimer(old)
                self._handle.registerTimer(last + gap_ms)
            return iter(out)

        def handleExpiredTimer(
            self, key, timerValues: "TimerValues", expiredTimerInfo: "ExpiredTimerInfo"
        ):
            if not self._state.exists():
                return iter([])
            start, last, n = self._state.get()
            self._state.clear()
            return iter([self._emit(key, start, last, n)])

        def close(self) -> None:
            pass

    return SessionProcessor()


def sessionize_stream(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming gap sessionization on ``transformWithStateInPandas`` (the
    Spark 4 stateful API: typed value state + event-time timers).

    Emits one row per CLOSED session — closed either by a later event of the
    same key (emitted in that micro-batch) or by the event-time timer when the
    watermark passes ``last_event + gap`` (the stream went quiet).  Sessions
    still open at the end of a run stay in the state store and survive
    restarts via the checkpoint — the batch twin is
    ``operators.events.sessionize``, and the within-batch fold uses the same
    exclusive-gap rule, so a batch replay of the same events yields the same
    session boundaries.

    Requires the RocksDB state store provider (Spark bundles it):
    ``spark.sql.streaming.stateStore.providerClass =
    org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``
    — and the ``protobuf`` Python package (transformWithState's state-server
    protocol).  This container has no protobuf and installs are disallowed,
    so the end-to-end test is gated on ``google.protobuf`` being importable
    (tests/test_streaming_stateful.py); the processor's session logic itself
    is deterministic pure-Python and unit-tested against fakes.  On any
    normal Spark 4 deployment this runs as-is.

    Scale: state is one (long, long, long) per key, hash-partitioned by key;
    timers are per-key in the same store.  No shuffle beyond the groupBy key.
    """
    gap_ms = int(round(gap_seconds * 1000.0))
    with_ms = stream.withWatermark(ts_col, watermark).select(
        F.col(key_col).alias("user_id"),
        F.col(ts_col),
        F.unix_millis(F.col(ts_col).cast("timestamp")).alias("ts_ms"),
    )
    return with_ms.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_session_processor(gap_ms),
        outputStructType="user_id long, session_start_ms long, session_end_ms long, n_events long",
        outputMode="append",
        timeMode="eventTime",
    )


def windowed_tile_counts(
    stream: DataFrame,
    ts_col: str = "warc_ts",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    keys: tuple = ("zoom", "tile_x", "tile_y"),
) -> DataFrame:
    """Event-time windowed feature counts per tile with late-data handling:
    rows later than ``watermark`` behind the max seen event time are dropped
    and window state is evicted once the watermark passes the window end."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), *keys)
        .agg(F.count("*").alias("n_features"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n_features",
        )
    )
