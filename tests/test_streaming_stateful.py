"""Stateful streaming operators (streaming/stateful.py): cross-micro-batch
first-seen dedup via applyInPandasWithState, and watermarked windowed tile
counts.  Micro-batches are made deterministic with a parquet file source +
maxFilesPerTrigger=1 + AvailableNow."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def two_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    b1 = pd.DataFrame(
        {
            "url": ["a", "b"],
            "warc_ts": [t0, t0 + dt.timedelta(minutes=5)],
            "text": ["first a", "first b"],
        }
    )
    b2 = pd.DataFrame(
        {
            "url": ["b", "c"],
            "warc_ts": [t0 + dt.timedelta(minutes=12), t0 + dt.timedelta(minutes=14)],
            "text": ["replayed b", "first c"],
        }
    )
    spark.createDataFrame(b1).coalesce(1).write.parquet(str(src / "batch1"))
    spark.createDataFrame(b2).coalesce(1).write.parquet(str(src / "batch2"))
    return str(src)


def _stream(spark, src):
    return (
        spark.readStream.schema("url string, warc_ts timestamp, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )


def test_first_seen_dedups_across_microbatches(spark, two_batches, tmp_path):
    from open_vector_tile_spark.streaming.stateful import first_seen

    out = first_seen(_stream(spark, two_batches), key_col="url")
    q = (
        out.writeStream.format("memory")
        .queryName("first_seen_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT url, text FROM first_seen_t").toPandas()
    # each key exactly once, regardless of file processing order
    assert sorted(got["url"]) == ["a", "b", "c"]
    # 'a' and 'c' appear in only one batch -> their payloads are pinned
    by_url = dict(zip(got["url"], got["text"]))
    assert by_url["a"] == "first a" and by_url["c"] == "first c"
    assert by_url["b"] in ("first b", "replayed b")


def test_first_seen_resumes_from_checkpoint(spark, two_batches, tmp_path):
    """State survives a query restart: a re-run over a NEW file with an old
    key emits nothing for it (exactly-once across restarts)."""
    from open_vector_tile_spark.streaming.stateful import first_seen

    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def run():
        q = (
            first_seen(_stream(spark, two_batches), key_col="url")
            .writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    first = spark.read.parquet(sink).toPandas()
    assert sorted(first["url"]) == ["a", "b", "c"]
    b3 = pd.DataFrame(
        {
            "url": ["a", "d"],
            "warc_ts": [dt.datetime(2026, 1, 1, 1, 0, 0)] * 2,
            "text": ["replayed a", "first d"],
        }
    )
    spark.createDataFrame(b3).coalesce(1).write.parquet(two_batches + "/batch3")
    run()
    both = spark.read.parquet(sink).toPandas()
    # the restarted query emits only the genuinely new key: state survived
    assert sorted(both["url"]) == ["a", "b", "c", "d"]
    assert both.set_index("url")["text"]["a"] == "first a"


def test_windowed_tile_counts(spark, two_batches, tmp_path):
    from open_vector_tile_spark.streaming.stateful import windowed_tile_counts

    pts = _stream(spark, two_batches).select(
        "warc_ts",
        F.lit(4).alias("zoom"),
        (F.length("url") % 4).cast("long").alias("tile_x"),
        F.lit(0).cast("long").alias("tile_y"),
    )
    out = windowed_tile_counts(pts, ts_col="warc_ts", window="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts_t")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(
        "SELECT window_start, n_features FROM win_counts_t ORDER BY window_start"
    ).toPandas()
    # events at 00:00, 00:05 -> window [00:00,00:10) = 2; 00:12, 00:14 -> [00:10,00:20) = 2
    assert got["n_features"].tolist() == [2, 2]
    assert got["window_start"].iloc[0].minute == 0
    assert got["window_start"].iloc[1].minute == 10


class _FakeState:
    def __init__(self):
        self.v = None

    def exists(self):
        return self.v is not None

    def get(self):
        return self.v

    def update(self, t):
        self.v = tuple(t)

    def clear(self):
        self.v = None


class _FakeHandle:
    def __init__(self):
        self.state = _FakeState()
        self.timers = []

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.state

    def listTimers(self):
        return list(self.timers)

    def deleteTimer(self, t):
        self.timers.remove(t)

    def registerTimer(self, t):
        self.timers.append(t)


def test_session_processor_logic():
    """The transformWithState session processor, driven directly (the state
    protocol needs protobuf, absent here — see sessionize_stream docstring):
    in-batch close on gap exceed, single re-registered timer at last+gap,
    timer expiry emits and clears, batch fold sorts by ts."""
    from open_vector_tile_spark.streaming.stateful import _make_session_processor

    gap = 600_000
    proc = _make_session_processor(gap)
    h = _FakeHandle()
    proc.init(h)

    # batch 1: two events 2 min apart (one session), out-of-order input
    out = list(proc.handleInputRows((1,), iter([pd.DataFrame({"ts_ms": [120_000, 0]})]), None))
    assert out == []
    assert h.state.v == (0, 120_000, 2)
    assert h.timers == [120_000 + gap]

    # batch 2: event far beyond the gap -> previous session emitted, new one opens
    out = list(proc.handleInputRows((1,), iter([pd.DataFrame({"ts_ms": [3_600_000]})]), None))
    assert len(out) == 1
    row = out[0].iloc[0]
    assert (row["session_start_ms"], row["session_end_ms"], row["n_events"]) == (0, 120_000, 2)
    assert h.state.v == (3_600_000, 3_600_000, 1)
    assert h.timers == [3_600_000 + gap]  # old timer deleted, one live timer

    # timer expiry: open session emitted and state cleared
    out = list(proc.handleExpiredTimer((1,), None, None))
    assert len(out) == 1
    row = out[0].iloc[0]
    assert (row["session_start_ms"], row["session_end_ms"], row["n_events"]) == (
        3_600_000,
        3_600_000,
        1,
    )
    assert h.state.v is None
    # expiry with no state is a no-op
    assert list(proc.handleExpiredTimer((1,), None, None)) == []


def test_sessionize_stream_transform_with_state(spark, tmp_path):
    """Streaming gap sessionization on transformWithStateInPandas: a session
    closed by a later event of the same key is emitted in that micro-batch; a
    session the stream goes quiet on is closed by its event-time timer when
    the watermark passes; a still-open session is NOT emitted."""
    pytest.importorskip(
        "google.protobuf", reason="transformWithState state protocol needs protobuf"
    )
    from open_vector_tile_spark.streaming.stateful import sessionize_stream

    src = tmp_path / "sess_src"
    src.mkdir()
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    b1 = pd.DataFrame(
        {
            "user_id": [1, 1, 2],
            "ts": [t0, t0 + dt.timedelta(minutes=2), t0 + dt.timedelta(minutes=30)],
        }
    )
    # user 2 reappears 30 min later (> 10 min gap -> closes their first
    # session in-batch); user 1 stays quiet -> timer closes their session
    b2 = pd.DataFrame({"user_id": [2], "ts": [t0 + dt.timedelta(minutes=60)]})
    spark.createDataFrame(b1).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(b2).coalesce(1).write.parquet(str(src / "b2"))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        out = sessionize_stream(stream, gap_seconds=600.0, watermark="0 seconds")
        q = (
            out.writeStream.format("memory")
            .queryName("sess_t")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    got = spark.sql(
        "SELECT user_id, session_start_ms, session_end_ms, n_events FROM sess_t"
    ).toPandas()
    ms = lambda d: int(d.timestamp() * 1000)
    rows = set(map(tuple, got.to_numpy().tolist()))
    # user 1: 2-event session closed by timer after watermark passed 00:12
    assert (1, ms(t0), ms(t0 + dt.timedelta(minutes=2)), 2) in rows
    # user 2: single-event session closed in-batch by the 01:00 event
    assert (2, ms(t0 + dt.timedelta(minutes=30)), ms(t0 + dt.timedelta(minutes=30)), 1) in rows
    # user 2's 01:00 session is still open -> not emitted
    assert len(rows) == 2


class _FakeGroupState:
    """Minimal GroupState stand-in for unit-testing the first_seen handler."""

    def __init__(self, exists=False, timed_out=False):
        self.exists = exists
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_set = None

    def update(self, v):
        self.exists = True

    def remove(self):
        self.removed = True
        self.exists = False

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def test_first_seen_timeout_contract():
    """With ProcessingTimeTimeout the handler must (a) arm the timer on every
    sighting and (b) evict state when the timer fires — otherwise the state
    store grows without bound despite the documented contract."""
    from open_vector_tile_spark.streaming.stateful import _make_first_seen_fn

    fn = _make_first_seen_fn(evict=True, timeout_duration_ms=5000)
    pdf = pd.DataFrame({"k": ["a"], "v": [1]})

    # first sighting: emits, arms timer
    st = _FakeGroupState()
    out = list(fn(("a",), iter([pdf]), st))
    assert len(out) == 1 and st.exists and st.timeout_set == 5000

    # repeat sighting: no emit, timer re-armed (sliding horizon)
    st2 = _FakeGroupState(exists=True)
    assert list(fn(("a",), iter([pdf]), st2)) == []
    assert st2.timeout_set == 5000

    # timer fires: state removed, nothing emitted
    st3 = _FakeGroupState(exists=True, timed_out=True)
    assert list(fn(("a",), iter([]), st3)) == []
    assert st3.removed

    # NoTimeout mode: never touches timer APIs
    fn0 = _make_first_seen_fn(evict=False, timeout_duration_ms=0)
    st4 = _FakeGroupState()
    assert len(list(fn0(("a",), iter([pdf]), st4))) == 1
    assert st4.timeout_set is None
