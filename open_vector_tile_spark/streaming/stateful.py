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
) -> DataFrame:
    """Streaming first-occurrence filter: one output row per distinct key,
    from the micro-batch where the key first appeared.

    Within a single micro-batch the winner is the first row in the group's
    Arrow batches (micro-batch-deterministic sources -> deterministic
    output).  State per key is a single boolean — the smallest possible
    state row; for unbounded key spaces pass a processing-time ``timeout``
    so the store evicts keys after the re-delivery horizon."""
    schema = stream.schema
    out_type = schema

    def dedup(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        for pdf in pdfs:
            if len(pdf):
                state.update((True,))
                yield pdf.iloc[:1]
                return

    # append-mode operator: each key's row is emitted exactly once and never
    # revised -> compatible with append-only sinks (files) AND recoverable
    # from a checkpoint (memory sink cannot recover)
    return stream.groupBy(key_col).applyInPandasWithState(
        dedup, out_type, "seen boolean", "append", timeout
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
