"""Streaming sketch maintenance: mergeable sketches over micro-batches.

The sketches in :mod:`..functions.sketch` (KMV, HLL, CMS) are partial
aggregates — shard sketches merge losslessly.  That same property makes
them STREAMING state: maintain the sketch table on disk, and per
micro-batch merge the batch's sketch into it.  Because merge is exact
(register-wise max / counter-wise sum / min-k union), the maintained
sketch is BIT-IDENTICAL to rebuilding from all data seen so far —
pinned by test (streamed registers == batch-whole registers), so the
streaming path needs no separate accuracy budget.

Store layout: ``{path}/snapshot={n}/`` parquet per commit, latest-wins
reads — the same append-only snapshot discipline as operators/resume's
TileStore (atomic because a snapshot directory appears only after its
write completes; replayed micro-batches overwrite their own snapshot id,
which keeps the merge idempotent under foreachBatch's at-least-once).

At scale the state is tiny by construction (2^p rows per group for HLL,
depth×width for CMS), so the per-batch merge cost is the batch scan plus
a bounded-size shuffle — independent of history length.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from ..functions.sketch import hll_estimate, hll_merge, hll_registers


def _commit_snapshot(df: DataFrame, path: str, batch_id: int) -> None:
    """Stage-then-rename commit (the TileStore discipline): the job writes
    to a ``_stage_`` directory and the snapshot name appears only via an
    atomic rename after the write completes — a reader never lists a
    half-written snapshot.  Replays of batch N remove their own previous
    snapshot before renaming (idempotent under at-least-once)."""
    stage = f"{path}/_stage_{batch_id}"
    final = f"{path}/snapshot={batch_id}"
    shutil.rmtree(stage, ignore_errors=True)
    df.write.mode("overwrite").parquet(stage)
    shutil.rmtree(final, ignore_errors=True)
    os.rename(stage, final)


class HllStore:
    """Persisted per-group HLL register table with snapshot commits."""

    def __init__(self, path: str, group_cols: list, p: int = 12):
        self.path = path
        self.group_cols = list(group_cols)
        self.p = p

    def _snapshots(self) -> list[int]:
        if not os.path.isdir(self.path):
            return []
        out = []
        for name in os.listdir(self.path):
            if name.startswith("snapshot="):
                try:
                    out.append(int(name.split("=", 1)[1]))
                except ValueError:
                    continue
        return sorted(out)

    def read_registers(self, spark: SparkSession) -> DataFrame | None:
        snaps = self._snapshots()
        if not snaps:
            return None
        return spark.read.parquet(f"{self.path}/snapshot={snaps[-1]}")

    def update(self, batch: DataFrame, item_col: str, batch_id: int) -> None:
        """Merge one micro-batch into the store (foreachBatch body).

        Idempotent under replay: the output snapshot id is the batch id,
        so a re-run of batch N rewrites snapshot N from the same inputs
        (prior state = newest snapshot BELOW N) instead of double-merging."""
        spark = batch.sparkSession
        fresh = hll_registers(batch, self.group_cols, item_col, p=self.p)
        prior_snaps = [s for s in self._snapshots() if s < batch_id]
        if prior_snaps:
            prior = spark.read.parquet(f"{self.path}/snapshot={prior_snaps[-1]}")
            fresh = hll_merge(prior, fresh, self.group_cols)
        # stage + rename: the lazily-read prior directory is never touched
        # while the merge job reads it, and the new snapshot name appears
        # atomically only after its files are complete
        _commit_snapshot(fresh, self.path, batch_id)

    def estimate(self, spark: SparkSession) -> DataFrame | None:
        regs = self.read_registers(spark)
        if regs is None:
            return None
        return hll_estimate(regs, self.group_cols, p=self.p)


class CmsStore:
    """Persisted count-min counter table with the same snapshot-per-batch
    discipline as :class:`HllStore` (counter-wise SUM is the lossless
    merge; replay of batch N rewrites snapshot N from snapshots < N)."""

    def __init__(self, path: str, group_cols: list, width: int = 1 << 12, depth: int = 4):
        self.path = path
        self.group_cols = list(group_cols)
        self.width = width
        self.depth = depth

    _snapshots = HllStore._snapshots
    read_counters = HllStore.read_registers

    def update(self, batch: DataFrame, item_col: str, batch_id: int) -> None:
        from ..functions.sketch import cms_counters, cms_merge

        spark = batch.sparkSession
        fresh = cms_counters(
            batch, item_col, width=self.width, depth=self.depth,
            group_cols=self.group_cols,
        )
        prior_snaps = [s for s in self._snapshots() if s < batch_id]
        if prior_snaps:
            prior = spark.read.parquet(f"{self.path}/snapshot={prior_snaps[-1]}")
            fresh = cms_merge(prior, fresh, self.group_cols)
        _commit_snapshot(fresh, self.path, batch_id)

    def estimate(self, queries: DataFrame, item_col: str) -> DataFrame | None:
        from ..functions.sketch import cms_estimate

        counters = self.read_counters(queries.sparkSession)
        if counters is None:
            return None
        return cms_estimate(
            counters, queries, item_col, width=self.width, depth=self.depth,
            group_cols=self.group_cols,
        )


def streaming_hll_distinct(
    stream: DataFrame,
    store: HllStore,
    item_col: str,
    checkpoint: str,
):
    """Wire a streaming DataFrame into the store: AvailableNow drain,
    foreachBatch merge.  Returns the started query (caller awaits it)."""
    return (
        stream.writeStream.foreachBatch(
            lambda batch, bid: store.update(batch, item_col, bid)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
