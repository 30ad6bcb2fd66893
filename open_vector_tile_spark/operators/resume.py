"""Checkpointed resumability + per-partition lineage/metrics (J5/A7/S12).

The pipeline is resumable at tile granularity: completed (zoom, tile_x,
tile_y) keys are recorded in a tiles table (parquet/Iceberg-style directory
of snapshots); a re-run LEFT ANTI joins pending work against the completed
set so only missing tiles recompute (north_rule: "resumable from checkpoint
with per-partition lineage + metrics").

On a real deployment the tiles table is an Iceberg table and the snapshot id
is the checkpoint; in the sandbox we model snapshots as append-only parquet
subdirectories ``snapshot=N`` with identical semantics (atomic-rename commit
protocol, read = union of snapshots).
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TILE_KEY = ["zoom", "tile_x", "tile_y"]


class TileStore:
    """Append-only snapshot store for the tiles table + lineage/metrics."""

    def __init__(self, root: str) -> None:
        self.root = root
        self.tiles_dir = os.path.join(root, "tiles")
        self.metrics_dir = os.path.join(root, "metrics")
        self.features_dir = os.path.join(root, "features")

    # -- feature log (bronze layer for incremental rebuilds) -------------
    def append_features(self, features: DataFrame, batch_id: int | None = None) -> None:
        """Append feature rows to the log.  With ``batch_id`` the rows land
        in a batch-scoped subdirectory written with OVERWRITE — a replayed
        micro-batch (foreachBatch is at-least-once) rewrites its own
        subdirectory instead of double-appending the same features."""
        if batch_id is None:
            features.write.mode("append").parquet(self.features_dir)
        else:
            features.write.mode("overwrite").parquet(
                f"{self.features_dir}/batch={int(batch_id)}"
            )

    def read_features(self, spark: SparkSession) -> DataFrame | None:
        if not os.path.isdir(self.features_dir):
            return None
        df = spark.read.parquet(self.features_dir)
        # batch-scoped appends surface the directory name as a partition
        # column; it is log bookkeeping, not feature data
        return df.drop("batch") if "batch" in df.columns else df

    # -- read ------------------------------------------------------------
    def snapshots(self) -> list[str]:
        if not os.path.isdir(self.tiles_dir):
            return []
        # NUMERIC sort: lexicographic would order snapshot=9 after
        # snapshot=10, so latest-wins reads would resurrect stale tiles
        # from the 11th commit onward
        return sorted(
            (d for d in os.listdir(self.tiles_dir) if d.startswith("snapshot=")),
            key=lambda d: int(d.split("=", 1)[1]),
        )

    def completed_keys(self, spark: SparkSession) -> DataFrame | None:
        snaps = self.snapshots()
        if not snaps:
            return None
        df = spark.read.parquet(*[os.path.join(self.tiles_dir, s) for s in snaps])
        return df.select(*TILE_KEY).distinct()

    def read_tiles(self, spark: SparkSession, as_of: int | None = None) -> DataFrame | None:
        """Union of snapshots with latest-wins per tile key (a rebuilt tile
        in snapshot N+1 shadows its snapshot-N version — Iceberg-style
        row-level replace semantics).  ``as_of`` is the time-travel read:
        only snapshots with index <= as_of participate, reproducing the
        table exactly as it stood after that commit."""
        from pyspark.sql import Window

        snaps = self.snapshots()
        if as_of is not None:
            snaps = [s for s in snaps if int(s.split("=", 1)[1]) <= as_of]
        if not snaps:
            return None
        parts = []
        for i, s in enumerate(snaps):
            parts.append(
                spark.read.parquet(os.path.join(self.tiles_dir, s)).withColumn(
                    "_snap", F.lit(i)
                )
            )
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        w = Window.partitionBy(*TILE_KEY).orderBy(F.desc("_snap"))
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_snap")
        )

    # -- write (snapshot commit) ----------------------------------------
    def commit(self, tiles: DataFrame, run_id: str | None = None) -> str:
        """Write one snapshot atomically (stage dir + rename) and record
        per-partition lineage/metrics rows (A7)."""
        run_id = run_id or uuid.uuid4().hex[:12]
        snap = f"snapshot={len(self.snapshots())}"
        stage = os.path.join(self.tiles_dir, f"_stage_{run_id}")
        final = os.path.join(self.tiles_dir, snap)
        tiles.write.mode("overwrite").parquet(stage)
        os.rename(stage, final)
        spark = tiles.sparkSession
        metrics = (
            spark.read.parquet(final)
            .groupBy(*TILE_KEY)
            .agg(
                F.count("*").alias("rows"),
                F.sum(F.length("tile")).alias("bytes"),
            )
            .withColumn("snapshot", F.lit(snap))
            .withColumn("run_id", F.lit(run_id))
            .withColumn("committed_at", F.lit(int(time.time())))
        )
        metrics.write.mode("append").parquet(self.metrics_dir)
        return snap

    # -- resume ----------------------------------------------------------
    def pending(self, work: DataFrame) -> DataFrame:
        """J5: anti-join pending tile keys against all committed snapshots."""
        done = self.completed_keys(work.sparkSession)
        if done is None:
            return work
        return work.join(done, on=TILE_KEY, how="left_anti")

    def changed_tiles(
        self, spark: SparkSession, since: int, until: int | None = None
    ) -> DataFrame | None:
        """Incremental change feed between two snapshots: tile keys whose
        bytes at ``until`` (default: latest) differ from — or did not exist
        at — snapshot ``since``.  This is what a downstream consumer (CDN
        sync, diff shipper) pulls instead of rescanning the tileset; both
        sides are latest-wins time-travel reads, joined on the tile key."""
        new = self.read_tiles(spark, as_of=until)
        if new is None:
            return None
        old = self.read_tiles(spark, as_of=since)
        if old is None:
            return new
        oldk = old.select(*TILE_KEY, F.xxhash64("tile").alias("_old_h"))
        return (
            new.withColumn("_new_h", F.xxhash64("tile"))
            .join(oldk, on=TILE_KEY, how="left")
            .filter(F.col("_old_h").isNull() | (F.col("_old_h") != F.col("_new_h")))
            .drop("_old_h", "_new_h")
        )

    def metrics(self, spark: SparkSession) -> DataFrame | None:
        if not os.path.isdir(self.metrics_dir):
            return None
        return spark.read.parquet(self.metrics_dir)
