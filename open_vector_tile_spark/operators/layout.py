"""Z-order (Morton) data layout: spatial-locality clustering for writes.

At 100 TB the cheapest query accelerator is the file layout itself: if rows
are written in Z-order on (x, y), every parquet row group covers a compact
spatial rectangle, so its lon/lat min/max footer stats exclude it from any
bbox query that misses the rectangle — data skipping at the scan, before a
single byte of the row group is read.  This is the same trick as
Delta/Iceberg ``OPTIMIZE ZORDER BY``, expressed with stock DataFrame ops:

    repartitionByRange(zorder_key)   global range partition on the key
    sortWithinPartitions(zorder_key) contiguous Z-runs inside each file

The key itself is the 2D Morton interleave (reference spec:
``src/util.ts:56-66`` weave2d; numpy twin ``codec/kernels.py:weave2d``)
built from pure Spark bit expressions — shiftleft/and/or chains that
whole-stage codegen compiles to JVM longs.  No Python anywhere in the
write path, and the key arithmetic is engine-portable integer math, so the
driver oracle reproduces it bit-for-bit in SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# part1by1 mask schedule: spread 16 bits to even positions of 32
_SPREAD = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread_bits16(c: Column) -> Column:
    """16-bit int -> bits at even positions of a 32-bit value (part1by1;
    kernels.py:_part1by1 is the numpy twin, pinned equal by test)."""
    x = c.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zorder_key(x: Column, y: Column) -> Column:
    """Morton key of two 16-bit grid coordinates (y in the odd bits),
    matching ``codec.kernels.weave2d(x, y)``."""
    return spread_bits16(x).bitwiseOR(F.shiftleft(spread_bits16(y), 1)).cast("long")


def quantize16(v: Column, lo: float, hi: float) -> Column:
    """Clamp+quantize a double to the [0, 65535] grid over [lo, hi)."""
    cell = (v - F.lit(float(lo))) / F.lit((float(hi) - float(lo)) / 65536.0)
    return F.least(
        F.greatest(F.floor(cell).cast("long"), F.lit(0)), F.lit(65535)
    )


def zorder_cluster(
    df: DataFrame,
    x_col: str,
    y_col: str,
    num_partitions: int,
    lon_range: tuple[float, float] = (-180.0, 180.0),
    lat_range: tuple[float, float] = (-90.0, 90.0),
    key_col: str = "_zkey",
) -> DataFrame:
    """Return ``df`` re-laid-out in Z-order on (x_col, y_col): globally
    range-partitioned and locally sorted on the Morton key, ready for a
    parquet/tileset write whose row-group stats enable bbox skipping.

    One shuffle (the range exchange, with Spark's sampled range bounds —
    balanced even under skew); the local sort replaces the shuffle-side
    sort Spark would do anyway for a sorted write.  The key column is kept
    (queryable for range pruning: a bbox maps to O(1) Z-ranges) — drop it
    after write if unwanted."""
    keyed = df.withColumn(
        key_col,
        zorder_key(
            quantize16(F.col(x_col), *lon_range),
            quantize16(F.col(y_col), *lat_range),
        ),
    )
    return keyed.repartitionByRange(int(num_partitions), key_col).sortWithinPartitions(
        key_col
    )


# ---------------------------------------------------------------------------
# bucketed tables: shuffle-free co-located joins
# ---------------------------------------------------------------------------


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list,
    num_buckets: int,
    sort_cols: list | None = None,
) -> None:
    """Persist ``df`` as a Hive-bucketed parquet table: rows are hash-
    partitioned into ``num_buckets`` files on ``bucket_cols`` at WRITE
    time, optionally sorted inside each bucket.

    This is the other half of the layout story next to Z-order: Z-order
    buys scan-time data SKIPPING, bucketing buys join-time shuffle
    ELIMINATION.  Two tables bucketed the same way on the join key
    sort-merge-join with ZERO Exchange — at 100 TB that's the difference
    between re-shuffling a petabyte per join and reading co-located
    buckets; the one-time bucketed write amortizes across every
    subsequent join/aggregation on the key (the classic fact/dim
    pre-bucketing pattern).  Plan-pinned by test_layout's zero-Exchange
    assertion and driver-oracled end-to-end by `bucketed_join`."""
    spark = df.sparkSession
    # mode('overwrite') only replaces tables the CURRENT catalog knows; a
    # previous session's managed-table directory survives the in-memory
    # catalog and fails the CREATE with LOCATION_ALREADY_EXISTS — drop the
    # entry and clear the orphaned location explicitly.  Quote each name
    # PART separately (backticking the whole of "db.tbl" would make it one
    # identifier and miss the real table); resolve the orphan directory
    # with the warehouse's db-suffix layout, and only sweep local paths
    # (an object-store warehouse has no local directory to clear).
    parts = table.split(".")
    quoted = ".".join(f"`{p}`" for p in parts)
    spark.sql(f"DROP TABLE IF EXISTS {quoted}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    if wh.startswith("file:") or "://" not in wh:
        loc = wh[5:] if wh.startswith("file:") else wh
        rel = (
            f"{parts[0].lower()}.db/{parts[1].lower()}"
            if len(parts) == 2
            else table.lower()
        )
        import shutil

        shutil.rmtree(f"{loc.rstrip('/')}/{rel}", ignore_errors=True)
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(int(num_buckets), *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(spark, table_a: str, table_b: str, on: list) -> DataFrame:
    """Inner join of two same-bucketed tables on the bucket key.  With
    broadcast disabled this compiles to a SortMergeJoin whose BOTH sides
    read bucketed scans — no Exchange anywhere in the plan."""
    return spark.table(table_a).join(spark.table(table_b), on=on, how="inner")
