"""KMV (k-minimum-values) distinct-cardinality sketch.

Why not ``approx_count_distinct``: Spark's HLL++ is engine-private — its
estimate cannot be reproduced by any other engine, so it can't be
oracle-checked, and its sketch bytes can't be handed to a non-Spark reader.
KMV over an md5-derived hash is *deterministic and portable*: any engine
with ``md5()`` produces bit-identical sketches and estimates (DuckDB:
``CAST('0x' || substring(md5(x), 1, 12) AS BIGINT)``), which is what lets
the driver hash-compare this operator against a DuckDB twin.

The sketch per group is the set of the k smallest distinct 48-bit hashes.
Estimator (Beyer et al., "On Synopses for Distinct-Value Estimation Under
Multiset Operations", SIGMOD'07): with m = #distinct hashes seen,

    est = m                          if m < k   (sketch is exhaustive: exact)
    est = (k-1) * 2^48 DIV h_(k)     otherwise  (h_(k) = k-th smallest hash)

All-integer math, so Spark and DuckDB agree to the bit.

Scale design (100 TB): a per-group min-k is an order statistic, which a
naive ``row_number() OVER (PARTITION BY g ORDER BY h)`` computes with one
full sort of ALL distinct hashes of each group — a single straggler task
when one group dominates.  The plan here is the standard two-level top-k
decomposition:

1. map-side-partial dedup of (group, hash) — the only full-data shuffle;
2. level 1: min-k within (group, hash % fanout) — ``fanout`` parallel sorted
   groups per logical group, each seeing ~1/fanout of the hashes;
3. level 2: min-k over the survivors — at most fanout*k rows per group.

Every global minimum survives level 1 (it is a minimum of its own subgroup),
so the composition is exactly the single-level result — pinned by test.
Sketches are mergeable (union the hash sets, re-take the k smallest), so
partial sketches from independent jobs / streaming micro-batches combine
without rescanning, same as any partial aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KMV_BITS = 48
KMV_SPACE = 1 << KMV_BITS  # hash space size; 12 md5 hex chars


def kmv_hash(item) -> F.Column:
    """Uniform 48-bit hash from the md5 hex prefix — bit-identical in any
    engine with md5() (12 hex chars keep (k-1)*2^48 inside int64)."""
    return F.conv(F.substring(F.md5(item), 1, 12), 16, 10).cast("long")


def kmv_min_hashes(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    k: int = 64,
    fanout: int = 16,
) -> DataFrame:
    """The sketch itself: per group, the k smallest distinct ``kmv_hash``
    values of ``item_col`` as rows ``(*group_cols, _h, _rn)`` with ``_rn``
    the 1-based rank.  Two-level plan per the module docstring."""
    if not 1 <= k <= 32768:
        # (k-1) * 2^48 must stay inside int64 for the estimator literal
        raise ValueError(f"k must be in [1, 32768], got {k}")
    hashes = (
        df.where(F.col(item_col).isNotNull())
        .select(*group_cols, kmv_hash(F.col(item_col)).alias("_h"))
        .distinct()
    )
    lvl1 = (
        hashes.withColumn("_sub", F.pmod(F.col("_h"), F.lit(int(fanout))))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(*group_cols, "_sub").orderBy("_h")
            ),
        )
        .where(F.col("_rn") <= k)
        .drop("_sub", "_rn")
    )
    return lvl1.withColumn(
        "_rn", F.row_number().over(Window.partitionBy(*group_cols).orderBy("_h"))
    ).where(F.col("_rn") <= k)


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    k: int = 64,
    fanout: int = 16,
) -> DataFrame:
    """-> one row per group: ``n_kept`` (min(k, m) hashes retained),
    ``kth_min`` (the largest retained hash) and ``est_distinct``.

    Exact below k distincts, ~1/sqrt(k) relative error above.  ``k`` is
    capped at 32768 so the (k-1)*2^48 estimator literal stays in int64."""
    mins = kmv_min_hashes(df, group_cols, item_col, k=k, fanout=fanout)
    return kmv_estimate(mins, group_cols, k=k)


def kmv_estimate(mins: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Estimator over a sketch table (``kmv_min_hashes`` / ``kmv_merge``
    output): -> (*group_cols, n_kept, kth_min, est_distinct)."""
    agg = mins.groupBy(*group_cols).agg(
        F.count("_h").alias("n_kept"), F.max("_h").alias("kth_min")
    )
    # greatest(kth,1): md5 prefix 0 is ~2^-48 improbable but DIV 0 is null
    est = F.when(F.col("n_kept") < k, F.col("n_kept")).otherwise(
        F.expr(f"CAST(({k - 1} * {KMV_SPACE}) DIV greatest(kth_min, 1) AS LONG)")
    )
    return agg.select(
        *group_cols, "n_kept", "kth_min", est.cast("long").alias("est_distinct")
    )


def kmv_merge(sketch_a: DataFrame, sketch_b: DataFrame, group_cols: list[str], k: int = 64) -> DataFrame:
    """Merge two ``kmv_min_hashes`` sketch tables (union of hash sets,
    re-take the k smallest) — the multiset-union property that makes the
    sketch a partial aggregate: shard-level sketches combine without
    rescanning the shards."""
    both = sketch_a.select(*group_cols, "_h").unionByName(
        sketch_b.select(*group_cols, "_h")
    ).distinct()
    return both.withColumn(
        "_rn", F.row_number().over(Window.partitionBy(*group_cols).orderBy("_h"))
    ).where(F.col("_rn") <= k)
