"""Token-stream packing: place every document at its absolute offset in the
concatenated token stream and derive which fixed-size training sequence
(context window) it lands in — the address computation behind
concat-and-chunk dataloaders.

The naive Spark spelling — ``sum(tokens) OVER (ORDER BY key)`` with no
PARTITION BY — collapses to a single task regardless of cluster size.  The
scalable plan here is a two-level prefix sum:

1. bucket rows by a coarse range of the order key;
2. one partial-agg shuffle reduces each bucket to a subtotal — the running
   (exclusive) offset of each bucket is then a window over the TINY bucket
   table only (~n_buckets rows, the one serial step);
3. broadcast the offsets back and finish with an in-bucket window
   PARTITIONED by bucket, so the big-table pass is fully parallel.

At 10^12 rows with bucket_width 10^6 the serial window sees 10^6 rows while
every other stage is hash-partitioned — this is the standard distributed
scan (prefix-sum) decomposition expressed in DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def distributed_cumsum(
    df: DataFrame,
    order_col: str,
    val_col: str,
    out_col: str = "cum_excl",
    bucket_width: int = 4096,
) -> DataFrame:
    """Exclusive prefix sum of ``val_col`` in ``order_col`` order (the sum of
    all STRICTLY-earlier rows) without a global single-task window.

    ``order_col`` must be numeric with distinct values (a doc id, a row
    address); buckets are value ranges of width ``bucket_width``, so bucket
    order == key order without a range repartition.
    """
    # integral `div`, not float floor: order keys can exceed 2^53 (row
    # addresses over a 10^12-token corpus) where double division misbuckets
    d = df.withColumn(
        "_bkt", F.expr(f"CAST({order_col} DIV {int(bucket_width)} AS LONG)")
    )
    totals = d.groupBy("_bkt").agg(F.sum(val_col).alias("_tot"))
    # exclusive running offset over the bucket table: n_buckets rows, the
    # only unpartitioned window in the plan
    wb = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_bkt", F.coalesce(F.sum("_tot").over(wb), F.lit(0)).cast("long").alias("_off")
    )
    wi = (
        Window.partitionBy("_bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        d.join(F.broadcast(offsets), "_bkt")
        .withColumn(
            out_col,
            (F.col("_off") + F.coalesce(F.sum(val_col).over(wi), F.lit(0))).cast("long"),
        )
        .drop("_bkt", "_off")
    )


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    bucket_col: str,
    out_col: str = "rank",
) -> DataFrame:
    """0-based global ROW_NUMBER in ``order_cols`` order without a global
    single-task sort — the two-level decomposition of ``ROW_NUMBER() OVER
    (ORDER BY ...)``.

    ``order_cols`` must be a TOTAL order (append a unique id as the last
    column if the leading keys can tie): like any row_number, ties would
    otherwise receive arbitrary partition-order-dependent ranks, breaking
    this repo's cross-run determinism contract.  Every caller here orders
    by a unique md5-derived key.

    ``bucket_col`` must be a coarse MONOTONE function of the leading order
    column (e.g. ``hash DIV 2^36`` for a uniform 48-bit hash): rows then
    rank as (exclusive count of earlier buckets) + (row_number within the
    bucket).  The only unpartitioned window runs over the bucket-count
    table (~n_buckets rows); the in-bucket window is hash-partitioned.
    Same shape as :func:`distributed_cumsum` with a count-1 payload.
    """
    totals = df.groupBy(bucket_col).agg(F.count(F.lit(1)).alias("_n"))
    wb = Window.orderBy(bucket_col).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        bucket_col,
        F.coalesce(F.sum("_n").over(wb), F.lit(0)).cast("long").alias("_off"),
    )
    wi = Window.partitionBy(bucket_col).orderBy(*order_cols)
    return (
        df.join(F.broadcast(offsets), bucket_col)
        .withColumn(
            out_col,
            (F.col("_off") + F.row_number().over(wi) - 1).cast("long"),
        )
        .drop("_off")
    )


def emit_chunks(
    packed: DataFrame,
    tokens_col: str,
    seq_len: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """``pack_sequences`` output -> one row per (doc, training sequence) the
    doc overlaps: the slice table a concat-and-chunk dataloader consumes.

    Columns added: ``seq_id`` (exploded), ``doc_off`` (tokens of the doc
    already consumed by earlier sequences), ``seq_off`` (position inside
    this sequence), ``n_tok`` (tokens this doc contributes here).  Empty
    docs (n_seqs = 0) emit nothing.  Pure column math over an exploded
    ``sequence()`` — the explode is the only row expansion and its fan-out
    per doc is ceil(tokens/seq_len)+1, so no skew beyond document length
    itself.
    """
    n = int(seq_len)
    first = F.col("seq_id")
    out = (
        packed.where(F.col("n_seqs") > 0)
        .withColumn("_s", F.explode(F.sequence(first, first + F.col("n_seqs") - 1)))
    )
    seq_start = F.col("_s") * n  # absolute token address where sequence _s begins
    lo = F.greatest(F.col("start"), seq_start)
    hi = F.least(F.col("start") + F.col(tokens_col), seq_start + n)
    return out.select(
        id_col,
        F.col("_s").alias("seq_id"),
        (lo - F.col("start")).cast("long").alias("doc_off"),
        (lo - seq_start).cast("long").alias("seq_off"),
        (hi - lo).cast("long").alias("n_tok"),
    )


def pack_sequences(
    docs: DataFrame,
    tokens_col: str,
    seq_len: int,
    id_col: str = "doc_id",
    bucket_width: int = 4096,
) -> DataFrame:
    """-> docs + (start, seq_id, seq_offset, n_seqs) for concat-and-chunk
    packing into ``seq_len``-token training sequences.

    ``start`` is the doc's absolute token offset in id order; ``seq_id`` the
    window containing its first token; ``seq_offset`` the position inside
    that window; ``n_seqs`` how many windows the doc spans (0 for empty
    docs).  Deterministic for a fixed id order, independent of
    partitioning.
    """
    out = distributed_cumsum(
        docs, id_col, tokens_col, out_col="start", bucket_width=bucket_width
    )
    t = F.col(tokens_col)
    n = int(seq_len)
    return (
        out.withColumn("seq_id", F.expr(f"CAST(start DIV {n} AS LONG)"))
        .withColumn("seq_offset", (F.col("start") % n).cast("long"))
        .withColumn(
            "n_seqs",
            F.when(
                t > 0,
                F.expr(f"CAST((start + {tokens_col} - 1) DIV {n} AS LONG)")
                - F.col("seq_id")
                + 1,
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
    )
