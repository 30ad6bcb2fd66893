"""Data selection via hashed n-gram importance weights (DSIR-style).

Xie et al. 2023 ("Data Selection for Language Models via Importance
Resampling") select pretraining documents by how much more likely their
hashed n-gram features are under a target-domain distribution than under
the raw-corpus distribution.  This operator estimates both distributions
in-plan from the corpus itself (the target is any caller-designated row
subset — a quality slice, an in-domain sample), scores every document,
and keeps the top fraction.

Numeric contract: the paper's score is a log-likelihood-ratio SUM, whose
``ln`` evaluations are ulp-unstable across engines.  Following the
PMI -> lift precedent (collocations.py), the score here is the log-free
surrogate ``sum_b c_b * ratio_b`` — each term the fixed IEEE chain
``double(c_b) * t_b * D_r / r_b / D_t`` (multiply/divide are correctly
rounded everywhere, unlike ln), summed as a SORTED fold.  The ranking is
the arithmetic- rather than geometric-mean likelihood ratio; monotone
agreement with the paper's score is empirical, bit-reproducibility is
exact (the DuckDB twin replays the chain with ``sum(x ORDER BY x)``).

Scale shape (100 TB corpus):
- ONE corpus scan builds the (doc, bucket, count) table: bigrams are
  formed inside the token array (slice+zip — no window), hashed to
  ``n_buckets`` via the md5 primitive, partial-agg reduced;
- raw/target bucket distributions are rollups of that table (bucket-
  space-sized, i.e. tiny) and broadcast back for scoring;
- add-one smoothing runs over an explicit bucket spine (``spark.range``)
  so empty buckets exist in both distributions deterministically;
- selection uses the distributed exact ``global_rank`` (layout.py) —
  no single-partition window at any scale.

Paper-faithful *resampling* (sample ∝ weight, without replacement)
composes with the existing sampler: feed ``score`` as the weight column
of ``functions/sampling.py:weighted_sample`` (Efraimidis–Spirakis keys
== Gumbel-top-k; its uniform draw is a content hash of the key column,
so the sample is deterministic for a given key, no seed parameter)
instead of taking the greedy top fraction this function returns.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["dsir_select"]


def _bigram_buckets(text: Column, n_buckets: int) -> Column:
    """Array of hashed-bigram bucket ids for a document's text."""
    from open_vector_tile_spark.functions.text import ws_tokens

    ts = ws_tokens(text)
    n = F.size(ts)
    grams = F.zip_with(
        F.slice(ts, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(ts, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.transform(
        grams,
        lambda g: (
            F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long")
            % n_buckets
        ).cast("int"),
    )


def dsir_select(
    docs: DataFrame,
    target: Column,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    keep_frac: float = 0.25,
    smoothing: int = 1,
) -> DataFrame:
    """Importance-score every document against the ``target`` subset.

    ``target`` is a boolean Column over ``docs`` marking the in-domain
    sample.  Returns ``(id, score, rank, selected)``: rank is the exact
    0-based global position by (score DESC, id ASC), ``selected`` marks
    the top ``ceil(keep_frac * n_docs)`` documents.  Documents with no
    bigrams score 0.0 (an empty ratio sum), deterministically.
    """
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac must be in (0,1], got {keep_frac}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if smoothing < 1:
        raise ValueError(f"smoothing must be >= 1, got {smoothing}")
    from open_vector_tile_spark.operators.layout import global_rank

    spark = docs.sparkSession
    base = docs.select(
        F.col(id_col).alias("id"),
        target.cast("boolean").alias("_tgt"),
        F.explode(_bigram_buckets(F.col(text_col), n_buckets)).alias("bucket"),
    )
    doc_bucket = (
        base.groupBy("id", "_tgt", "bucket")
        .agg(F.count("*").cast("long").alias("c"))
        .persist()
    )
    spine = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    dists = (
        spine.join(
            doc_bucket.groupBy("bucket").agg(
                F.sum("c").cast("long").alias("_raw"),
                F.sum(F.when(F.col("_tgt"), F.col("c")).otherwise(0))
                .cast("long")
                .alias("_t"),
            ),
            "bucket",
            "left",
        )
        .select(
            "bucket",
            (F.coalesce(F.col("_raw"), F.lit(0)) + smoothing).alias("r_b"),
            (F.coalesce(F.col("_t"), F.lit(0)) + smoothing).alias("t_b"),
        )
    )
    totals = dists.agg(
        F.sum("r_b").cast("long").alias("d_r"), F.sum("t_b").cast("long").alias("d_t")
    )
    terms = (
        doc_bucket.join(F.broadcast(dists), "bucket")
        .crossJoin(F.broadcast(totals))
        .select(
            "id",
            (
                F.col("c").cast("double")
                * F.col("t_b")
                * F.col("d_r")
                / F.col("r_b")
                / F.col("d_t")
            ).alias("term"),
        )
    )
    scores = terms.groupBy("id").agg(
        F.aggregate(
            F.sort_array(F.collect_list("term")),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("score")
    )
    all_docs = docs.select(F.col(id_col).alias("id"))
    scored = all_docs.join(scores, "id", "left").select(
        "id", F.coalesce("score", F.lit(0.0)).alias("score")
    )
    # count the input directly: scores is grouped by the unique id, so the
    # left join preserves docs' cardinality — counting `scored` would run
    # the whole scoring DAG a second time just to learn this number
    n_docs = docs.select(id_col).count()
    n_keep = math.ceil(n_docs * keep_frac)
    ranked = global_rank(
        scored.withColumn("_neg", -F.col("score")), ["_neg", "id"], rank_col="rank"
    )
    doc_bucket.unpersist()
    return ranked.select(
        "id",
        "score",
        F.col("rank").cast("long").alias("rank"),
        (F.col("rank") < n_keep).alias("selected"),
    )
