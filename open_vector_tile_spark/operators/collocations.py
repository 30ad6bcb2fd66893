"""Bigram collocation mining — phrase discovery over a web-text corpus.

Training-data pipelines mine collocations ("new york", "machine
learning") to build phrase vocabularies and tokenizer merges.  The
classic statistic is PMI = log P(ab) / (P(a)P(b)); since log is
monotone, ranking by the LIFT ratio ``n_ab * N / (n_a * n_b)`` produces
the identical order without a transcendental in the ranking key.  Lift
is evaluated as the fixed double chain ``double(n_ab) * N / n_a / n_b``
— the exact same IEEE operations in the same order on any engine (the
oracle twin mirrors it literally), and immune to the int64 overflow a
products-first formulation hits at web scale (N ~ 2e13 tokens makes
``n_ab * N`` exceed 2^63 for stopword bigrams).

Scale shape (100 TB corpus):
- bigrams are built INSIDE the token array (`slice` + `arrays_zip`)
  before exploding — no per-document window, no shuffle to establish
  adjacency; the only wide stages are the two partial-aggregated
  count groupBys;
- unigram counts (vocabulary-sized) broadcast onto the bigram table;
- the global top-k is `orderBy(...).limit(k)` — Spark plans a
  TakeOrderedAndProject distributed heap, never a single-partition sort;
- ``min_count`` prunes rare bigrams BEFORE the unigram join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bigram_collocations"]


def bigram_collocations(
    docs: DataFrame,
    *,
    text_col: str = "text",
    min_count: int = 2,
    top_k: int = 50,
) -> DataFrame:
    """Top-``top_k`` bigrams by lift: ``(a, b, n_ab, n_a, n_b, lift)``.

    Ties in lift break on (a, b) lexicographically — deterministic under
    any partitioning.  Tokens are lowercased, split on whitespace runs;
    bigram adjacency is evaluated after empty-token removal.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    from open_vector_tile_spark.functions.text import WS_SPLIT

    toks = docs.select(
        F.filter(
            F.split(F.lower(F.col(text_col)), WS_SPLIT), lambda t: t != ""
        ).alias("ts")
    )
    # persist the vocabulary-sized unigram table: it feeds BOTH broadcast
    # sides and the total-token scalar — without it Catalyst re-executes
    # the full corpus token scan once per consumer (3 extra passes)
    unigrams = (
        toks.select(F.explode("ts").alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("n_term"))
    ).persist()
    n_total = unigrams.agg(F.sum("n_term").cast("long").alias("n_tokens"))
    sz = F.size("ts")
    pairs = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("ts"), 1, F.greatest(sz - 1, F.lit(0))).alias("a"),
                F.slice(F.col("ts"), 2, F.greatest(sz - 1, F.lit(0))).alias("b"),
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    bigrams = (
        pairs.groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("n_ab"))
        .where(F.col("n_ab") >= min_count)
    )
    ua = unigrams.select(F.col("term").alias("a"), F.col("n_term").alias("n_a"))
    ub = unigrams.select(F.col("term").alias("b"), F.col("n_term").alias("n_b"))
    scored = (
        bigrams.join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .crossJoin(F.broadcast(n_total))
        .select(
            "a",
            "b",
            "n_ab",
            "n_a",
            "n_b",
            # double-first chain: overflow-free at any corpus size and a
            # fixed op order the oracle twin reproduces bit-for-bit
            (
                F.col("n_ab").cast("double")
                * F.col("n_tokens")
                / F.col("n_a")
                / F.col("n_b")
            ).alias("lift"),
        )
    )
    result = scored.orderBy(F.desc("lift"), F.asc("a"), F.asc("b")).limit(top_k)
    # the result is bounded by top_k rows: materialize it eagerly so the
    # unigram cache can be released NOW instead of leaking for the
    # application lifetime (the lazy plan would still reference it)
    rows = result.collect()
    schema = result.schema
    unigrams.unpersist()
    return docs.sparkSession.createDataFrame(rows, schema)
