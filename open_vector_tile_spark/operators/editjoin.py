"""Edit-distance similarity join — near-duplicate URLs/titles by Levenshtein.

String similarity joins under an edit-distance threshold are the exact
companion to the token-set near-dup family (minhash/simhash in dedup.py):
they catch single-character recrawl variants — session ids, pagination
digits, typo mirrors — that word-level shingles miss.  The shape follows
Ed-Join (Xiao, Wang, Lin — VLDB 2008): positional q-gram candidates with
RARE-GRAM prefix filtering, then an exact verify on candidates only.

Filter correctness (count filter, Gravano et al. VLDB 2001): an edit
operation destroys at most ``q`` q-grams, so ``ed(s,t) <= d`` implies the
q-gram BAG overlap is at least ``max(|s|,|t|) - q + 1 - q*d``.  Bags are
joined exactly by occurrence-indexed elements ``(gram, k)`` — the k-th
occurrence of a gram matches only the other string's k-th occurrence, so
the equi-join count IS the bag intersection.  Prefix filtering: order all
``(gram, k)`` elements globally by (frequency, gram, k); any qualifying
pair must share an element within the first ``q*d + 1`` elements of BOTH
strings (smallest-shared-element argument), so the join runs over those
prefixes only.  Hot grams — every URL contains ``://`` — are naturally
excluded from long strings' prefixes, which is what bounds join skew.
Pairs where the bound is vacuous (BOTH strings shorter than ``q*(d+1)``)
can share zero grams yet qualify; they brute-force inside a length-band
self-join of the (bounded) short-string subset.

Scale shape (10^12 URLs):
- grams explode map-side; occurrence index + prefix rank are two windows
  over the exploded table keyed by string id — the only wide stages
  besides the candidate join itself;
- the global element-frequency table is gram-vocabulary-sized and
  partial-agg reduced; joined back by gram key (no driver collect);
- the candidate join runs on (gram, k) over ``q*d + 1`` elements per
  string — candidate count is bounded by rare-gram collision lists, not
  by N^2, and the verify is Spark's built-in JVM ``levenshtein`` (no
  Python anywhere in the operator);
- output pairs are distinct (id_l < id_r) with the exact distance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["edit_similarity_join"]


def edit_similarity_join(
    df: DataFrame,
    *,
    id_col: str = "id",
    str_col: str = "s",
    max_dist: int = 2,
    q: int = 3,
) -> DataFrame:
    """All pairs with ``levenshtein(s_l, s_r) <= max_dist``.

    Returns ``(id_l, id_r, dist)`` with ``id_l < id_r``, exact and
    complete (the prefix filter is loss-free; a randomized brute-force
    parity test pins this).  NULL strings are dropped.
    """
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    if q < 2:
        raise ValueError(f"q must be >= 2, got {q}")
    prefix_len = q * max_dist + 1
    short_max = q * (max_dist + 1) - 1  # both-short => vacuous count bound

    s = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(str_col).alias("s"),
        F.length(str_col).cast("int").alias("len"),
    ).where(F.col("s").isNotNull())

    # positional q-grams, occurrence-indexed: (id, gram, k)
    grams = s.select(
        "id",
        "len",
        F.posexplode(
            F.transform(
                # guard: sequence(1, 0) steps DOWN to [1, 0] in Spark, so
                # sub-q strings must yield an explicitly empty position list
                F.when(
                    F.col("len") >= q,
                    F.sequence(F.lit(1), F.col("len") - q + 1),
                ).otherwise(F.expr("CAST(array() AS ARRAY<INT>)")),
                lambda i: F.substring(F.col("s"), i, F.lit(q)),
            )
        ).alias("pos", "gram"),
    )
    # occurrence index k: the k-th time this gram appears in this string,
    # in string-position order — (gram, k) elements make the equi-join
    # count an exact BAG intersection
    occ = Window.partitionBy("id", "gram").orderBy("pos")
    grams = grams.select(
        "id", "len", "gram", F.row_number().over(occ).alias("k")
    )

    freqs = grams.groupBy("gram", "k").agg(
        F.count("*").cast("long").alias("n_elem")
    )
    ranked = grams.join(freqs, ["gram", "k"])
    pfx = Window.partitionBy("id").orderBy("n_elem", "gram", "k")
    prefix = (
        ranked.select(
            "id", "len", "gram", "k", F.row_number().over(pfx).alias("r")
        )
        .where(F.col("r") <= prefix_len)
        .drop("r")
    )

    pl = prefix.select(
        F.col("id").alias("id_l"), F.col("len").alias("len_l"), "gram", "k"
    )
    pr = prefix.select(
        F.col("id").alias("id_r"), F.col("len").alias("len_r"), "gram", "k"
    )
    cand = (
        # merge hint: the two sides are the SAME prefix chain (grams ->
        # occurrence window -> frequency rank window); a broadcast build
        # side would re-run that whole chain, while identical SMJ children
        # share one exchange via ReusedExchange — and at web scale the
        # prefix table is far past any broadcast threshold anyway, so this
        # also makes the small-scale plan match the at-scale one
        pl.hint("merge")
        .join(pr, ["gram", "k"])
        .where(
            (F.col("id_l") < F.col("id_r"))
            & (F.abs(F.col("len_l") - F.col("len_r")) <= max_dist)
        )
        .select("id_l", "id_r")
    )

    shorts = s.where(F.col("len") <= short_max)
    sl = shorts.select(F.col("id").alias("id_l"), F.col("len").alias("len_l"))
    sr = shorts.select(F.col("id").alias("id_r"), F.col("len").alias("len_r"))
    short_pairs = (
        sl.join(
            sr,
            (F.col("id_l") < F.col("id_r"))
            & (F.abs(F.col("len_l") - F.col("len_r")) <= max_dist),
        )
    ).select("id_l", "id_r")

    pairs = cand.union(short_pairs).distinct()
    # one full wave for the verify stage: the per-row work downstream is a
    # banded DP (levenshtein), ~us/row, but the distinct's exchange carries
    # only 16-byte pair rows, so AQE's byte-based coalescing collapses the
    # stage to 1-2 tasks and the DP runs nearly serially (measured 4.6x of
    # the sf0.1 wall; the tile_encode r6 fix is the same disease).  An
    # explicit round-robin repartition by NUMBER is exempt from AQE
    # coalescing; one wave of cluster cores is the right width for a
    # CPU-bound map stage at any data size, and the extra exchange moves
    # 16 B/row to save ~us/row of near-serial DP.
    pairs = pairs.repartition(df.sparkSession.sparkContext.defaultParallelism)
    left = s.select(F.col("id").alias("id_l"), F.col("s").alias("_sl"))
    right = s.select(F.col("id").alias("id_r"), F.col("s").alias("_sr"))
    return (
        pairs.join(left, "id_l")
        .join(right, "id_r")
        .select(
            "id_l",
            "id_r",
            # banded DP: the threshold form is O(len*max_dist) instead of
            # O(len^2) and returns the EXACT distance for every kept pair
            # (-1 only when it exceeds max_dist, excluded by the between)
            F.levenshtein("_sl", "_sr", max_dist).cast("int").alias("dist"),
        )
        .where(F.col("dist").between(0, max_dist))
    )
