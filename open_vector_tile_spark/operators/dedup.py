"""Deduplication operators for web-scale text corpora.

All variants operate on a DataFrame with (id_col, text_col) and are built
from native Spark primitives where possible:

- exact_dedup:   hash-groupBy on normalized text (one shuffle; map-side
                 partial via first-wins aggregation)
- minhash_lsh:   shingle -> 64 minhashes -> b bands -> band-hash bucket join;
                 candidate pairs verified by true shingle-set Jaccard.
- simhash:       64-bit simhash via token-hash bit voting; near-dups = equal
                 band keys on rotated halves.
- ngram_jaccard: exact pairwise Jaccard on n-gram sets within LSH buckets.
- embedding near-dup lives in similarity.py (cosine top-k).

Scale: everything keys by a 64-bit hash; shuffles are on those keys; no
driver-side collection.  Minhash banding makes candidate generation linear.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# exact dedup (A-hash groupBy)
# ---------------------------------------------------------------------------


def normalized_text(text: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the smallest id per identical normalized text."""
    h = F.xxhash64(normalized_text(F.col(text_col))).alias("text_hash")
    w = Window.partitionBy("text_hash").orderBy(F.col(id_col).asc())
    return (
        df.select(F.col(id_col), F.col(text_col), h)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def exact_dup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """-> (text_hash, n_dups, keeper_id) for groups with >1 member."""
    h = F.xxhash64(normalized_text(F.col(text_col))).alias("text_hash")
    return (
        df.select(F.col(id_col), h)
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keeper_id"))
        .filter(F.col("n_dups") > 1)
    )


# ---------------------------------------------------------------------------
# shingles + minhash + LSH
# ---------------------------------------------------------------------------


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingle array (distinct)."""
    words = F.split(F.trim(normalized_text(text)), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))
    )


_MERSENNE = (1 << 61) - 1


def _let(expr: Column, body) -> Column:
    """Let-binding for column expressions: evaluate ``expr`` ONCE and pass it
    to ``body`` as a lambda variable (via a 1-element array transform).
    Prevents Catalyst from re-evaluating an expensive subexpression inside
    per-element lambdas."""
    return F.element_at(F.transform(F.array(expr), body), 1)


def minhash_signature(shingle_col: Column, num_hashes: int = 64) -> Column:
    """num_hashes minhashes: min over shingles of (a_i*h + b_i) mod p with
    a_i = 2i+1, b_i = (golden * (i+1)) & 0x7fffffff.

    The per-shingle xxhash64 array is let-bound so it is computed once per
    document, not once per signature row (the naive 64-separate-columns form
    re-tokenizes and re-hashes the document 64x; measured ~15x slower)."""
    base = F.transform(shingle_col, lambda s: F.pmod(F.xxhash64(s), F.lit(2**31 - 1)))
    golden = 0x9E3779B9

    def build(hs: Column) -> Column:
        def sig_i(i: Column) -> Column:
            a = (F.lit(2) * i + F.lit(1)).cast("long")
            b = (F.lit(golden) * (i + F.lit(1)).cast("long")).bitwiseAND(F.lit(0x7FFFFFFF))
            return F.array_min(
                F.transform(hs, lambda h: F.pmod(a * h + b, F.lit(_MERSENNE)))
            )

        return F.transform(F.sequence(F.lit(0), F.lit(num_hashes - 1)), sig_i)

    return _let(base, build)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """-> candidate pairs (id_a, id_b) sharing >= 1 LSH band bucket.

    band key = hash(signature slice).  The signature AND all band hashes are
    one let-bound expression so the signature is computed exactly once per
    document (separate projections would collapse and recompute it per band).
    The bucket join is a self-equi-join on (band, band_hash) -- shuffles only
    ids + band keys, never text.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signature(shingles(F.col(text_col), shingle_n), num_hashes)

    def band_hashes(s: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.alias("band"),
                F.xxhash64(
                    F.array_join(
                        F.transform(
                            F.slice(s, b * rows_per_band + 1, rows_per_band),
                            lambda v: v.cast("string"),
                        ),
                        ",",
                    )
                ).alias("band_hash"),
            ),
        )

    band_rows = df.select(
        F.col(id_col), F.explode(_let(sig, band_hashes)).alias("bh")
    ).select(id_col, "bh.band", "bh.band_hash")
    left = band_rows.withColumnRenamed(id_col, "id_a")
    right = band_rows.withColumnRenamed(id_col, "id_b")
    return (
        left.join(right, on=["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Verify candidate pairs with exact n-gram Jaccard -> (id_a, id_b, jaccard)."""
    sh = df.select(F.col(id_col), shingles(F.col(text_col), shingle_n).alias("sh"))
    a = sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a")
    b = sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b")
    joined = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return joined.select(
        "id_a",
        "id_b",
        (inter / F.greatest(union, F.lit(1))).alias("jaccard"),
    )


def minhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    **kw,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates -> exact Jaccard -> pairs >= t."""
    cand = minhash_lsh_candidates(df, id_col, text_col, **kw)
    verified = ngram_jaccard_pairs(df, cand, id_col, text_col)
    return verified.filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def simhash64(text: Column) -> Column:
    """64-bit simhash: per-token 64-bit hash, bitwise majority vote.

    One expression tree: token hashes are let-bound (computed once), the 64
    bit votes run over a literal mask array, and the bits fold into a long
    with bitwiseOR.
    """
    tokens = F.split(normalized_text(text), " ")
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))
    masks = F.array(*[F.shiftleft(F.lit(1).cast("long"), b) for b in range(64)])

    def build(hs: Column) -> Column:
        bits = F.transform(
            masks,
            lambda m: F.aggregate(
                hs,
                F.lit(0),
                lambda acc, h: acc + F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1),
            ),
        )
        contributions = F.zip_with(
            bits, masks, lambda b, m: F.when(b > 0, m).otherwise(F.lit(0).cast("long"))
        )
        return F.aggregate(
            contributions, F.lit(0).cast("long"), lambda acc, v: acc.bitwiseOR(v)
        )

    return _let(hashes, build)


def simhash_near_dups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", band_bits: int = 16
) -> DataFrame:
    """Near-dup candidates: equal 16-bit band of the simhash (4 bands ->
    hamming distance <= 3 guaranteed recall within any one band)."""
    sh = df.select(F.col(id_col), simhash64(F.col(text_col)).alias("simhash"))
    bands = []
    for b in range(64 // band_bits):
        bands.append(
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright("simhash", b * band_bits)
                .bitwiseAND(F.lit((1 << band_bits) - 1))
                .alias("band_val"),
            )
        )
    rows = sh.select(id_col, "simhash", F.explode(F.array(*bands)).alias("bh")).select(
        id_col, "simhash", "bh.band", "bh.band_val"
    )
    a = rows.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sim_a"), "band", "band_val"
    )
    b = rows.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sim_b"), "band", "band_val"
    )
    pairs = (
        a.join(b, on=["band", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sim_a", "sim_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return pairs.select("id_a", "id_b", hamming.alias("hamming"))
