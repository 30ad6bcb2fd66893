"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk_bruteforce` — exact top-k neighbors for a query set:
  native ``F.zip_with`` + ``F.aggregate`` dot products (JVM, codegen) with a
  ranking window.  The baseline and the oracle.
- :func:`cosine_topk_lsh` — scale path: random-hyperplane LSH buckets
  (sign-bit sketch) prefilter candidates, exact cosine re-rank inside
  buckets.  Brute force cost O(N*Q) drops to O(N + Q*bucket).
- :func:`embedding_near_dups` — near-duplicate pairs by cosine >= threshold
  within LSH buckets (dedup by embedding).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    # double accumulation in array order: bit-matches DuckDB's
    # list_dot_product on DOUBLE[] for the oracle comparisons
    da = a.cast("array<double>")
    db = b.cast("array<double>")
    return F.aggregate(
        F.zip_with(da, db, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "embedding",
) -> DataFrame:
    """Exact: broadcast queries x all vectors, rank by cosine.
    -> (query_id, vec_id, cos_sim, rank)."""
    q = queries.select(F.col(qid_col), F.col(qvec_col).alias("_qvec"))
    joined = vectors.crossJoin(F.broadcast(q))
    sim = cosine(F.col(vec_col), F.col("_qvec"))
    w = Window.partitionBy(qid_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        joined.select(F.col(qid_col), F.col(id_col), sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim)).tolist()


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit sketch: bucket id = bits of sign(vec . plane_i)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot(vec, arr) > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def cosine_topk_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "embedding",
) -> DataFrame:
    """Approximate: multi-table sign-LSH.  Each of ``n_tables`` independent
    hyperplane sets buckets the corpus; candidates = union over tables of
    same-bucket rows (exploded array join — one shuffle); exact cosine
    re-rank within candidates.  Recall grows with tables, cost with
    tables/2^planes."""
    tables = [_hyperplanes(dim, n_planes, seed=42 + 7 * t) for t in range(n_tables)]

    def buckets(col: Column) -> Column:
        return F.array(
            *[
                F.struct(F.lit(t).alias("tbl"), lsh_bucket(col, planes).alias("b"))
                for t, planes in enumerate(tables)
            ]
        )

    v = vectors.select(
        F.col(id_col), F.col(vec_col), F.explode(buckets(F.col(vec_col))).alias("_bk")
    )
    q = queries.select(
        F.col(qid_col),
        F.col(qvec_col).alias("_qvec"),
        F.explode(buckets(F.col(qvec_col))).alias("_bk"),
    )
    joined = v.join(F.broadcast(q), on=["_bk"]).dropDuplicates([qid_col, id_col])
    sim = cosine(F.col(vec_col), F.col("_qvec"))
    w = Window.partitionBy(qid_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        joined.select(F.col(qid_col), F.col(id_col), sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_near_dups(
    vectors: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup pairs by cosine within LSH buckets -> (id_a, id_b, cos_sim)."""
    planes = _hyperplanes(dim, n_planes)
    v = vectors.select(F.col(id_col), F.col(vec_col)).withColumn(
        "_bucket", lsh_bucket(F.col(vec_col), planes)
    )
    a = v.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"), "_bucket"
    )
    b = v.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"), "_bucket"
    )
    pairs = a.join(b, on="_bucket").filter(F.col("id_a") < F.col("id_b"))
    sim = cosine(F.col("vec_a"), F.col("vec_b"))
    return pairs.select("id_a", "id_b", sim.alias("cos_sim")).filter(
        F.col("cos_sim") >= threshold
    )
