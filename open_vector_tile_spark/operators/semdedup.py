"""SemDeDup-style semantic deduplication: cluster embeddings, then prune
near-duplicates *within* each cluster by pairwise cosine.

Why clustering first (Abbas et al., "SemDeDup", 2023): all-pairs cosine over
N vectors is O(N^2) — unrunnable at 10^11 embeddings.  Partitioning the
space with a coarse k-means quantizer (the IVF trainer this repo already
has, similarity.py ivf_train_centroids) bounds the pairwise work to
O(sum c_i^2) over cluster sizes c_i: with k ~ N/1000 clusters the quadratic
term touches ~1000x fewer pairs, and each cluster's work is an independent
task.

Pruning rule (deterministic, non-cascading): a vector is DROPPED iff its
cluster contains a vector with a SMALLER id whose cosine similarity is
>= threshold.  The kept set is therefore exactly the id-order greedy scan
in which every vector is compared against all earlier *originals and
duplicates* — a pure relational predicate ("exists earlier similar row"),
which is what makes the operator oracle-able in SQL, unlike the cascading
variant ("exists earlier KEPT row") whose keep-set is inherently
sequential.  For dedup purposes the two differ only when A~B, B~C but
A!~C with threshold transitivity broken; the non-cascading rule prunes
strictly more (B and C both drop), which is the conservative direction
for training-data curation.

Exact mode: ``n_centroids=1`` puts everything in one cluster — the operator
degrades to exact all-pairs semantic dedup, which the driver oracle
`semantic_dedup` checks verbatim against a DuckDB twin (same trick as
`near_dup_embeddings` / `lsh_topk`: collapse the approximation knob, verify
the full machinery end to end).

Scale notes (100 TB):
- training reads k seed rows + n_iters map passes (partial-agg reduced);
- assignment is one Arrow map pass, no shuffle;
- the pairwise stage shuffles (cluster, id, vec) once on the cluster id;
  ``max_cluster`` caps the per-task quadratic cost by sub-salting oversized
  clusters (a capped cluster is pruned within each salt slice only —
  documented recall/precision tradeoff, same contract as the LSH
  ``max_bucket`` cap in dedup.py);
- cosine is accumulated sequentially over dims (similarity._seq_dot) so
  Spark bit-matches DuckDB's list_dot_product — threshold comparisons then
  agree exactly across engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _seq_dot, _seq_norm, _to_matrix, ivf_assign, ivf_train_centroids


def _earliest_dup(
    ids: np.ndarray, V: np.ndarray, threshold: float, block: int = 1024
) -> np.ndarray:
    """For each row: the smallest id among SMALLER-id rows with
    cosine >= threshold, else -1.  ids must be sorted ascending.

    Pairwise similarities are computed in COLUMN BLOCKS of ``block`` so
    peak memory is n*block*8 bytes (≈ 64 MB at the max_cluster cap), not a
    dense n² matrix (a 100k-row cluster would otherwise need an 80 GB
    sims array)."""
    n = len(ids)
    out = np.full(n, -1, dtype=np.int64)
    if n <= 1:
        return out
    nrm = _seq_norm(V)
    rows = np.arange(n)[:, None]
    for j0 in range(1, n, block):  # column 0 has no earlier row
        j1 = min(j0 + block, n)
        sims = _seq_dot(V, V[j0:j1])  # (n, chunk), sequential-dim accumulation
        with np.errstate(divide="ignore", invalid="ignore"):
            sims = sims / (nrm[:, None] * nrm[None, j0:j1])
        # column j may only match strictly-earlier rows i < j
        hit = (sims >= threshold) & (rows < np.arange(j0, j1)[None, :])
        any_hit = hit.any(axis=0)
        first_idx = np.argmax(hit, axis=0)  # first True = min id (ids sorted)
        out[j0:j1] = np.where(any_hit, ids[first_idx], -1)
    return out


def semantic_dedup(
    vectors: DataFrame,
    threshold: float,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    max_cluster: int | None = 8192,
) -> DataFrame:
    """-> ``(id_col, cluster int, dup_of long, keep int)``.

    ``dup_of`` is the smallest same-cluster id with cosine >= threshold
    among ids smaller than the row's (-1 if none — then ``keep`` = 1).

    ``n_centroids=1`` skips training and runs the exact all-pairs mode
    (single cluster 0).  ``max_cluster`` sub-salts clusters larger than the
    cap (id-hash slices), bounding task cost at the cost of cross-slice
    misses — exactness requires the cluster to fit the cap.  Per-task cost
    at the cap: O(cap^2) similarity ops in cap*1024*8-byte blocks (~64 MB
    peak at the 8192 default — see _earliest_dup)."""
    if n_centroids <= 1:
        assigned = vectors.withColumn("cluster", F.lit(0))
    else:
        if centroids is None:
            centroids = ivf_train_centroids(
                vectors, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col
            )
        assigned = ivf_assign(vectors, centroids, vec_col=vec_col, out_col="cluster")

    if max_cluster is not None:
        # sub-salt only clusters over the cap: slice id is 0 (exact) unless
        # the cluster is hot, in which case ids hash into ceil(size/cap)
        # slices — bounded task cost, documented cross-slice misses.  The
        # size table is one tiny partial-agg (n_clusters rows), broadcast.
        sizes = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("_csz"))
        assigned = assigned.join(F.broadcast(sizes), "cluster").withColumn(
            "_slice",
            F.when(
                F.col("_csz") > int(max_cluster),
                F.pmod(
                    F.xxhash64(F.col(id_col)),
                    (F.col("_csz") / int(max_cluster)).cast("long") + 1,
                ),
            ).otherwise(F.lit(0)),
        ).drop("_csz")
    else:
        assigned = assigned.withColumn("_slice", F.lit(0))

    id_t = vectors.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_t}, cluster int, dup_of long"

    def prune(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy()
        V = _to_matrix(pdf[vec_col])
        dup = _earliest_dup(ids.astype(np.int64), V, threshold)
        return pd.DataFrame(
            {id_col: ids, "cluster": int(key[0]), "dup_of": dup}
        )

    pruned = (
        assigned.select(id_col, vec_col, "cluster", "_slice")
        .groupBy("cluster", "_slice")
        .applyInPandas(prune, out_schema)
    )
    return pruned.select(
        id_col,
        "cluster",
        F.col("dup_of").cast("long").alias("dup_of"),
        F.when(F.col("dup_of") < 0, F.lit(1)).otherwise(F.lit(0)).cast("int").alias("keep"),
    )
