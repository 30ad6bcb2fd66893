"""Skyline (Pareto front) operator — the classic OLAP query Spark has no
native operator for: keep every row not DOMINATED by another (dominated =
another row is <= in every criterion and strictly < in at least one; all
criteria minimized — negate a column upstream to maximize it).

Naive SQL is a quadratic NOT EXISTS self-join (a broadcast-nested-loop at
cluster scale).  This operator uses the standard two-phase distributed
shape instead:

1. LOCAL prune: each partition computes its own Pareto front inside one
   Arrow batch (sort by the first criterion, then a survivors scan —
   a candidate only compares against current survivors, which stay small
   for non-adversarial data).  Dominated rows never leave the executor.
2. GLOBAL prune: the per-partition survivors (typically a tiny fraction)
   are gathered to ONE partition and pruned once more with the same
   kernel.  Correct because dominance is transitive and the local pass
   never removes a global survivor.

Worst case (fully anti-correlated criteria) the front IS the table and
phase 2 degenerates — that is a property of the query, not the plan;
callers should bound it upstream.  Duplicate points do not dominate each
other (strict < required) and are all kept, matching the SQL oracle's
NOT EXISTS semantics exactly — integer criteria make the comparison
engine-exact.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pareto_np(vals: np.ndarray) -> np.ndarray:
    """Indices of the Pareto-minimal rows of ``vals`` (n, d)."""
    n = vals.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int64)
    # lexicographic sort: any dominator of row i sorts before i, so one
    # forward pass comparing only against current survivors is complete
    order = np.lexsort(vals.T[::-1])
    sv = vals[order]
    keep = np.zeros(n, dtype=bool)
    surv = []  # indices into sv of current survivors
    for i in range(n):
        v = sv[i]
        dominated = False
        for j in surv:
            u = sv[j]
            if np.all(u <= v) and np.any(u < v):
                dominated = True
                break
        if not dominated:
            surv.append(i)
            keep[i] = True
    out = np.zeros(n, dtype=bool)
    out[order] = keep
    return np.nonzero(out)[0]


def skyline(
    df: DataFrame,
    criteria: Sequence[str],
    *,
    payload_cols: Sequence[str] | None = None,
) -> DataFrame:
    """-> the Pareto-minimal rows of ``df`` over integer/numeric
    ``criteria`` (all minimized), carrying ``payload_cols`` (default: all
    other columns) through untouched."""
    crits = list(criteria)
    if not crits:
        raise ValueError("criteria must be non-empty")
    payload = (
        list(payload_cols)
        if payload_cols is not None
        else [c for c in df.columns if c not in crits]
    )
    cols = payload + crits
    proj = df.select(*cols)
    schema = proj.schema
    k = len(crits)

    def prune(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            vals = pdf[crits].to_numpy(dtype=np.float64)
            idx = _pareto_np(vals)
            yield pdf.iloc[idx]

    local = proj.mapInPandas(prune, schema=schema)
    # survivors are small; one partition sees them all for the final pass
    return local.repartition(1).mapInPandas(prune, schema=schema)
