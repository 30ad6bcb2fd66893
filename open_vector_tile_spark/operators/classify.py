"""Trained linear quality classifier — the fasttext-style corpus gate.

DataComp-LM, LLaMA and the CCNet line of work all gate web documents
with a *trained* lightweight classifier (fasttext / logistic regression
over cheap text features), not just hand-tuned thresholds.  At corpus
scale both halves must be distributed: feature extraction is a map-side
column-expression pass, and training is batch gradient descent where
each step is ONE partial-aggregated reduction over the corpus
(d+1 feature gradients, a few doubles to the driver per round — the
same shape as the distributed Lloyd iteration in similarity.py).

Model: logistic regression  p(y=1|x) = sigmoid(w·x)  trained by full-batch
gradient descent,  w ← w − lr · (Xᵀ(sigmoid(Xw) − y)) / n.  Full-batch
(not SGD) is the deterministic choice: every round is a pure function of
(data, w), so the whole training run replays bit-for-bit in the DuckDB
oracle as one unrolled CTE per round — the pagerank/HITS evidence
pattern applied to model training.

Determinism: double addition is non-associative, so the gradient
reduction has two modes — ``deterministic=True`` folds each feature's
per-document contributions in sorted order (bit-stable under any
partitioning; what the oracle replays via ``sum(g ORDER BY g)``), the
default uses plain ``SUM`` partial aggregation (the 100 TB path: map-side
combine, no single collect_list group).  The driver-side weight update
uses the same IEEE ops (``w - lr * (g / n)``) in Python, Spark and SQL.

Features (doc_features): intercept-ready cheap signals with EXACT
integer numerators so both engines derive bit-identical doubles —
log(1+token_count), mean token length, stopword ratio.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["STOPWORDS", "doc_features", "train_logreg", "score_logreg"]

# re-exported from the shared tokenizer module (one list for every gate)
from open_vector_tile_spark.functions.text import STOPWORDS  # noqa: E402


def doc_features(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_tokens, x1, x2, x3): x1 = ln(1 + n_tokens), x2 = mean token
    length, x3 = stopword ratio.  Documents with zero tokens are dropped
    (their ratios are undefined; a length gate owns them).  Pure column
    expressions — integer counts first, one double division each, so any
    engine replaying the formula reproduces the doubles bit-for-bit."""
    from open_vector_tile_spark.functions.text import ws_tokens

    d = docs.select(F.col(id_col), ws_tokens(text_col).alias("ts")).where(
        F.size("ts") >= 1
    )
    n = F.size("ts").cast("long")
    chars = F.aggregate(
        F.transform(F.col("ts"), F.length), F.lit(0).cast("long"), lambda a, x: a + x
    )
    sw = F.size(F.filter(F.col("ts"), lambda t: t.isin(*STOPWORDS)))
    return d.select(
        id_col,
        n.alias("n_tokens"),
        F.log(F.lit(1.0) + n.cast("double")).alias("x1"),
        (chars.cast("double") / n.cast("double")).alias("x2"),
        (sw.cast("double") / n.cast("double")).alias("x3"),
    )


def _dot(weights: list[float], xs: list[Column]) -> Column:
    """w·x as a fixed left-associated chain: w0 + w1*x1 + w2*x2 + ... —
    the exact op order the SQL twin spells out."""
    acc: Column = F.lit(float(weights[0]))
    for w, x in zip(weights[1:], xs):
        acc = acc + F.lit(float(w)) * x
    return acc


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def train_logreg(
    feats: DataFrame,
    *,
    label_col: str,
    feature_cols: list[str],
    lr: float = 0.5,
    rounds: int = 4,
    deterministic: bool = False,
) -> list[float]:
    """Full-batch GD -> [w0 (intercept), w1..wd].  One reduction job per
    round; each ships d+1 doubles to the driver.  ``deterministic=True``
    makes the result bit-stable under any partitioning (sorted folds) —
    use it when an oracle or reproducibility audit replays training."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    if lr <= 0:
        raise ValueError(f"lr must be > 0, got {lr}")
    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")
    # pin the training set: each round re-reads it, and re-derived input
    # (or a re-run of a nondeterministic upstream) would break the pure
    # function-of-(data, w) replay contract
    base = feats.select(
        F.col(label_col).cast("double").alias("_y"), *feature_cols
    ).localCheckpoint(eager=False)
    n = base.count()
    if n == 0:
        raise ValueError("training set is empty")
    xs = [F.col(c) for c in feature_cols]
    w = [0.0] * (1 + len(feature_cols))
    for _ in range(int(rounds)):
        err = _sigmoid(_dot(w, xs)) - F.col("_y")
        gcols = [err.alias("g0")] + [
            (err * x).alias(f"g{j + 1}") for j, x in enumerate(xs)
        ]
        contrib = base.select(*gcols)
        if deterministic:
            aggs = [
                F.aggregate(
                    F.sort_array(F.collect_list(f"g{j}")),
                    F.lit(0.0),
                    lambda a, x: a + x,
                ).alias(f"g{j}")
                for j in range(len(w))
            ]
        else:
            aggs = [F.sum(f"g{j}").alias(f"g{j}") for j in range(len(w))]
        g = contrib.agg(*aggs).collect()[0]
        w = [w[j] - lr * (g[f"g{j}"] / n) for j in range(len(w))]
    return w


def score_logreg(
    feats: DataFrame,
    weights: list[float],
    *,
    feature_cols: list[str],
    threshold: float = 0.5,
) -> DataFrame:
    """Apply a trained model: adds ``score`` = sigmoid(w·x) and ``keep``
    = score >= threshold.  Map-side column math only — the 100 TB apply
    pass is a narrow scan."""
    if len(weights) != 1 + len(feature_cols):
        raise ValueError(
            f"got {len(weights)} weights for {len(feature_cols)} features"
        )
    xs = [F.col(c) for c in feature_cols]
    score = _sigmoid(_dot(list(weights), xs))
    return feats.withColumn("score", score).withColumn(
        "keep", F.col("score") >= F.lit(float(threshold))
    )



def robust_outliers(
    df: DataFrame,
    *,
    group_col: str = "source",
    value_col: str = "n_chars",
    k: float = 3.0,
) -> DataFrame:
    """Median/MAD robust outlier gate per group — the curation filter that
    survives heavy-tailed web data where mean/stddev gates do not:
    a row is an outlier when ``|x - median| > k * 1.4826 * MAD`` (1.4826
    scales MAD to sigma under normality).  When MAD is 0 (over half the
    group identical) any deviation at all is flagged.

    -> one summary row per group: ``(group, n, med, mad, n_out)``.

    Exactness: with INTEGER values both engines' interpolated medians are
    exact doubles on the 0.5 grid (a + (b-a)*0.5 carries no rounding for
    ints below 2^52), deviations stay on that grid, and the threshold is
    one fixed multiply chain — so the oracle matches bit-for-bit with no
    rounding fudge.  Plan shape: two partial-agg passes (median, then MAD
    of deviations) with broadcast joins of the tiny per-group tables —
    group cardinality rows, never data rows, travel twice.
    """
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    g = F.col(group_col)
    v = F.col(value_col)
    med = df.groupBy(group_col).agg(
        F.percentile(v, F.lit(0.5)).alias("med")
    )
    dev = df.join(F.broadcast(med), on=group_col).select(
        group_col, v.alias("_v"), F.abs(v - F.col("med")).alias("_dev"),
        "med",
    )
    mad = dev.groupBy(group_col).agg(
        F.percentile(F.col("_dev"), F.lit(0.5)).alias("mad")
    )
    thr = F.lit(float(k)) * F.lit(1.4826) * F.col("mad")
    flagged = dev.join(F.broadcast(mad), on=group_col).select(
        group_col, "med", "mad", "_dev",
        F.when(F.col("mad") == 0.0, F.col("_dev") > 0.0)
        .otherwise(F.col("_dev") > thr)
        .alias("_out"),
    )
    return flagged.groupBy(group_col, "med", "mad").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("_out").cast("long")).cast("long").alias("n_out"),
    ).select(group_col, "n", "med", "mad", "n_out")
