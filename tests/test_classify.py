"""Trained logistic-regression quality gate (operators/classify.py)."""

import math
import random

import pytest

from open_vector_tile_spark.operators.classify import (
    STOPWORDS,
    doc_features,
    score_logreg,
    train_logreg,
)

LR, ROUNDS = 0.5, 4


def _py_train(rows, lr=LR, rounds=ROUNDS):
    """Numpy-free scalar reference of the same full-batch GD with sorted
    gradient folds: rows = [(y, x1, .., xd)]."""
    n = len(rows)
    d = len(rows[0]) - 1
    w = [0.0] * (d + 1)
    for _ in range(rounds):
        contribs = [[] for _ in range(d + 1)]
        for r in rows:
            y, xs = float(r[0]), list(r[1:])
            z = w[0]
            for wj, xj in zip(w[1:], xs):
                z = z + wj * xj
            err = 1.0 / (1.0 + math.exp(-z)) - y
            contribs[0].append(err)
            for j, xj in enumerate(xs):
                contribs[j + 1].append(err * xj)
        g = []
        for c in contribs:
            acc = 0.0
            for v in sorted(c):
                acc = acc + v
            g.append(acc)
        w = [w[j] - lr * (g[j] / n) for j in range(d + 1)]
    return w


def test_features_known(spark):
    df = spark.createDataFrame(
        [
            (1, "The cat ON the mat"),   # 5 tokens, 3+3+2+3+3=14 chars, sw: the,on,the
            (2, "   "),                  # dropped
            (3, "zz"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in doc_features(df).collect()}
    assert set(got) == {1, 3}
    assert got[1]["n_tokens"] == 5
    assert got[1]["x1"] == pytest.approx(math.log(6.0), rel=1e-15)
    assert got[1]["x2"] == pytest.approx(14 / 5, rel=1e-15)
    assert got[1]["x3"] == pytest.approx(3 / 5, rel=1e-15)
    assert got[3]["x3"] == 0.0


def test_training_parity_bitexact(spark):
    rng = random.Random(5)
    rows = []
    for i in range(300):
        x1 = rng.uniform(0.0, 5.0)
        x2 = rng.uniform(2.0, 8.0)
        y = 1 if (0.8 * x1 - 0.5 * x2 + rng.uniform(-0.5, 0.5)) > 0 else 0
        rows.append((i, y, x1, x2))
    df = spark.createDataFrame(rows, "id long, y int, x1 double, x2 double")
    w = train_logreg(
        df, label_col="y", feature_cols=["x1", "x2"], deterministic=True
    )
    w_ref = _py_train([(y, x1, x2) for _, y, x1, x2 in rows])
    assert w == w_ref  # bit-exact: sorted folds + identical update chain
    # bit-stable under repartitioning
    w2 = train_logreg(
        df.repartition(7),
        label_col="y",
        feature_cols=["x1", "x2"],
        deterministic=True,
    )
    assert w2 == w
    # production (plain SUM) path converges to the same model numerically
    w3 = train_logreg(df, label_col="y", feature_cols=["x1", "x2"])
    for a, b in zip(w3, w):
        assert a == pytest.approx(b, rel=1e-9)


@pytest.mark.slow
def test_learns_separable_task(spark):
    rng = random.Random(9)
    rows = []
    for i in range(400):
        y = i % 2
        # class 1 has larger x1; linearly separable with margin
        x1 = rng.uniform(2.0, 3.0) if y else rng.uniform(0.0, 1.0)
        rows.append((i, y, x1))
    df = spark.createDataFrame(rows, "id long, y int, x1 double")
    w = train_logreg(df, label_col="y", feature_cols=["x1"], rounds=50, lr=1.0)
    scored = score_logreg(df, w, feature_cols=["x1"])
    acc = scored.where(scored.keep.cast("int") == scored.y).count() / 400.0
    assert acc >= 0.95
    assert w[1] > 0  # larger x1 -> class 1


@pytest.mark.slow  # r4 VERDICT ask 7: gate-time offset for the new oracle-types family; fast siblings + green driver oracle retain default coverage
def test_end_to_end_text_gate(spark):
    # prose-like docs (stopword-rich) vs keyword-spam docs
    prose = "the cat sat on the mat and the dog is in the house for a nap"
    spam = "buy cheap pills viagra casino poker jackpot win win win"
    rows = [(i, prose if i % 2 == 0 else spam) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from pyspark.sql import functions as F

    feats = doc_features(df).withColumn(
        "y", (F.col("doc_id") % 2 == 0).cast("int")
    )
    w = train_logreg(
        feats, label_col="y", feature_cols=["x1", "x2", "x3"], rounds=30, lr=1.0
    )
    scored = score_logreg(feats, w, feature_cols=["x1", "x2", "x3"])
    acc = scored.where(scored.keep.cast("int") == scored.y).count() / 200.0
    assert acc == 1.0


def test_validation(spark):
    df = spark.createDataFrame([(1, 0, 1.0)], "id long, y int, x1 double")
    with pytest.raises(ValueError):
        train_logreg(df, label_col="y", feature_cols=["x1"], rounds=0)
    with pytest.raises(ValueError):
        train_logreg(df, label_col="y", feature_cols=["x1"], lr=0.0)
    with pytest.raises(ValueError):
        train_logreg(df, label_col="y", feature_cols=[])
    with pytest.raises(ValueError):
        train_logreg(df.where("id < 0"), label_col="y", feature_cols=["x1"])
    with pytest.raises(ValueError):
        score_logreg(df, [0.0, 0.0, 0.0], feature_cols=["x1"])


def test_robust_outliers_reference(spark):
    import numpy as np

    from open_vector_tile_spark.operators.classify import robust_outliers

    rng = np.random.default_rng(107)
    rows = []
    for gsrc in ("a", "b", "c"):
        base = int(rng.integers(50, 200))
        for _ in range(40):
            rows.append((gsrc, base + int(rng.integers(-10, 11))))
        rows.append((gsrc, base + 500))  # planted outlier
    df = spark.createDataFrame(rows, ["source", "n_chars"]).repartition(5)
    got = {
        r["source"]: (r["n"], r["med"], r["mad"], r["n_out"])
        for r in robust_outliers(df).collect()
    }

    def ref_med(vals):
        s = sorted(vals)
        n = len(s)
        return (
            float(s[n // 2])
            if n % 2
            else s[n // 2 - 1] + (s[n // 2] - s[n // 2 - 1]) * 0.5
        )

    per = {}
    for gsrc, v in rows:
        per.setdefault(gsrc, []).append(v)
    for gsrc, vals in per.items():
        med = ref_med(vals)
        devs = [abs(v - med) for v in vals]
        mad = ref_med(devs)
        thr = 3.0 * 1.4826 * mad
        nout = sum(1 for d in devs if (d > 0 if mad == 0 else d > thr))
        assert got[gsrc] == (len(vals), med, mad, nout), gsrc
        assert got[gsrc][3] >= 1  # the planted outlier is caught


def test_robust_outliers_mad_zero_and_validation(spark):
    import pytest as _pt

    from open_vector_tile_spark.operators.classify import robust_outliers

    rows = [("z", 5)] * 9 + [("z", 6)]
    df = spark.createDataFrame(rows, ["source", "n_chars"])
    got = robust_outliers(df).collect()[0]
    assert got["mad"] == 0.0 and got["n_out"] == 1
    with _pt.raises(ValueError):
        robust_outliers(df, k=0)
