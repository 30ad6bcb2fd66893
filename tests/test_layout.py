"""Z-order layout: JVM key == numpy weave2d, and written row-group stats
actually enable bbox skipping (the point of the operator)."""

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from open_vector_tile_spark.codec.kernels import weave2d
from open_vector_tile_spark.operators.layout import (
    quantize16,
    zorder_cluster,
    zorder_key,
)


def test_zorder_key_matches_numpy_weave2d(spark):
    rng = np.random.default_rng(7)
    xs = rng.integers(0, 65536, 300)
    ys = rng.integers(0, 65536, 300)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(xs, ys)], ["x", "y"]
    )
    got = [
        r["k"]
        for r in df.select(zorder_key(F.col("x"), F.col("y")).alias("k"))
        .collect()
    ]
    want = weave2d(xs, ys).astype(np.int64).tolist()
    assert got == want


def test_quantize16_clamps_and_grids(spark):
    df = spark.createDataFrame(
        [(-180.0,), (-179.999,), (0.0,), (179.999,), (180.0,), (999.0,), (-999.0,)],
        ["lon"],
    )
    got = [
        r["q"]
        for r in df.select(quantize16(F.col("lon"), -180.0, 180.0).alias("q")).collect()
    ]
    assert got[0] == 0 and got[2] == 32768
    assert got[4] == 65535 and got[5] == 65535 and got[6] == 0
    assert 0 <= got[1] <= 1 and got[3] == 65535


def _files_hit(path: str, lo_x, hi_x, lo_y, hi_y) -> tuple[int, int]:
    """(#row groups whose lon/lat stats intersect the bbox, #row groups)."""
    hit = total = 0
    import glob

    for f in glob.glob(f"{path}/*.parquet"):
        meta = pq.ParquetFile(f).metadata
        cols = {meta.schema.column(i).name: i for i in range(len(meta.schema))}
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            sx = g.column(cols["lon"]).statistics
            sy = g.column(cols["lat"]).statistics
            total += 1
            if sx.min <= hi_x and sx.max >= lo_x and sy.min <= hi_y and sy.max >= lo_y:
                hit += 1
    return hit, total


def test_zorder_write_skips_row_groups(spark, tmp_path):
    n = 40000
    df = (
        spark.range(n)
        .select(
            ((F.col("id") * 7919) % 36000 / 100.0 - 180.0).alias("lon"),
            ((F.col("id") * 104729) % 18000 / 100.0 - 90.0).alias("lat"),
        )
    )
    plain = str(tmp_path / "plain")
    zo = str(tmp_path / "zorder")
    df.repartition(16).write.parquet(plain)
    zorder_cluster(df, "lon", "lat", num_partitions=16).write.parquet(zo)

    bbox = (10.0, 30.0, 10.0, 30.0)  # ~0.3% of the globe's area
    hit_plain, total_plain = _files_hit(plain, *bbox)
    hit_z, total_z = _files_hit(zo, *bbox)
    assert total_plain >= 16 and total_z >= 16
    assert hit_plain == total_plain  # random layout: every group intersects
    assert hit_z <= total_z // 4  # clustered: most groups skipped

    # layout is a permutation, not a transformation
    a = sorted(map(tuple, spark.read.parquet(plain).collect()))
    b = sorted(
        map(tuple, spark.read.parquet(zo).drop("_zkey").collect())
    )
    assert a == b


def test_zorder_sorted_and_range_partitioned(spark):
    df = spark.range(5000).select(
        ((F.col("id") * 37) % 3600 / 10.0 - 180.0).alias("lon"),
        ((F.col("id") * 53) % 1600 / 10.0 - 80.0).alias("lat"),
    )
    out = zorder_cluster(df, "lon", "lat", num_partitions=4)
    per_part = out.select("_zkey").rdd.mapPartitions(
        lambda it: [[r["_zkey"] for r in it]]
    ).collect()
    ranges = []
    for keys in per_part:
        assert keys == sorted(keys)  # sortWithinPartitions
        if keys:
            ranges.append((keys[0], keys[-1]))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo  # repartitionByRange: disjoint global key ranges


def test_bucketed_join_has_no_exchange(spark):
    from open_vector_tile_spark.operators.layout import bucketed_join, write_bucketed

    a = spark.range(0, 5000).selectExpr("id % 400 AS k", "id AS a_val")
    b = spark.range(0, 1000).selectExpr("id % 400 AS k", "id * 7 AS b_val")
    write_bucketed(a, "t_bkt_a", ["k"], 8, sort_cols=["k"])
    write_bucketed(b, "t_bkt_b", ["k"], 8, sort_cols=["k"])
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = bucketed_join(spark, "t_bkt_a", "t_bkt_b", ["k"])
            n = j.count()
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan  # co-located: zero shuffles
            assert "SortMergeJoin" in plan
            # correctness vs plain join of the source frames
            want = a.join(b, "k").count()
            assert n == want
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_a")
        spark.sql("DROP TABLE IF EXISTS t_bkt_b")


def test_bucketed_agg_has_no_exchange(spark):
    """groupBy on the bucket key also skips its shuffle — the layout pays
    for aggregations, not just joins."""
    from open_vector_tile_spark.operators.layout import write_bucketed

    a = spark.range(0, 3000).selectExpr("id % 97 AS k", "id AS v")
    write_bucketed(a, "t_bkt_g", ["k"], 8)
    try:
        agg = spark.table("t_bkt_g").groupBy("k").sum("v")
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert agg.count() == 97
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_g")


# ---------------------------------------------------------- global_rank / STR


def test_global_rank_matches_window(spark):
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from open_vector_tile_spark.operators.layout import global_rank

    rng = random.Random(59)
    rows = [(i, rng.uniform(0, 100)) for i in range(500)]
    df = spark.createDataFrame(rows, "rid long, v double").repartition(9)
    got = {
        r["rid"]: r["_rank"]
        for r in global_rank(df, ["v", "rid"], num_partitions=7).collect()
    }
    want = {
        r["rid"]: r["w"] - 1
        for r in df.withColumn(
            "w", F.row_number().over(Window.orderBy("v", "rid"))
        ).collect()
    }
    assert got == want
    # duplicate keys broken by the id tie-break still rank exactly
    rows2 = [(i, float(i % 3)) for i in range(60)]
    df2 = spark.createDataFrame(rows2, "rid long, v double")
    got2 = {
        r["rid"]: r["_rank"]
        for r in global_rank(df2, ["v", "rid"], num_partitions=5).collect()
    }
    want2 = {
        rid: rank
        for rank, (v, rid) in enumerate(sorted((v, rid) for rid, v in rows2))
    }
    assert got2 == want2


def _py_str_pack(rects, cap):
    import math

    n = len(rects)
    n_leaves = math.ceil(n / cap)
    n_slices = math.ceil(math.sqrt(n_leaves))
    slice_rows = math.ceil(n / n_slices)
    leaves_per_slice = math.ceil(slice_rows / cap)
    by_cx = sorted(rects, key=lambda r: ((r[1] + r[3]) / 2.0, r[0]))
    out = {}
    for rank, r in enumerate(by_cx):
        out[r[0]] = [rank // slice_rows]
    for s in {v[0] for v in out.values()}:
        in_slice = sorted(
            (r for r in rects if out[r[0]][0] == s),
            key=lambda r: ((r[2] + r[4]) / 2.0, r[0]),
        )
        for j, r in enumerate(in_slice):
            out[r[0]].append(s * leaves_per_slice + j // cap)
    return {k: tuple(v) for k, v in out.items()}


def test_str_pack_parity_and_mbrs(spark):
    import random

    from open_vector_tile_spark.operators.layout import str_pack

    rng = random.Random(61)
    rects = []
    for i in range(180):
        x, y = rng.uniform(0, 100), rng.uniform(0, 100)
        rects.append((i, x, y, x + rng.uniform(0.1, 5), y + rng.uniform(0.1, 5)))
    df = spark.createDataFrame(
        rects, "rid long, xmin double, ymin double, xmax double, ymax double"
    ).repartition(7)
    out = str_pack(df, leaf_capacity=8).collect()
    want = _py_str_pack(rects, 8)
    got = {r["rid"]: (r["slice"], r["leaf_id"]) for r in out}
    assert got == want
    # every rect inside its leaf MBR; leaf sizes respect capacity
    by_leaf = {}
    rd = {r[0]: r for r in rects}
    for r in out:
        by_leaf.setdefault(r["leaf_id"], []).append(r)
        rect = rd[r["rid"]]
        assert r["leaf_xmin"] <= rect[1] and r["leaf_ymin"] <= rect[2]
        assert r["leaf_xmax"] >= rect[3] and r["leaf_ymax"] >= rect[4]
        assert r["n_in_leaf"] <= 8
    for leaf, rows in by_leaf.items():
        assert len(rows) == rows[0]["n_in_leaf"]


def test_str_pack_validation(spark):
    import pytest as _pytest

    from open_vector_tile_spark.operators.layout import str_pack

    df = spark.createDataFrame(
        [(1, 0.0, 0.0, 1.0, 1.0)],
        "rid long, xmin double, ymin double, xmax double, ymax double",
    )
    with _pytest.raises(ValueError):
        str_pack(df, leaf_capacity=0)
    with _pytest.raises(ValueError):
        str_pack(df.where("rid < 0"), leaf_capacity=4)


# ---------------------------------------------------------------------------
# Hilbert curve
# ---------------------------------------------------------------------------


def test_hilbert_python_reference_is_a_hilbert_curve():
    from open_vector_tile_spark.operators.layout import hilbert_d_py

    # order-1 base case: the U shape
    assert [hilbert_d_py(x, y, 1) for x, y in [(0, 0), (0, 1), (1, 1), (1, 0)]] == [
        0,
        1,
        2,
        3,
    ]
    # bijective on the full order-4 grid ...
    inv = {hilbert_d_py(x, y, 4): (x, y) for x in range(16) for y in range(16)}
    assert sorted(inv) == list(range(256))
    # ... and CONTINUOUS: consecutive keys are grid neighbors (the property
    # Z-order lacks — this is the whole point of the operator)
    for d in range(255):
        (x1, y1), (x2, y2) = inv[d], inv[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


@pytest.mark.slow
def test_hilbert_spark_matches_python(spark):
    import numpy as np

    from open_vector_tile_spark.operators.layout import (
        hilbert_d_py,
        with_hilbert_key,
    )

    rng = np.random.default_rng(11)
    xs = rng.integers(0, 65536, 300)
    ys = rng.integers(0, 65536, 300)
    df = spark.createDataFrame(
        [(i, int(a), int(b)) for i, (a, b) in enumerate(zip(xs, ys))],
        ["id", "x", "y"],
    )
    out = with_hilbert_key(df, "x", "y", order=16, key_col="hkey")
    got = {r["id"]: r["hkey"] for r in out.collect()}
    want = {i: hilbert_d_py(int(a), int(b), 16) for i, (a, b) in enumerate(zip(xs, ys))}
    assert got == want
    # corners at full order
    corner = spark.createDataFrame(
        [(0, 0, 0), (1, 0, 65535), (2, 65535, 65535), (3, 65535, 0)],
        ["id", "x", "y"],
    )
    vals = {
        r["id"]: r["hkey"]
        for r in with_hilbert_key(corner, "x", "y", key_col="hkey").collect()
    }
    assert vals[0] == 0 and vals[3] == 2**32 - 1  # start and end of the curve

    # staged projections: the plan must stay LINEAR in the order, not
    # exponential (CollapseProject must not re-inline the per-level CASEs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(plan) < 200_000


def test_hilbert_order_validation(spark):
    import pytest as _pytest

    from open_vector_tile_spark.operators.layout import with_hilbert_key

    df = spark.range(1).selectExpr("id AS x", "id AS y")
    with _pytest.raises(ValueError):
        with_hilbert_key(df, "x", "y", order=0)
    with _pytest.raises(ValueError):
        with_hilbert_key(df, "x", "y", order=32)


def test_hilbert_cluster_skips_row_groups_and_fewer_runs_than_zorder(
    spark, tmp_path
):
    from open_vector_tile_spark.operators.layout import hilbert_cluster

    n = 40000
    df = spark.range(n).select(
        ((F.col("id") * 7919) % 36000 / 100.0 - 180.0).alias("lon"),
        ((F.col("id") * 104729) % 18000 / 100.0 - 90.0).alias("lat"),
    )
    hz = str(tmp_path / "hilbert")
    hilbert_cluster(df, "lon", "lat", num_partitions=16).write.parquet(hz)
    bbox = (10.0, 30.0, 10.0, 30.0)
    hit_h, total_h = _files_hit(hz, *bbox)
    assert total_h >= 16
    assert hit_h <= total_h // 4  # clustered: most row groups skipped
    # permutation, not transformation
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, spark.read.parquet(hz).drop("_hkey").collect()))
    assert a == b

    # locality: a bbox covers no more key-runs on the Hilbert curve than on
    # the Z curve (the continuity advantage), measured exactly at order 6
    from open_vector_tile_spark.codec.kernels import weave2d
    import numpy as np

    from open_vector_tile_spark.operators.layout import hilbert_d_py

    def runs(keys):
        ks = sorted(keys)
        return 1 + sum(1 for a_, b_ in zip(ks, ks[1:]) if b_ != a_ + 1)

    rng = np.random.default_rng(3)
    worse = 0
    for _ in range(40):
        x0, y0 = rng.integers(0, 48, 2)
        w, h = rng.integers(4, 16, 2)
        cells = [
            (x, y)
            for x in range(x0, min(64, x0 + w))
            for y in range(y0, min(64, y0 + h))
        ]
        hk = [hilbert_d_py(x, y, 6) for x, y in cells]
        zk = [
            int(weave2d(np.array([x]), np.array([y]))[0]) for x, y in cells
        ]
        if runs(hk) > runs(zk):
            worse += 1
    assert worse <= 8  # hilbert ties-or-wins on the overwhelming majority
