"""DataSourceV2 tileset-directory source/sink (sources/tileset.py).

Reads the reference's committed benchmark tile directories
(/root/reference/benchmarks/data/*/mvt — z_x_y.{mvt,pbf} files), asserting
filename-level filter pushdown, partition-parallel reads, blob fidelity,
and the write->read round trip."""

import os

import pytest
from pyspark.sql import functions as F

REF_MVT = "/root/reference/benchmarks/data/omt/mvt"


@pytest.fixture(scope="module")
def registered(spark):
    from open_vector_tile_spark.sources.tileset import OvtTilesetDataSource

    spark.dataSource.register(OvtTilesetDataSource)
    return spark


def _expected_files(root):
    import re

    out = {}
    for fn in os.listdir(root):
        m = re.match(r"^(\d+)[-_](\d+)[-_](\d+)\b", fn)
        if m and fn.endswith((".mvt", ".pbf", ".ovt")):
            p = os.path.join(root, fn)
            out[(int(m.group(1)), int(m.group(2)), int(m.group(3)))] = os.path.getsize(p)
    return out


def test_tileset_scan_lists_all_tiles(registered):
    df = registered.read.format("ovt_tileset").option("path", REF_MVT).load()
    got = {
        (r["zoom"], r["tile_x"], r["tile_y"]): r["n_bytes"]
        for r in df.select("zoom", "tile_x", "tile_y", "n_bytes").collect()
    }
    assert got == _expected_files(REF_MVT)


def test_tileset_blob_bytes_match_disk(registered):
    df = (
        registered.read.format("ovt_tileset")
        .option("path", REF_MVT)
        .load()
        .filter(F.col("zoom") == 2)
    )
    rows = df.collect()
    assert rows
    for r in rows:
        with open(r["path"], "rb") as fh:
            assert bytes(r["tile"]) == fh.read()


def test_tileset_filter_pushdown_prunes_files(registered):
    """The pushed zoom filter must shrink the PARTITION file lists (pruning
    happens in partitions(), before any read), not just the output rows."""
    from open_vector_tile_spark.sources.tileset import OvtTilesetReader
    from pyspark.sql.datasource import EqualTo

    reader = OvtTilesetReader({"path": REF_MVT, "num_partitions": "4"})
    all_files = sum(len(p.files) for p in reader.partitions())

    reader2 = OvtTilesetReader({"path": REF_MVT, "num_partitions": "4"})
    rest = list(reader2.pushFilters([EqualTo(("zoom",), 2)]))
    assert rest == []  # fully absorbed
    pruned = sum(len(p.files) for p in reader2.partitions())
    assert 0 < pruned < all_files
    assert all(t[0] == 2 for p in reader2.partitions() for t in p.files)

    # end-to-end: the DataFrame filter produces exactly the pruned files
    df = (
        registered.read.format("ovt_tileset")
        .option("path", REF_MVT)
        .load()
        .filter(F.col("zoom") == 2)
    )
    assert df.count() == pruned


def test_tileset_unsupported_filter_returned(registered):
    from open_vector_tile_spark.sources.tileset import OvtTilesetReader
    from pyspark.sql.datasource import EqualTo, StringContains

    reader = OvtTilesetReader({"path": REF_MVT})
    rest = list(
        reader.pushFilters([EqualTo(("zoom",), 2), StringContains(("path",), "omt")])
    )
    assert len(rest) == 1 and isinstance(rest[0], StringContains)
    assert len(reader.pushed) == 1


def test_tileset_skip_blob_stats_only(registered):
    df = (
        registered.read.format("ovt_tileset")
        .option("path", REF_MVT)
        .option("skip_blob", "true")
        .load()
    )
    r = df.filter(F.col("zoom") == 2).select("n_bytes", "tile").first()
    assert r["n_bytes"] > 0 and r["tile"] is None


def test_read_tileset_decodes_reference_tiles(registered):
    """read_tileset: scan + pre-decode pushdown filter + blob decode in one
    call, against the reference's own committed MVT tiles."""
    from pyspark.sql import functions as F

    from open_vector_tile_spark.operators import read_tileset

    feats = read_tileset(registered, REF_MVT, where=F.col("zoom") == 2)
    pdf = feats.select("zoom", "tile_x", "tile_y", "layer", "ftype").toPandas()
    assert len(pdf) > 0
    assert (pdf["zoom"] == 2).all()
    assert pdf["layer"].nunique() >= 1


def test_tileset_write_read_roundtrip(registered, tmp_path):
    """Encode real OVT tiles with the Spark tiler, sink them as a tileset
    directory, scan the directory back, decode — bytes and counts intact."""
    from open_vector_tile_spark.operators import decode_tiles, encode_tiles, points_to_features

    pts = registered.range(200).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 37 % 3600) / 10.0 - 180.0).alias("lon"),
        ((F.col("id") * 53 % 1600) / 10.0 - 80.0).alias("lat"),
    )
    feats = points_to_features(pts, zoom=3, layer="docs", extent=4096, id_col="doc_id")
    tiles = encode_tiles(feats).cache()
    out = str(tmp_path / "tileset")
    (
        tiles.select("zoom", "tile_x", "tile_y", "tile")
        .write.format("ovt_tileset")
        .option("path", out)
        .mode("append")
        .save()
    )
    back = registered.read.format("ovt_tileset").option("path", out).load()
    orig = {(r["zoom"], r["tile_x"], r["tile_y"]): bytes(r["tile"]) for r in tiles.collect()}
    got = {(r["zoom"], r["tile_x"], r["tile_y"]): bytes(r["tile"]) for r in back.collect()}
    assert got == orig
    assert decode_tiles(back.select("zoom", "tile_x", "tile_y", "tile")).count() == 200


def test_shard_layout_roundtrip_and_pushdown(registered, tmp_path):
    """Shard container: compact the reference tileset (445 loose files) into a
    few packed shards, read back byte-identical rows, and verify pushdown
    prunes at the ENTRY level inside shards."""
    from open_vector_tile_spark.sources.tileset import (
        OvtTilesetReader,
        read_shard_index,
    )
    from pyspark.sql.datasource import EqualTo

    loose = registered.read.format("ovt_tileset").option("path", REF_MVT).load()
    want = {
        (r["zoom"], r["tile_x"], r["tile_y"]): bytes(r["tile"])
        for r in loose.collect()
    }

    out = str(tmp_path / "shards")
    (
        loose.select("zoom", "tile_x", "tile_y", "tile")
        .repartition(3)
        .write.format("ovt_tileset")
        .option("path", out)
        .option("layout", "shard")
        .mode("append")
        .save()
    )
    shard_files = [f for f in os.listdir(out) if f.endswith(".ovtshard")]
    assert 1 <= len(shard_files) <= 3  # tiles packed, not one file per tile
    assert sum(len(read_shard_index(os.path.join(out, f))[0]) for f in shard_files) == len(want)

    back = registered.read.format("ovt_tileset").option("path", out).load()
    got = {
        (r["zoom"], r["tile_x"], r["tile_y"]): bytes(r["tile"]) for r in back.collect()
    }
    assert got == want

    # pushdown prunes shard ENTRIES before any blob read
    reader = OvtTilesetReader({"path": out, "num_partitions": "4"})
    assert list(reader.pushFilters([EqualTo(("zoom",), 2)])) == []
    entries = [t for p in reader.partitions() for t in p.files]
    assert 0 < len(entries) < len(want)
    assert all(t[0] == 2 for t in entries)
    n_z2 = sum(1 for k in want if k[0] == 2)
    assert len(entries) == n_z2


def test_shard_bytes_deterministic(tmp_path):
    """Shard bytes are a pure function of the entry set (order-insensitive)."""
    from open_vector_tile_spark.sources.tileset import write_shard

    e = [(2, 1, 1, b"aaa"), (1, 0, 0, b"bb"), (2, 0, 3, b"cccc")]
    p1, p2 = str(tmp_path / "a.ovtshard"), str(tmp_path / "b.ovtshard")
    write_shard(p1, e)
    write_shard(p2, list(reversed(e)))
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_compact_tileset_one_liner(registered, tmp_path):
    from open_vector_tile_spark.sources.tileset import compact_tileset

    dst = str(tmp_path / "compacted")
    n = compact_tileset(registered, REF_MVT, dst, shards=2)
    assert n == 429
    back = registered.read.format("ovt_tileset").option("path", dst).load()
    assert back.count() == n
    shard_files = [f for f in os.listdir(dst) if f.endswith(".ovtshard")]
    assert 1 <= len(shard_files) <= 2


def _tiny_tiles(spark, n, start=0):
    from open_vector_tile_spark.operators import encode_tiles, points_to_features

    pts = spark.range(start, start + n).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 37 % 3600) / 10.0 - 180.0).alias("lon"),
        ((F.col("id") * 53 % 1600) / 10.0 - 80.0).alias("lat"),
    )
    feats = points_to_features(pts, zoom=2, layer="docs", extent=4096, id_col="doc_id")
    return encode_tiles(feats).select("zoom", "tile_x", "tile_y", "tile")


def test_writer_overwrite_clears_previous_and_leaves_no_temps(registered, tmp_path):
    """mode('overwrite') must replace the tileset, not silently append, and
    the two-phase commit must leave zero temp files behind."""
    out = str(tmp_path / "ow")
    _tiny_tiles(registered, 200).write.format("ovt_tileset").option("path", out).mode(
        "append"
    ).save()
    first = set(os.listdir(out))
    assert first
    # second job: different (smaller) tile set, overwrite
    _tiny_tiles(registered, 30).write.format("ovt_tileset").option("path", out).mode(
        "overwrite"
    ).save()
    back = registered.read.format("ovt_tileset").option("path", out).load()
    want = {
        (r["zoom"], r["tile_x"], r["tile_y"]): bytes(r["tile"])
        for r in _tiny_tiles(registered, 30).collect()
    }
    got = {
        (r["zoom"], r["tile_x"], r["tile_y"]): bytes(r["tile"]) for r in back.collect()
    }
    assert got == want  # old tiles gone, new tiles exact
    assert not [f for f in os.listdir(out) if f.startswith(".tmp-")]


def test_writer_shard_append_jobs_do_not_clobber(registered, tmp_path):
    """Two append jobs keep both jobs' shards (job-tagged final names), and
    shard names are deterministic per partition within a job."""
    from open_vector_tile_spark.sources.tileset import read_shard_index

    out = str(tmp_path / "sh")
    for start in (0, 1000):
        _tiny_tiles(registered, 50, start=start).repartition(2).write.format(
            "ovt_tileset"
        ).option("path", out).option("layout", "shard").mode("append").save()
    shards = [f for f in os.listdir(out) if f.endswith(".ovtshard")]
    assert len(shards) in (3, 4)  # 2 jobs x <=2 non-empty partitions, no clobber
    assert not [f for f in os.listdir(out) if f.startswith(".tmp-")]
    n = sum(len(read_shard_index(os.path.join(out, f))[0]) for f in shards)
    back = registered.read.format("ovt_tileset").option("path", out).load()
    assert back.count() == n


def test_writer_abort_leaves_no_partial_output(registered, tmp_path):
    """A failing write job must leave the destination with no final tile
    files and no temps: succeeding tasks' temps are swept by abort(), and
    nothing is ever renamed to a final name."""
    out = str(tmp_path / "fail")
    tiles = _tiny_tiles(registered, 50).cache()
    poison = tiles.select("tile_x", "tile_y").first()  # any real tile key
    # poison ONE tile's blob so one task fails after others already wrote temps
    bad = tiles.repartition(4, "tile_x", "tile_y").select(
        "zoom",
        "tile_x",
        "tile_y",
        F.when(
            (F.col("tile_x") == poison["tile_x"]) & (F.col("tile_y") == poison["tile_y"]),
            F.raise_error(F.lit("boom")).cast("binary"),
        )
        .otherwise(F.col("tile"))
        .alias("tile"),
    )
    with pytest.raises(Exception):
        bad.write.format("ovt_tileset").option("path", out).mode("append").save()
    leftovers = os.listdir(out) if os.path.isdir(out) else []
    assert leftovers == [], leftovers


def test_reader_ignores_orphaned_temps(registered, tmp_path):
    """A torn/orphaned '.tmp-*' file (driver killed before abort could
    sweep) must be invisible to readers — both a garbage temp shard and a
    temp loose tile."""
    out = str(tmp_path / "ts")
    tiles = _tiny_tiles(registered, 10)
    tiles.write.format("ovt_tileset").option("path", out).mode("append").save()
    n = spark_read_count(registered, out)
    # drop garbage temps that would crash read_shard_index / duplicate tiles
    with open(os.path.join(out, ".tmp-deadbeef-3-99.ovtshard"), "wb") as fh:
        fh.write(b"NOT A SHARD AT ALL")
    with open(os.path.join(out, ".tmp-deadbeef-3-99-2_0_1.ovt"), "wb") as fh:
        fh.write(b"\x00torn")
    assert spark_read_count(registered, out) == n


def spark_read_count(spark, path):
    return (
        spark.read.format("ovt_tileset").option("path", path).load().count()
    )
