"""Corpus-wide parity sweep over the reference's committed benchmark tiles
(benchmarks/data/{amazon,amazon_here,bing,omt}): MVT decode -> IR -> OVT
encode -> OVT decode, asserting layer/feature/property/geometry parity and
aggregate size within the reference's published MVT->OVT deltas
(motivation.md:84-230).

Default run: a deterministic 40-tile sample across all corpora (~20 s).
Set SPARK_GRAFT_FULL_SWEEP=1 to sweep all 445 tiles (~4 min); BENCH.md
records the full-sweep size table.

Property parity accounts for two defined transformations:
- the layer shape is merged across features (last-write-wins inference,
  src/open/shape.ts:320-321), so decode fills defaults for keys a feature
  lacks;
- keys whose value type mismatches the final shape are COERCED by our
  writer (str()/numeric-or-0, codec/shape.py) — the reference writer throws
  on these tiles (columnCache.ts:291-292), which is why its own benchmark
  (benchmarks/ovtVScovt.ts:38-44) runs only the bing corpus.
"""

import glob
import os
import struct

import numpy as np
import pytest

from open_vector_tile_spark.codec import VectorTile, mvt_tile_to_base_layers, write_ov_tile
from open_vector_tile_spark.codec.mvt import MvtLayer

DATA = "/root/reference/benchmarks/data"
FULL = os.environ.get("SPARK_GRAFT_FULL_SWEEP") == "1"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference benchmark corpus absent"
)


def _corpus_files():
    files = sorted(
        f
        for f in glob.glob(f"{DATA}/*/mvt/*")
        if f.endswith((".mvt", ".pbf"))
    )
    if FULL:
        return files
    rng = np.random.RandomState(17)
    # deterministic sample, all corpora represented
    by_corpus: dict = {}
    for f in files:
        by_corpus.setdefault(f.split("/")[5], []).append(f)
    out = []
    for c, fs in sorted(by_corpus.items()):
        take = min(len(fs), 10)
        out.extend(np.asarray(fs)[rng.choice(len(fs), take, replace=False)].tolist())
    return out


def _expected_props(props: dict, shape: dict) -> dict:
    """The defined decode result for ``props`` under the layer ``shape``:
    defaults for absent keys, coercion for type-mismatched values, f32
    truncation for float-column values."""
    out = {}
    for k, prim in shape.items():
        v = props.get(k)
        if prim == "string":
            out[k] = "" if v is None else (v if isinstance(v, str) else str(v))
        elif prim in ("u64", "i64"):
            try:
                out[k] = int(v or 0)
            except (TypeError, ValueError):
                try:
                    out[k] = int(float(v))
                except (TypeError, ValueError):
                    out[k] = 0
        elif prim == "f32":
            try:
                f = float(v or 0)
            except (TypeError, ValueError):
                f = 0.0
            out[k] = struct.unpack("<f", struct.pack("<f", f))[0]
        elif prim == "f64":
            try:
                out[k] = float(v or 0)
            except (TypeError, ValueError):
                out[k] = 0.0
        elif prim == "bool":
            out[k] = bool(v)
        else:  # null / nested: corpus props are flat primitives
            out[k] = v
    return out


def _geom_tuples(f):
    if f.ftype == 1:
        return [tuple(p) for p in f.geometry]
    if f.ftype == 2:
        return [[tuple(p) for p in ln.points] for ln in f.geometry]
    return [[[tuple(p) for p in ln.points] for ln in poly] for poly in f.geometry]


@pytest.mark.slow
def test_corpus_parity_and_size():
    files = _corpus_files()
    assert files
    sizes: dict = {}
    n_features = 0
    for fp in files:
        raw = open(fp, "rb").read()
        mvt = VectorTile(raw)
        layers = mvt_tile_to_base_layers(mvt)
        buf = write_ov_tile(layers)
        ovt = VectorTile(buf)
        m_names = [n for n, l in mvt.layers.items() if isinstance(l, MvtLayer) and len(l)]
        assert set(ovt.layers) == set(m_names)
        for n in m_names:
            ml, ol = mvt.layers[n], ovt.layers[n]
            assert len(ol) == len(ml) and ol.extent == ml.extent
            base = [ml.feature(i).to_base() for i in range(len(ml))]
            base.sort(key=lambda f: f.ftype)  # writer's stable type sort (O2)
            shape = ol.shape
            for i, mf in enumerate(base):
                of = ol.feature(i)
                assert of.ftype == mf.ftype
                assert (of.id or 0) == (mf.id or 0)
                assert of.properties == _expected_props(mf.properties, shape), (
                    fp, n, i, mf.properties, of.properties)
                if mf.ftype == 1:
                    assert of.geometry == [tuple(p) for p in mf.geometry]
                elif mf.ftype == 2:
                    assert _geom_tuples(of) == [
                        [tuple(p) for p in ln.points] for ln in mf.geometry]
                else:
                    assert _geom_tuples(of) == [
                        [[tuple(p) for p in ln.points] for ln in poly] for poly in mf.geometry]
                    assert of.indices == list(mf.indices)
                n_features += 1
        corpus = fp.split("/")[5]
        s = sizes.setdefault(corpus, [0, 0, 0])
        s[0] += len(raw)
        s[1] += len(buf)
        s[2] += 1
    assert n_features > 1000
    # aggregate size: OVT re-encode never larger than +10% of the MVT input
    # (reference's published raw MVT->OVT deltas are negative on average,
    # motivation.md:84-230; amazon_here compresses as far as -45% thanks to
    # the shared column cache).  Bigger-than-MVT output would flag a broken
    # dictionary path; much smaller is the design working.
    for c, (m, o, k) in sizes.items():
        delta = (o - m) / m
        assert delta <= 0.10, (c, k, delta)


# reference-published OMT per-zoom OVT averages (motivation.md:84-103; that
# table's 'kB' is KiB).  For z5-14 the published run used exactly the
# committed corpus tiles (input MVT averages coincide), so this repo's
# writer must reproduce the reference writer's PUBLISHED output size.
PUBLISHED_OMT_OVT_KIB = {
    5: 581.62, 6: 424.84, 7: 376.94, 8: 296.48, 9: 309.43,
    10: 148.41, 11: 92.13, 12: 138.77, 13: 86.77, 14: 641.71,
}


def _omt_ovt_avg_kib(zoom: int) -> float:
    files = [
        f
        for f in glob.glob(f"{DATA}/omt/mvt/*")
        if os.path.basename(f).startswith(f"{zoom}_")
    ]
    assert files
    tot = 0
    for f in files:
        raw = open(f, "rb").read()
        tot += len(write_ov_tile(mvt_tile_to_base_layers(VectorTile(raw))))
    return tot / len(files) / 1024.0


@pytest.mark.parametrize("zoom", [11, 13])
def test_published_ovt_size_parity_fast(zoom):
    """Always-on spot check: repo writer output size == the reference
    writer's published average at this zoom (to the table's 2-decimal
    rounding)."""
    got = _omt_ovt_avg_kib(zoom)
    want = PUBLISHED_OMT_OVT_KIB[zoom]
    assert abs(got - want) / want < 5e-4, (got, want)


@pytest.mark.skipif(not FULL, reason="full sweep gated on SPARK_GRAFT_FULL_SWEEP=1")
@pytest.mark.parametrize("zoom", sorted(PUBLISHED_OMT_OVT_KIB))
def test_published_ovt_size_parity_full(zoom):
    got = _omt_ovt_avg_kib(zoom)
    want = PUBLISHED_OMT_OVT_KIB[zoom]
    assert abs(got - want) / want < 5e-4, (got, want)
