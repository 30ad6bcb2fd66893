"""Top-level tile container: parse + write (reference: src/vectorTile.ts)."""

from __future__ import annotations

import struct
from typing import Optional

from .column_cache import ColumnCacheReader, ColumnCacheWriter
from .grid import GridData, write_grid_data
from .image import ImageData, write_image_data
from .layer import BaseLayer, OVLayer, write_ov_layer
from .mvt import MvtLayer
from .pbf import PbfReader, PbfWriter, TileDecodeError

# Every error class a truncated/corrupt buffer can surface as, at parse time
# OR during lazy feature decode after a clean header parse.  Single source of
# truth: operators/decode.py's skip-corrupt paths catch exactly this tuple, so
# adding a class here propagates to every scan's ``on_error="skip"``.
DECODE_ERROR_CLASSES = (
    TileDecodeError,
    IndexError,
    ValueError,
    KeyError,
    OverflowError,
    UnicodeDecodeError,
    AttributeError,  # e.g. column-cache tag truncated away -> cache is None
    TypeError,
    struct.error,
)


class VectorTile:
    """Parse a tile buffer: MVT layers (tags 1/3), OVT layers (tag 4),
    column cache (tag 5), grids (tag 6), images (tag 7)
    (src/vectorTile.ts:92-132)."""

    def __init__(self, data: bytes) -> None:
        try:
            self._parse(data)
        except TileDecodeError:
            raise
        except DECODE_ERROR_CLASSES as e:
            raise TileDecodeError(
                f"invalid tile buffer ({len(data)} bytes): {type(e).__name__}: {e}"
            ) from e

    def _parse(self, data: bytes) -> None:
        self.layers: dict[str, object] = {}
        self.grids: dict[str, GridData] = {}
        self.images: dict[str, ImageData] = {}
        self._columns: Optional[ColumnCacheReader] = None
        layer_indexes: list[int] = []
        pbf = PbfReader(data)

        def handler(fld: int, wt: int, reader: PbfReader) -> None:
            if fld in (1, 3):
                end = reader.read_varint() + reader.pos
                layer = MvtLayer(reader, end, is_s2=(fld == 1))
                reader.pos = end
                if len(layer) != 0:
                    self.layers[layer.name] = layer
            elif fld == 4:
                layer_indexes.append(reader.pos)
            elif fld == 5:
                end = reader.read_varint() + reader.pos
                self._columns = ColumnCacheReader.from_pbf(reader, end)
                reader.pos = end
            elif fld == 6:
                end = reader.read_varint() + reader.pos
                grid = GridData.from_pbf(reader, end)
                reader.pos = end
                self.grids[grid.name] = grid
            elif fld == 7:
                end = reader.read_varint() + reader.pos
                image = ImageData.from_pbf(reader, end)
                reader.pos = end
                self.images[image.name] = image

        pbf.read_fields(handler)
        # OVT layers decoded after the column cache is registered (:126-132)
        for pos in layer_indexes:
            pbf.pos = pos
            end = pbf.read_varint() + pbf.pos
            layer = OVLayer(pbf, end, self._columns)
            self.layers[layer.name] = layer


def write_ov_tile(
    layers: Optional[list[BaseLayer]] = None,
    images: Optional[list[dict]] = None,
    grids: Optional[list[dict]] = None,
) -> bytes:
    """(src/vectorTile.ts:148-185).  Buffer order: layer messages (tag 4),
    column cache (tag 5), images (tag 7), grids (tag 6)."""
    pbf = PbfWriter()
    if layers is not None:
        cache = ColumnCacheWriter()
        layer_bodies = [write_ov_layer(layer, cache) for layer in layers]
        for body in layer_bodies:
            pbf.write_message(4, body)
        col_pbf = PbfWriter()
        cache.write(col_pbf)
        pbf.write_message(5, col_pbf.commit())
    if images is not None:
        for img in images:
            pbf.write_bytes_field(
                7,
                write_image_data(
                    img["name"], img["type"], img["width"], img["height"], img["image"]
                ),
            )
    if grids is not None:
        for g in grids:
            pbf.write_bytes_field(
                6, write_grid_data(g["name"], g["size"], g["data"], g["extent"])
            )
    return pbf.commit()


def mvt_tile_to_base_layers(tile: VectorTile) -> list[BaseLayer]:
    """MVT layers of a parsed tile -> write-side IR (BaseVectorTile.fromVectorTile,
    src/base/vectorTile.ts:23-49)."""
    out = []
    for name, layer in tile.layers.items():
        if not isinstance(layer, MvtLayer):
            continue
        base = BaseLayer(name=layer.name, extent=layer.extent, version=layer.version)
        for i in range(len(layer)):
            base.add_feature(layer.feature(i).to_base())
        out.append(base)
    return out


def ovt_tile_to_base_layers(tile: VectorTile) -> list[BaseLayer]:
    """OVT layers of a parsed tile -> write-side IR.  The decoded OVFeature
    shares BaseFeature's geometry model (points / BaseLine lists / ring
    lists), so conversion is field-copying; re-encoding the result is
    byte-identical to the original buffer (pinned by
    tests/test_decode_full.py::test_ovt_to_base_reencode_byte_equal)."""
    from .feature import BaseFeature

    out = []
    for name, layer in tile.layers.items():
        if not isinstance(layer, OVLayer):
            continue
        # carry the decoded layer's EXACT shape/mshape instead of re-running
        # inference: last-write-wins inference over the type-sorted decode
        # order can flip a float key to u64 and truncate values (the
        # reference's shape.ts:320-321 quirk); with the original shape the
        # re-encode is value-exact and byte-stable
        base = BaseLayer(
            name=layer.name,
            extent=layer.extent,
            version=layer.version,
            shape=dict(layer.shape),
            mshape=dict(layer.mshape) if layer.mshape is not None else None,
        )
        for i in range(len(layer)):
            f = layer.feature(i)
            base.add_feature(
                BaseFeature(
                    ftype=f.ftype,
                    geometry=f.geometry,
                    properties=f.properties,
                    id=f.id,
                    bbox=f.bbox,
                    indices=list(f.indices),
                    tessellation=list(f.tessellation),
                    mvalues=f.mvalues,
                )
            )
        out.append(base)
    return out


def tile_to_base_layers(tile: VectorTile) -> list[BaseLayer]:
    """All vector layers (both wire families) of a parsed tile -> IR."""
    return ovt_tile_to_base_layers(tile) + mvt_tile_to_base_layers(tile)


def merge_tile_bytes(a: Optional[bytes], b: Optional[bytes], prefer: str = "b") -> bytes:
    """Merge two tile buffers at the layer level: the union of both tiles'
    vector layers, grids, and images; name collisions resolved by ``prefer``
    ("a" | "b").  Grids are re-encoded from their dequantized values
    (requantization is within the codec's half-step tolerance).

    **Output is always the OVT wire family.**  MVT/S2 input layers are
    value-losslessly converted to IR and re-encoded as OVT columnar layers
    (``tile_to_base_layers`` feeds ``write_ov_tile``) — geometry, ids,
    properties, and M-values survive exactly, but the merged buffer is no
    longer parseable by an MVT-only consumer, and only layers that were
    ALREADY OVT round-trip byte-identically.  If MVT byte fidelity is
    required, keep those tiles out of merge/extract paths (pass them
    through untouched)."""
    if a is None:
        return b if b is not None else write_ov_tile(layers=[])
    if b is None:
        return a
    ta, tb = VectorTile(a), VectorTile(b)
    first, second = (tb, ta) if prefer == "a" else (ta, tb)  # second wins
    layers: dict[str, BaseLayer] = {}
    for t in (first, second):
        for lyr in tile_to_base_layers(t):
            layers[lyr.name] = lyr
    grids: dict[str, dict] = {}
    images: dict[str, dict] = {}
    for t in (first, second):
        for name, g in t.grids.items():
            grids[name] = grid_to_dict(g)
        for name, im in t.images.items():
            images[name] = image_to_dict(im)
    return write_ov_tile(
        layers=list(layers.values()),
        images=list(images.values()) or None,
        grids=list(grids.values()) or None,
    )


def grid_to_dict(g) -> dict:
    """GridData -> the write_ov_tile grid-input dict (single definition of
    the contract, shared by merge/extract paths)."""
    return {"name": g.name, "size": g.size, "extent": g.extent, "data": g.data()}


def image_to_dict(im) -> dict:
    """ImageData -> the write_ov_tile image-input dict.  NOTE ``image()``
    is a METHOD — storing the bound method instead of calling it crashes
    write_image_data with a len(method) TypeError."""
    return {
        "name": im.name, "type": im.type, "width": im.width,
        "height": im.height, "image": im.image(),
    }
