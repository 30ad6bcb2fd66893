"""Grid (elevation-style) layer codec (reference: src/open/gridLayer.ts)."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import kernels as K
from .pbf import PbfReader, PbfWriter


def write_grid_data(name: str, size: int, data, extent: int) -> bytes:
    """(src/open/gridLayer.ts:72-89).  Note the reference folds 0 into the
    min/max reduce seeds (``reduce(..., 0)``), so min<=0<=max always."""
    arr = np.asarray(data, dtype=np.float64)
    vmax = float(max(arr.max() if arr.size else 0.0, 0.0))
    vmin = float(min(arr.min() if arr.size else 0.0, 0.0))
    remapped = K.remap_value(arr, vmin, vmax, extent)
    coded = K.delta_encode(remapped)
    pbf = PbfWriter()
    pbf.write_varint_field(1, extent)
    pbf.write_varint_field(2, size)
    pbf.write_float_field(3, vmin)
    pbf.write_float_field(4, vmax)
    pbf.write_packed_varint(5, coded)
    pbf.write_string_field(6, name)
    return pbf.commit()


@dataclass
class GridData:
    """(src/open/gridLayer.ts:7-48)."""

    name: str = "default"
    extent: int = 8192
    size: int = 0
    min: float = 0.0
    max: float = 0.0
    _data_pos: int = 0
    _pbf: PbfReader = None  # type: ignore[assignment]

    @classmethod
    def from_pbf(cls, pbf: PbfReader, end: int) -> "GridData":
        self = cls(_pbf=pbf)

        def handler(fld: int, wt: int, reader: PbfReader) -> None:
            if fld == 1:
                self.extent = reader.read_varint()
            elif fld == 2:
                self.size = reader.read_varint()
            elif fld == 3:
                self.min = reader.read_float()
            elif fld == 4:
                self.max = reader.read_float()
            elif fld == 5:
                self._data_pos = reader.pos
            elif fld == 6:
                self.name = reader.read_string()

        pbf.read_fields(handler, end)
        return self

    def data(self) -> np.ndarray:
        self._pbf.pos = self._data_pos
        words = self._pbf.read_packed_varint()
        return K.unmap_value(K.delta_decode(words.astype(np.int64)), self.min, self.max, self.extent)
