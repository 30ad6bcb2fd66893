"""Image layer codec (reference: src/open/imageLayer.ts)."""

from __future__ import annotations

from dataclasses import dataclass

from .pbf import PbfReader, PbfWriter

IMAGE_TYPES = ("png", "jpg", "webp", "gif", "avif", "svg", "bmp", "raw", "unknown")
# enum ids (src/open/imageLayer.ts:4-23): png=0 jpg=1 webp=2 gif=3 avif=4 svg=5 bmp=6 raw=7 unknown=8


def to_image_type(s: str) -> int:
    try:
        return IMAGE_TYPES.index(s)
    except ValueError:
        raise ValueError("Invalid image type") from None


def from_image_type(i: int) -> str:
    if not 0 <= i < len(IMAGE_TYPES):
        raise ValueError("Invalid image type")
    return IMAGE_TYPES[i]


def write_image_data(name: str, type: str, width: int, height: int, image: bytes) -> bytes:
    """(src/open/imageLayer.ts:94-104)."""
    pbf = PbfWriter()
    pbf.write_varint_field(1, to_image_type(type))
    pbf.write_varint_field(2, width)
    pbf.write_varint_field(3, height)
    pbf.write_bytes_field(4, image)
    pbf.write_string_field(5, name)
    return pbf.commit()


@dataclass
class ImageData:
    """(src/open/imageLayer.ts:37-73)."""

    name: str = "default"
    type: str = "png"
    width: int = 512
    height: int = 512
    _image_pos: int = 0
    _pbf: PbfReader = None  # type: ignore[assignment]

    @classmethod
    def from_pbf(cls, pbf: PbfReader, end: int) -> "ImageData":
        self = cls(_pbf=pbf)

        def handler(fld: int, wt: int, reader: PbfReader) -> None:
            if fld == 1:
                self.type = from_image_type(reader.read_varint())
            elif fld == 2:
                self.width = reader.read_varint()
            elif fld == 3:
                self.height = reader.read_varint()
            elif fld == 4:
                self._image_pos = reader.pos
            elif fld == 5:
                self.name = reader.read_string()

        pbf.read_fields(handler, end)
        return self

    def image(self) -> bytes:
        self._pbf.pos = self._image_pos
        return self._pbf.read_bytes()
