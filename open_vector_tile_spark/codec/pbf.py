"""Minimal protobuf wire codec (writer + reader) used by the tile codecs.

Wire-compatible with the ``pbf-ts`` / ``mapbox/pbf`` conventions the reference
library uses (reference: /root/reference/src/open/columnCache.ts:183-214 reads,
/root/reference/src/vectorTile.ts:148-185 writes).  Pure Python for the framing
layer (headers are tiny); bulk packed-varint arrays go through the vectorized
numpy paths in :mod:`open_vector_tile_spark.codec.kernels`.

Wire types: 0 = varint, 1 = 64-bit (double), 2 = length-delimited
(bytes/string/message/packed), 5 = 32-bit (float).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "PbfWriter",
    "PbfReader",
    "TileDecodeError",
    "write_varint",
    "read_varint",
    "zigzag64",
    "zagzig64",
]

_MASK64 = (1 << 64) - 1


class TileDecodeError(ValueError):
    """A tile buffer is truncated or structurally invalid.

    The operational error type: at fleet scale a handful of corrupt blobs
    (torn object-store writes, bitrot) must be skippable per-row
    (``decode_tiles(on_error="skip")``) instead of failing a multi-hour job
    with a bare IndexError from the framing layer."""


def zigzag64(n: int) -> int:
    """64-bit zigzag encode (sint wire format)."""
    return ((n << 1) ^ (n >> 63)) & _MASK64


def zagzig64(n: int) -> int:
    """64-bit zigzag decode."""
    return (n >> 1) ^ -(n & 1)


def write_varint(out: bytearray, value: int) -> None:
    """Append an unsigned LEB128 varint. Negative ints are written as their
    64-bit two's complement (protobuf convention)."""
    if 0 <= value < 0x80:  # 1-byte fast path (the overwhelmingly common case)
        out.append(value)
        return
    value &= _MASK64
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """Read an unsigned varint at ``pos``; returns (value, new_pos)."""
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


class PbfWriter:
    """Append-only protobuf writer mirroring the ``Pbf`` writer API surface
    the reference uses (writeVarintField/writeMessage/commit...)."""

    __slots__ = ("buf",)

    def __init__(self) -> None:
        self.buf = bytearray()

    # -- raw --------------------------------------------------------------
    def write_varint(self, value: int) -> None:
        write_varint(self.buf, value)

    def write_svarint(self, value: int) -> None:
        write_varint(self.buf, zigzag64(value))

    def _tag(self, field: int, wire_type: int) -> None:
        write_varint(self.buf, (field << 3) | wire_type)

    # -- fields -----------------------------------------------------------
    def write_varint_field(self, field: int, value: int) -> None:
        self._tag(field, 0)
        self.write_varint(value)

    def write_svarint_field(self, field: int, value: int) -> None:
        self._tag(field, 0)
        self.write_svarint(value)

    def write_boolean_field(self, field: int, value: bool) -> None:
        self.write_varint_field(field, 1 if value else 0)

    def write_float_field(self, field: int, value: float) -> None:
        self._tag(field, 5)
        self.buf += struct.pack("<f", value)

    def write_double_field(self, field: int, value: float) -> None:
        self._tag(field, 1)
        self.buf += struct.pack("<d", value)

    def write_string_field(self, field: int, value: str) -> None:
        self.write_bytes_field(field, value.encode("utf-8"))

    def write_bytes_field(self, field: int, value: bytes | bytearray | memoryview) -> None:
        self._tag(field, 2)
        self.write_varint(len(value))
        self.buf += value

    def write_packed_varint(self, field: int, values) -> None:
        """Length-delimited packed varints.  Always written, even when empty,
        so column indices stay aligned with field occurrence counts
        (reference reader counts fields: columnCache.ts:221-226)."""
        body = pack_varints(values)
        self._tag(field, 2)
        self.write_varint(len(body))
        self.buf += body

    def write_message(self, field: int, body: bytes | bytearray) -> None:
        self.write_bytes_field(field, body)

    def commit(self) -> bytes:
        return bytes(self.buf)


def pack_varints(values) -> bytes:
    """Vectorized LEB128 pack of a sequence of non-negative ints (uint64).

    numpy path: compute per-element byte counts, then scatter each byte
    position in one masked vector op — no per-element Python loop.
    """
    arr = np.asarray(values, dtype=np.uint64)
    n = arr.size
    if n == 0:
        return b""
    if n < 16:  # tiny arrays: plain loop is faster than vector setup
        out = bytearray()
        for v in arr.tolist():
            write_varint(out, int(v))
        return bytes(out)
    # bits needed -> varint byte length (1..10); uint64 here so max 10
    nbytes = np.ones(n, dtype=np.int64)
    v = arr.copy()
    v >>= np.uint64(7)
    while v.any():
        nbytes += (v != 0).astype(np.int64)
        v >>= np.uint64(7)
    ends = np.cumsum(nbytes)
    total = int(ends[-1])
    starts = ends - nbytes
    out = np.empty(total, dtype=np.uint8)
    maxb = int(nbytes.max())
    for j in range(maxb):
        mask = nbytes > j
        vals = (arr[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1 > j).astype(np.uint8) << 7
        out[starts[mask] + j] = vals.astype(np.uint8) | cont
    return out.tobytes()


def unpack_varints(buf: bytes | memoryview) -> np.ndarray:
    """Vectorized LEB128 unpack of a packed-varint body -> uint64 array."""
    data = np.frombuffer(buf, dtype=np.uint8)
    if data.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_term = (data & 0x80) == 0  # last byte of each varint
    # element id for every byte: number of terminators strictly before it
    elem = np.zeros(data.size, dtype=np.int64)
    np.cumsum(is_term[:-1], out=elem[1:])
    n = int(is_term.sum())
    starts = np.zeros(n, dtype=np.int64)
    term_pos = np.flatnonzero(is_term)
    starts[1:] = term_pos[:-1] + 1
    pos_in_elem = np.arange(data.size, dtype=np.int64) - starts[elem]
    contrib = (data.astype(np.uint64) & np.uint64(0x7F)) << (
        np.uint64(7) * pos_in_elem.astype(np.uint64)
    )
    out = np.zeros(n, dtype=np.uint64)
    np.add.at(out, elem, contrib)
    return out


class PbfReader:
    """Protobuf reader with the same navigation surface the reference uses:
    ``read_fields`` dispatch, positional lazy reads (pos save/restore)."""

    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0) -> None:
        self.buf = buf
        self.pos = pos

    def read_varint(self) -> int:
        v, self.pos = read_varint(self.buf, self.pos)
        return v

    def read_svarint(self) -> int:
        return zagzig64(self.read_varint())

    def read_boolean(self) -> bool:
        return self.read_varint() != 0

    def read_float(self) -> float:
        v = struct.unpack_from("<f", self.buf, self.pos)[0]
        self.pos += 4
        return v

    def read_double(self) -> float:
        v = struct.unpack_from("<d", self.buf, self.pos)[0]
        self.pos += 8
        return v

    def read_bytes(self) -> bytes:
        ln = self.read_varint()
        out = self.buf[self.pos : self.pos + ln]
        self.pos += ln
        return out

    def read_string(self) -> str:
        return self.read_bytes().decode("utf-8")

    def read_packed_varint(self) -> np.ndarray:
        return unpack_varints(self.read_bytes())

    def skip(self, wire_type: int) -> None:
        if wire_type == 0:
            self.read_varint()
        elif wire_type == 1:
            self.pos += 8
        elif wire_type == 2:
            ln = self.read_varint()
            self.pos += ln
        elif wire_type == 5:
            self.pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire_type}")

    def read_fields(self, handler, end: int = 0) -> None:
        """Call ``handler(field, wire_type, reader)`` for each field until
        ``end`` (0 = end of buffer). Handler may consume the value; if the
        position didn't move, the field is skipped."""
        if end == 0:
            end = len(self.buf)
        while self.pos < end:
            key = self.read_varint()
            field, wire_type = key >> 3, key & 0x7
            before = self.pos
            handler(field, wire_type, self)
            if self.pos == before:
                self.skip(wire_type)
