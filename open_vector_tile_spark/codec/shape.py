"""Shape (schema) and Value encode/decode.

Re-expresses the reference Shape system (reference: src/open/shape.ts:25-416).
A Shape is the per-layer schema: a dict of key -> type where type is one of
the primitive strings ('string'|'f32'|'f64'|'u64'|'i64'|'bool'|'null'),
a single-element list [T] (array type), or a nested dict (object).

Values are encoded against the layer Shape into an index stream stored in the
``shapes`` column; numbers become late-bound references into the sorted number
columns (see column_cache.NumberChunk).
"""

from __future__ import annotations

import json as _json
from typing import Any

from .column_cache import ColumnCacheReader, ColumnCacheWriter, NumberChunk, OColumn

PRIMITIVES = ("string", "f32", "f64", "u64", "i64", "bool", "null")

# primitive -> attribute column code (src/open/shape.ts:276-284)
_PRIM_TO_COL = {
    "string": OColumn.string,
    "u64": OColumn.unsigned,
    "i64": OColumn.signed,
    "f32": OColumn.float,
    "f64": OColumn.double,
    "bool": 6,
    "null": 7,
}
_COL_TO_PRIM = {v: k for k, v in _PRIM_TO_COL.items()}


def _encode_attribute(atype: int, count_or_col: int) -> int:
    """(countOrCol << 2) + type  (src/open/shape.ts:260-262)."""
    return (count_or_col << 2) + atype


def _decode_attribute(num: int) -> tuple[int, int]:
    return num & 0b11, num >> 2


def encode_shape(cache: ColumnCacheWriter, shape: dict) -> int:
    """Shape -> varint program stored in the shapes column; returns index
    (src/open/shape.ts:61-90)."""
    store: list[int] = []
    _encode_shape(shape, store, cache)
    return cache.add_column_data(OColumn.shapes, store)


def _encode_shape(shape: Any, store: list, cache: ColumnCacheWriter) -> None:
    if isinstance(shape, list):  # array type
        store.append(0)
        _encode_shape(shape[0], store, cache)
    elif isinstance(shape, dict):  # nested object
        store.append(_encode_attribute(1, len(shape)))
        for key, value in shape.items():
            store.append(cache.add_column_data(OColumn.string, key))
            _encode_shape(value, store, cache)
    else:  # primitive
        store.append(_encode_attribute(2, _PRIM_TO_COL[shape]))


def decode_shape(shape_index: int, cache: ColumnCacheReader) -> dict:
    """(src/open/shape.ts:97-128)."""
    store = list(cache.get_column(OColumn.shapes, shape_index))
    it = iter(store)
    return _decode_shape(cache, it)


def _decode_shape(cache: ColumnCacheReader, it) -> Any:
    atype, count_or_col = _decode_attribute(int(next(it, 0)))
    if atype == 0:
        return [_decode_shape(cache, it)]
    if atype == 1:
        obj = {}
        for _ in range(count_or_col):
            key = cache.get_column(OColumn.string, int(next(it, 0)))
            obj[key] = _decode_shape(cache, it)
        return obj
    return _COL_TO_PRIM[count_or_col]


def encode_value(value: dict, shape: dict, cache: ColumnCacheWriter) -> int:
    """Properties object -> value index stream in the shapes column; returns
    index (src/open/shape.ts:136-183)."""
    store: list = []
    _encode_value(value, shape, store, cache)
    return cache.add_column_data(OColumn.shapes, store)


def _encode_value(value: Any, shape: Any, store: list, cache: ColumnCacheWriter) -> None:
    if isinstance(shape, list):
        arr = value if isinstance(value, (list, tuple)) else []
        store.append(len(arr))
        for v in arr:
            _encode_value(v, shape[0], store, cache)
    elif isinstance(shape, dict):
        obj = value if isinstance(value, dict) else {}
        for key in shape:
            _encode_value(obj.get(key), shape[key], store, cache)
    else:
        # TOTAL semantics for type-mismatched values.  The reference's
        # last-write-wins shape inference (src/open/shape.ts:320-321) can pin
        # e.g. 'string' for a key whose earlier features hold numbers; its
        # writer then THROWS (columnCache.ts:291-292 'Use addNumber instead')
        # — several committed amazon/amazon_here benchmark tiles hit this,
        # which is presumably why ovtVScovt.ts runs only the bing corpus.
        # We coerce instead (str() / numeric-or-0), a deliberate robustness
        # divergence: mixed-type keys are already lossy under the inferred
        # shape, and a 100 TB pipeline cannot crash on one dirty property.
        if shape == "string":
            if value is None:
                value = ""
            elif not isinstance(value, str):
                value = _json.dumps(value, separators=(",", ":")) if isinstance(
                    value, (dict, list, tuple)
                ) else str(value)
            store.append(cache.add_string(value))
        elif shape == "u64":
            store.append(cache.add_number(_as_int(value), OColumn.unsigned))
        elif shape == "i64":
            store.append(cache.add_number(_as_int(value), OColumn.signed))
        elif shape == "f32":
            store.append(cache.add_number(_as_float(value), OColumn.float))
        elif shape == "f64":
            store.append(cache.add_number(_as_float(value), OColumn.double))
        elif shape == "bool":
            store.append(cache.add_number(1 if value else 0, OColumn.unsigned))
        # 'null' encodes nothing (shape carries it, src/open/shape.ts:224)


def _as_int(value) -> int:
    try:
        return int(value or 0)
    except (TypeError, ValueError):
        try:
            return int(float(value))
        except (TypeError, ValueError):
            return 0


def _as_float(value) -> float:
    try:
        return float(value or 0)
    except (TypeError, ValueError):
        return 0.0


def decode_value(value_index: int, shape: dict, cache: ColumnCacheReader) -> dict:
    """(src/open/shape.ts:191-241)."""
    store = list(cache.get_column(OColumn.shapes, value_index))
    it = iter(store)
    return _decode_value(it, shape, cache)


def _decode_value(it, shape: Any, cache: ColumnCacheReader) -> Any:
    if isinstance(shape, list):
        length = int(next(it, 0))
        return [_decode_value(it, shape[0], cache) for _ in range(length)]
    if isinstance(shape, dict):
        return {key: _decode_value(it, shape[key], cache) for key in shape}
    if shape == "null":
        return None
    col_value = int(next(it, 0))
    if shape == "string":
        return cache.get_column(OColumn.string, col_value)
    if shape == "bool":
        return cache.get_column(OColumn.unsigned, col_value) != 0
    if shape == "u64":
        return cache.get_column(OColumn.unsigned, col_value)
    if shape == "i64":
        return cache.get_column(OColumn.signed, col_value)
    if shape == "f32":
        return cache.get_column(OColumn.float, col_value)
    return cache.get_column(OColumn.double, col_value)  # f64


# ---------------------------------------------------------------------------
# shape inference (src/open/shape.ts:307-416)
# ---------------------------------------------------------------------------


def create_shape_from_data(rows) -> dict:
    shape: dict = {}
    for row in rows:
        update_shape_from_data(shape, row)
    return shape


def update_shape_from_data(shape: dict, data: dict) -> None:
    for k, v in data.items():
        shape[k] = _value_type(v)


def _value_type(value: Any) -> Any:
    if isinstance(value, (list, tuple)):
        types = [_value_type(v) for v in value]
        return [validate_types(types)]
    if isinstance(value, dict):
        return create_shape_from_data([value])
    return _primitive_type(value)


def _primitive_type(value: Any) -> str:
    if isinstance(value, str):
        return "string"
    if isinstance(value, bool):
        return "bool"
    if isinstance(value, int):
        return "i64" if value < 0 else "u64"
    if isinstance(value, float):
        return "u64" if value == int(value) and value >= 0 else (
            "i64" if value == int(value) else "f64"
        )
    return "null"


def _is_number(t: str) -> bool:
    return t in ("i64", "u64", "f32", "f64")


def _highest_order(a: str, b: str) -> str:
    """f64 > i64 > u64 (src/open/shape.ts:408-416)."""
    if a == "f64" or b == "f64":
        return "f64"
    if a == "i64" or b == "i64":
        return "i64"
    return "u64"


def validate_types(types: list) -> Any:
    """All same, with numeric widening (src/open/shape.ts:370-392)."""
    if not types:
        raise ValueError("empty type list")
    if isinstance(types[0], str):
        base = types[0]
        base_is_num = _is_number(base)
        for t in types:
            if t != base:
                if isinstance(t, str) and _is_number(t) and base_is_num:
                    base = _highest_order(base, t)
                else:
                    raise ValueError("All types must be the same")
        return base
    ok = all(
        type(t) is type(types[0]) and isinstance(t, list) == isinstance(types[0], list)
        for t in types
    )
    if not ok:
        raise ValueError("All types must be the same")
    return types[0]
