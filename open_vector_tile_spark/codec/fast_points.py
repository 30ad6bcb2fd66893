"""Vectorized bulk encoder for the dominant tile shape: ONE layer of 2D
single-point features with a flat pinned Shape.

Byte-for-byte identical to the generic writer path (tile.write_ov_tile over
BaseLayer/BaseFeature) — asserted by randomized equivalence tests — but
assembled with numpy/pandas column operations instead of per-feature Python:
~10-30x faster per tile at web scale where pages-as-points is the payload.

Replicated ordering contracts (reference: src/open/vectorLayer.ts:128-143,
src/open/vectorFeature.ts:697-742, src/open/columnCache.ts:369-436):
- string column: insertion order = layer name, shape keys, then per-feature
  values in shape-key order (first occurrence wins)
- shapes column: shape program, mShape program, then value stores in first
  occurrence order (dedup by full index tuple incl. number-column identity)
- number columns: insertion keyed, finally sorted by (use-count desc, value
  asc); value stores carry the POST-sort indices (two-phase assignment)
- feature flags: single-point inline weave fast path (flag bit 6), id bit 0
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np
import pandas as pd

from . import kernels as K
from .pbf import PbfWriter, pack_varints
from .shape import _PRIM_TO_COL  # shared primitive->column mapping
from .column_cache import OColumn

_FLAT_PRIMS = {"string", "u64", "i64", "f64", "f32", "bool"}


def eligible_shape(shape: Optional[dict]) -> bool:
    return shape is not None and all(
        isinstance(t, str) and t in _FLAT_PRIMS for t in shape.values()
    )


def _varint_sizes(vals: np.ndarray) -> np.ndarray:
    """LEB128 byte length per uint64 value (vectorized)."""
    v = vals.astype(np.uint64)
    sizes = np.ones(v.shape, dtype=np.int64)
    v = v >> np.uint64(7)
    while v.any():
        sizes += (v != 0).astype(np.int64)
        v >>= np.uint64(7)
    return sizes


def encode_point_layer_tile(
    layer_name: str,
    extent: int,
    shape: dict,
    prop_arrays: dict,
    qx: np.ndarray,
    qy: np.ndarray,
    ids: Optional[np.ndarray] = None,
) -> bytes:
    """-> full tile bytes (layer message + column cache message)."""
    n = len(qx)
    keys = list(shape)

    # ---- string column (insertion order) --------------------------------
    # call order: layer name, shape keys, then per-feature string values in
    # shape-key order; factorize over the exact sequence keeps first-occur order
    string_parts: list[np.ndarray] = [np.array([layer_name] + keys, dtype=object)]
    string_cols = [k for k in keys if shape[k] == "string"]
    if string_cols:
        # per-feature interleaved in shape order: stack columns then ravel rows
        mat = np.empty((n, len(string_cols)), dtype=object)
        for j, k in enumerate(string_cols):
            col = prop_arrays[k]
            mat[:, j] = np.where(pd.isna(col), "", col.astype(object))
        string_parts.append(mat.ravel())
    all_strings = np.concatenate(string_parts)
    str_codes, str_uniques = pd.factorize(all_strings)
    # indices for per-feature string values
    pos = len(string_parts[0])
    str_value_idx: dict[str, np.ndarray] = {}
    if string_cols:
        codes = str_codes[pos:].reshape(n, len(string_cols))
        for j, k in enumerate(string_cols):
            str_value_idx[k] = codes[:, j]
    name_idx = int(str_codes[0])
    key_idx = {k: int(str_codes[1 + i]) for i, k in enumerate(keys)}

    # ---- number columns (two-phase index assignment) ---------------------
    # insertion-order first-occurrence + reuse counts, then sort by
    # (count desc, value asc) and remap to final indices
    num_final_idx: dict[str, np.ndarray] = {}
    num_sorted_values: dict[int, np.ndarray] = {}
    by_col: dict[int, list[str]] = {}
    for k in keys:
        t = shape[k]
        if t == "string":
            continue
        col_id = OColumn.unsigned if t in ("u64", "bool") else _PRIM_TO_COL[t]
        by_col.setdefault(col_id, []).append(k)
    for col_id, knames in by_col.items():
        seq_parts = []
        for k in knames:
            arr = prop_arrays[k]
            if shape[k] == "bool":
                vals = np.where(pd.isna(arr), 0, arr.astype(object)).astype(np.int64)
                vals = (vals != 0).astype(np.int64)
            elif shape[k] in ("u64", "i64"):
                vals = np.where(pd.isna(arr), 0, arr).astype(np.int64)
            else:
                # NOTE: f32 dedups on the raw double (generic add_number keys
                # pre-truncation); truncation happens only at write time
                vals = np.where(pd.isna(arr), 0.0, arr).astype(np.float64)
            seq_parts.append(vals)
        # interleave per feature in key order to match the generic call order
        seq = np.stack(seq_parts, axis=1).ravel()
        codes, uniques = pd.factorize(seq)  # first-occurrence order (= insertion)
        counts = np.bincount(codes)
        order = np.lexsort((uniques, -counts))  # count desc, value asc
        final_of_insert = np.empty(len(uniques), dtype=np.int64)
        final_of_insert[order] = np.arange(len(uniques))
        codes2 = codes.reshape(n, len(knames))
        for j, k in enumerate(knames):
            num_final_idx[k] = final_of_insert[codes2[:, j]]
        num_sorted_values[col_id] = uniques[order]

    # ---- shapes column ----------------------------------------------------
    # entry 0: shape program; entry 1: mShape {} program; then value stores
    shape_prog = [(len(keys) << 2) | 1]
    for k in keys:
        shape_prog.append(key_idx[k])
        shape_prog.append((_PRIM_TO_COL[shape[k]] << 2) | 2)
    mshape_prog = [1]  # empty object: (0<<2)|1
    # identical programs dedup to ONE shapes entry (generic add_column_data
    # keys by content) — happens exactly when shape == {}
    progs_dedup = shape_prog == mshape_prog
    mshape_idx = 0 if progs_dedup else 1
    store_base = 1 if progs_dedup else 2

    # per-feature value store = tuple of per-key indices; dedup keyed on
    # (col-identity, value-identity) per slot — distinct column spaces can
    # share an int index without colliding, so fold col id into the key
    slot_key_cols = []
    slot_written_cols = []
    for k in keys:
        if shape[k] == "string":
            kk = str_value_idx[k].astype(np.int64)
            slot_key_cols.append(kk)  # string idx is identity AND written val
            slot_written_cols.append(kk)
        else:
            written = num_final_idx[k]
            # identity pre-sort is the value itself; (col,val) pairs are what
            # the generic path keys on — use written idx + col tag (bijective
            # with (col,value) after sorting)
            col_id = OColumn.unsigned if shape[k] in ("u64", "bool") else _PRIM_TO_COL[shape[k]]
            slot_key_cols.append(written.astype(np.int64) | (np.int64(col_id) << 56))
            slot_written_cols.append(written.astype(np.int64))
    if slot_key_cols:
        key_mat = np.stack(slot_key_cols, axis=1)
        # row-wise exact dedup, first-occurrence order (np.unique sorts, so
        # re-rank unique ids by their first appearance)
        _, first, inverse = np.unique(key_mat, axis=0, return_index=True, return_inverse=True)
        occ_order = np.argsort(first, kind="stable")
        rank = np.empty(len(first), dtype=np.int64)
        rank[occ_order] = np.arange(len(first))
        feature_value_idx = rank[inverse] + store_base  # after the shape program entries
        written_mat = np.stack(slot_written_cols, axis=1)
        unique_stores = list(written_mat[first[occ_order]])
    else:
        feature_value_idx = np.zeros(n, dtype=np.int64) + store_base
        unique_stores = [np.empty(0, dtype=np.int64)]

    # ---- feature blobs ----------------------------------------------------
    geom_words = K.weave2d(K.zigzag(qx.astype(np.int64)), K.zigzag(qy.astype(np.int64)))
    has_id = ids is not None
    flags = np.int64((1 if has_id else 0) | (1 << 6))
    field_cols = [np.full(n, 1, dtype=np.uint64), np.full(n, np.uint64(flags))]
    if has_id:
        field_cols.append(ids.astype(np.uint64))
    field_cols.append(feature_value_idx.astype(np.uint64))
    field_cols.append(geom_words.astype(np.uint64))
    fields = np.stack(field_cols, axis=1)  # (n, 4|5)
    sizes = _varint_sizes(fields)
    blob_lens = sizes.sum(axis=1)
    # header per feature: tag byte 0x22 (field 4, wire 2) + varint(blob_len)
    header_lens = 1 + _varint_sizes(blob_lens)
    # serialize: interleave [tag, len, fields...] per feature via one packed
    # varint stream with the tag handled as a 1-byte varint (0x22 < 0x80)
    stream = np.concatenate(
        [
            np.full((n, 1), 0x22, dtype=np.uint64),
            blob_lens.astype(np.uint64)[:, None],
            fields,
        ],
        axis=1,
    ).ravel()
    features_bytes = pack_varints(stream)

    # ---- layer message ----------------------------------------------------
    layer = PbfWriter()
    layer.write_varint_field(1, 1)  # version
    layer.write_varint_field(2, name_idx)
    layer.write_varint_field(3, K.encode_extent(extent))
    layer.write_varint_field(5, 0)  # shape program index
    layer.write_varint_field(6, mshape_idx)
    layer.buf += features_bytes
    layer_body = layer.commit()

    # ---- column cache message ---------------------------------------------
    cache = PbfWriter()
    for s in str_uniques:
        cache.write_string_field(OColumn.string, str(s))
    for col_id in (OColumn.unsigned, OColumn.signed, OColumn.float, OColumn.double):
        vals = num_sorted_values.get(col_id)
        if vals is None:
            continue
        if col_id == OColumn.unsigned:
            for v in vals.tolist():
                cache.write_varint_field(col_id, int(v))
        elif col_id == OColumn.signed:
            for v in vals.tolist():
                cache.write_svarint_field(col_id, int(v))
        elif col_id == OColumn.float:
            for v in vals.tolist():
                cache._tag(col_id, 5)
                cache.buf += struct.pack("<f", v)
        else:
            for v in vals.tolist():
                cache._tag(col_id, 1)
                cache.buf += struct.pack("<d", v)
    cache.write_packed_varint(OColumn.shapes, shape_prog)
    if not progs_dedup:
        cache.write_packed_varint(OColumn.shapes, mshape_prog)
    for store in unique_stores:
        cache.write_packed_varint(OColumn.shapes, store)
    cache_body = cache.commit()

    out = PbfWriter()
    out.write_message(4, layer_body)
    out.write_message(5, cache_body)
    return out.commit()



# ---------------------------------------------------------------------------
# cross-tile bulk encoder
# ---------------------------------------------------------------------------
#
# The single-tile encoder above pays ~90us of numpy fixed cost per tile —
# ruinous in the z10+ regime where millions of tiles hold a handful of
# features each.  This variant encodes EVERY tile of a tile-sorted batch in
# one vectorized pass.  Core device: with rows sorted by tile, factorizing
# the pair (tile_id, value) assigns group ids in first-occurrence order, and
# because tiles are contiguous each tile's group ids occupy a contiguous
# range — so the WITHIN-tile insertion index is `pair_code - base[tile]`
# where base[t] = cumulative unique count of earlier tiles.  No per-row
# Python anywhere; the only per-tile loop does byte-slice concatenation.
# Byte-identity with the single-tile path (and hence the generic writer) is
# asserted by randomized equivalence tests.


def _tile_base(tid_of_unique: np.ndarray, n_tiles: int) -> np.ndarray:
    """base[t] = number of uniques belonging to tiles < t."""
    per_tile = np.bincount(tid_of_unique, minlength=n_tiles)
    base = np.zeros(n_tiles, dtype=np.int64)
    np.cumsum(per_tile[:-1], out=base[1:])
    return base


def _split_bytes(packed: bytes, unit_sizes: np.ndarray, unit_tid: np.ndarray, n_tiles: int):
    """One packed blob covering units in tile order -> per-tile memoryviews."""
    per_tile = np.bincount(
        unit_tid, weights=unit_sizes.astype(np.float64), minlength=n_tiles
    ).astype(np.int64)
    ends = np.cumsum(per_tile)
    starts = ends - per_tile
    mv = memoryview(packed)
    return [mv[s:e] for s, e in zip(starts.tolist(), ends.tolist())]


def _pair_codes(tid: np.ndarray, gcodes: np.ndarray, n_glob: int):
    """(tile, global-code) pairs -> first-occurrence group ids + metadata.

    Returns (pcodes, first_pos) where pcodes are contiguous per tile."""
    pair = tid * np.int64(max(n_glob, 1)) + gcodes
    pcodes, _ = pd.factorize(pair)
    first_pos = np.unique(pcodes, return_index=True)[1]
    return pcodes, first_pos


def encode_point_layer_tiles_bulk(
    layer_name: str,
    extent: int,
    shape: dict,
    prop_arrays: dict,
    qx: np.ndarray,
    qy: np.ndarray,
    counts: np.ndarray,
    ids: Optional[np.ndarray] = None,
) -> list:
    """Encode ALL tiles of a tile-sorted batch in one numpy pass.

    ``counts[t]`` = rows of tile t (rows contiguous per tile, t ascending in
    row order).  Returns a list of tile byte strings, each byte-identical to
    :func:`encode_point_layer_tile` / the generic writer on the same rows.
    """
    n = len(qx)
    keys = list(shape)
    counts = np.asarray(counts, dtype=np.int64)
    n_tiles = len(counts)
    row_tid = np.repeat(np.arange(n_tiles, dtype=np.int64), counts)

    # ---- string column ----------------------------------------------------
    # per-tile sequence = [layer_name, *keys, row-major feature values]; the
    # prefix is identical for every tile, so its within-tile codes are too
    prefix = np.array([layer_name] + keys, dtype=object)
    prefix_codes, prefix_uniq = pd.factorize(prefix)
    p = len(prefix_uniq)
    name_idx = int(prefix_codes[0])  # always 0: layer name leads the column
    key_idx = {k: int(prefix_codes[1 + i]) for i, k in enumerate(keys)}
    string_cols = [k for k in keys if shape[k] == "string"]
    str_value_idx: dict[str, np.ndarray] = {}
    extras_gid = np.empty(0, dtype=np.int64)
    extras_tid = np.empty(0, dtype=np.int64)
    guniq = prefix_uniq
    if string_cols and n:
        mat = np.empty((n, len(string_cols)), dtype=object)
        for j, k in enumerate(string_cols):
            col = prop_arrays[k]
            mat[:, j] = np.where(pd.isna(col), "", col.astype(object))
        vals = mat.ravel()
        gcodes_all, guniq = pd.factorize(np.concatenate([prefix_uniq, vals]))
        gv = gcodes_all[p:]  # global ids; ids < p are prefix strings
        vtid = np.repeat(row_tid, len(string_cols))
        fresh = gv >= p
        within = np.empty(len(gv), dtype=np.int64)
        within[~fresh] = gv[~fresh]
        if fresh.any():
            ftid = vtid[fresh]
            pcodes, first_pos = _pair_codes(ftid, gv[fresh], len(guniq))
            extras_tid = ftid[first_pos]
            extras_gid = gv[fresh][first_pos]
            base = _tile_base(extras_tid, n_tiles)
            within[fresh] = p + (pcodes - base[ftid])
        codes2 = within.reshape(n, len(string_cols))
        for j, k in enumerate(string_cols):
            str_value_idx[k] = codes2[:, j]

    # per-tile string cache bytes: shared prefix block + tile's extra uniques
    def _enc_str(s) -> bytes:
        w = PbfWriter()
        w.write_string_field(OColumn.string, str(s))
        return w.commit()

    prefix_block = b"".join(_enc_str(s) for s in prefix_uniq)
    enc_cache: dict[int, bytes] = {}
    extras_enc = []
    for g in extras_gid.tolist():
        b = enc_cache.get(g)
        if b is None:
            b = enc_cache[g] = _enc_str(guniq[g])
        extras_enc.append(b)
    extras_per_tile = np.bincount(extras_tid, minlength=n_tiles).tolist()
    str_bytes: list[bytes] = []
    pos = 0
    for t in range(n_tiles):
        cnt = extras_per_tile[t]
        str_bytes.append(prefix_block + b"".join(extras_enc[pos : pos + cnt]))
        pos += cnt

    # ---- number columns (per-tile two-phase index assignment) -------------
    num_final_idx: dict[str, np.ndarray] = {}
    num_bytes_by_col: dict[int, list] = {}
    by_col: dict[int, list[str]] = {}
    for k in keys:
        t = shape[k]
        if t == "string":
            continue
        col_id = OColumn.unsigned if t in ("u64", "bool") else _PRIM_TO_COL[t]
        by_col.setdefault(col_id, []).append(k)
    for col_id, knames in by_col.items():
        seq_parts = []
        for k in knames:
            arr = prop_arrays[k]
            if shape[k] == "bool":
                v = np.where(pd.isna(arr), 0, arr.astype(object)).astype(np.int64)
                v = (v != 0).astype(np.int64)
            elif shape[k] in ("u64", "i64"):
                v = np.where(pd.isna(arr), 0, arr).astype(np.int64)
            else:
                # f32 dedups on the raw double; truncation only at write time
                v = np.where(pd.isna(arr), 0.0, arr).astype(np.float64)
            seq_parts.append(v)
        seq = np.stack(seq_parts, axis=1).ravel()
        stid = np.repeat(row_tid, len(knames))
        gcodes, guniq_n = pd.factorize(seq)
        pcodes, first_pos = _pair_codes(stid, gcodes, len(guniq_n))
        cnts = np.bincount(pcodes)
        tid_u = stid[first_pos]
        val_u = seq[first_pos]
        base = _tile_base(tid_u, n_tiles)
        order = np.lexsort((val_u, -cnts, tid_u))  # tile, count desc, value asc
        tid_sorted = tid_u[order]
        rank_in_tile = np.arange(len(order), dtype=np.int64) - base[tid_sorted]
        final_of_insert = np.empty(len(order), dtype=np.int64)
        final_of_insert[order] = rank_in_tile
        codes2 = final_of_insert[pcodes].reshape(n, len(knames))
        for j, k in enumerate(knames):
            num_final_idx[k] = codes2[:, j]
        vals_sorted = val_u[order]
        # per-tile cache bytes for this column
        if col_id in (OColumn.unsigned, OColumn.signed):
            if col_id == OColumn.signed:
                iv = vals_sorted.astype(np.int64)
                wire = ((iv << np.int64(1)) ^ (iv >> np.int64(63))).astype(np.uint64)
            else:
                wire = vals_sorted.astype(np.uint64)
            stream = np.stack(
                [np.full(len(order), np.uint64(col_id << 3), dtype=np.uint64), wire],
                axis=1,
            )
            sizes = _varint_sizes(stream).sum(axis=1)
            packed = pack_varints(stream.ravel())
            num_bytes_by_col[col_id] = _split_bytes(packed, sizes, tid_sorted, n_tiles)
        else:
            if col_id == OColumn.float:
                tag, width, dt = (OColumn.float << 3) | 5, 5, "<f4"
            else:
                tag, width, dt = (OColumn.double << 3) | 1, 9, "<f8"
            k_u = len(order)
            buf = np.empty((k_u, width), dtype=np.uint8)
            buf[:, 0] = tag
            buf[:, 1:] = (
                vals_sorted.astype(dt).view(np.uint8).reshape(k_u, width - 1)
            )
            packed = buf.tobytes()
            sizes = np.full(k_u, width, dtype=np.int64)
            num_bytes_by_col[col_id] = _split_bytes(packed, sizes, tid_sorted, n_tiles)

    # ---- shapes column ------------------------------------------------------
    shape_prog = [(len(keys) << 2) | 1]
    for k in keys:
        shape_prog.append(key_idx[k])
        shape_prog.append((_PRIM_TO_COL[shape[k]] << 2) | 2)
    mshape_prog = [1]
    progs_dedup = shape_prog == mshape_prog
    mshape_idx = 0 if progs_dedup else 1
    store_base = 1 if progs_dedup else 2
    shapes_head = PbfWriter()
    shapes_head.write_packed_varint(OColumn.shapes, shape_prog)
    if not progs_dedup:
        shapes_head.write_packed_varint(OColumn.shapes, mshape_prog)
    shapes_head_bytes = shapes_head.commit()

    # per-feature value stores: dedup rows of (tile, per-slot identity)
    slot_key_cols = []
    slot_written_cols = []
    for k in keys:
        if shape[k] == "string":
            kk = str_value_idx[k].astype(np.int64)
            slot_key_cols.append(kk)
            slot_written_cols.append(kk)
        else:
            written = num_final_idx[k]
            col_id = OColumn.unsigned if shape[k] in ("u64", "bool") else _PRIM_TO_COL[shape[k]]
            slot_key_cols.append(written.astype(np.int64) | (np.int64(col_id) << 56))
            slot_written_cols.append(written.astype(np.int64))
    code = row_tid
    for colv in slot_key_cols:
        gc, gu = pd.factorize(colv)
        comb = code * np.int64(len(gu)) + gc
        code, _ = pd.factorize(comb)
    # `code` is already contiguous per tile (tid seeds the fold)
    first_pos = np.unique(code, return_index=True)[1]
    store_tid = row_tid[first_pos]
    base = _tile_base(store_tid, n_tiles)
    feature_value_idx = (code - base[row_tid]) + store_base
    if slot_written_cols:
        written_mat = np.stack(slot_written_cols, axis=1)[first_pos].astype(np.uint64)
    else:
        written_mat = np.zeros((len(first_pos), 0), dtype=np.uint64)
    # store stream rows: [tag, payload_bytelen, values...]
    k_s = len(first_pos)
    payload_sizes = (
        _varint_sizes(written_mat).sum(axis=1) if written_mat.size else np.zeros(k_s, dtype=np.int64)
    )
    store_stream = np.concatenate(
        [
            np.full((k_s, 1), np.uint64((OColumn.shapes << 3) | 2), dtype=np.uint64),
            payload_sizes.astype(np.uint64)[:, None],
            written_mat,
        ],
        axis=1,
    )
    store_sizes = _varint_sizes(store_stream).sum(axis=1)
    store_packed = pack_varints(store_stream.ravel())
    store_bytes = _split_bytes(store_packed, store_sizes, store_tid, n_tiles)

    # ---- feature blobs ------------------------------------------------------
    geom_words = K.weave2d(K.zigzag(qx.astype(np.int64)), K.zigzag(qy.astype(np.int64)))
    has_id = ids is not None
    flags = np.int64((1 if has_id else 0) | (1 << 6))
    field_cols = [np.full(n, 1, dtype=np.uint64), np.full(n, np.uint64(flags))]
    if has_id:
        field_cols.append(ids.astype(np.uint64))
    field_cols.append(feature_value_idx.astype(np.uint64))
    field_cols.append(geom_words.astype(np.uint64))
    fields = np.stack(field_cols, axis=1)
    sizes = _varint_sizes(fields)
    blob_lens = sizes.sum(axis=1)
    feat_stream = np.concatenate(
        [
            np.full((n, 1), 0x22, dtype=np.uint64),
            blob_lens.astype(np.uint64)[:, None],
            fields,
        ],
        axis=1,
    )
    feat_sizes = 1 + _varint_sizes(blob_lens) + blob_lens
    feat_packed = pack_varints(feat_stream.ravel())
    feat_bytes = _split_bytes(feat_packed, feat_sizes, row_tid, n_tiles)

    # ---- assembly (per-tile loop does only slicing + joins) ----------------
    head = PbfWriter()
    head.write_varint_field(1, 1)
    head.write_varint_field(2, name_idx)
    head.write_varint_field(3, K.encode_extent(extent))
    head.write_varint_field(5, 0)
    head.write_varint_field(6, mshape_idx)
    layer_head = head.commit()

    out: list[bytes] = []
    empty = num_bytes_by_col  # alias for line-length
    unsigned_b = empty.get(OColumn.unsigned)
    signed_b = empty.get(OColumn.signed)
    float_b = empty.get(OColumn.float)
    double_b = empty.get(OColumn.double)
    for t in range(n_tiles):
        layer_body = layer_head + feat_bytes[t]
        cache_parts = [str_bytes[t]]
        if unsigned_b is not None:
            cache_parts.append(unsigned_b[t])
        if signed_b is not None:
            cache_parts.append(signed_b[t])
        if float_b is not None:
            cache_parts.append(float_b[t])
        if double_b is not None:
            cache_parts.append(double_b[t])
        cache_parts.append(shapes_head_bytes)
        cache_parts.append(store_bytes[t])
        cache_body = b"".join(cache_parts)
        w = PbfWriter()
        w.write_message(4, layer_body)
        w.write_message(5, cache_body)
        out.append(w.commit())
    return out
