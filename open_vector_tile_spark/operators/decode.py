"""Table-level tile scan: tiles table -> feature rows (S1/P1-P5 at scale).

The reference reads one tile lazily (position references, memoized columns —
src/vectorTile.ts:92-132, src/open/columnCache.ts:104-177); at table scale
the same economy comes from (a) Catalyst column pruning feeding the decoder
a ``layers`` request so non-requested layers are never touched inside the
blob (SURVEY §4 R1), and (b) Arrow-batched ``mapInPandas`` so tile bytes
never become JVM row objects.
"""

from __future__ import annotations

import json
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame

from ..codec import VectorTile
from ..codec.layer import OVLayer

DECODED_SCHEMA = (
    "zoom int, tile_x long, tile_y long, layer string, feature_index int, "
    "id long, ftype int, n_vertices int, geom_xy array<int>, props_json string"
)


def decode_tiles(
    tiles: DataFrame,
    layers: Optional[list[str]] = None,
) -> DataFrame:
    """tiles(zoom, tile_x, tile_y, tile) -> exploded feature rows.

    ``layers`` prunes decoding to the requested layer names: other layers'
    features are never parsed (the codec's lazy position references mean
    skipping a layer costs only its header scan).
    """
    want = set(layers) if layers else None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for _, row in pdf.iterrows():
                parsed = VectorTile(bytes(row["tile"]))
                for lname, layer in parsed.layers.items():
                    if want is not None and lname not in want:
                        continue
                    if not isinstance(layer, OVLayer):
                        continue
                    for i in range(len(layer)):
                        f = layer.feature(i)
                        pts = f.load_points()
                        flat = [int(c) for p in pts for c in p]
                        out.append(
                            (
                                int(row["zoom"]),
                                int(row["tile_x"]),
                                int(row["tile_y"]),
                                lname,
                                i,
                                f.id,
                                f.ftype,
                                len(pts),
                                flat,
                                json.dumps(f.properties, default=str),
                            )
                        )
            yield pd.DataFrame(
                out,
                columns=[
                    "zoom", "tile_x", "tile_y", "layer", "feature_index",
                    "id", "ftype", "n_vertices", "geom_xy", "props_json",
                ],
            )

    return tiles.mapInPandas(run, DECODED_SCHEMA)
