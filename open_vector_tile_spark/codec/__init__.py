"""Pure numpy/Python codec for the open-vector-tile wire format.

No Spark dependencies — this layer is imported inside Arrow UDFs on
executors and by the pytest round-trip oracles.
"""

from . import kernels  # noqa: F401
from .column_cache import ColumnCacheReader, ColumnCacheWriter, OColumn  # noqa: F401
from .feature import BaseFeature, BaseLine, OVFeature, read_feature, write_ov_feature  # noqa: F401
from .grid import GridData, write_grid_data  # noqa: F401
from .image import ImageData, write_image_data  # noqa: F401
from .layer import BaseLayer, OVLayer, write_ov_layer  # noqa: F401
from .mvt import MvtLayer, classify_rings, signed_area, write_mvt  # noqa: F401
from .pbf import PbfReader, PbfWriter, TileDecodeError  # noqa: F401
from .s2json import s2json_feature_to_base, s2json_to_base_layers  # noqa: F401
from .shape import (  # noqa: F401
    create_shape_from_data,
    decode_shape,
    decode_value,
    encode_shape,
    encode_value,
    update_shape_from_data,
    validate_types,
)
from .tile import (  # noqa: F401
    VectorTile,
    merge_tile_bytes,
    mvt_tile_to_base_layers,
    ovt_tile_to_base_layers,
    tile_to_base_layers,
    write_ov_tile,
)
