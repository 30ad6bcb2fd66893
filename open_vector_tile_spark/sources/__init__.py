from .pages import (  # noqa: F401
    grid_input,
    image_input,
    pages_pdf,
    pages_spark,
    pois_pdf,
    polygons_pdf,
)
from .tileset import OvtTilesetDataSource  # noqa: F401
