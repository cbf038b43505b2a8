from sugar_tpu.raster.common import RasterSettings  # noqa: F401
from sugar_tpu.raster.api import rasterize_gaussians  # noqa: F401
