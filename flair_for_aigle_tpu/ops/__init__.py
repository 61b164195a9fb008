from flair_for_aigle_tpu.ops.resize import (
    interpolate,
    resize_bilinear_nhwc,
    resize_nearest_nhwc,
    zoom_nearest,
)

__all__ = [
    "interpolate",
    "resize_bilinear_nhwc",
    "resize_nearest_nhwc",
    "zoom_nearest",
]
