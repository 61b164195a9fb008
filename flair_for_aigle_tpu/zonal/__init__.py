# Zonal (sliding-window) inference engine: overlap tiler, multimodal
# windowed dataset, batched device inference with on-device stitching,
# georeferenced raster outputs, polygonization.
