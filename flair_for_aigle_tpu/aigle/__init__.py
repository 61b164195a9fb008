# Aigle production orchestration: CLI config merge, S3 data plumbing
# (gated), zonal run driver, class mapping, PostGIS/GPKG export.
