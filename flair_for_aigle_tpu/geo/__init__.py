# Geospatial substrate: affine transforms/windows, native GeoTIFF IO
# (libtiff via C++), GEOS geometry (ctypes), CRS transforms (libproj via
# ctypes), GeoPackage IO (sqlite3), raster polygonization.
