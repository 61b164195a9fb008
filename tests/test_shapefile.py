"""First-party ESRI Shapefile IO (geo/shapefile.py): round-trip and the
geozone-cache path that the reference serves from a .shp via geopandas
(reference flair_zonal_detection/inference.py:233-244)."""

import numpy as np
import pytest

from flair_for_aigle_tpu.geo import geos
from flair_for_aigle_tpu.geo.shapefile import (
    read_shapefile,
    write_shapefile,
)


def _square(x0, y0, s):
    return [(x0, y0), (x0 + s, y0), (x0 + s, y0 + s), (x0, y0 + s), (x0, y0)]


def test_roundtrip_polygons_attrs_crs(tmp_path):
    recs = [
        {"geometry": geos.polygon(_square(0, 0, 10)),
         "iso_code": "29019", "name": "Brest"},
        {"geometry": geos.polygon(_square(100, 100, 20),
                                  [_square(105, 105, 4)]),
         "iso_code": "35238", "name": "Rennes"},
    ]
    path = str(tmp_path / "zones.shp")
    write_shapefile(path, recs, crs="EPSG:2154")
    got, crs = read_shapefile(path)
    assert crs == "EPSG:2154"
    assert [r["iso_code"] for r in got] == ["29019", "35238"]
    assert [r["name"] for r in got] == ["Brest", "Rennes"]
    np.testing.assert_allclose(got[0]["geometry"].area, 100.0)
    np.testing.assert_allclose(got[1]["geometry"].area, 400.0 - 16.0)
    assert got[1]["geometry"].geom_type == "Polygon"


def test_roundtrip_multipolygon(tmp_path):
    mp = geos.multipolygon_of([
        geos.polygon(_square(0, 0, 5)), geos.polygon(_square(50, 0, 5)),
    ])
    path = str(tmp_path / "mp.shp")
    write_shapefile(path, [{"geometry": mp, "id": 7}])
    got, _ = read_shapefile(path)
    assert len(got) == 1
    assert got[0]["geometry"].geom_type == "MultiPolygon"
    np.testing.assert_allclose(got[0]["geometry"].area, 50.0)
    assert got[0]["id"] == "7"  # writer emits text fields


def test_numeric_dbf_fields_parse(tmp_path):
    # hand-build a dbf with an N field to exercise numeric parsing
    import struct

    base = str(tmp_path / "num")
    write_shapefile(base + ".shp", [{"geometry": geos.polygon(_square(0, 0, 2))}])
    with open(base + ".dbf", "wb") as f:
        f.write(struct.pack("<B3BIHH", 0x03, 26, 8, 17, 1, 32 + 32 + 1, 1 + 8))
        f.write(b"\x00" * 20)
        f.write(b"pop".ljust(11, b"\x00") + b"N" + b"\x00" * 4)
        f.write(struct.pack("<BB", 8, 0) + b"\x00" * 14)
        f.write(b"\x0d")
        f.write(b" " + b"  123456")
        f.write(b"\x1a")
    got, _ = read_shapefile(base + ".shp")
    assert got[0]["pop"] == 123456


def test_geozone_cache_from_shp(tmp_path, monkeypatch):
    from flair_for_aigle_tpu.zonal.inference import load_geozone_contour

    recs = [
        {"geometry": geos.polygon(_square(0, 0, 10)), "iso_code": "29019"},
        {"geometry": geos.polygon(_square(20, 0, 10)), "iso_code": "56121"},
    ]
    write_shapefile(str(tmp_path / "geozones.shp"), recs, crs="EPSG:2154")
    monkeypatch.setenv("GEOZONES_SHAPEFILE", "geozones.shp")

    class Cfg:
        db_sources = str(tmp_path)
        geozones_codes = "29019"
        input_crs = "EPSG:2154"

    geoms = load_geozone_contour(Cfg())
    assert len(geoms) == 1
    np.testing.assert_allclose(geoms[0].area, 100.0)

    class CfgAll(Cfg):
        geozones_codes = "all"

    assert len(load_geozone_contour(CfgAll())) == 2


def test_dbf_deleted_row_keeps_alignment(tmp_path):
    # dbf soft-deletion does NOT remove the .shp record; skipping only the
    # attribute row misaligned every later geometry with its attributes
    # (ADVICE r3). Deleted rows must drop BOTH sides of the pair.
    import struct

    recs = [
        {"geometry": geos.polygon(_square(0, 0, 10)), "name": "keep0"},
        {"geometry": geos.polygon(_square(50, 0, 20)), "name": "drop1"},
        {"geometry": geos.polygon(_square(100, 0, 30)), "name": "keep2"},
    ]
    path = str(tmp_path / "del.shp")
    write_shapefile(path, recs)
    dbf = path[:-4] + ".dbf"
    with open(dbf, "r+b") as f:
        head = f.read(32)
        head_size = struct.unpack("<H", head[8:10])[0]
        rec_size = struct.unpack("<H", head[10:12])[0]
        f.seek(head_size + rec_size)  # record 1
        f.write(b"*")
    got, _ = read_shapefile(path)
    assert [r["name"] for r in got] == ["keep0", "keep2"]
    np.testing.assert_allclose([r["geometry"].area for r in got],
                               [100.0, 900.0])
