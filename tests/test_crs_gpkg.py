import numpy as np

from flair_for_aigle_tpu.geo import geos
from flair_for_aigle_tpu.geo.crs import Transformer, transform_geometry
from flair_for_aigle_tpu.geo.gpkg import read_gpkg, write_gpkg


def test_lambert93_to_wgs84():
    # Paris: EPSG:2154 (652709, 6862057) ~ lon 2.3488 lat 48.8534
    tr = Transformer("EPSG:2154", "EPSG:4326")
    xs, ys = tr.transform([652709.0], [6862057.0])
    assert abs(xs[0] - 2.35) < 0.02
    assert abs(ys[0] - 48.85) < 0.02


def test_transform_geometry_polygon():
    sq = geos.box(650000, 6860000, 651000, 6861000)  # 1km2 in L93
    wgs = transform_geometry(sq, "EPSG:2154", "EPSG:4326")
    minx, miny, maxx, maxy = wgs.bounds
    assert 2.0 < minx < 3.0 and 48.0 < miny < 49.5
    # same-crs shortcut
    same = transform_geometry(sq, "EPSG:2154", "EPSG:2154")
    assert same.bounds == sq.bounds


def test_gpkg_roundtrip(tmp_path):
    path = str(tmp_path / "out.gpkg")
    recs = [
        {"geometry": geos.box(0, 0, 10, 10), "class_id": 6, "confidence": 0.8},
        {"geometry": geos.box(20, 20, 25, 30), "class_id": 3, "confidence": 0.1},
    ]
    write_gpkg(path, recs, layer="detections", crs="EPSG:2154")
    back, crs = read_gpkg(path)
    assert crs == "EPSG:2154"
    assert len(back) == 2
    assert back[0]["class_id"] == 6
    assert abs(back[0]["geometry"].area - 100) < 1e-9
    assert abs(back[1]["geometry"].area - 50) < 1e-9


def test_gpkg_append(tmp_path):
    path = str(tmp_path / "out.gpkg")
    write_gpkg(path, [{"geometry": geos.box(0, 0, 1, 1), "v": 1}],
               layer="l", crs="EPSG:4326")
    write_gpkg(path, [{"geometry": geos.box(1, 1, 2, 2), "v": 2}],
               layer="l", crs="EPSG:4326", append=True)
    back, _ = read_gpkg(path, "l")
    assert len(back) == 2
