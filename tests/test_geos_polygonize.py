import numpy as np
import pytest

from flair_for_aigle_tpu.geo import geos
from flair_for_aigle_tpu.geo.polygonize import polygons_for_class, raster_to_polygons
from flair_for_aigle_tpu.geo.windows import Affine, from_origin


def test_geos_basic_ops():
    b = geos.box(0, 0, 10, 10)
    assert b.area == 100
    assert b.bounds == (0, 0, 10, 10)
    c = geos.box(5, 5, 15, 15)
    assert b.intersects(c)
    inter = b.intersection(c)
    assert inter.area == 25
    u = geos.unary_union([b, c])
    assert abs(u.area - 175) < 1e-9
    assert "POLYGON" in b.wkt
    rt = geos.from_wkb(b.wkb)
    assert rt.area == 100
    rt2 = geos.from_wkt(b.wkt)
    assert rt2.area == 100


def test_geos_polygon_with_hole_and_simplify():
    shell = [(0, 0), (20, 0), (20, 20), (0, 20)]
    hole = [(5, 5), (10, 5), (10, 10), (5, 10)]
    p = geos.polygon(shell, hole and [hole])
    assert p.area == 400 - 25
    s = p.simplify(1.0)
    assert abs(s.area - p.area) < 50


def test_polygonize_simple_square():
    data = np.zeros((10, 10), np.uint8)
    data[2:6, 3:8] = 1
    tr = from_origin(100.0, 200.0, 1.0, 1.0)
    polys = polygons_for_class(data, 1, tr, min_area=0.0, simplification=0)
    assert len(polys) == 1
    p = polys[0]
    assert p.area == 4 * 5
    assert p.bounds == (103.0, 194.0, 108.0, 198.0)


def test_polygonize_with_hole():
    data = np.zeros((12, 12), np.uint8)
    data[1:11, 1:11] = 2
    data[4:7, 4:7] = 0  # hole
    tr = from_origin(0, 12, 1, 1)
    polys = polygons_for_class(data, 2, tr, min_area=0.0, simplification=0)
    assert len(polys) == 1
    assert polys[0].area == 100 - 9


def test_polygonize_multiple_regions_and_classes():
    data = np.zeros((16, 16), np.uint8)
    data[1:4, 1:4] = 1
    data[10:14, 10:15] = 1
    data[5:8, 5:9] = 3
    tr = from_origin(0, 16, 1, 1)
    res = raster_to_polygons(data, tr, ignore_background=True,
                             background_value=0, min_area=0.0,
                             simplification=0)
    by_cls = {}
    for r in res:
        by_cls.setdefault(r["class_id"], []).append(r["geometry"])
    assert len(by_cls[1]) == 2
    assert len(by_cls[3]) == 1
    areas = sorted(g.area for g in by_cls[1])
    assert areas == [9.0, 20.0]


def test_polygonize_min_area_and_background_filters():
    data = np.full((8, 8), 18, np.uint8)  # background class 18
    data[0, 0] = 1  # 1-px region
    data[2:6, 2:6] = 5
    tr = from_origin(0, 8, 1, 1)
    res = raster_to_polygons(data, tr, min_area=2.0)
    assert {r["class_id"] for r in res} == {5}


def test_polygonize_diagonal_touch_separate_regions():
    # 4-connectivity: diagonal neighbors are separate polygons
    data = np.zeros((6, 6), np.uint8)
    data[1, 1] = 1
    data[2, 2] = 1
    tr = from_origin(0, 6, 1, 1)
    polys = polygons_for_class(data, 1, tr, min_area=0, simplification=0)
    assert len(polys) == 2
    assert all(p.area == 1.0 for p in polys)
