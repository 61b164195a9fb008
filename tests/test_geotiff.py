"""Native GeoTIFF IO: round-trips, windowed/boundless reads, COG, PIL cross-check."""

import os

import numpy as np
import pytest
from PIL import Image

from flair_for_aigle_tpu.geo.geotiff import (
    WindowedWriter,
    convert_to_cog,
    open_raster,
    read_patch,
    write_geotiff,
)
from flair_for_aigle_tpu.geo.windows import Affine, Window, from_bounds, from_origin


@pytest.fixture
def tmp_tif(tmp_path):
    return str(tmp_path / "test.tif")


def test_roundtrip_uint8_multiband(tmp_tif):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, size=(4, 100, 130)).astype(np.uint8)
    tr = from_origin(654321.0, 6789000.0, 0.2, 0.2)
    write_geotiff(tmp_tif, arr, tr, "EPSG:2154")
    with open_raster(tmp_tif) as src:
        assert (src.height, src.width, src.count) == (100, 130, 4)
        assert src.crs == "EPSG:2154"
        assert abs(src.res[0] - 0.2) < 1e-9
        b = src.bounds
        assert abs(b.left - 654321.0) < 1e-6 and abs(b.top - 6789000.0) < 1e-6
        back = src.read()
    np.testing.assert_array_equal(arr, back)


def test_roundtrip_float32_and_band_select(tmp_tif):
    arr = np.random.default_rng(1).normal(size=(3, 64, 64)).astype(np.float32)
    write_geotiff(tmp_tif, arr, from_origin(0, 64, 1, 1), "EPSG:4326")
    with open_raster(tmp_tif) as src:
        sel = src.read([3, 1])
        np.testing.assert_array_equal(sel[0], arr[2])
        np.testing.assert_array_equal(sel[1], arr[0])
        one = src.read(2)
        np.testing.assert_array_equal(one, arr[1])


def test_windowed_and_boundless_read(tmp_tif):
    arr = np.arange(100 * 100, dtype=np.uint16).reshape(1, 100, 100)
    write_geotiff(tmp_tif, arr, from_origin(1000, 2000, 1, 1), "EPSG:2154")
    with open_raster(tmp_tif) as src:
        win = Window(10, 20, 30, 40)
        got = src.read(window=win)
        np.testing.assert_array_equal(got[0], arr[0, 20:60, 10:40])
        # boundless with fill
        win = Window(-5, -5, 20, 20)
        got = src.read(window=win, boundless=True, fill_value=7)
        assert got.shape == (1, 20, 20)
        assert (got[0, :5, :] == 7).all() and (got[0, :, :5] == 7).all()
        np.testing.assert_array_equal(got[0, 5:, 5:], arr[0, :15, :15])
        # from_bounds geo window
        win = from_bounds(1010, 1940, 1040, 1980, src.transform)
        got = src.read(window=win)
        np.testing.assert_array_equal(got[0], arr[0, 20:60, 10:40])


def test_out_shape_resampling(tmp_tif):
    arr = np.arange(16, dtype=np.uint8).reshape(1, 4, 4)
    write_geotiff(tmp_tif, arr, from_origin(0, 4, 1, 1), "EPSG:2154")
    with open_raster(tmp_tif) as src:
        up = src.read(window=Window(0, 0, 4, 4), out_shape=(1, 8, 8),
                      resampling="bilinear")
        assert up.shape == (1, 8, 8)
        nn = src.read(window=Window(0, 0, 4, 4), out_shape=(1, 2, 2),
                      resampling="nearest")
        assert nn.shape == (1, 2, 2)


def test_pil_can_read_our_uint8(tmp_tif):
    """External-tool cross-check: PIL decodes our single-band LZW tiles."""
    arr = np.random.default_rng(2).integers(0, 19, (1, 64, 64)).astype(np.uint8)
    write_geotiff(tmp_tif, arr, from_origin(0, 64, 1, 1), "EPSG:2154")
    img = np.array(Image.open(tmp_tif))
    np.testing.assert_array_equal(img, arr[0])


def test_windowed_writer_last_write_wins(tmp_tif):
    with WindowedWriter(tmp_tif, 50, 40, 1, np.uint8,
                        from_origin(0, 40, 1, 1), "EPSG:2154") as dst:
        dst.write(np.full((30, 30), 1, np.uint8), 1, Window(0, 0, 30, 30))
        dst.write(np.full((30, 30), 2, np.uint8), 1, Window(10, 5, 30, 30))
    with open_raster(tmp_tif) as src:
        data = src.read(1)
    assert data[10, 15] == 2  # overwritten region
    assert data[2, 2] == 1
    assert data[39, 49] == 0  # untouched


def test_cog_conversion(tmp_path):
    src_path = str(tmp_path / "plain.tif")
    cog_path = str(tmp_path / "cog.tif")
    arr = np.random.default_rng(3).integers(0, 255, (1, 600, 600)).astype(np.uint8)
    write_geotiff(src_path, arr, from_origin(0, 600, 1, 1), "EPSG:2154")
    convert_to_cog(src_path, cog_path)
    assert not os.path.exists(src_path)
    with open_raster(cog_path) as src:
        np.testing.assert_array_equal(src.read(), arr)


def test_read_patch_helper(tmp_tif):
    arr = np.random.default_rng(4).integers(0, 255, (5, 16, 16)).astype(np.uint8)
    write_geotiff(tmp_tif, arr, from_origin(0, 16, 1, 1), "EPSG:2154")
    np.testing.assert_array_equal(read_patch(tmp_tif), arr)
    np.testing.assert_array_equal(read_patch(tmp_tif, [4, 1, 2]),
                                  arr[[3, 0, 1]])


def test_invalid_jp2_clear_error(tmp_path):
    # .jp2 now routes to the native JP2 reader; garbage input errors clearly
    p = tmp_path / "img.jp2"
    p.write_bytes(b"\x00")
    with pytest.raises((OSError, RuntimeError)):
        open_raster(str(p))
