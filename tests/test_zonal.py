"""Zonal engine end-to-end: slicing math, on-device stitch parity with a
host reference loop, full run_inference on a synthetic GeoTIFF."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flair_for_aigle_tpu.geo.geotiff import open_raster, write_geotiff
from flair_for_aigle_tpu.geo.windows import Window, from_origin
from flair_for_aigle_tpu.models.checkpoint import export_torch_state_dict
from flair_for_aigle_tpu.zonal.inference import run_inference
from flair_for_aigle_tpu.zonal.slicing import generate_patches_from_reference

RES = 0.5
PATCH = 64
MARGIN = 8


def make_raster(path, width=96, height=96, bands=3, seed=0):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 255, (bands, height, width)).astype(np.uint8)
    write_geotiff(path, arr, from_origin(10000.0, 20000.0, RES, RES),
                  "EPSG:2154")
    return arr


def make_zonal_config(tmp_path, img_path, n_classes=5, output_type="argmax",
                      out_res=RES, arch="resnet18-unet"):
    weights = str(tmp_path / "w.safetensors")
    # random-weight checkpoint in reference torch layout, via our exporter
    from flair_for_aigle_tpu.zonal.model_utils import (
        build_inference_model,
        prepare_model_config,
    )
    cfg = {
        "output_path": str(tmp_path / "out"),
        "output_name": "test_zonal",
        "write_dataframe": False,
        "output_type": output_type,
        "cog_conversion": False,
        "model_weights": weights,
        "batch_size": 2,
        "num_worker": 1,
        "img_pixels_detection": PATCH,
        "margin": MARGIN,
        "output_px_meters": out_res,
        "monotemp_arch": arch,
        "multitemp_model_ref_date": "05-15",
        "modalities": {
            "inputs": {
                "AERIAL_RGBI": True, "AERIAL-RLT_PAN": False,
                "DEM_ELEV": False, "SPOT_RGBI": False, "SENTINEL2_TS": False,
                "SENTINEL1-ASC_TS": False, "SENTINEL1-DESC_TS": False,
            },
            "AERIAL_RGBI": {
                "input_img_path": img_path,
                "channels": [1, 2, 3],
                "normalization": {"type": "custom",
                                  "means": [105.0, 111.0, 102.0],
                                  "stds": [52.0, 45.0, 44.0]},
            },
        },
        "tasks": [
            {"name": "AERIAL_LABEL-COSIA", "active": True,
             "class_names": {i: f"c{i}" for i in range(n_classes)}},
        ],
    }
    os.makedirs(cfg["output_path"], exist_ok=True)
    # build a model with random weights and save them in torch layout
    from safetensors.numpy import save_file

    mc = prepare_model_config({**cfg, "model_weights": ""})
    mc["labels"] = ["AERIAL_LABEL-COSIA"]
    mc["labels_configs"] = {
        "AERIAL_LABEL-COSIA": {"value_name": [f"c{i}" for i in range(n_classes)]}
    }
    from flair_for_aigle_tpu.models.flair_model import FlairHubModel
    from flair_for_aigle_tpu.zonal.model_utils import example_batch_for

    model = FlairHubModel(config=mc)
    variables = model.init(
        jax.random.key(7), example_batch_for(mc, {"AERIAL_RGBI": PATCH}, 1)
    )
    sd = export_torch_state_dict(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})}
    )
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, weights)
    return cfg


def test_slicing_grid_covers_and_dedups(tmp_path):
    img = str(tmp_path / "img.tif")
    make_raster(img, 96, 96)
    cfg = {
        "img_pixels_detection": PATCH, "margin": MARGIN,
        "output_path": str(tmp_path), "output_name": "t",
        "reference_modality": "AERIAL_RGBI", "reference_resolution": RES,
        "modalities": {"AERIAL_RGBI": {"input_img_path": img}},
    }
    tiles = generate_patches_from_reference(cfg, img)
    assert len(tiles) == 4  # 96px with 48px stride -> 2x2 after snapping
    ids = {t["id"] for t in tiles}
    assert len(ids) == 4
    # inner bounds within the raster
    for t in tiles:
        assert t["right"] <= 10000.0 + 96 * RES + 1e-6
        assert t["left"] >= 10000.0 - MARGIN * RES - 1e-6


@pytest.mark.slow
@pytest.mark.parametrize("output_type", ["argmax", "class_prob"])
def test_run_inference_end_to_end(tmp_path, output_type):
    img = str(tmp_path / "img.tif")
    make_raster(img, 96, 96)
    cfg = make_zonal_config(tmp_path, img, output_type=output_type)
    temp_paths = run_inference(cfg)
    out = temp_paths["AERIAL_LABEL-COSIA"]
    assert os.path.exists(out)
    with open_raster(out) as src:
        assert (src.height, src.width) == (96, 96)
        assert src.crs == "EPSG:2154"
        assert abs(src.res[0] - RES) < 1e-9
        data = src.read()
    if output_type == "argmax":
        assert data.shape == (1, 96, 96)
        assert data.max() < 5
    else:
        assert data.shape == (5, 96, 96)
        # softmax*255 sums to ~255 per pixel
        sums = data.astype(int).sum(axis=0)
        assert np.abs(sums - 255).max() <= 3


@pytest.mark.slow
def test_canvas_matches_host_reference_loop(tmp_path):
    """Byte parity: on-device stitch vs the reference's host write loop."""
    img = str(tmp_path / "img.tif")
    make_raster(img, 96, 96, seed=3)
    cfg = make_zonal_config(tmp_path, img)
    temp_paths = run_inference(cfg)
    with open_raster(temp_paths["AERIAL_LABEL-COSIA"]) as src:
        got = src.read(1)

    # host reference loop, reusing the same model/variables via a fresh build
    from flair_for_aigle_tpu.zonal.inference import (
        initialize_geometry_and_resolutions,
        prep_dataset,
    )
    from flair_for_aigle_tpu.zonal.model_utils import (
        build_inference_model, compute_patch_sizes,
    )
    from flair_for_aigle_tpu.zonal.postprocess import convert
    from flair_for_aigle_tpu.zonal.slicing import generate_patches_from_reference

    config = dict(cfg)
    config = initialize_geometry_and_resolutions(config)
    config["output_type"] = "argmax"
    tiles = generate_patches_from_reference(config)
    patch_sizes = compute_patch_sizes(config)
    config["labels"] = ["AERIAL_LABEL-COSIA"]
    config["labels_configs"] = {
        "AERIAL_LABEL-COSIA": {"value_name": [f"c{i}" for i in range(5)]}
    }
    model, variables, _ = build_inference_model(config, patch_sizes, 1)
    ds = prep_dataset(config, tiles, patch_sizes)

    want = np.zeros((96, 96), np.uint8)
    ib = config["image_bounds"]
    for i in range(len(ds)):
        s = ds[i]
        batch = {k: jnp.asarray(v)[None] for k, v in s.items()
                 if k != "index"}
        logits, _ = model.apply(variables, batch)
        lg = np.asarray(logits["AERIAL_LABEL-COSIA"])[0]
        patch = lg[:, MARGIN:PATCH - MARGIN, MARGIN:PATCH - MARGIN]
        pred = convert(patch, "argmax")  # (1, h, w)
        row = tiles[i]
        left_px = int(round((row["left"] - ib["left"]) / RES))
        top_px = int(round((ib["top"] - row["top"]) / RES))
        h = min(pred.shape[-2], 96 - top_px)
        w = min(pred.shape[-1], 96 - left_px)
        want[top_px:top_px + h, left_px:left_px + w] = pred[0, :h, :w]
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_device_norm_matches_host_norm(tmp_path):
    """normalize_on_device fast path produces the same argmax raster as the
    host float64 parity path."""
    img = str(tmp_path / "img.tif")
    make_raster(img, 96, 96, seed=9)
    cfg = make_zonal_config(tmp_path, img)
    host_paths = run_inference(dict(cfg))
    with open_raster(host_paths["AERIAL_LABEL-COSIA"]) as src:
        host = src.read(1)

    cfg2 = make_zonal_config(tmp_path, img)
    cfg2["output_name"] = "test_zonal_dev"
    cfg2["normalize_on_device"] = True
    dev_paths = run_inference(cfg2)
    with open_raster(dev_paths["AERIAL_LABEL-COSIA"]) as src:
        dev = src.read(1)
    # identical up to float32-vs-float64 normalization rounding at argmax
    agree = (host == dev).mean()
    assert agree > 0.999, f"device-norm disagreement: {1 - agree:.4%}"


@pytest.mark.slow
def test_zonal_data_parallel_matches_single_device(tmp_path):
    """batch sharded over the 8-device CPU mesh -> identical canvas."""
    img = str(tmp_path / "img.tif")
    make_raster(img, 96, 96, seed=11)
    cfg1 = make_zonal_config(tmp_path, img)
    cfg1["batch_size"] = 8
    single = run_inference(dict(cfg1))
    with open_raster(single["AERIAL_LABEL-COSIA"]) as src:
        want = src.read(1)

    cfg2 = make_zonal_config(tmp_path, img)
    cfg2["output_name"] = "test_zonal_dp"
    cfg2["batch_size"] = 8
    cfg2["data_parallel_devices"] = 8
    dp = run_inference(cfg2)
    with open_raster(dp["AERIAL_LABEL-COSIA"]) as src:
        got = src.read(1)
    np.testing.assert_array_equal(want, got)


@pytest.mark.slow
def test_run_inference_output_rescale(tmp_path):
    """output_px_meters != reference resolution: device nearest-rescale path
    matches the host reference loop byte-for-byte."""
    img = str(tmp_path / "img.tif")
    make_raster(img, 96, 96, seed=5)
    out_res = 1.0  # 2x coarser than RES=0.5
    cfg = make_zonal_config(tmp_path, img, out_res=out_res)
    temp_paths = run_inference(dict(cfg))
    with open_raster(temp_paths["AERIAL_LABEL-COSIA"]) as src:
        got = src.read(1)
        assert (src.height, src.width) == (48, 48)
        assert abs(src.res[0] - out_res) < 1e-9

    # host reference loop with scipy-zoom rescale semantics
    from flair_for_aigle_tpu.zonal.inference import (
        initialize_geometry_and_resolutions,
        prep_dataset,
        resample_prediction,
    )
    from flair_for_aigle_tpu.zonal.model_utils import (
        build_inference_model, compute_patch_sizes,
    )
    from flair_for_aigle_tpu.zonal.postprocess import convert

    config = dict(cfg)
    config = initialize_geometry_and_resolutions(config)
    tiles = generate_patches_from_reference(config)
    patch_sizes = compute_patch_sizes(config)
    config["labels"] = ["AERIAL_LABEL-COSIA"]
    config["labels_configs"] = {
        "AERIAL_LABEL-COSIA": {"value_name": [f"c{i}" for i in range(5)]}
    }
    model, variables, _ = build_inference_model(config, patch_sizes, 1)
    ds = prep_dataset(config, tiles, patch_sizes)
    want = np.zeros((48, 48), np.uint8)
    ib = config["image_bounds"]
    for i in range(len(ds)):
        s = ds[i]
        batch = {k: jnp.asarray(v)[None] for k, v in s.items() if k != "index"}
        logits, _ = model.apply(variables, batch)
        lg = np.asarray(logits["AERIAL_LABEL-COSIA"])[0]
        patch = lg[:, MARGIN:PATCH - MARGIN, MARGIN:PATCH - MARGIN]
        pred = convert(patch, "argmax")
        pred = resample_prediction(pred, RES / out_res)
        row = tiles[i]
        left_px = int(round((row["left"] - ib["left"]) / out_res))
        top_px = int(round((ib["top"] - row["top"]) / out_res))
        h = min(pred.shape[-2], 48 - top_px)
        w = min(pred.shape[-1], 48 - left_px)
        if h <= 0 or w <= 0:
            continue
        want[top_px:top_px + h, left_px:left_px + w] = pred[0, :h, :w]
    np.testing.assert_array_equal(got, want)


def test_slicing_with_geozone_clip(tmp_path):
    from flair_for_aigle_tpu.geo import geos

    img = str(tmp_path / "img.tif")
    make_raster(img, 96, 96)
    cfg = {
        "img_pixels_detection": PATCH, "margin": MARGIN,
        "output_path": str(tmp_path), "output_name": "t",
        "reference_modality": "AERIAL_RGBI", "reference_resolution": RES,
        "modalities": {"AERIAL_RGBI": {"input_img_path": img}},
    }
    # zone covering only the top-left quarter of the raster
    zone = geos.box(10000.0, 20000.0 - 24 * RES, 10000.0 + 24 * RES, 20000.0)
    tiles = generate_patches_from_reference(cfg, img, [zone])
    assert len(tiles) >= 1
    full = generate_patches_from_reference(cfg, img)
    assert len(tiles) < len(full)
    # no-intersection zone -> empty
    far = geos.box(0, 0, 10, 10)
    assert generate_patches_from_reference(cfg, img, [far]) == []


@pytest.mark.slow
def test_device_resident_tiles_match_host_path(tmp_path):
    """HBM-resident gather path == host windowed-read path, byte for byte
    (same device norm on both sides; only the tile transport differs)."""
    img = str(tmp_path / "img.tif")
    make_raster(img, 150, 120, seed=13)  # non-square, edge-snapped tiles

    cfg1 = make_zonal_config(tmp_path, img)
    cfg1["normalize_on_device"] = True
    cfg1["device_resident_tiles"] = False
    host = run_inference(dict(cfg1))
    with open_raster(host["AERIAL_LABEL-COSIA"]) as src:
        want = src.read()

    cfg2 = make_zonal_config(tmp_path, img)
    cfg2["output_name"] = "test_zonal_resident"
    cfg2["normalize_on_device"] = True  # auto gate: custom norm needs opt-in
    from flair_for_aigle_tpu.zonal.inference import device_tiling_plan
    probe = dict(cfg2)
    from flair_for_aigle_tpu.zonal.inference import (
        initialize_geometry_and_resolutions,
    )
    assert device_tiling_plan(initialize_geometry_and_resolutions(probe))
    got_paths = run_inference(cfg2)
    with open_raster(got_paths["AERIAL_LABEL-COSIA"]) as src:
        got = src.read()
    np.testing.assert_array_equal(want, got)


@pytest.mark.slow
def test_device_resident_tiles_rescale_and_scaling_norm(tmp_path):
    """Resident path with 'scaling' norm (auto-gates with no opt-in flag)
    and a coarser output resolution."""
    img = str(tmp_path / "img.tif")
    make_raster(img, 96, 96, seed=17)
    cfg1 = make_zonal_config(tmp_path, img, out_res=1.0)
    cfg1["modalities"]["AERIAL_RGBI"]["normalization"] = {"type": "scaling"}
    cfg1["device_resident_tiles"] = False
    want_paths = run_inference(dict(cfg1))
    with open_raster(want_paths["AERIAL_LABEL-COSIA"]) as src:
        want = src.read()

    cfg2 = make_zonal_config(tmp_path, img, out_res=1.0)
    cfg2["modalities"]["AERIAL_RGBI"]["normalization"] = {"type": "scaling"}
    cfg2["output_name"] = "test_zonal_resident_scaling"
    from flair_for_aigle_tpu.zonal.inference import (
        device_tiling_plan,
        initialize_geometry_and_resolutions,
    )
    assert device_tiling_plan(initialize_geometry_and_resolutions(dict(cfg2)))
    got_paths = run_inference(cfg2)
    with open_raster(got_paths["AERIAL_LABEL-COSIA"]) as src:
        got = src.read()
    # scaling norm: host float64 img_as_float vs device float32 may differ
    # only at argmax ties; require near-exact agreement
    assert (want == got).mean() > 0.999


def test_pack_labels5_roundtrip():
    import jax
    import jax.numpy as jnp
    from flair_for_aigle_tpu.ops.pack import (
        pack_labels5, packed_width, unpack_labels5,
    )

    rng = np.random.default_rng(0)
    x = rng.integers(0, 32, (2, 13, 40), dtype=np.int64).astype(np.uint8)
    packed = np.asarray(jax.jit(pack_labels5)(jnp.asarray(x)))
    assert packed.shape == (2, 13, packed_width(40))
    got = unpack_labels5(packed, 37)
    np.testing.assert_array_equal(got, x[:, :, :37])

    # native in-place unpack into a strided canvas slice (the zonal
    # finalize path) must agree with the numpy twin
    from flair_for_aigle_tpu.ops.pack import unpack_labels5_into

    canvas = np.zeros((2, 20, 64), np.uint8)
    unpack_labels5_into(packed, canvas[:, 4:17, 9:46])
    np.testing.assert_array_equal(canvas[:, 4:17, 9:46], x[:, :, :37])
    assert not canvas[:, :4].any() and not canvas[:, 17:].any()
    assert not canvas[:, :, :9].any() and not canvas[:, :, 46:].any()


def test_rle_roundtrip():
    import jax
    import jax.numpy as jnp
    from flair_for_aigle_tpu.ops.rle import rle_encode5, rle_decode_into

    rng = np.random.default_rng(1)
    # piecewise-constant map with noise patches: realistic run structure
    x = np.repeat(rng.integers(0, 19, (1, 9, 14), dtype=np.int64), 5, axis=2)
    x = np.repeat(x, 3, axis=1).astype(np.uint8)  # (1, 27, 70)
    enc = jax.jit(rle_encode5, static_argnums=1)
    runs, n_runs = enc(jnp.asarray(x), 1024)
    nr = int(n_runs)
    assert 0 < nr < 1024
    # zero-length padding past n_runs
    lens = np.asarray(runs)[:, :4].astype(np.uint32)
    lens = lens[:, 0] | (lens[:, 1] << 8) | (lens[:, 2] << 16) | (lens[:, 3] << 24)
    assert (lens[nr:] == 0).all() and lens[:nr].sum() == x.size
    dst = np.empty_like(x)
    rle_decode_into(np.asarray(runs), nr, dst)
    np.testing.assert_array_equal(dst, x)

    # overflow detection: capacity below the true run count
    runs2, n2 = enc(jnp.asarray(x), 8)
    assert int(n2) == nr and runs2.shape == (8, 5)

    # worst case: every pixel its own run
    y = (np.arange(64, dtype=np.uint8) % 19).reshape(1, 4, 16)
    runs3, n3 = enc(jnp.asarray(y), 64)
    assert int(n3) == 64
    dst3 = np.empty_like(y)
    rle_decode_into(np.asarray(runs3), 64, dst3)
    np.testing.assert_array_equal(dst3, y)


def test_stripe_codec_probe_commit():
    """_StripeCodec mode machine: probes dual-ship and the first verdict
    commits the run to rle (compressible) or pack5 (noise)."""
    import jax.numpy as jnp
    from flair_for_aigle_tpu.zonal.inference import _StripeCodec

    w = 640
    img_w = {"T": w}
    # compressible canvas: constant classes in large bands
    canvas = jnp.asarray(
        np.repeat(np.arange(8, dtype=np.uint8) % 19, w // 8)[None, None, :]
        * np.ones((1, 2048, 1), np.uint8)
    )
    codec = _StripeCodec(True, True, img_w)
    assert codec.mode == "probe"
    recs = [codec.encode(canvas, "T", i * 512, (i + 1) * 512)
            for i in range(4)]
    codec.plan_all(recs)
    assert codec.mode == "rle"
    assert all(r.get("tier") in ("small", "mid") for r in recs)
    dst = np.empty((1, 512, w), np.uint8)
    codec.decode_into(recs[0], dst)
    np.testing.assert_array_equal(dst, np.asarray(canvas[:, :512, :w]))

    # noise canvas: overflows -> pack5 commit; probes dual-shipped packed
    noise = jnp.asarray(
        np.random.default_rng(0).integers(0, 19, (1, 2048, w))
        .astype(np.uint8)
    )
    codec2 = _StripeCodec(True, True, img_w)
    recs2 = [codec2.encode(noise, "T", i * 512, (i + 1) * 512)
             for i in range(4)]
    codec2.plan_all(recs2)
    assert codec2.mode == "pack5"
    probed = [r for r in recs2 if "n_runs" in r]
    assert probed and all(r.get("packed_sent") for r in probed)
    assert any("n_runs" not in r for r in recs2) or len(probed) <= 3
    dst2 = np.empty((1, 512, w), np.uint8)
    codec2.decode_into(recs2[-1], dst2)
    np.testing.assert_array_equal(dst2, np.asarray(noise[:, 1536:2048, :w]))


@pytest.mark.slow
def test_run_inference_d2h_codecs_identical(tmp_path):
    """auto (RLE tiers), pack5, and raw D2H must land bit-identical
    rasters through the full run_inference path."""
    img = str(tmp_path / "img.tif")
    make_raster(img, 160, 130)
    cfg = make_zonal_config(tmp_path, img)
    outs = {}
    for name, extra in {
        "auto": {},
        "pack5": {"d2h_codec": "pack5"},
        "raw": {"pack_d2h": False},
    }.items():
        c = {**cfg, **extra,
             "output_path": str(tmp_path / f"out_{name}")}
        os.makedirs(c["output_path"], exist_ok=True)
        paths = run_inference(c)
        with open_raster(paths["AERIAL_LABEL-COSIA"]) as src:
            outs[name] = src.read()
    np.testing.assert_array_equal(outs["auto"], outs["pack5"])
    np.testing.assert_array_equal(outs["auto"], outs["raw"])


def test_kernels_not_disabled_under_dp(tmp_path):
    """Multi-device zonal wraps the forward in shard_map over dp, so
    data_parallel_devices > 1 must NOT gate the fused kernels off anymore
    (round 2 forced attn_kernel='off' under DP)."""
    from flair_for_aigle_tpu.zonal.model_utils import prepare_model_config

    base = {
        "monotemp_arch": "swin_base_patch4_window12_384-upernet",
        "model_weights": "",
        "modalities": {
            "inputs": {"AERIAL_RGBI": True, "AERIAL-RLT_PAN": False,
                       "DEM_ELEV": False, "SPOT_RGBI": False,
                       "SENTINEL2_TS": False, "SENTINEL1-ASC_TS": False,
                       "SENTINEL1-DESC_TS": False},
            "AERIAL_RGBI": {"input_img_path": "", "channels": [1, 2, 3]},
        },
        "tasks": [{"name": "AERIAL_LABEL-COSIA", "active": True,
                   "class_names": {i: f"c{i}" for i in range(5)}}],
    }
    mc = prepare_model_config({**base, "data_parallel_devices": 2})
    assert mc["models"]["monotemp_model"]["attn_kernel"] == "auto"
    mc1 = prepare_model_config({**base, "attn_kernel": "on"})
    assert mc1["models"]["monotemp_model"]["attn_kernel"] == "on"
    mc2 = prepare_model_config(base)
    assert mc2["models"]["monotemp_model"]["attn_kernel"] == "auto"


@pytest.mark.slow
def test_zonal_dp_resident_path_matches_single_device(tmp_path):
    """HBM-resident raster path under the 8-device CPU mesh: replicated
    rasters + shard_mapped gather/forward must produce the identical
    canvas to the single-device resident path (and the plan must actually
    engage in both runs)."""
    from flair_for_aigle_tpu.zonal.inference import device_tiling_plan

    img = str(tmp_path / "img.tif")
    make_raster(img, 96, 96, seed=17)
    base = make_zonal_config(tmp_path, img)
    base["batch_size"] = 8
    base["normalize_on_device"] = True  # custom norm -> resident plan in auto

    from flair_for_aigle_tpu.zonal.inference import (
        initialize_geometry_and_resolutions,
    )

    probe = initialize_geometry_and_resolutions(dict(base))
    assert device_tiling_plan(probe) is not None

    cfg1 = dict(base)
    single = run_inference(cfg1)
    with open_raster(single["AERIAL_LABEL-COSIA"]) as src:
        want = src.read(1)

    cfg2 = dict(base)
    cfg2["output_name"] = "test_zonal_dp_resident"
    cfg2["data_parallel_devices"] = 8
    dp = run_inference(cfg2)
    with open_raster(dp["AERIAL_LABEL-COSIA"]) as src:
        got = src.read(1)
    np.testing.assert_array_equal(want, got)


@pytest.mark.slow
def test_zonal_dp_kernels_on_matches_single_device(tmp_path):
    """Fused pallas kernels (attention + FFN + stride-4 epilogue) running
    inside shard_map over the 8-device CPU mesh (interpret mode) produce the
    same canvas as the single-device kernel path."""
    img = str(tmp_path / "img.tif")
    make_raster(img, 96, 96, seed=13)
    base = make_zonal_config(tmp_path, img,
                             arch="swin_micro_patch4_window12_384-upernet")
    base["batch_size"] = 8
    base["attn_kernel"] = "on"
    base["fused_epilogue"] = True

    cfg1 = dict(base)
    single = run_inference(cfg1)
    with open_raster(single["AERIAL_LABEL-COSIA"]) as src:
        want = src.read(1)

    cfg2 = dict(base)
    cfg2["output_name"] = "test_zonal_dp_kern"
    cfg2["data_parallel_devices"] = 8
    dp = run_inference(cfg2)
    with open_raster(dp["AERIAL_LABEL-COSIA"]) as src:
        got = src.read(1)
    np.testing.assert_array_equal(want, got)


@pytest.mark.slow
def test_pack_d2h_disabled_matches(tmp_path):
    """pack_d2h=False must produce a byte-identical raster to the default
    packed path."""
    img = str(tmp_path / "img.tif")
    make_raster(img, 96, 96)
    outs = {}
    for packed in (True, False):
        cfg = make_zonal_config(tmp_path, img)
        cfg["pack_d2h"] = packed
        cfg["output_path"] = str(tmp_path / f"out_{packed}")
        os.makedirs(cfg["output_path"], exist_ok=True)
        from flair_for_aigle_tpu.zonal.inference import run_inference

        paths = run_inference(cfg)
        from flair_for_aigle_tpu.geo.geotiff import open_raster

        with open_raster(list(paths.values())[0]) as src:
            outs[packed] = src.read(1)
    np.testing.assert_array_equal(outs[True], outs[False])


@pytest.mark.slow
def test_class_prob_fused_epilogue_e2e(tmp_path):
    """class_prob zonal run: fused epilogue (interpret) within one uint8
    step of the unfused path, end to end."""
    img = str(tmp_path / "img.tif")
    make_raster(img, 96, 96)
    outs = {}
    for fused in (False, True):
        cfg = make_zonal_config(tmp_path, img, output_type="class_prob")
        cfg["monotemp_arch"] = "resnet18-unet"  # head at full res: skip
        cfg["fused_epilogue"] = fused
        cfg["output_path"] = str(tmp_path / f"cp_{fused}")
        os.makedirs(cfg["output_path"], exist_ok=True)
        from flair_for_aigle_tpu.zonal.inference import run_inference
        from flair_for_aigle_tpu.geo.geotiff import open_raster

        paths = run_inference(cfg)
        with open_raster(list(paths.values())[0]) as src:
            outs[fused] = src.read()
    # resnet-unet head is full-res -> fused gate never engages; both paths
    # must be byte-identical (documents the unet gating)
    np.testing.assert_array_equal(outs[True], outs[False])


@pytest.mark.slow
def test_host_path_foreign_loader_order(tmp_path):
    """A loader without the ``order`` attribute iterates however it wants;
    the streaming frontier must stay fully conservative and the output
    byte-identical."""
    img = str(tmp_path / "img.tif")
    make_raster(img, 96, 96, seed=23)
    cfg = make_zonal_config(tmp_path, img)
    want_paths = run_inference(dict(cfg))
    with open_raster(want_paths["AERIAL_LABEL-COSIA"]) as src:
        want = src.read(1)

    # re-run with a foreign wrapper that hides .order and iterates in the
    # original generation order
    from flair_for_aigle_tpu.geo.geotiff import open_raster as _open
    from flair_for_aigle_tpu.zonal.dataset import BatchedLoader
    from flair_for_aigle_tpu.zonal.inference import (
        inference_and_write,
        init_outputs,
        initialize_geometry_and_resolutions,
        prep_dataset,
    )
    from flair_for_aigle_tpu.zonal.model_utils import (
        build_inference_model,
        compute_patch_sizes,
    )

    class ForeignLoader:
        def __init__(self, inner):
            self._inner = inner
            self.dataset = inner.dataset
            self.batch_size = inner.batch_size

        def __len__(self):
            return len(self._inner)

        def __iter__(self):
            return iter(self._inner)

    config = initialize_geometry_and_resolutions(dict(cfg))
    config["output_name"] = "test_zonal_foreign"
    config["labels"] = ["AERIAL_LABEL-COSIA"]
    config["labels_configs"] = {
        "AERIAL_LABEL-COSIA": {"value_name": [f"c{i}" for i in range(5)]}
    }
    tiles = generate_patches_from_reference(config)
    patch_sizes = compute_patch_sizes(config)
    model, variables, _ = build_inference_model(config, patch_sizes,
                                                config["batch_size"])
    dataset = prep_dataset(config, tiles, patch_sizes)
    loader = ForeignLoader(BatchedLoader(dataset, config["batch_size"]))
    ref = open_raster(img)
    output_files, temp_paths = init_outputs(config, ref)
    inference_and_write(model, variables, loader, tiles, config,
                        output_files, ref)
    ref.close()
    dataset.close()
    with _open(temp_paths["AERIAL_LABEL-COSIA"]) as src:
        got = src.read(1)
    np.testing.assert_array_equal(want, got)
