"""Zonal inference engine: batched device inference + on-device stitching.

TPU-native rebuild of /root/reference/flair_zonal_detection/inference.py.
Pipeline per raster (SURVEY.md section 7 design):

  host: overlap tiling -> windowed multimodal reads (thread-prefetched)
  device (one jit): forward -> margin crop -> argmax/softmax-u8 ->
                    optional nearest rescale -> scatter into uint8 canvas
  host: single D2H of the canvas -> tiled LZW GeoTIFF (+ COG) -> polygons

The reference instead wrote every tile from the host with rasterio windowed
writes (inference.py:297-352). Canvas scatter preserves its last-write-wins
ordering (sequential within batch, batches in order).

Ported quirks (documented, SURVEY.md section 7):
* reference_modality selection uses min() over resolutions — the FINEST
  m/px, though the reference comment says coarsest (inference.py:114-115).
* init_outputs keeps the reference's literal ``_i.tif`` suffix unless
  ``raster_index`` is passed (filename bug, inference.py:177).
"""

from __future__ import annotations

import logging
import os
import time
from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from flair_for_aigle_tpu.geo import geos
from flair_for_aigle_tpu.geo.geotiff import WindowedWriter, open_raster
from flair_for_aigle_tpu.geo.gpkg import read_gpkg
from flair_for_aigle_tpu.geo.polygonize import raster_to_polygons as _raster_to_polys
from flair_for_aigle_tpu.geo.windows import Window, from_origin
from flair_for_aigle_tpu.ops.resize import zoom_nearest
from flair_for_aigle_tpu.zonal.config import (
    config_recap_1,
    config_recap_2,
    load_config,
    validate_config,
)
from flair_for_aigle_tpu.zonal.dataset import BatchedLoader, MultiModalSlicedDataset
from flair_for_aigle_tpu.zonal.model_utils import (
    build_inference_model,
    compute_patch_sizes,
)
from flair_for_aigle_tpu.zonal.postprocess import convert
from flair_for_aigle_tpu.zonal.slicing import generate_patches_from_reference
from flair_for_aigle_tpu.zonal.stripes import (
    LAST_TIMINGS,
    StripeCodec,
    StripeStream,
    finalize_canvases,
    future_frontiers,
)

# back-compat aliases (pre round-4 the codec lived here as a private class)
_StripeCodec = StripeCodec

logger = logging.getLogger(__name__)


def overwrite_config(config, model_ckpt_path, model_threshold_filepath,
                     result_folder, log_folder):
    config["model_weights"] = model_ckpt_path
    config["model_threshold_filepath"] = model_threshold_filepath
    config["output_path"] = result_folder
    config["log_folder"] = log_folder
    return config


def initialize_geometry_and_resolutions(config: Dict) -> Dict:
    """Reference inference.py:76-132."""
    modalities = config["modalities"]
    active = [m for m, a in modalities["inputs"].items() if a]
    resolutions, bounds = {}, []
    for mod in active:
        path = modalities[mod]["input_img_path"]
        with open_raster(path) as src:
            resolutions[mod] = round(src.res[0], 5)
            bounds.append((mod, src.bounds))
            if "image_shape_px" not in config:
                config["image_shape_px"] = {
                    "height": src.height, "width": src.width
                }
    ref_mod0, ref_bounds = bounds[0]
    for mod, b in bounds[1:]:
        if not np.allclose(list(b), list(ref_bounds), atol=1e-2):
            raise ValueError(
                f"Bounds mismatch between '{ref_mod0}' and '{mod}': "
                f"{list(ref_bounds)} vs {list(b)}"
            )
    # quirk-compat: min() picks the FINEST resolution (reference :114-115)
    ref_mod, reference_resolution = min(resolutions.items(), key=lambda x: x[1])
    config["reference_modality"] = ref_mod
    config["reference_resolution"] = reference_resolution
    config["modality_resolutions"] = resolutions
    config["image_bounds"] = {
        "left": ref_bounds.left, "bottom": ref_bounds.bottom,
        "right": ref_bounds.right, "top": ref_bounds.top,
    }
    config["tile_size_m"] = round(
        config["img_pixels_detection"] * reference_resolution, 2
    )
    config["margin_size_m"] = round(config["margin"] * reference_resolution, 2)
    return config


def prep_config(config_path: str, model_ckpt_path=None,
                model_threshold_filepath=None, result_folder=None,
                log_folder=None, images_folder=None) -> Dict:
    """Reference inference.py:54-73 (aigle overwrite path optional)."""
    config = load_config(config_path) if isinstance(config_path, str) else config_path
    if images_folder:
        rasters = sorted(
            p for p in os.listdir(images_folder)
            if p.lower().endswith((".tif", ".tiff", ".jp2"))
        )
        if rasters:
            config["modalities"]["AERIAL_RGBI"]["input_img_path"] = os.path.join(
                images_folder, rasters[0]
            )
    if model_ckpt_path is not None:
        config = overwrite_config(config, model_ckpt_path,
                                  model_threshold_filepath, result_folder,
                                  log_folder)
    validate_config(config)
    config_recap_1(config)
    config = initialize_geometry_and_resolutions(config)
    config_recap_2(config)
    config["output_type"] = config.get("output_type", "argmax")
    return config


def prep_dataset(config: Dict, tiles, patch_sizes: Dict[str, int]
                 ) -> MultiModalSlicedDataset:
    active = [m for m, a in config["modalities"]["inputs"].items() if a]
    modality_cfgs = {m: config["modalities"][m] for m in active}
    config["labels"] = [t["name"] for t in config["tasks"] if t["active"]]
    config["labels_configs"] = {
        t["name"]: {"value_name": (list(t["class_names"].values())
                                   if isinstance(t["class_names"], dict)
                                   else list(t["class_names"]))}
        for t in config["tasks"] if t["active"]
    }
    n_dp = config.get("data_parallel_devices") or 1
    modalities_config = config
    if n_dp <= 1 and device_tiling_plan(config) is not None:
        # HBM-resident tiling reads each raster exactly once (row stripes
        # straight to the device); a MemoryRaster preload would decode the
        # whole file a second time for nothing.
        modalities_config = dict(config)
        modalities_config["preload_rasters"] = False
    return MultiModalSlicedDataset(
        tiles=tiles,
        modality_cfgs=modality_cfgs,
        patch_size_dict=patch_sizes,
        ref_date_str=config.get("multitemp_model_ref_date", "01-01"),
        modalities_config=modalities_config,
        fixed_t=config.get("fixed_time_steps"),
    )


def init_outputs(config: Dict, ref_img, raster_index=None):
    """Create one canvas-backed writer per active task (inference.py:157-208)."""
    output_files, temp_paths = {}, {}
    output_type = config["output_type"]
    ref_res = config["reference_resolution"]
    out_res = config.get("output_px_meters", ref_res)
    image_bounds = config["image_bounds"]
    needs_rescale = abs(ref_res - out_res) > 1e-6
    suffix = "argmax" if output_type == "argmax" else "class-prob"
    idx_part = f"_{raster_index}" if raster_index is not None else "_i"

    for task in config["tasks"]:
        if not task["active"]:
            continue
        num_classes = len(task["class_names"])
        out_path = os.path.join(
            config["output_path"],
            f"{config['output_name']}_{task['name']}_{suffix}{idx_part}.tif",
        )
        if not needs_rescale:
            height, width = ref_img.height, ref_img.width
            transform = ref_img.transform
        else:
            height = int(round((image_bounds["top"] - image_bounds["bottom"]) / out_res))
            width = int(round((image_bounds["right"] - image_bounds["left"]) / out_res))
            transform = from_origin(image_bounds["left"], image_bounds["top"],
                                    out_res, out_res)
        count = num_classes if output_type == "class_prob" else 1
        output_files[task["name"]] = WindowedWriter(
            out_path, width, height, count, np.uint8, transform, ref_img.crs,
            compress="lzw",
        )
        temp_paths[task["name"]] = out_path
    return output_files, temp_paths


def resample_prediction(prediction: np.ndarray, scale: float) -> np.ndarray:
    """Reference inference.py:212-226 (scipy zoom order-0 semantics)."""
    return np.asarray(zoom_nearest(np.asarray(prediction), scale))


def load_geozone_contour(config, db=None) -> list:
    """Reference inference.py:229-252: cached geozone file filtered by
    iso_code; when the cache is absent, falls back to querying
    ``detections.fr_geozone_view`` (reference uses read_postgis) through
    aigle/db.py and writes the cache for subsequent runs."""
    geo_file = os.getenv("GEOZONES_SHAPEFILE", "")
    shp = os.path.join(getattr(config, "db_sources", "."), geo_file)
    if not geo_file or not os.path.isfile(shp):
        logger.warning("Geozones cache file not found, expecting: %s", shp)
        from flair_for_aigle_tpu.aigle.db import (
            DatabaseError,
            connect_from_env,
            fetch_geozones,
        )

        try:
            db = db or connect_from_env()
            if db is None:
                raise DatabaseError("DB_STRING_PROD not set")
            logger.info("Querying geozones from aigle bd topo...")
            from flair_for_aigle_tpu.geo.geos import from_wkt
            from flair_for_aigle_tpu.geo.gpkg import write_gpkg

            recs = []
            for row in fetch_geozones(db):
                recs.append({
                    "geometry": from_wkt(row["geometry"]),
                    "id": row.get("id"),
                    "name": row.get("name"),
                    "geo_zone_type": row.get("geo_zone_type"),
                    "name_normalized": row.get("name_normalized"),
                    "iso_code": row.get("iso_code"),
                })
            if geo_file and shp.lower().endswith(".gpkg"):
                crs = getattr(config, "input_crs", None) or "EPSG:2154"
                write_gpkg(shp, recs, layer="geozones", crs=crs)
                logger.info("Geozones cache created at %s", shp)
            else:
                # no cache location configured: filter in memory
                code = getattr(config, "geozones_codes", "all")
                return [
                    r["geometry"] for r in recs
                    if code in ("all", None)
                    or str(r.get("iso_code")) in str(code).split(",")
                ]
        except DatabaseError as e:
            raise FileNotFoundError(
                f"Geozones cache file not found: {shp} and the PostGIS "
                f"fallback is unavailable ({e}); provide the cached "
                "geozones GPKG/SHP or a reachable DB_STRING_PROD"
            ) from e
    if shp.lower().endswith(".shp"):
        # the reference's production cache is an ESRI shapefile loaded via
        # geopandas (inference.py:233-238); first-party reader in geo/
        from flair_for_aigle_tpu.geo.shapefile import read_shapefile

        records, crs = read_shapefile(shp)
    else:
        records, crs = read_gpkg(shp)
    code = getattr(config, "geozones_codes", "all")
    out = []
    for rec in records:
        if code in ("all", None) or str(rec.get("iso_code")) in str(code).split(","):
            geom = rec["geometry"]
            input_crs = getattr(config, "input_crs", crs)
            if input_crs and crs and input_crs != crs:
                from flair_for_aigle_tpu.geo.crs import transform_geometry
                geom = transform_geometry(geom, crs, input_crs)
            out.append(geom)
    return out


# ---------------------------------------------------------------------------
# Device pipeline
# ---------------------------------------------------------------------------


def device_tiling_plan(config: Dict) -> Dict | None:
    """Decide whether inference can run from HBM-resident rasters.

    The resident path ships each modality raster across the tunnel once and
    gathers/normalizes tiles on device; at reference defaults (512 px patch,
    40 px margin) the per-tile H2D path re-sends ~1.5x the raster bytes in
    window overlaps, and every byte costs when the chip sits behind a shared
    tunnel. Conditions (``device_resident_tiles``: auto/True/False):

    * no time-series modality active (TS tiles need host-side cloud filtering
      against a second raster + date metadata),
    * every active modality at the reference resolution (no per-window
      resample; reference model_utils.py:11-35 sizes coarser modalities
      differently),
    * normalization expressible on device ('custom'/'scaling'/'without');
      in "auto" mode 'custom' additionally requires ``normalize_on_device``
      (the host computes it in float64 — reference norm.py:8-52 — so the
      f32 device version is only used when the config opted in),
    * decoded rasters fit in ``device_tiles_max_bytes`` (default 3 GiB).
    """
    flag = config.get("device_resident_tiles", "auto")
    if not flag:
        return None
    active = [m for m, a in config["modalities"]["inputs"].items() if a]
    if any(m.endswith("_TS") for m in active):
        return None
    ref_res = config["reference_resolution"]
    norm_specs: Dict[str, tuple] = {}
    total_bytes = 0
    dims = None
    for mod in active:
        if abs(config["modality_resolutions"][mod] - ref_res) > 1e-9:
            return None
        mcfg = config["modalities"][mod]
        with open_raster(mcfg["input_img_path"]) as src:
            dtype = np.dtype(src.dtypes[0])
            total_bytes += src.width * src.height * src.count * dtype.itemsize
            # the stripe loop drives every modality's reads/dispatch off the
            # first raster's grid; a differently-sized second raster would
            # silently feed zero-filled regions — fall back to the host path
            if dims is None:
                dims = (src.width, src.height)
            elif dims != (src.width, src.height):
                return None
        ncfg = mcfg.get("normalization") or {}
        ntype = ncfg.get("type", "without")
        if ntype == "custom":
            if flag == "auto" and not config.get("normalize_on_device"):
                return None
            norm_specs[mod] = ("custom", ncfg["means"], ncfg["stds"])
        elif ntype == "scaling":
            if np.issubdtype(dtype, np.floating):
                norm_specs[mod] = ("cast",)
            else:
                info = np.iinfo(dtype)
                norm_specs[mod] = (
                    "scaling", float(max(abs(info.min), info.max))
                )
        elif ntype == "without":
            norm_specs[mod] = ("cast",)
        else:
            return None
    if total_bytes > config.get("device_tiles_max_bytes", 3 << 30):
        return None
    return {"mods": active, "norm_specs": norm_specs, "bytes": total_bytes}


@partial(jax.jit, donate_argnums=(0,))
def _place_stripe(buf, stripe, y0, x0):
    """Land one decoded row stripe into the margin-padded HBM raster.

    The buffer is donated: dynamic_update_slice aliases it in place instead
    of copying the full margin-padded raster per stripe (the caller rebinds
    ``bufs[mod]`` to the result)."""
    from jax import lax

    return lax.dynamic_update_slice(buf, stripe, (0, y0, x0))


_STEP_CACHE: dict = {}


def _norm_spec_key(spec) -> tuple:
    kind = spec[0]
    if kind == "custom":
        return ("custom", tuple(spec[1]), tuple(spec[2]))
    if kind == "scaling":
        return ("scaling", float(spec[1]))
    return (kind,)


def make_infer_step(model, output_type: str, margin_px: int, tile_size: int,
                    n_classes: Dict[str, int], scale_num: int, scale_den: int,
                    compute_dtype=jnp.float32, device_norm: Dict | None = None,
                    mesh=None):
    # memoize per process: a fresh jit closure per raster would re-trace and
    # re-load the executable onto the (possibly tunneled) device each time
    norm_key = tuple(sorted(
        (m, _norm_spec_key(spec)) for m, spec in (device_norm or {}).items()
    ))
    # key the mesh by its content (devices + axis names), not id(): DP runs
    # build a fresh-but-identical Mesh per raster, and an id() key would miss
    # on every raster — re-tracing + re-loading the executable over the
    # tunnel each time (minutes) despite this cache existing to avoid that
    mesh_key = None if mesh is None else (
        tuple(d.id for d in mesh.devices.flat), mesh.axis_names)
    cache_key = (id(model), output_type, margin_px, tile_size,
                 tuple(sorted(n_classes.items())), scale_num, scale_den,
                 str(compute_dtype), norm_key, mesh_key)
    if cache_key in _STEP_CACHE:
        return _STEP_CACHE[cache_key]
    step = _make_infer_step(model, output_type, margin_px, tile_size,
                            n_classes, scale_num, scale_den, compute_dtype,
                            device_norm, mesh)
    _STEP_CACHE[cache_key] = step
    return step


def _make_infer_step(model, output_type: str, margin_px: int, tile_size: int,
                     n_classes: Dict[str, int], scale_num: int, scale_den: int,
                     compute_dtype=jnp.float32, device_norm: Dict | None = None,
                     mesh=None):
    """Build the jit'd batch step: forward -> crop -> convert -> rescale.

    Returns tiles_u8 dict {task: (B, C_or_1, th, tw) uint8}. The nearest
    rescale uses a static integer ratio grid identical to scipy zoom
    order-0 on the cropped tile.

    ``device_norm`` maps modality -> normalization spec applied on device:
    ``("custom", means, stds)`` (reference norm.py 'custom'),
    ``("scaling", maxval)`` ('scaling' / img_as_float), or ``("cast",)``
    ('without' on integer inputs — plain float cast).
    """

    inner = tile_size - 2 * margin_px

    def _maybe_rescale_idx():
        if scale_num == scale_den:
            return None
        out_size = int(round(inner * scale_num / scale_den))
        if out_size <= 1 or inner <= 1:
            idx = np.zeros(out_size, np.int64)
        else:
            src = np.arange(out_size) * (inner - 1) / (out_size - 1)
            idx = np.clip(np.round(src).astype(np.int64), 0, inner - 1)
        return jnp.asarray(idx)

    rescale_idx = _maybe_rescale_idx()

    norm_consts = {}
    for mod, spec in (device_norm or {}).items():
        if spec[0] == "custom":
            norm_consts[mod] = (
                "custom",
                jnp.asarray(spec[1], jnp.float32)[None, :, None, None],
                jnp.asarray(spec[2], jnp.float32)[None, :, None, None],
            )
        elif spec[0] == "scaling":
            norm_consts[mod] = ("scaling", np.float32(1.0 / spec[1]))
        else:
            norm_consts[mod] = ("cast",)

    def _apply_norm(k, v):
        spec = norm_consts.get(k)
        if spec is None:
            return v
        if spec[0] == "custom":
            return (v.astype(jnp.float32) - spec[1]) / spec[2]
        if spec[0] == "scaling":
            return v.astype(jnp.float32) * spec[1]
        return v.astype(jnp.float32)

    stride4 = bool(getattr(model, "config", {}).get("zonal_stride4_logits"))

    def forward_convert(variables, batch):
        cast = {}
        for k, v in batch.items():
            v = _apply_norm(k, v)
            if (isinstance(v, jnp.ndarray) and v.dtype == jnp.float32
                    and not k.endswith("_DATES")):
                v = v.astype(compute_dtype)
            cast[k] = v
        logits_tasks, _ = model.apply(variables, cast)
        out = {}
        for task, logits in logits_tasks.items():
            if stride4:
                # NHWC stride-4 logits -> fused x4-bilinear + crop + convert
                from flair_for_aigle_tpu.ops.pallas.epilogue import (
                    upsample_crop_convert,
                )

                lgs4 = jnp.transpose(logits, (0, 3, 1, 2))
                pred = upsample_crop_convert(
                    lgs4, margin=margin_px, scale=4, output_type=output_type,
                )
            else:
                lg = logits[:, :, margin_px:tile_size - margin_px,
                            margin_px:tile_size - margin_px].astype(jnp.float32)
                if output_type == "argmax":
                    pred = jnp.argmax(lg, axis=1).astype(jnp.uint8)[:, None]
                else:
                    probs = jax.nn.softmax(lg, axis=1)
                    pred = jnp.round(probs * 255).astype(jnp.uint8)
            if rescale_idx is not None:
                pred = jnp.take(pred, rescale_idx, axis=-2)
                pred = jnp.take(pred, rescale_idx, axis=-1)
            out[task] = pred
        return out

    if mesh is not None:
        # GSPMD cannot partition pallas_call, but shard_map can: each dp
        # shard runs the full fused-kernel forward on its slice of the
        # batch, so multi-device meshes keep the single-chip kernel speed
        # (round-2 gated the kernels off here instead).
        from jax.sharding import PartitionSpec as P

        fwd = jax.shard_map(
            forward_convert, mesh=mesh,
            in_specs=(P(), P("dp")), out_specs=P("dp"), check_vma=False,
        )
    else:
        fwd = forward_convert
    step = jax.jit(fwd)

    from functools import partial as _partial
    from jax import lax as _lax

    @_partial(jax.jit, donate_argnums=(3,))
    def step_and_stitch(variables, batch, offsets, canvases):
        """Single dispatch per batch: forward + convert + canvas scatter."""
        preds = step(variables, batch)
        new = {}
        for t, canvas in canvases.items():
            tiles_t = preds[t]

            def body(i, cv, tiles_t=tiles_t):
                return _lax.dynamic_update_slice(
                    cv, tiles_t[i], (0, offsets[i, 0], offsets[i, 1])
                )

            new[t] = _lax.fori_loop(0, tiles_t.shape[0], body, canvas)
        return new

    @_partial(jax.jit, donate_argnums=(5,))
    def gather_step_and_stitch(variables, rasters, extras, in_offs, out_offs,
                               canvases):
        """Device-resident tiling: slice the batch's tiles out of HBM-resident
        (margin-padded) rasters, then forward + convert + canvas scatter — the
        raster crosses the host->device tunnel exactly once per run instead of
        once per overlapping tile (~1.5x the bytes at 512/40 patch/margin)."""
        batch = dict(extras)
        for mod, raster in rasters.items():
            offs = in_offs[mod]
            c = raster.shape[0]

            def one(off, raster=raster, c=c):
                return _lax.dynamic_slice(
                    raster, (0, off[0], off[1]), (c, tile_size, tile_size)
                )

            batch[mod] = jax.vmap(one)(offs)
        return step_and_stitch(variables, batch, out_offs, canvases)

    step.step_and_stitch = step_and_stitch
    step.gather_step_and_stitch = gather_step_and_stitch
    return step


def inference_and_write(model, variables, dataloader, tiles, config: Dict,
                        output_files: Dict[str, WindowedWriter], ref_img,
                        mesh=None) -> None:
    """Run batched inference, stitch on device, land each canvas once.

    Multi-chip: set ``data_parallel_devices`` in the config (or pass a mesh)
    to shard each batch over the ``dp`` axis — params and canvases stay
    replicated and GSPMD gathers the small uint8 tiles for the scatter.
    """
    LAST_TIMINGS.clear()
    n_dp = config.get("data_parallel_devices")
    if mesh is None and n_dp and n_dp > 1:
        from flair_for_aigle_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_devices=n_dp)
    margin_px = config["margin"]
    tile_size = config["img_pixels_detection"]
    output_type = config["output_type"]
    ref_res = config["reference_resolution"]
    out_res = config.get("output_px_meters", ref_res)
    needs_rescale = abs(ref_res - out_res) > 1e-6
    image_bounds = {
        "left": ref_img.bounds.left, "bottom": ref_img.bounds.bottom,
        "right": ref_img.bounds.right, "top": ref_img.bounds.top,
    }
    # static rational scale for the device-side rescale grid
    scale_den, scale_num = 1000000, int(round(1000000 * ref_res / out_res))
    if not needs_rescale:
        scale_num = scale_den

    tasks = list(output_files.keys())
    n_classes = {t: output_files[t].count for t in tasks}
    # the resident path runs under DP meshes too: rasters/canvases stay
    # replicated, the shard_mapped step gathers+computes each shard's slice
    # of the batch, and GSPMD all-gathers the small uint8 tiles for the
    # replicated canvas scatter
    plan = device_tiling_plan(config)
    device_norm = None
    if plan:
        device_norm = plan["norm_specs"]
    elif config.get("normalize_on_device"):
        device_norm = {}
        for mod, active in config["modalities"]["inputs"].items():
            if not active or mod.endswith("_TS"):
                continue
            ncfg = config["modalities"][mod].get("normalization") or {}
            ntype = ncfg.get("type", "without")
            if ntype == "custom":
                device_norm[mod] = ("custom", ncfg["means"], ncfg["stds"])
            elif ntype == "scaling":
                path = config["modalities"][mod]["input_img_path"]
                with open_raster(path) as src:
                    dtype = np.dtype(src.dtypes[0])
                if np.issubdtype(dtype, np.floating):
                    device_norm[mod] = ("cast",)
                else:
                    info = np.iinfo(dtype)
                    device_norm[mod] = (
                        "scaling", float(max(abs(info.min), info.max))
                    )
            else:
                device_norm[mod] = ("cast",)
    if mesh is not None:
        n_dp = mesh.shape.get("dp", 1)
        bsz = dataloader.batch_size
        if bsz % n_dp:
            raise ValueError(
                f"batch_size {bsz} must be divisible by "
                f"data_parallel_devices {n_dp} (shard_map over the dp axis)"
            )
    step = make_infer_step(
        model, output_type, margin_px, tile_size, n_classes,
        scale_num, scale_den,
        compute_dtype=jnp.bfloat16 if config.get("compute_dtype") == "bfloat16"
        else jnp.float32,
        device_norm=device_norm,
        mesh=mesh,
    )

    inner = tile_size - 2 * margin_px
    th = int(round(inner * scale_num / scale_den)) if needs_rescale else inner

    if mesh is not None:
        from flair_for_aigle_tpu.parallel.mesh import replicate_tree

        variables = replicate_tree(mesh, variables)

    # device canvases padded by one tile each side so every scatter is in-bounds
    canvases = {}
    for t in tasks:
        w = output_files[t]
        canvas = jnp.zeros((w.count, w.height + th, w.width + th), jnp.uint8)
        if mesh is not None:
            from flair_for_aigle_tpu.parallel.mesh import replicated

            canvas = jax.device_put(canvas, replicated(mesh))
        canvases[t] = canvas

    img_h = {t: output_files[t].height for t in tasks}
    img_w = {t: output_files[t].width for t in tasks}
    # The frontier/stripe machinery below indexes img_h/img_w via tasks[0]
    # for every task; all output canvases share one geometry by construction
    # (same image_bounds / out_res — zonal config defines one output grid),
    # so differing sizes would silently encode pad rows for the shorter task.
    assert all(img_h[t] == img_h[tasks[0]] and img_w[t] == img_w[tasks[0]]
               for t in tasks), (
        f"output canvases must share one geometry, got "
        f"{[(t, img_h[t], img_w[t]) for t in tasks]}")

    # Streamed canvas D2H (zonal/stripes.py): a two-ended row frontier
    # encodes canvas rows the moment no remaining tile can write them, so
    # the D2H overlaps compute instead of landing as a dead tail fetch.
    n_total = len(tiles)
    tile_tops = np.empty(n_total, np.int64)
    tile_lefts = np.empty(n_total, np.int64)
    for i, row in enumerate(tiles):
        tile_tops[i] = int(round((image_bounds["top"] - row["top"]) / out_res))
        tile_lefts[i] = int(round((row["left"] - image_bounds["left"])
                                  / out_res))
    tile_bots = np.minimum(tile_tops + th, img_h[tasks[0]])
    consumed = 0
    # Stripe D2H codec: device-side RLE (class maps are piecewise-constant;
    # 4-1000x fewer bytes) with 5-bit packing as the incompressible
    # fallback, both computed on device so only the winner crosses the
    # tunnel at full size. class_prob canvases are dense probability bytes
    # and ship raw. config 'pack_d2h' false -> raw; 'd2h_codec' picks
    # 'auto' (RLE+pack5, default) or 'pack5'.
    pack = (config.get("pack_d2h", True) and output_type == "argmax"
            and all(output_files[t].count == 1 for t in tasks)
            and all(len(tk["class_names"]) <= 32
                    for tk in config["tasks"] if tk.get("active")))
    use_rle = pack and config.get("d2h_codec", "auto") == "auto"
    codec = StripeCodec(pack, use_rle, img_w)
    stream = StripeStream(tasks, img_h[tasks[0]], codec)

    def _out_offsets(indices, valid):
        offs = np.zeros((len(indices), 2), np.int32)
        for i, idx in enumerate(indices):
            if i >= valid:
                offs[i] = (img_h[tasks[0]], img_w[tasks[0]])  # padded area
                continue
            row = tiles[int(idx)]
            offs[i] = (
                int(round((image_bounds["top"] - row["top"]) / out_res)),
                int(round((row["left"] - image_bounds["left"]) / out_res)),
            )
        return offs

    logger.info("[ ] Starting inference and on-device stitching ...")

    if plan:
        # --- HBM-resident rasters: gather tiles on device ----------------
        # Fully pipelined: decode stripe i+1 on the host while stripe i's
        # async H2D is in flight, and dispatch each tile batch the moment
        # every row it gathers is resident — compute overlaps the upload,
        # and the striped canvas D2H overlaps both.
        from flair_for_aigle_tpu.geo.windows import from_bounds

        logger.info("[ ] device-resident tiling: %d modality raster(s), "
                    "%.1f MB H2D", len(plan["mods"]), plan["bytes"] / 1e6)
        readers = dataloader.dataset.readers
        in_offs_all = {}
        for mod in plan["mods"]:
            tr = readers[mod].transform
            offs = np.zeros((n_total, 2), np.int32)
            for i, row in enumerate(tiles):
                win = from_bounds(*row["geometry"].bounds,
                                  transform=tr).round()
                offs[i] = (int(win.row_off) + margin_px,
                           int(win.col_off) + margin_px)
            in_offs_all[mod] = offs
        bsz = dataloader.batch_size
        ps = config["img_pixels_detection"]
        extras = {
            t: jnp.zeros((bsz, 1, ps, ps), jnp.float32)
            for t in config["labels"]
        }

        # Processing order: bottom-up row-major (grid rows bottom -> top,
        # left -> right within a row). The tile LIST keeps the reference's
        # column-major generation order (ids, GPKG dumps, host path), but
        # processing column-major defeats the pipeline twice over: batch 1
        # would gather the full raster height (no read/compute overlap) and
        # no output row is final until the last column (no streamed D2H).
        # Bottom-up row-major preserves every overlap seam's winner: tiles
        # only overlap where the grid snaps (right column / top row), and
        # for any overlapping pair the reference-later tile (larger x, then
        # larger y) is still processed later here.
        order = np.lexsort((tile_lefts, -tile_tops))
        fmt_res, fmb_res = future_frontiers(order, tile_tops, tile_bots,
                                            img_h[tasks[0]])
        batch_starts = list(range(0, n_total, bsz))
        # lowest raster row a batch's gathers touch (bottom-up reads make
        # rows [read_lo, height) resident; margins above the raster are the
        # buffer's zero init, so clamp at 0)
        need_lo = [
            max(0, int(min(in_offs_all[m][order[s:min(s + bsz, n_total)],
                                          0].min()
                           for m in plan["mods"])) - margin_px)
            for s in batch_starts
        ]

        bufs = {}
        for mod in plan["mods"]:
            r = readers[mod]
            n_ch = len(config["modalities"][mod].get("channels")
                       or range(r.count))
            buf = jnp.zeros(
                (n_ch, r.height + 2 * margin_px, r.width + 2 * margin_px),
                np.dtype(r.dtypes[0]),
            )
            if mesh is not None:
                from flair_for_aigle_tpu.parallel.mesh import replicated

                buf = jax.device_put(buf, replicated(mesh))
            bufs[mod] = buf
        stripe_sharding = None
        if mesh is not None:
            from flair_for_aigle_tpu.parallel.mesh import replicated

            stripe_sharding = replicated(mesh)
        height = readers[plan["mods"][0]].height
        width = readers[plan["mods"][0]].width
        itemsize = max(np.dtype(readers[m].dtypes[0]).itemsize
                       for m in plan["mods"])
        stripe_rows = max(64, (8 << 20) // max(1, width * 3 * itemsize))
        # align stripes to the decode granularity (TIFF tile rows / JP2
        # precinct rows): gt_read_window decodes whole tiles with no cache,
        # so a misaligned stripe pays ~2x the LZW decode of the raster
        block = max((getattr(readers[m], "block_rows", 1) or 1)
                    for m in plan["mods"])
        if block > 1:
            stripe_rows = max(block, (stripe_rows // block) * block)

        bi = 0

        def dispatch_ready(read_lo: int):
            nonlocal bi, canvases, consumed
            while bi < len(batch_starts) and (
                read_lo <= need_lo[bi] or read_lo <= 0
            ):
                start = batch_starts[bi]
                idxs = order[start:min(start + bsz, n_total)]
                valid = len(idxs)
                if valid < bsz:
                    idxs = np.concatenate(
                        [idxs, np.full(bsz - valid, idxs[-1], idxs.dtype)]
                    )
                in_offs = {m: jnp.asarray(in_offs_all[m][idxs])
                           for m in plan["mods"]}
                out_offs = jnp.asarray(_out_offsets(idxs, valid))
                canvases = step.gather_step_and_stitch(
                    variables, bufs, extras, in_offs, out_offs, canvases
                )
                consumed += valid
                c = min(consumed, n_total)
                stream.advance(canvases, fmt_res[c], fmb_res[c])
                bi += 1

        timing = os.getenv("FLAIR_ZONAL_TIMING")
        t_read = t_put = t_disp = 0.0
        t_start = time.perf_counter()
        x0 = jnp.int32(margin_px)
        # read stripes bottom-up to match the processing order: the first
        # grid row of tiles is ready after one stripe, so compute overlaps
        # the remaining decode instead of waiting for the full raster
        spans = [(y0, min(stripe_rows, height - y0))
                 for y0 in range(0, height, stripe_rows)]
        for y0, h in reversed(spans):
            for mod in plan["mods"]:
                t0 = time.perf_counter()
                arr = readers[mod].read(
                    indexes=config["modalities"][mod].get("channels"),
                    window=Window(0, y0, width, h),
                )
                if arr.ndim == 2:
                    arr = arr[None]
                t1 = time.perf_counter()
                bufs[mod] = _place_stripe(
                    bufs[mod],
                    jax.device_put(arr, stripe_sharding),
                    jnp.int32(y0 + margin_px), x0,
                )
                t2 = time.perf_counter()
                t_read += t1 - t0
                t_put += t2 - t1
            t0 = time.perf_counter()
            dispatch_ready(y0)
            codec.poll()
            t_disp += time.perf_counter() - t0
        t0 = time.perf_counter()
        dispatch_ready(0)
        codec.poll()
        t_disp += time.perf_counter() - t0
        t0 = time.perf_counter()
        finalize_canvases(canvases, stream, img_h, output_files)
        LAST_TIMINGS.update(
            read_s=round(t_read, 3), put_s=round(t_put, 3),
            dispatch_s=round(t_disp, 3),
            finalize_s=round(time.perf_counter() - t0, 3),
            total_s=round(time.perf_counter() - t_start, 3),
        )
        if timing:
            logger.warning(
                "[timing] resident path: read=%.2fs put=%.2fs dispatch=%.2fs "
                "finalize=%.2fs total=%.2fs",
                t_read, t_put, t_disp, time.perf_counter() - t0,
                time.perf_counter() - t_start,
            )
        logger.info("[ok] canvases written")
        return

    # --- host windowed-read path ------------------------------------------
    # The dataset emits reference-parity extras (``*_RAW`` copies and big
    # zero-filled label tensors) that the forward never consumes — shipping
    # them to the device costs ~10x the useful H2D volume. Labels are only
    # read for their spatial size, so a device-resident zero stand-in with
    # one channel is substituted once.
    device_labels = None
    # iterate the loader bottom-up row-major so output rows finalize
    # progressively (streamed canvas D2H); same permutation + seam-winner
    # proof as the resident path. A foreign loader (or a pre-set custom
    # order) keeps its order and the frontier stays fully conservative —
    # everything lands in the single finalize encode, which is correct for
    # ANY consumption order.
    host_order = np.lexsort((tile_lefts, -tile_tops))
    order_used = None
    if n_total > 1 and hasattr(dataloader, "order"):
        if dataloader.order is None:
            dataloader.order = host_order.tolist()
        if list(dataloader.order) == host_order.tolist():
            order_used = host_order
    if order_used is not None:
        fmt_host, fmb_host = future_frontiers(order_used, tile_tops,
                                              tile_bots, img_h[tasks[0]])
    else:
        fmt_host = np.zeros(n_total + 1, np.int64)
        fmb_host = np.full(n_total + 1, img_h[tasks[0]], np.int64)
    for batch in dataloader:
        valid = batch.pop("valid")
        indices = np.asarray(batch["index"]).reshape(-1)
        jb = {
            k: jnp.asarray(v) for k, v in batch.items()
            if isinstance(v, np.ndarray) and k != "index"
            and not k.endswith("_RAW") and k not in config["labels"]
        }
        if mesh is not None:
            from flair_for_aigle_tpu.parallel.mesh import shard_batch

            jb = shard_batch(mesh, jb)
        if device_labels is None:
            bsz = len(indices)
            ps = config["img_pixels_detection"]
            device_labels = {
                t: jnp.zeros(
                    (bsz, 1) + (tuple(np.shape(batch[t])[-2:])
                                if t in batch else (ps, ps)),
                    jnp.float32,
                )
                for t in config["labels"]
            }
        jb.update(device_labels)

        # offsets identical for all tasks (shared grid)
        offs = _out_offsets(indices, valid)
        # fused forward+convert+scatter: one dispatch per batch
        canvases = step.step_and_stitch(variables, jb, jnp.asarray(offs),
                                        canvases)
        consumed += int(valid)
        c = min(consumed, n_total)
        stream.advance(canvases, fmt_host[c], fmb_host[c])

    finalize_canvases(canvases, stream, img_h, output_files)
    logger.info("[ok] canvases written")




# ---------------------------------------------------------------------------
# Vectorization entry points (reference parity surface)
# ---------------------------------------------------------------------------


def raster_to_polygons(output_files, ignore_background=True, background_value=18,
                       min_area=1.0, simplification=0.1, n_jobs=None):
    """Reference raster_to_polygons (inference.py:377-413): reads the
    written raster for the first task and vectorizes per class. Accepts the
    dict of writers (reference passes ``output_files``) or a path."""
    if isinstance(output_files, dict):
        first = next(iter(output_files.values()))
        path = first.path
    else:
        path = output_files
    with open_raster(path) as src:
        data = src.read(1)
        transform = src.transform
        crs = src.crs
    polys = _raster_to_polys(
        data, transform, ignore_background=ignore_background,
        background_value=background_value, min_area=min_area,
        simplification=simplification, n_jobs=n_jobs,
    )
    for p in polys:
        p["crs"] = crs
    return polys


def logits_to_labels_and_confidence(probs: np.ndarray):
    labels = np.argmax(probs, axis=0).astype(np.uint8)
    confidence = np.max(probs, axis=0)
    return labels, confidence


def vectorize_segmentation(labels, confidence, transform, crs="EPSG:5490",
                           simplification_tolerance=1.0, min_area=0.0):
    """Reference inference.py:574-595: polygons with mean confidence."""
    out = []
    for cls in np.unique(labels):
        if cls == 0:
            continue
        mask_mean = float(confidence[labels == cls].mean())
        from flair_for_aigle_tpu.geo.polygonize import polygons_for_class
        for poly in polygons_for_class(labels, int(cls), transform,
                                       min_area=min_area,
                                       simplification=simplification_tolerance):
            out.append({"geometry": poly, "class_id": int(cls),
                        "confidence": mask_mean, "crs": crs})
    return out


def postpro_outputs(temp_paths: Dict[str, str], config: Dict) -> None:
    if config.get("cog_conversion", False):
        from flair_for_aigle_tpu.geo.geotiff import convert_to_cog

        for task_name, temp_path in temp_paths.items():
            cog_path = temp_path.replace(".tif", "_COG.tif")
            convert_to_cog(temp_path, cog_path)
            temp_paths[task_name] = cog_path
            logger.info("[ok] Converted to COG: %s", cog_path)


def run_inference(config_path: str) -> Dict[str, str]:
    """Standalone zonal entry point (reference inference.py:644-674)."""
    start_total = time.time()
    config = prep_config(config_path)

    start_slice = time.time()
    tiles = generate_patches_from_reference(config)
    logger.info("[ok] Sliced into %d tiles in %.2fs", len(tiles),
                time.time() - start_slice)

    start_model = time.time()
    patch_sizes = compute_patch_sizes(config)
    # labels/labels_configs needed before model build
    config["labels"] = [t["name"] for t in config["tasks"] if t["active"]]
    config["labels_configs"] = {
        t["name"]: {"value_name": (list(t["class_names"].values())
                                   if isinstance(t["class_names"], dict)
                                   else list(t["class_names"]))}
        for t in config["tasks"] if t["active"]
    }
    model, variables, model_cfg = build_inference_model(
        config, patch_sizes, batch_size=config.get("batch_size", 8),
        t_steps=config.get("fixed_time_steps", 4),
    )
    logger.info("[ok] Loaded model and checkpoint in %.2fs",
                time.time() - start_model)

    dataset = prep_dataset(config, tiles, patch_sizes)
    dataloader = BatchedLoader(dataset, batch_size=config.get("batch_size", 8),
                               num_workers=config.get("num_worker", 1))

    ref_img = open_raster(
        config["modalities"][config["reference_modality"]]["input_img_path"]
    )
    output_files, temp_paths = init_outputs(config, ref_img)

    start_inf = time.time()
    inference_and_write(model, variables, dataloader, tiles, config,
                        output_files, ref_img)
    logger.info("[ok] Inference completed in %.2fs", time.time() - start_inf)

    postpro_outputs(temp_paths, config)
    logger.info("[ok] Total time: %.2fs", time.time() - start_total)
    logger.info("[ok] Rasters written to: %s", list(temp_paths.values()))
    ref_img.close()
    dataset.close()
    return temp_paths


# Legacy accumulate variant moved to zonal/legacy.py (round-4 split);
# re-exported here for API compatibility.
from flair_for_aigle_tpu.zonal.legacy import inference  # noqa: E402
