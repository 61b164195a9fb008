"""Checkpoint name-map proof at full flagship geometry (VERDICT round-1
item #4): published smp-0.4.0 + timm-1.x checkpoints spell some module
paths differently from our canonical tree. Feed synthetic state dicts in
those external layouts through ``load_checkpoint`` at the REAL
swin_base_patch4_window12_384-upernet geometry (embed 128, depths
2/2/18/2, window 12 -> 529-entry bias tables) and assert zero silent
re-initialization plus exact weight round-trip.

External layouts covered (reference
/root/reference/flair_hub/models/monotemp_model.py:68-92 builds the model
via smp.create_model with a tu- timm encoder):
* timm FeatureListNet(flatten_sequential=True): swin stage Sequential
  children renamed ``layers.{i}`` -> ``layers_{i}``.
* timm FeatureGetterNet: one extra ``model.`` nesting level.
* smp upernet PSP branches as bare ``Sequential`` (``psp.blocks.{i}.1``).
* Lightning ``model.`` prefix on every key.
"""

import re

import jax
import numpy as np
import pytest
from safetensors.numpy import save_file

from flair_for_aigle_tpu.models.checkpoint import (
    coverage_by_module,
    export_torch_state_dict,
    load_checkpoint,
    normalize_external_state_dict,
)
from flair_for_aigle_tpu.models.flair_model import FlairHubModel
from tests._fixtures import make_config

ARCH = "swin_base_patch4_window12_384-upernet"


@pytest.fixture(scope="module")
def flagship():
    import jax.numpy as jnp

    cfg = make_config(arch=ARCH, mono=("AERIAL_RGBI",),
                      tasks=(("AERIAL_LABEL-COSIA", 19),))
    model = FlairHubModel(config=cfg)
    batch = {
        "AERIAL_RGBI": jnp.zeros((1, 3, 64, 64), jnp.float32),
        "AERIAL_LABEL-COSIA": jnp.zeros((1, 19, 64, 64), jnp.float32),
    }
    variables = dict(jax.jit(model.init)(jax.random.key(0), batch))
    return cfg, model, batch, variables


def _external_layout(sd: dict) -> dict:
    """Rewrite a canonical torch state dict into the published external
    spelling (the inverse of the loader's alias normalization)."""
    out = {}
    for k, v in sd.items():
        k = re.sub(r"\.model\.layers\.(\d+)\.", r".model.layers_\1.", k)
        k = re.sub(r"\.psp\.blocks\.(\d+)\.pool\.1\.", r".psp.blocks.\1.1.", k)
        out["model." + k] = v  # Lightning prefix
    return out


@pytest.mark.slow
def test_flagship_geometry(flagship):
    _, _, _, variables = flagship
    p = variables["params"]
    enc = p["encoders.AERIAL_RGBI.seg_model"]["model"]
    # window 12 -> (2*12-1)^2 = 529 bias entries; swin-base head counts
    table = enc["layers.0.blocks.0"]["attn"]["relative_position_bias_table"]
    assert table.shape == (529, 4)
    table3 = enc["layers.3.blocks.1"]["attn"]["relative_position_bias_table"]
    assert table3.shape == (529, 32)
    # downsample at the START of stages 1..3 (timm 0.9+ placement)
    assert "layers.1.downsample" in enc and "layers.0.downsample" not in enc
    assert enc["layers.1.downsample"]["norm"]["scale"].shape == (512,)
    assert enc["layers.1.downsample"]["reduction"]["kernel"].shape == (512, 256)


@pytest.mark.slow
def test_external_layout_loads_with_zero_reinit(flagship, tmp_path):
    cfg, model, batch, variables = flagship
    sd = export_torch_state_dict(variables)
    external = _external_layout(sd)
    assert not any(".layers.0." in k for k in external)  # layout applied

    path = str(tmp_path / "external.safetensors")
    save_file({k: np.ascontiguousarray(v) for k, v in external.items()}, path)

    conf = {"paths": {"ckpt_model_path": path}}
    zeros = jax.tree.map(np.zeros_like, variables)
    loaded, report = load_checkpoint(conf, zeros)

    assert report["missing"] == [], report["missing"][:10]
    assert report["unused"] == [], report["unused"][:10]
    assert report["shape_mismatch"] == []
    assert report["reinit_tasks"] == []
    assert report["matched_tasks"] == ["AERIAL_LABEL-COSIA"]
    for module, (n_loaded, n_total) in report["coverage"].items():
        assert n_loaded == n_total, (module, n_loaded, n_total)

    # exact weight round-trip through the external spelling
    flat_a = jax.tree_util.tree_leaves(variables)
    flat_b = jax.tree_util.tree_leaves(loaded)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unknown_layout_is_flagged_not_silent(flagship):
    _, _, _, variables = flagship
    sd = export_torch_state_dict(variables)
    # an unrecognizable layout: mangle every encoder key
    bad = {k.replace(".seg_model.model.", ".seg_model.backbone."): v
           for k, v in sd.items()}
    normalized, aliases = normalize_external_state_dict(
        bad, list(sd.keys())
    )
    # no alias silently "fixes" an unknown layout
    assert not any(".seg_model.model." in k for k in normalized
                   if ".backbone." in k)
    from flair_for_aigle_tpu.models.checkpoint import (
        _flatten,
        convert_torch_state_dict,
    )

    _, report = convert_torch_state_dict(normalized, variables)
    cov = coverage_by_module(report, _flatten(variables["params"]))
    n_loaded, n_total = cov["encoders.AERIAL_RGBI"]
    assert n_loaded < 0.9 * n_total  # the loud-coverage guard would fire
