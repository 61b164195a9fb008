"""Multimodal full-geometry golden parity (VERDICT round-3 ask #4): the
flagship FLAIR-HUB fusion case 4 — mono swin + Sentinel-2 UTAE + full
FusionHandler + upernet main decoder + aux decoders on BOTH modalities —
against the independent torch oracle (tests/torch_refs.py:TFlairHubModel),
THROUGH the checkpoint converter (zero re-init contract), at both a fast
micro geometry and the production swin-base/512px/19-class geometry
(reference flair_hub/models/flair_model.py:316-435 + FusionHandler
:437-547).

Per-stage activation fingerprints (mean/std/absmax of every captured module
output) are pinned in tests/golden/multimodal_fingerprints.json so any
future numerical drift — INCLUDING a coordinated repo+oracle change that
golden comparison alone cannot see — fails loudly. Regenerate after an
intentional numerics change with:

    python tools/gen_golden_fingerprints.py
"""

import json
import os

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from flair_for_aigle_tpu.models.checkpoint import convert_torch_state_dict
from flair_for_aigle_tpu.models.flair_model import (
    FLAIR_TRANSPOSE_CONV_PATTERNS,
    FlairHubModel,
)

from tests._fixtures import make_config
from tests.torch_refs import TFlairHubModel

FINGERPRINT_PATH = os.path.join(os.path.dirname(__file__), "golden",
                                "multimodal_fingerprints.json")

TASK = "AERIAL_LABEL-COSIA"

# module paths whose outputs are fingerprinted (one per pipeline stage)
CAPTURE = (
    "encoders.AERIAL_RGBI.seg_model",  # mono swin feature pyramid
    "encoders.SENTINEL2_TS",           # UTAE (logits, maps)
    "fusion_handler",                  # fused pyramid
    f"main_decoders.{TASK}.seg_model",  # task decoder (pre-resize)
)


def build_pair(n_classes, img, s2, t_steps, arch, oracle_kw, seed=0):
    """(jax model+variables loaded from the torch oracle, torch oracle,
    batch) — the converter must map every key (zero re-init)."""
    torch.manual_seed(seed)
    tmodel = TFlairHubModel(tasks=(TASK,), nclasses=(n_classes,),
                            **oracle_kw).eval()

    cfg = make_config(arch=arch, mono=("AERIAL_RGBI",),
                      multi=("SENTINEL2_TS",),
                      tasks=((TASK, n_classes),),
                      aux=("AERIAL_RGBI", "SENTINEL2_TS"))
    model = FlairHubModel(config=cfg)

    rng = np.random.default_rng(seed)
    batch_np = {
        "AERIAL_RGBI": rng.normal(size=(1, 3, img, img)).astype(np.float32),
        "SENTINEL2_TS": rng.normal(
            size=(1, t_steps, 3, s2, s2)).astype(np.float32),
        "SENTINEL2_DATES": np.sort(
            rng.integers(-180, 180, (1, t_steps))).astype(np.float32),
        TASK: np.zeros((1, n_classes, img, img), np.float32),
    }
    jb = {k: jnp.asarray(v) for k, v in batch_np.items()}
    variables = dict(jax.jit(model.init)(jax.random.key(0), jb))

    sd = {k: v.detach().numpy().copy() for k, v in tmodel.state_dict().items()}
    new_vars, report = convert_torch_state_dict(
        sd, variables,
        transpose_conv_prefixes=FLAIR_TRANSPOSE_CONV_PATTERNS,
    )
    # the golden contract: NOTHING re-inits, nothing is left over
    assert not report["missing"], report["missing"][:8]
    assert not report["unused"], report["unused"][:8]
    assert not report["shape_mismatch"], report["shape_mismatch"][:8]
    return model, new_vars, tmodel, batch_np, jb


def run_oracle(tmodel, batch_np):
    with torch.no_grad():
        want_tasks, want_aux = tmodel(
            {k: torch.from_numpy(v) for k, v in batch_np.items()})
    return ({k: v.numpy() for k, v in want_tasks.items()},
            {k: v.numpy() for k, v in want_aux.items()})


def assert_logits_match(got, want, atol_med=1e-3, abs_max=0.06):
    assert got.shape == want.shape, (got.shape, want.shape)
    err = np.abs(got - want)
    denom = np.maximum(np.abs(want), 1e-2)
    assert np.median(err / denom) < atol_med, np.median(err / denom)
    assert np.max(err) < abs_max, np.max(err)
    agree = (got.argmax(1) == want.argmax(1)).mean()
    assert agree > 0.999, agree


def capture_fingerprints(model, variables, jb):
    """{stage: [(mean, std, absmax), ...]} for every CAPTURE module output."""
    filt = lambda mdl, method: mdl.name in CAPTURE
    _, state = model.apply(variables, jb, capture_intermediates=filt,
                           mutable=["intermediates"])
    inter = state["intermediates"]
    out = {}
    for name in CAPTURE:
        node = inter
        for part in [name]:  # dotted flax names are single path components
            node = node[part]
        arrays = [np.asarray(a, np.float64)
                  for a in jax.tree.leaves(node["__call__"])]
        arrays = [a for a in arrays if a.size]  # skip 0-channel dummies
        out[name] = [
            [float(a.mean()), float(a.std()), float(np.abs(a).max())]
            for a in arrays
        ]
    return out


def check_fingerprints(got: dict, key: str, rtol=5e-4):
    """Compare captured stage stats against the committed goldens."""
    if not os.path.exists(FINGERPRINT_PATH):
        pytest.fail(
            f"{FINGERPRINT_PATH} missing — run "
            "`python tools/gen_golden_fingerprints.py` and commit it")
    with open(FINGERPRINT_PATH) as f:
        want = json.load(f)
    assert key in want, f"no pinned fingerprints for {key!r} — regenerate"
    for stage, stats in want[key].items():
        assert stage in got, f"stage {stage} not captured"
        np.testing.assert_allclose(
            np.asarray(got[stage]), np.asarray(stats), rtol=rtol, atol=1e-7,
            err_msg=f"activation drift at stage {stage!r} — if intentional, "
                    "regenerate with tools/gen_golden_fingerprints.py")


MICRO_KW = dict(
    arch="swin_micro_patch4_window4_128-upernet",
    oracle_kw=dict(embed_dim=128, depths=(1, 1, 1, 1),
                   num_heads=(4, 8, 16, 32), ws=4,
                   # adjust_fm_length([16,16,32], chans=4) -> [16,16,32,32]
                   mt_widths=(16, 16, 32, 32), out_conv=(8, 19),
                   n_head=4, d_model=32, d_k=4),
)


@pytest.mark.slow
def test_multimodal_micro_golden_vs_torch():
    # 128 px keeps every swin stage >= the window (32,16,8,4 with ws=4)
    model, variables, tmodel, batch_np, jb = build_pair(
        n_classes=7, img=128, s2=8, t_steps=3, **MICRO_KW)
    want_tasks, want_aux = run_oracle(tmodel, batch_np)

    got_tasks, got_aux = jax.jit(model.apply)(variables, jb)
    assert set(got_aux) == set(want_aux)
    assert_logits_match(np.asarray(got_tasks[TASK]), want_tasks[TASK])
    for k in want_aux:
        assert_logits_match(np.asarray(got_aux[k]), want_aux[k])

    fps = capture_fingerprints(model, variables, jb)
    check_fingerprints(fps, "micro")


FLAGSHIP_KW = dict(
    arch="swin_base_patch4_window12_384-upernet",
    oracle_kw=dict(embed_dim=128, depths=(2, 2, 18, 2),
                   num_heads=(4, 8, 16, 32), ws=12,
                   # adjust_fm_length([16,16,32] fixture widths, 4 stages)
                   mt_widths=(16, 16, 32, 32), out_conv=(8, 19),
                   n_head=4, d_model=32, d_k=4),
)


@pytest.mark.slow
@pytest.mark.slow
def test_multimodal_flagship_512px_golden_vs_torch():
    """Production LC geometry: swin-base window-12 @ 512 px, 19 classes,
    S2 time series through UTAE, fusion case 4, aux on both modalities."""
    model, variables, tmodel, batch_np, jb = build_pair(
        n_classes=19, img=512, s2=16, t_steps=4, **FLAGSHIP_KW)
    want_tasks, want_aux = run_oracle(tmodel, batch_np)

    got_tasks, got_aux = jax.jit(model.apply)(variables, jb)
    assert set(got_aux) == set(want_aux)
    assert_logits_match(np.asarray(got_tasks[TASK]), want_tasks[TASK])
    for k in want_aux:
        assert_logits_match(np.asarray(got_aux[k]), want_aux[k])

    fps = capture_fingerprints(model, variables, jb)
    check_fingerprints(fps, "flagship")
