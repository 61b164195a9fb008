"""Checkpoint loader edge behaviors (reference checkpoint.py semantics):
head-class-count reconciliation, Swin bias-table interpolation, 'model.'
prefix stripping, torch .ckpt format."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from flair_for_aigle_tpu.models.checkpoint import (
    bicubic_resize_2d,
    interpolate_bias_table,
    load_checkpoint,
    read_torch_checkpoint,
    strip_model_prefix_if_needed,
)


def test_bicubic_matches_torch():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(9, 9, 4)).astype(np.float32)
    got = bicubic_resize_2d(img, 23, 23)
    want = F.interpolate(torch.from_numpy(img).permute(2, 0, 1)[None],
                         size=(23, 23), mode="bicubic", align_corners=False
                         )[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_interpolate_bias_table_matches_reference_math():
    rng = np.random.default_rng(1)
    old = rng.normal(size=((2 * 7 - 1) ** 2, 4)).astype(np.float32)  # window 7
    new_len = (2 * 12 - 1) ** 2  # window 12
    got = interpolate_bias_table(old, (new_len, 4))
    assert got.shape == (new_len, 4)
    # torch reference computation (checkpoint.py:33-56)
    t = torch.from_numpy(old).reshape(1, 13, 13, 4).permute(0, 3, 1, 2)
    t = F.interpolate(t, size=(23, 23), mode="bicubic", align_corners=False)
    want = t.permute(0, 2, 3, 1).reshape(new_len, 4).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_strip_model_prefix():
    sd = {"model.encoder.conv1.weight": np.zeros(3), "other.bias": np.ones(2)}
    out = strip_model_prefix_if_needed(sd, ["encoder.conv1.weight"])
    assert "encoder.conv1.weight" in out and "other.bias" in out
    # no stripping when targets use the prefix
    out2 = strip_model_prefix_if_needed(dict(sd), ["model.encoder.conv1.weight"])
    assert "model.encoder.conv1.weight" in out2


def test_read_torch_ckpt_format(tmp_path):
    path = str(tmp_path / "m.ckpt")
    torch.save({"state_dict": {"a.weight": torch.ones(2, 3)},
                "epoch": 3}, path)
    sd = read_torch_checkpoint(path)
    assert sd["a.weight"].shape == (2, 3)


@pytest.mark.slow
def test_load_checkpoint_head_mismatch_reinit(tmp_path):
    """Checkpoint with 19-class heads loads into a 5-class model: heads get
    Xavier/zeros re-init, the rest loads (reference checkpoint.py:87-131)."""
    from safetensors.numpy import save_file

    from flair_for_aigle_tpu.models.checkpoint import export_torch_state_dict
    from flair_for_aigle_tpu.models.flair_model import FlairHubModel
    from tests._fixtures import make_batch, make_config

    cfg19 = make_config(arch="resnet18-unet", tasks=(("TASK-A", 19),))
    m19 = FlairHubModel(config=cfg19)
    b19 = {k: jnp.asarray(v) for k, v in make_batch(cfg19, 1, 32).items()}
    v19 = dict(m19.init(jax.random.key(0), b19))
    sd = export_torch_state_dict(
        {"params": v19["params"], "batch_stats": v19["batch_stats"]}
    )
    ckpt = str(tmp_path / "w19.safetensors")
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, ckpt)

    cfg5 = make_config(arch="resnet18-unet", tasks=(("TASK-A", 5),))
    cfg5["paths"]["ckpt_model_path"] = ckpt
    m5 = FlairHubModel(config=cfg5)
    b5 = {k: jnp.asarray(v) for k, v in make_batch(cfg5, 1, 32).items()}
    v5 = dict(m5.init(jax.random.key(1), b5))
    new_vars, report = load_checkpoint(cfg5, v5)
    assert report["reinit_tasks"] == ["TASK-A"]
    assert report["matched_tasks"] == []
    # encoder weights actually transferred
    got = np.asarray(
        new_vars["params"]["encoders.AERIAL_RGBI.seg_model"]["conv1"]["kernel"]
    )
    want = np.asarray(
        v19["params"]["encoders.AERIAL_RGBI.seg_model"]["conv1"]["kernel"]
    )
    np.testing.assert_array_equal(got, want)
    # head re-initialized: zeros bias
    head = new_vars["params"]["main_decoders.TASK-A.seg_model"][
        "segmentation_head"]["0"]
    assert np.asarray(head["bias"]).shape == (5,)
    np.testing.assert_array_equal(np.asarray(head["bias"]), np.zeros(5))


def test_load_checkpoint_matched_heads(tmp_path):
    from safetensors.numpy import save_file

    from flair_for_aigle_tpu.models.checkpoint import export_torch_state_dict
    from flair_for_aigle_tpu.models.flair_model import FlairHubModel
    from tests._fixtures import make_batch, make_config

    cfg = make_config(arch="resnet18-unet", tasks=(("TASK-A", 7),))
    m = FlairHubModel(config=cfg)
    b = {k: jnp.asarray(v) for k, v in make_batch(cfg, 1, 32).items()}
    v = dict(m.init(jax.random.key(0), b))
    sd = export_torch_state_dict(
        {"params": v["params"], "batch_stats": v["batch_stats"]}
    )
    ckpt = str(tmp_path / "w.safetensors")
    save_file({k: np.ascontiguousarray(x) for k, x in sd.items()}, ckpt)
    cfg["paths"]["ckpt_model_path"] = ckpt
    v2 = dict(m.init(jax.random.key(9), b))
    new_vars, report = load_checkpoint(cfg, v2)
    assert report["matched_tasks"] == ["TASK-A"]
    assert not report["missing"]
    # outputs identical to source model
    out1, _ = m.apply({"params": v["params"], "batch_stats": v["batch_stats"]}, b)
    out2, _ = m.apply(new_vars, b)
    np.testing.assert_allclose(np.asarray(out1["TASK-A"]),
                               np.asarray(out2["TASK-A"]), atol=1e-6)


def test_load_checkpoint_invalid_path_exits():
    from tests._fixtures import make_config

    cfg = make_config()
    cfg["paths"]["ckpt_model_path"] = "/nonexistent/x.safetensors"
    with pytest.raises(SystemExit):
        load_checkpoint(cfg, {"params": {}}, exit_on_fail=True)
    out, report = load_checkpoint(cfg, {"params": {}}, exit_on_fail=False)
    assert out == {"params": {}}
