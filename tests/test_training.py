"""End-to-end training stack on a tiny synthetic TOY-style dataset:
CSV-driven multimodal patches -> train 2 epochs -> checkpoint -> predict ->
metrics.json. Runs on the virtual 8-device CPU mesh (data parallel)."""

import json
import os
from pathlib import Path

import numpy as np
import pytest

from flair_for_aigle_tpu.geo.geotiff import write_geotiff
from flair_for_aigle_tpu.geo.windows import from_origin

N_CLASSES = 5
PATCH = 32


def make_toy_dataset(root: Path, n_train=8, n_val=8, n_test=2):
    """Synthetic FLAIR-HUB-style tree: aerial rgb patches + label rasters."""
    rng = np.random.default_rng(0)
    rows = {"train": [], "val": [], "test": []}
    for split, n in (("train", n_train), ("val", n_val), ("test", n_test)):
        for i in range(n):
            area = f"D01_2020-{split}-{i:03d}"
            img_dir = root / split / "img"
            lab_dir = root / split / "lab"
            img_dir.mkdir(parents=True, exist_ok=True)
            lab_dir.mkdir(parents=True, exist_ok=True)
            img_path = img_dir / f"IMG_{area}_0_{i}.tif"
            lab_path = lab_dir / f"LAB_{area}_0_{i}.tif"
            # classes correlated with intensity so the model can learn
            # blocky labels (8x8 superpixels) correlated with intensity
            blocks = rng.integers(0, N_CLASSES, (PATCH // 8, PATCH // 8))
            lab = np.kron(blocks, np.ones((8, 8))).astype(np.uint8)
            img = (lab[None].repeat(4, 0) * 40 +
                   rng.normal(0, 5, (4, PATCH, PATCH))).clip(0, 255).astype(np.uint8)
            tr = from_origin(10000 + i * 100, 20000, 0.2, 0.2)
            write_geotiff(str(img_path), img, tr, "EPSG:2154")
            write_geotiff(str(lab_path), lab[None], tr, "EPSG:2154")
            rows[split].append((str(img_path), str(lab_path)))
    import pandas as pd

    csvs = {}
    for split, data in rows.items():
        df = pd.DataFrame(data, columns=["AERIAL_RGBI", "AERIAL_LABEL-COSIA"])
        p = root / f"{split}.csv"
        df.to_csv(p, index=False)
        csvs[split] = str(p)
    return csvs


def make_train_config(root: Path, csvs):
    from tests._fixtures import make_config

    cfg = make_config(arch="resnet18-unet", mono=("AERIAL_RGBI",),
                      tasks=(("AERIAL_LABEL-COSIA", N_CLASSES),))
    cfg["modalities"]["inputs_channels"]["AERIAL_RGBI"] = [1, 2, 3]
    cfg["modalities"]["normalization"].update({
        "norm_type": "custom",
        "AERIAL_RGBI_means": [100.0, 100.0, 100.0],
        "AERIAL_RGBI_stds": [50.0, 50.0, 50.0],
    })
    cfg["paths"] = {
        "out_folder": str(root / "out"),
        "out_model_name": "toy-model",
        "train_csv": csvs["train"], "val_csv": csvs["val"],
        "test_csv": csvs["test"],
        "global_mtd_folder": str(root) + "/",
        "ckpt_model_path": "",
    }
    cfg["tasks"] = {
        "train": True,
        "train_tasks": {"init_weights_only_from_ckpt": False,
                        "resume_training_from_ckpt": False},
        "predict": True,
        "write_files": True,
        "georeferencing_output": True,
        "metrics_only": False,
    }
    cfg["hyperparams"].update({"num_epochs": 10, "batch_size": 4,
                               "learning_rate": 3e-3,
                               "scheduler": None})
    cfg["hardware"] = {"accelerator": "tpu", "num_nodes": 1,
                       "gpus_per_node": 1, "strategy": "auto",
                       "num_workers": 0}
    cfg["saving"] = {
        "ckpt_save_also_last": True, "ckpt_weights_only": False,
        "ckpt_monitor": "val_miou", "ckpt_monitor_mode": "max",
        "ckpt_earlystopping_patience": 20,
        "cp_csv_and_conf_to_output": False, "enable_progress_bar": False,
        "progress_rate": 10, "ckpt_verbose": False, "verbose_config": False,
    }
    cfg["modalities"]["pre_processings"]["use_augmentation"] = True
    return cfg


@pytest.fixture(scope="module")
def toy(tmp_path_factory):
    root = tmp_path_factory.mktemp("toy")
    csvs = make_toy_dataset(root)
    return root, csvs


@pytest.mark.slow
def test_full_training_and_predict(toy):
    root, csvs = toy
    cfg = make_train_config(root, csvs)

    from flair_for_aigle_tpu.data.paths import get_datasets
    from flair_for_aigle_tpu.train.stages import (
        build_data_module,
        predict_stage,
        training_stage,
    )

    dict_train, dict_val, dict_test = get_datasets(cfg)
    assert len(dict_train["AERIAL_RGBI"]) == 8
    dm = build_data_module(cfg, dict_train, dict_val, dict_test)

    out_dir = Path(cfg["paths"]["out_folder"]) / cfg["paths"]["out_model_name"]
    out_dir.mkdir(parents=True, exist_ok=True)
    model, best_state = training_stage(cfg, dm, out_dir)

    # checkpoint written
    ckpts = list((out_dir / "checkpoints").glob("*.safetensors"))
    assert ckpts, "no checkpoint saved"

    # predict + metrics
    out_pred = out_dir / "results_toy-model"
    out_pred.mkdir(parents=True, exist_ok=True)
    predict_stage(cfg, dm, out_pred, (model, best_state))

    pred_dir = out_pred / "predictions_toy-model" / "AERIAL_LABEL-COSIA"
    preds = list(pred_dir.glob("PRED_*.tif"))
    assert len(preds) == 2
    metrics_file = (out_pred / "metrics_toy-model" / "AERIAL_LABEL-COSIA"
                    / "metrics.json")
    assert metrics_file.exists()
    metrics = json.loads(metrics_file.read_text())
    assert "Avg_metrics" in metrics
    # mechanism check: far better than the 20% chance level after training
    oa = metrics["Avg_metrics"][1]
    assert oa > 35.0, f"overall accuracy too low: {oa}"


def test_scheduler_shapes():
    from flair_for_aigle_tpu.train.optim import one_cycle_lr

    sched = one_cycle_lr(1e-3, 100, pct_start=0.2)
    lrs = [float(sched(s)) for s in range(100)]
    assert lrs[0] < 1e-5  # initial = max/1000
    assert abs(max(lrs) - 1e-3) < 1e-6
    assert lrs[-1] < lrs[50]


def test_loss_weights_and_ce():
    import jax.numpy as jnp
    import torch

    from flair_for_aigle_tpu.train.losses import weighted_cross_entropy

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 5, 8, 8)).astype(np.float32)
    targets = rng.integers(0, 5, (2, 8, 8))
    w = np.array([1, 1, 0, 2, 1], np.float32)
    want = torch.nn.CrossEntropyLoss(weight=torch.from_numpy(w))(
        torch.from_numpy(logits), torch.from_numpy(targets)
    ).item()
    got = float(weighted_cross_entropy(jnp.asarray(logits),
                                       jnp.asarray(targets), jnp.asarray(w)))
    assert abs(want - got) < 1e-5


@pytest.mark.slow
def test_aux_loss_fix_changes_gradients(toy):
    """aux_loss_fix=True routes gradients through aux decoders (the
    reference's aux path is dead code; ours is opt-in)."""
    import jax
    import jax.numpy as jnp

    from flair_for_aigle_tpu.models.flair_model import FlairHubModel
    from flair_for_aigle_tpu.train.optim import make_optimizer
    from flair_for_aigle_tpu.train.task import TrainState, make_steps
    from tests._fixtures import make_batch, make_config

    cfg = make_config(arch="resnet18-unet", mono=("AERIAL_RGBI",),
                      tasks=(("TASK-A", 5),), aux=("AERIAL_RGBI",))
    model = FlairHubModel(config=cfg)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, 2, 32).items()}
    variables = dict(model.init(jax.random.key(0), batch))
    opt = make_optimizer(cfg["hyperparams"])

    def run(aux_fix):
        state = TrainState(variables["params"], variables["batch_stats"],
                           opt.init(variables["params"]),
                           jnp.zeros((), jnp.int32))
        step, _, _ = make_steps(model, cfg, opt, aux_loss_fix=aux_fix)
        new_state, m = step(state, batch, jax.random.key(1))
        aux_kernel_before = variables["params"][
            "aux_decoders.AERIAL_RGBI__TASK-A.seg_model"]["segmentation_head"][
            "0"]["kernel"]
        aux_kernel_after = new_state.params[
            "aux_decoders.AERIAL_RGBI__TASK-A.seg_model"]["segmentation_head"][
            "0"]["kernel"]
        moved = float(jnp.abs(aux_kernel_after - aux_kernel_before).max())
        return float(m["loss"]), moved

    loss_off, moved_off = run(False)
    loss_on, moved_on = run(True)
    # dead path: only adamw weight decay touches the aux decoder (~1e-8);
    # fixed path: real gradients move it orders of magnitude more
    assert moved_off < 1e-6
    assert moved_on > 100 * max(moved_off, 1e-9)
    assert loss_on > loss_off        # aux terms add to the loss


@pytest.mark.slow
def test_metrics_only_mode(toy):
    """predict_stage metrics_only recomputes metrics from rasters on disk."""
    import json

    root, csvs = toy
    cfg = make_train_config(root, csvs)
    out_dir = Path(cfg["paths"]["out_folder"]) / cfg["paths"]["out_model_name"]
    out_pred = out_dir / "results_toy-model"
    metrics_file = (out_pred / "metrics_toy-model" / "AERIAL_LABEL-COSIA"
                    / "metrics.json")
    if not metrics_file.exists():
        pytest.skip("depends on test_full_training_and_predict artifacts")
    before = json.loads(metrics_file.read_text())

    cfg["tasks"]["predict"] = False
    cfg["tasks"]["train"] = False
    cfg["tasks"]["metrics_only"] = True
    from flair_for_aigle_tpu.train.stages import predict_stage

    predict_stage(cfg, None, out_pred)
    after = json.loads(metrics_file.read_text())
    # same confmat -> same metrics as the live predict pass
    np.testing.assert_allclose(before["Avg_metrics"], after["Avg_metrics"],
                               atol=1e-6)


def test_orbax_full_state_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from flair_for_aigle_tpu.models.flair_model import FlairHubModel
    from flair_for_aigle_tpu.train.optim import make_optimizer
    from flair_for_aigle_tpu.train.task import TrainState
    from flair_for_aigle_tpu.train.trainer import (
        restore_orbax_checkpoint,
        save_orbax_checkpoint,
    )
    from tests._fixtures import make_batch, make_config

    cfg = make_config(arch="resnet18-unet", tasks=(("TASK-A", 3),))
    model = FlairHubModel(config=cfg)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, 1, 32).items()}
    variables = dict(model.init(jax.random.key(0), batch))
    opt = make_optimizer(cfg["hyperparams"])
    state = TrainState(variables["params"], variables["batch_stats"],
                       opt.init(variables["params"]),
                       jnp.asarray(7, jnp.int32))
    path = str(tmp_path / "ckpt")
    save_orbax_checkpoint(state, path)
    fresh = dict(model.init(jax.random.key(5), batch))
    restored = restore_orbax_checkpoint(
        path, TrainState(fresh["params"], fresh["batch_stats"],
                         opt.init(fresh["params"]), jnp.zeros((), jnp.int32)))
    assert int(restored.step) == 7
    a = np.asarray(state.params["encoders.AERIAL_RGBI.seg_model"]["conv1"]["kernel"])
    b = np.asarray(restored.params["encoders.AERIAL_RGBI.seg_model"]["conv1"]["kernel"])
    np.testing.assert_array_equal(a, b)
    # optimizer state restored exactly (full-state resume, not weights-only)
    import jax as _jax

    for x, y in zip(_jax.tree_util.tree_leaves(state.opt_state),
                    _jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_orbax_resume_config_flag(tmp_path):
    """tasks.train_tasks.resume_full_state_from_orbax resumes step count and
    optimizer state through the train() driver."""
    import jax
    import jax.numpy as jnp

    from flair_for_aigle_tpu.models.flair_model import FlairHubModel
    from flair_for_aigle_tpu.train.trainer import train
    from tests._fixtures import make_batch, make_config

    cfg = make_config(arch="resnet18-unet", tasks=(("TASK-A", 3),))
    cfg["hyperparams"].update(batch_size=2, num_epochs=1)
    cfg["saving"] = {"ckpt_monitor": "val_miou", "ckpt_monitor_mode": "max",
                     "save_full_state_orbax": True,
                     "ckpt_earlystopping_patience": 20}
    cfg["paths"] = {"out_model_name": "orbax-toy"}
    cfg["tasks"] = {"train": True, "train_tasks": {}}

    class _DM:
        def setup(self, stage):
            pass

        def _loader(self):
            return [make_batch(cfg, 2, 32, seed=s) for s in range(2)]

        train_dataloader = _loader
        val_dataloader = _loader

    model = FlairHubModel(config=cfg)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, 2, 32).items()}
    variables = dict(model.init(jax.random.key(0), batch))

    _, state1 = train(cfg, _DM(), model, variables, str(tmp_path))
    assert int(state1.step) == 2
    orbax_path = tmp_path / "checkpoints" / "orbax_last_orbax-toy"
    assert orbax_path.exists()

    cfg["tasks"]["train_tasks"]["resume_full_state_from_orbax"] = str(orbax_path)
    _, state2 = train(cfg, _DM(), model, variables, str(tmp_path))
    assert int(state2.step) == 4  # resumed at 2, trained 2 more


def test_bf16_training_step_finite():
    import jax
    import jax.numpy as jnp

    from flair_for_aigle_tpu.models.flair_model import FlairHubModel
    from flair_for_aigle_tpu.train.optim import make_optimizer
    from flair_for_aigle_tpu.train.task import TrainState, make_steps
    from tests._fixtures import make_batch, make_config

    cfg = make_config(arch="resnet18-unet", tasks=(("TASK-A", 5),))
    cfg["hyperparams"]["compute_dtype"] = "bfloat16"
    model = FlairHubModel(config=cfg)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, 2, 32).items()}
    variables = dict(model.init(jax.random.key(0), batch))
    opt = make_optimizer(cfg["hyperparams"])
    state = TrainState(variables["params"], variables["batch_stats"],
                       opt.init(variables["params"]), jnp.zeros((), jnp.int32))
    step, eval_step, _ = make_steps(model, cfg, opt)
    state, m = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(m["loss"]))
    m2 = eval_step(state, batch)
    assert np.isfinite(float(m2["loss"]))
