"""Training / prediction stages (reference flair_hub/tasks/stages.py +
module_setup.py).

``training_stage``: seed, probe input sizes from one batch ("monkeybatch",
module_setup.py:86-112), build model + losses, optional init-from-checkpoint,
train, reload best state. ``predict_stage``: metrics-only or predict with
the PredictionWriter.
"""

from __future__ import annotations

import datetime
import logging
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from flair_for_aigle_tpu.data.dataset import FlairDataModule
from flair_for_aigle_tpu.models.checkpoint import (
    convert_torch_state_dict,
    load_checkpoint,
    read_torch_checkpoint,
)
from flair_for_aigle_tpu.models.flair_model import (
    FLAIR_TRANSPOSE_CONV_PATTERNS,
    FlairHubModel,
)
from flair_for_aigle_tpu.train.task import TrainState, _array_batch
from flair_for_aigle_tpu.train.trainer import predict, train
from flair_for_aigle_tpu.writer.prediction_writer import PredictionWriter

logger = logging.getLogger(__name__)


def build_data_module(config: Dict[str, Any], dict_train=None, dict_val=None,
                      dict_test=None) -> FlairDataModule:
    assert isinstance(config, dict)
    assert isinstance(
        config["modalities"]["pre_processings"]["use_augmentation"], bool
    )
    return FlairDataModule(
        config=config,
        dict_train=dict_train, dict_val=dict_val, dict_test=dict_test,
        batch_size=config["hyperparams"]["batch_size"],
        num_workers=config["hardware"]["num_workers"],
        drop_last=True,
        use_augmentations=config["modalities"]["pre_processings"]["use_augmentation"],
    )


def get_input_img_sizes(config: Dict[str, Any], dm: FlairDataModule,
                        stage: str = "fit") -> tuple[Dict[str, int], dict]:
    """Pull one batch through the loader to measure per-modality sizes."""
    assert stage in {"fit", "predict"}
    dm.setup(stage)
    loader = dm.train_dataloader() if stage == "fit" else dm.predict_dataloader()
    monkeybatch = next(iter(loader))
    sizes = {}
    for modality, active in config["modalities"]["inputs"].items():
        if active and modality in monkeybatch:
            sizes[modality] = monkeybatch[modality][0].shape[-1]
    return sizes, monkeybatch


def build_segmentation_module(config: Dict[str, Any], in_img_sizes,
                              monkeybatch=None, stage: str = "train"):
    """Create the model + initialized variables (reference
    build_segmentation_module, module_setup.py:48-82)."""
    assert stage in ("train", "predict")
    # GSPMD cannot partition pallas_call: when eval/predict steps run over a
    # multi-device mesh, the fused swin kernels must stay off (training
    # forward/backward never uses them — models/swin.py is_training gate)
    if len(jax.devices()) > 1:
        mm = dict(config.get("models", {}).get("monotemp_model", {}))
        mm.setdefault("attn_kernel", "off")
        config = {**config, "models": {**config.get("models", {}),
                                       "monotemp_model": mm}}
    model = FlairHubModel(config=config, img_input_sizes=in_img_sizes)
    if monkeybatch is None:
        raise ValueError("monkeybatch required to initialize variables")
    example = {
        k: jnp.asarray(v) for k, v in _array_batch(monkeybatch).items()
    }
    variables = dict(jax.jit(model.init)(jax.random.key(
        config["hyperparams"].get("seed", 0)), example))
    return model, variables


def training_stage(config: Dict, data_module, out_dir: Path,
                   mesh=None, aux_loss_fix: bool = False):
    start = datetime.datetime.now()
    np.random.seed(config["hyperparams"]["seed"])

    in_img_sizes, monkeybatch = get_input_img_sizes(config, data_module, "fit")
    model, variables = build_segmentation_module(
        config, in_img_sizes, monkeybatch, stage="train"
    )

    if config["tasks"]["train_tasks"]["init_weights_only_from_ckpt"]:
        variables, _ = load_checkpoint(
            config, variables,
            transpose_conv_prefixes=FLAIR_TRANSPOSE_CONV_PATTERNS,
            exit_on_fail=True,
        )

    ckpt_cb, state = train(config, data_module, model, variables, str(out_dir),
                           mesh=mesh, aux_loss_fix=aux_loss_fix)

    # reload best checkpoint weights (reference stages.py:47)
    best_state = state
    if ckpt_cb.best_model_path:
        sd = read_torch_checkpoint(ckpt_cb.best_model_path)
        v, _ = convert_torch_state_dict(
            sd, {"params": state.params, "batch_stats": state.batch_stats},
            transpose_conv_prefixes=FLAIR_TRANSPOSE_CONV_PATTERNS,
        )
        best_state = state._replace(params=v["params"],
                                    batch_stats=v["batch_stats"])

    elapsed = (datetime.datetime.now() - start).total_seconds()
    logger.info(
        "[Training finished in %s with %s nodes x %s devices]",
        datetime.timedelta(seconds=elapsed),
        config["hardware"].get("num_nodes", 1),
        config["hardware"].get("gpus_per_node", 1),
    )
    return model, best_state


def predict_stage(config: Dict, data_module, out_dir_predict: Path,
                  trained: Optional[tuple] = None) -> None:
    out_dir_predict = Path(out_dir_predict)

    if config["tasks"].get("metrics_only", False) and not config["tasks"].get(
        "predict", False
    ):
        logger.info("[ ] Metrics-only mode: loading predictions from disk ...")
        writer = PredictionWriter(config, str(out_dir_predict))
        writer.load_predictions_and_compute_metrics()
        return

    if config["tasks"].get("predict", False):
        in_img_sizes, monkeybatch = get_input_img_sizes(config, data_module,
                                                        "predict")
        if trained is not None:
            model, state = trained
        else:
            model, variables = build_segmentation_module(
                config, in_img_sizes, monkeybatch, stage="predict"
            )
            variables, _ = load_checkpoint(
                config, variables,
                transpose_conv_prefixes=FLAIR_TRANSPOSE_CONV_PATTERNS,
                exit_on_fail=True,
            )
            state = TrainState(variables["params"],
                               variables.get("batch_stats", {}), None,
                               jnp.zeros((), jnp.int32))
        logger.info("[ ] Running inference and metrics calculation ...")
        predict(config, data_module, model, state, str(out_dir_predict))
        return

    logger.info("[ ] Neither 'predict' nor 'metrics_only' is enabled.")
