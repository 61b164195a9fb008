#!/usr/bin/env python
"""FLAIR-HUB training/predict CLI (reference flair_hub/main.py).

Usage: python train_main.py --config <yaml file or dir of yamls>
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

from flair_for_aigle_tpu.data.paths import get_datasets
from flair_for_aigle_tpu.train.stages import build_data_module, predict_stage, training_stage
from flair_for_aigle_tpu.utils.config_display import print_recap
from flair_for_aigle_tpu.utils.config_io import copy_csv_and_config, setup_environment
from flair_for_aigle_tpu.utils.messaging import Logger, end_msg, start_msg

logger = logging.getLogger(__name__)

argParser = argparse.ArgumentParser()
argParser.add_argument("--config", help="Path to the .yaml config file",
                       required=True)
argParser.add_argument("--aux-loss-fix", action="store_true",
                       help="Enable the (reference-dead) auxiliary loss path")


def main():
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s - %(name)s - %(message)s")
    args = argParser.parse_args()
    config, out_dir = setup_environment(args)
    sys.stdout = Logger(
        Path(config["paths"]["out_folder"], config["paths"]["out_model_name"],
             f"flair-compute{config['paths']['out_model_name']}.log").as_posix()
    )
    start_msg()

    dict_train, dict_val, dict_test = get_datasets(config)
    print_recap(config, dict_train, dict_val, dict_test)

    if config["saving"]["cp_csv_and_conf_to_output"]:
        copy_csv_and_config(config, out_dir, args)

    dm = build_data_module(config, dict_train=dict_train, dict_val=dict_val,
                           dict_test=dict_test)

    trained = None
    if config["tasks"]["train"]:
        trained = training_stage(config, dm, out_dir,
                                 aux_loss_fix=args.aux_loss_fix)

    if config["tasks"].get("predict") or config["tasks"].get("metrics_only"):
        out_dir_predict = Path(out_dir,
                               "results_" + config["paths"]["out_model_name"])
        out_dir_predict.mkdir(parents=True, exist_ok=True)
        predict_stage(config, dm, out_dir_predict, trained)
    else:
        logger.info("[WARNING] Neither prediction nor metrics_only enabled.")

    end_msg()


if __name__ == "__main__":
    main()
