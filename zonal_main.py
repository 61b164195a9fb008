#!/usr/bin/env python
"""Standalone zonal detection CLI (reference flair_zonal_detection/main.py)."""

from __future__ import annotations

import argparse
import logging

from flair_for_aigle_tpu.zonal.inference import run_inference


def main() -> None:
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s - %(name)s - %(message)s")
    parser = argparse.ArgumentParser(
        description="Run zonal detection inference."
    )
    parser.add_argument("--config", type=str, required=True,
                        help="Path to the detection config file")
    args = parser.parse_args()
    run_inference(args.config)


if __name__ == "__main__":
    main()
