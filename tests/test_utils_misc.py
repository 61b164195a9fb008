"""Smoke coverage: config IO, recap display, messaging, profiling, maps."""

import logging
from pathlib import Path

import numpy as np
import yaml


def test_read_config_file_and_dir(tmp_path):
    from flair_for_aigle_tpu.utils.config_io import read_config

    (tmp_path / "a.yaml").write_text(yaml.safe_dump({"x": 1, "shared": "a"}))
    (tmp_path / "b.yaml").write_text(yaml.safe_dump({"y": 2, "shared": "b"}))
    merged = read_config(str(tmp_path))
    assert merged["x"] == 1 and merged["y"] == 2
    assert merged["shared"] == "b"  # later files win (sorted order)
    single = read_config(str(tmp_path / "a.yaml"))
    assert single == {"x": 1, "shared": "a"}
    import pytest

    with pytest.raises(ValueError):
        read_config(str(tmp_path / "missing.json"))


def test_print_recap_smoke(caplog):
    from flair_for_aigle_tpu.utils.config_display import print_recap
    from tests._fixtures import make_config

    cfg = make_config()
    cfg["tasks"] = {"train": True, "predict": True}
    cfg["saving"] = {"verbose_config": False}
    with caplog.at_level(logging.INFO):
        print_recap(cfg, {"AERIAL_RGBI": [1, 2, 3]},
                    {"AERIAL_RGBI": [1]}, {"AERIAL_RGBI": [1, 2]})
    text = caplog.text
    assert "Configuration Tree" in text
    assert "3 samples" in text


def test_logger_tee_and_unique_names(tmp_path, capsys):
    from flair_for_aigle_tpu.utils.messaging import Logger

    p = tmp_path / "run.log"
    lg = Logger(str(p))
    lg.write("hello tee\n")
    lg.flush()
    lg.close()
    assert "hello tee" in p.read_text()
    assert not lg.isatty()
    lg2 = Logger(str(p))  # same name -> versioned file
    lg2.close()
    assert (tmp_path / "run_v1.log").exists()


def test_mapper_class_remaps():
    from flair_for_aigle_tpu.aigle.map import Mapper

    m = Mapper({i: f"c{i}" for i in range(19)}, simplify=True)
    assert m.simplify_flair_classes_app(6) == 16   # water -> plan d'eau id
    assert m.simplify_flair_classes_app(0) == -1
    assert m.map_aigle_classes_labels(16) == "plan d eau"
    assert m.map_aigle_classes_labels(99) == "Unknown class"


def test_param_count_table():
    import jax
    import jax.numpy as jnp

    from flair_for_aigle_tpu.models.flair_model import (
        FlairHubModel,
        print_model_parameters,
    )
    from tests._fixtures import make_batch, make_config

    cfg = make_config(arch="resnet18-unet", tasks=(("TASK-A", 3),))
    model = FlairHubModel(config=cfg)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, 1, 32).items()}
    variables = model.init(jax.random.key(0), batch)
    table = print_model_parameters(variables, cfg)
    assert "AERIAL_RGBI" in table and "Total parameters" in table
    assert "resnet18" in table


def test_update_progress_local(tmp_path, monkeypatch):
    import json

    from flair_for_aigle_tpu.aigle import logs as alogs

    log_file = tmp_path / "run.log"
    prog = tmp_path / "prog.json"  # non-s3 path: local only
    alogs.configure_logging(str(log_file), str(prog))
    alogs.update_progress(50, "running")
    lines = [json.loads(ln) for ln in
             (tmp_path / "tmp_progression.json").read_text().splitlines()]
    assert lines[-1]["progress"] == 50 and lines[-1]["status"] == "running"


def test_stage_timers_and_trace(tmp_path):
    from flair_for_aigle_tpu.utils.profiling import StageTimers, profile_trace

    t = StageTimers()
    with t.stage("io"):
        pass
    with t.stage("io"):
        pass
    rep = t.report()
    assert "io" in rep and t.counts["io"] == 2
    with profile_trace(None):
        pass  # no-op path
