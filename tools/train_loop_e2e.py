"""End-to-end training-LOOP proof on the real TPU (VERDICT r4 ask #1).

Runs the COMPLETE fit driver (train/trainer.py:train — epoch loop,
scheduler stepping, checkpoint-on-val_miou, TB scalars, orbax full-state
save) at the bench geometry (swin-base@512, bf16+remat, batch 8,
attn_f32=False) on deterministic synthetic-but-learnable data, then proves
kill-and-resume continuity:

  phase full   — N epochs uninterrupted; per-epoch metrics -> JSON.
  phase part1  — same run, but the process SIGKILLs ITSELF after epoch
                 K's checkpointing (a real process death mid-run).
  phase part2  — resumes from the orbax checkpoint; num_epochs = N-K-1
                 more epochs; per-epoch metrics -> JSON.
  orchestrate  — runs the three phases as subprocesses and asserts:
                 * part1 died by SIGKILL (rc == -9) after saving orbax
                 * part2 resumed at step (K+1)*steps_per_epoch
                 * the resumed loss curve CONTINUES the full run's
                   (per-epoch train loss matches the uninterrupted run —
                   exact restore + step-keyed rng + deterministic data)
                 * checkpoint-on-val_miou fired; TB event files exist

Data: a fixed pool of images whose pixels encode their label class
(class-coded colors + noise), so the model actually learns and val_miou
rises — exercising the checkpoint-improvement path, the one-cycle
scheduler, and the attn_f32=False fast-softmax training path (VERDICT r4
Weak #1's risk surface) under real dynamics. Reference loop:
flair_hub/tasks/trainers.py:35-108.

Usage:
  python tools/train_loop_e2e.py orchestrate            # on the TPU
  TINY=1 python tools/train_loop_e2e.py orchestrate     # CPU smoke
"""
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TINY = os.getenv("TINY", "0") == "1"
OUT = os.getenv("OUT", os.path.join(REPO, ".tmp", "train_loop_e2e"))
EPOCHS = int(os.getenv("EPOCHS", "4"))
KILL_AFTER = int(os.getenv("KILL_AFTER", "1"))  # SIGKILL after this epoch
NC = 19

if TINY:
    SIZE, BATCH, SPE, VAL_BATCHES = 64, 2, 3, 2
    ARCH = "swin_micro_patch4_window4_64-upernet"
else:
    SIZE, BATCH, SPE, VAL_BATCHES = 512, 8, 25, 4
    ARCH = "swin_base_patch4_window12_384-upernet"


def make_pool(n, size, seed=7):
    """Pool of (image uint8-ish float, int label) pairs: label is a blocky
    class map; pixels are class-coded colors + noise (learnable)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    colors = rng.normal(size=(NC, 3)).astype(np.float32)  # class embedding
    imgs, labs = [], []
    for _ in range(n):
        blocks = rng.integers(0, NC, (size // 32, size // 32))
        lab = np.kron(blocks, np.ones((32, 32), np.int64)).astype(np.int32)
        img = colors[lab]                       # (H, W, 3)
        img = img + rng.normal(0, 0.35, img.shape).astype(np.float32)
        imgs.append(np.transpose(img, (2, 0, 1)))  # NCHW boundary
        labs.append(lab)
    return imgs, labs


class SyntheticLoader:
    """Deterministic re-iterable loader. Each __iter__ of the train loader
    consumes the next epoch's (seeded) batch order, starting at
    ``start_epoch`` — so a resumed run replays the same data stream the
    uninterrupted run saw at that epoch."""

    def __init__(self, pool, n_batches, batch, start_epoch=0, fixed=False):
        self.imgs, self.labs = pool
        self.n_batches = n_batches
        self.batch = batch
        self.epoch = start_epoch
        self.fixed = fixed  # val: same batches every epoch

    def __len__(self):
        return self.n_batches

    def __iter__(self):
        import numpy as np

        rng = np.random.default_rng(1000 + (0 if self.fixed else self.epoch))
        if not self.fixed:
            self.epoch += 1
        n = len(self.imgs)
        for _ in range(self.n_batches):
            idx = rng.integers(0, n, self.batch)
            yield {
                "AERIAL_RGBI": np.stack([self.imgs[i] for i in idx]),
                "TASK-SEMANTIC": np.stack([self.labs[i] for i in idx]),
            }


class DM:
    def __init__(self, start_epoch=0):
        pool = make_pool(16 if TINY else 64, SIZE)
        vpool = make_pool(8 if TINY else 16, SIZE, seed=99)
        self._train = SyntheticLoader(pool, SPE, BATCH, start_epoch)
        self._val = SyntheticLoader(vpool, VAL_BATCHES, BATCH, fixed=True)

    def setup(self, stage):
        pass

    def train_dataloader(self):
        return self._train

    def val_dataloader(self):
        return self._val


def make_cfg(num_epochs):
    from tests._fixtures import make_config

    cfg = make_config(arch=ARCH, tasks=(("TASK-SEMANTIC", NC),))
    cfg["models"]["monotemp_model"].update(remat=True, attn_f32=False)
    cfg["hyperparams"].update(
        batch_size=BATCH, num_epochs=num_epochs, seed=11,
        learning_rate=1e-4, scheduler="one_cycle_lr", warmup_fraction=0.2,
        scheduler_total_steps=SPE * EPOCHS,
        compute_dtype=None if TINY else "bfloat16",
    )
    cfg["saving"] = {"ckpt_monitor": "val_miou", "ckpt_monitor_mode": "max",
                     "save_full_state_orbax": True, "ckpt_save_also_last": False,
                     "ckpt_earlystopping_patience": 50}
    cfg["paths"]["out_model_name"] = "e2e"
    cfg["tasks"] = {"train": True, "train_tasks": {}}
    return cfg


def run_phase(phase):
    if TINY:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if TINY:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".tmp", "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp
    import logging

    logging.basicConfig(level=logging.INFO, stream=sys.stdout,
                        format="%(asctime)s %(message)s")
    from flair_for_aigle_tpu.models.flair_model import FlairHubModel
    from flair_for_aigle_tpu.train.trainer import train

    out_dir = os.path.join(OUT, "full" if phase == "full" else "resumable")
    os.makedirs(out_dir, exist_ok=True)
    orbax_path = os.path.join(out_dir, "checkpoints", "orbax_last_e2e")

    if phase == "full":
        cfg, start_epoch = make_cfg(EPOCHS), 0
    elif phase == "part1":
        cfg, start_epoch = make_cfg(EPOCHS), 0  # plans N, dies after K
    else:  # part2
        cfg, start_epoch = make_cfg(EPOCHS - KILL_AFTER - 1), KILL_AFTER + 1
        cfg["tasks"]["train_tasks"]["resume_full_state_from_orbax"] = orbax_path

    dm = DM(start_epoch=start_epoch)
    model = FlairHubModel(config=cfg)
    b0 = next(iter(dm.train_dataloader()))
    dm._train.epoch = start_epoch  # rewind the probe iteration
    batch = {k: jnp.asarray(v) for k, v in b0.items()}
    variables = dict(jax.jit(model.init)(jax.random.key(0), batch))

    history = []

    def hook(epoch, metrics):
        history.append({"epoch": epoch,
                        **{k: round(float(v), 6) for k, v in metrics.items()
                           if k.count("_") <= 1}})
        with open(os.path.join(out_dir, f"history_{phase}.json"), "w") as f:
            json.dump(history, f, indent=1)
        print(f"[{phase}] epoch {epoch} done: "
              f"train_loss {metrics['train_loss']:.4f} "
              f"val_miou {metrics['val_miou']:.4f}", flush=True)
        if phase == "part1" and epoch == KILL_AFTER:
            print(f"[part1] SIGKILL self after epoch {epoch} "
                  f"(orbax saved at {orbax_path})", flush=True)
            sys.stdout.flush()
            os.kill(os.getpid(), signal.SIGKILL)

    t0 = time.perf_counter()
    ckpt_cb, state = train(cfg, dm, model, variables, out_dir,
                           epoch_hook=hook)
    wall = time.perf_counter() - t0
    result = {
        "phase": phase, "final_step": int(state.step), "wall_s": round(wall, 1),
        "steps_per_s": round(int(state.step) / wall, 3),
        "best": round(ckpt_cb.best, 5), "best_path": ckpt_cb.best_model_path,
        "history": history,
    }
    with open(os.path.join(out_dir, f"result_{phase}.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "history"}),
          flush=True)


def orchestrate():
    import shutil

    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)
    env = dict(os.environ)

    def run(phase, expect_rc=0):
        t0 = time.perf_counter()
        p = subprocess.run([sys.executable, os.path.abspath(__file__), phase],
                           env=env, cwd=REPO)
        print(f"== {phase}: rc={p.returncode} "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)
        assert p.returncode == expect_rc, (phase, p.returncode)

    run("full")
    run("part1", expect_rc=-signal.SIGKILL)  # died by SIGKILL mid-run
    run("part2")

    full = json.load(open(os.path.join(OUT, "full", "result_full.json")))
    p2 = json.load(open(os.path.join(OUT, "resumable", "result_part2.json")))
    h1 = json.load(open(os.path.join(OUT, "resumable", "history_part1.json")))

    # -- step-count continuity ------------------------------------------
    assert full["final_step"] == SPE * EPOCHS, full["final_step"]
    assert h1[-1]["epoch"] == KILL_AFTER  # died right after epoch K
    assert p2["final_step"] == SPE * EPOCHS, p2["final_step"]
    assert p2["history"][0]["epoch"] == KILL_AFTER + 1  # epoch label continues

    # -- metric continuity: resumed epochs retrace the uninterrupted run
    fh = {h["epoch"]: h for h in full["history"]}
    max_dev = 0.0
    for h in p2["history"]:
        ref = fh[h["epoch"]]
        dev = abs(h["train_loss"] - ref["train_loss"]) / max(
            abs(ref["train_loss"]), 1e-6)
        max_dev = max(max_dev, dev)
        print(f"epoch {h['epoch']}: full train_loss {ref['train_loss']:.5f} "
              f"resumed {h['train_loss']:.5f} (rel dev {dev:.2e}) | "
              f"val_miou full {ref['val_miou']:.4f} "
              f"resumed {h['val_miou']:.4f}", flush=True)
    assert max_dev < 5e-3, f"resumed curve diverged: rel dev {max_dev}"

    # -- learning happened & checkpoint-on-val_miou fired ----------------
    losses = [h["train_loss"] for h in full["history"]]
    assert losses[-1] < losses[0] * 0.9, losses
    assert full["best_path"] and os.path.exists(full["best_path"])
    assert p2["best_path"] and os.path.exists(p2["best_path"])
    mious = [h["val_miou"] for h in full["history"]]
    assert max(mious[1:]) > mious[0], mious  # improved after epoch 0

    # -- TB event files written -----------------------------------------
    tb = [f for d in ("full", "resumable")
          for r, _, fs in os.walk(os.path.join(OUT, d)) for f in fs
          if "tfevents" in f]
    assert tb, "no TB event files"

    print(json.dumps({
        "ok": True, "epochs": EPOCHS, "steps": full["final_step"],
        "kill_after_epoch": KILL_AFTER,
        "full_wall_s": full["wall_s"], "full_steps_per_s": full["steps_per_s"],
        "loss_curve": [round(v, 4) for v in losses],
        "val_miou_curve": [round(v, 4) for v in mious],
        "resume_max_rel_dev": round(max_dev, 8),
        "tb_files": len(tb),
    }), flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "orchestrate"
    if mode == "orchestrate":
        orchestrate()
    else:
        run_phase(mode)
