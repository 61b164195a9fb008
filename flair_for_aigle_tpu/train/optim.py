"""Optimizers and LR schedules (optax), torch-equivalent semantics.

Ports the reference's configure_optimizers
(flair_hub/tasks/tasks_module.py:344-391):
* sgd / adam / adamw (decoupled weight decay scaled by lr, torch AdamW)
* one_cycle_lr — torch OneCycleLR(cos, div_factor=1000,
  final_div_factor=1e4 default), stepped per optimizer step
* reduce_on_plateau — factor 0.5, cooldown 4, min_lr 1e-7, stepped per
  epoch on val_loss (host-side state; LR injected via inject_hyperparams)
* cycle_then_plateau — OneCycle warmup (pct_start=1.0, final_div_factor=1)
  for warmup_fraction*total steps, then plateau
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np
import optax


def one_cycle_lr(max_lr: float, total_steps: int, pct_start: float = 0.3,
                 div_factor: float = 1000.0,
                 final_div_factor: float = 1e4) -> Callable[[int], float]:
    """torch OneCycleLR with cosine annealing (anneal_strategy='cos')."""
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    up_steps = max(1, int(float(pct_start) * total_steps) - 1)
    down_steps = max(1, total_steps - up_steps - 1)

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.minimum(step, total_steps - 1)
        pct_up = jnp.clip(step / up_steps, 0.0, 1.0)
        lr_up = initial_lr + (max_lr - initial_lr) * (
            1 - jnp.cos(jnp.pi * pct_up)
        ) / 2
        pct_down = jnp.clip((step - up_steps) / down_steps, 0.0, 1.0)
        lr_down = max_lr + (min_lr - max_lr) * (
            1 - jnp.cos(jnp.pi * pct_down)
        ) / 2
        return jnp.where(step <= up_steps, lr_up, lr_down)

    return schedule


@dataclass
class ReduceLROnPlateau:
    """Host-side plateau tracker (torch semantics, mode='min')."""

    factor: float = 0.5
    patience: int = 10
    cooldown: int = 4
    min_lr: float = 1e-7
    best: float = math.inf
    bad_epochs: int = 0
    cooldown_count: int = 0
    scale: float = 1.0

    def step(self, metric: float) -> float:
        if self.cooldown_count > 0:
            self.cooldown_count -= 1
            self.bad_epochs = 0
        if metric < self.best:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale *= self.factor
                self.bad_epochs = 0
                self.cooldown_count = self.cooldown
        return self.scale

    def lr(self, base_lr: float) -> float:
        return max(base_lr * self.scale, self.min_lr)


@dataclass
class SchedulerState:
    """Bundles the configured schedule; the trainer consults it per step
    (one_cycle) and per epoch (plateau variants)."""

    kind: Optional[str]
    base_lr: float
    total_steps: int
    warmup_fraction: float = 0.0
    plateau: Optional[ReduceLROnPlateau] = None
    using_plateau: bool = False
    _one_cycle: Optional[Callable] = None

    def lr_for_step(self, step: int) -> float:
        if self.kind == "one_cycle_lr":
            return float(self._one_cycle(step))
        if self.kind == "cycle_then_plateau":
            warmup_steps = max(1, int(self.warmup_fraction * self.total_steps))
            if step < warmup_steps and not self.using_plateau:
                return float(self._one_cycle(min(step, warmup_steps - 1)))
            self.using_plateau = True
            return self.plateau.lr(self.base_lr)
        if self.kind == "reduce_on_plateau":
            return self.plateau.lr(self.base_lr)
        return self.base_lr

    def epoch_end(self, val_loss: float) -> None:
        if self.kind == "reduce_on_plateau" or (
            self.kind == "cycle_then_plateau" and self.using_plateau
        ):
            self.plateau.step(val_loss)


def make_scheduler(cfg: dict, total_steps: int) -> SchedulerState:
    kind = cfg.get("scheduler")
    lr = cfg["learning_rate"]
    state = SchedulerState(kind=kind, base_lr=lr, total_steps=total_steps,
                           warmup_fraction=cfg.get("warmup_fraction", 0.0))
    if kind == "one_cycle_lr":
        state._one_cycle = one_cycle_lr(
            lr, total_steps, pct_start=cfg.get("warmup_fraction", 0.3)
        )
    elif kind == "cycle_then_plateau":
        warmup_steps = max(1, int(cfg.get("warmup_fraction", 0.0) * total_steps))
        state._one_cycle = one_cycle_lr(
            lr, warmup_steps, pct_start=1.0, final_div_factor=1.0
        )
        state.plateau = ReduceLROnPlateau(patience=10)
    elif kind == "reduce_on_plateau":
        state.plateau = ReduceLROnPlateau(
            patience=cfg.get("plateau_patience", 10)
        )
    return state


def make_optimizer(cfg: dict):
    """Returns an optax optimizer whose learning_rate is injected (mutable
    from the host each step via ``opt_state.hyperparams``)."""
    optim_type = cfg["optimizer"]
    if optim_type == "sgd":
        return optax.inject_hyperparams(optax.sgd)(
            learning_rate=cfg["learning_rate"]
        )
    if optim_type in ("adam", "adamw"):
        b1, b2 = cfg.get("optim_betas", [0.9, 0.999])
        if optim_type == "adamw":
            return optax.inject_hyperparams(optax.adamw)(
                learning_rate=cfg["learning_rate"], b1=b1, b2=b2,
                weight_decay=cfg.get("optim_weight_decay", 0.01),
            )
        return optax.inject_hyperparams(optax.adam)(
            learning_rate=cfg["learning_rate"], b1=b1, b2=b2
        )
    raise ValueError(f"Unsupported optimizer type: {optim_type}")
