"""LR schedules via optax: warmup + {step, cosine, plateau-free} families.

The reference implements warmup by mutating optimizer LR per epoch
(train_arcface.py:832-845) and wraps torch Step/Cosine/Plateau schedulers
(:487-516); here everything is a pure optax schedule resolved from config.
(Plateau scheduling is inherently stateful-on-metric; `ReduceOnPlateau` is
provided as an injectable host-side controller.)
"""

from __future__ import annotations

from typing import Optional

import optax


def build_schedule(
    base_lr: float,
    schedule: str = "cosine",
    total_steps: int = 10_000,
    warmup_steps: int = 0,
    warmup_start_factor: float = 0.1,
    step_size: int = 3_000,
    gamma: float = 0.1,
    min_lr: float = 0.0,
) -> optax.Schedule:
    """Resolve a config-described schedule into an optax schedule fn."""
    # Defensive numeric coercion: CLI overrides parse through YAML 1.1,
    # where "3e-4" is a STRING (float syntax requires a dot before the
    # exponent) — left uncoerced it string-multiplies inside optax and
    # fails deep in the first train step.
    base_lr = float(base_lr)
    gamma = float(gamma)
    min_lr = float(min_lr)
    warmup_start_factor = float(warmup_start_factor)
    if schedule == "cosine":
        main = optax.cosine_decay_schedule(
            base_lr, max(total_steps - warmup_steps, 1), alpha=min_lr / base_lr if base_lr else 0.0
        )
    elif schedule == "step":
        main = optax.exponential_decay(
            base_lr,
            transition_steps=step_size,
            decay_rate=gamma,
            staircase=True,
        )
    elif schedule in ("constant", "plateau"):
        # plateau: host-side ReduceOnPlateau scales this constant base.
        main = optax.constant_schedule(base_lr)
    else:
        raise ValueError(f"unknown schedule {schedule!r}")
    if warmup_steps > 0:
        warm = optax.linear_schedule(
            base_lr * warmup_start_factor, base_lr, warmup_steps
        )
        return optax.join_schedules([warm, main], [warmup_steps])
    return main


class ReduceOnPlateau:
    """Host-side plateau controller: emits an LR scale factor.

    Matches torch ReduceLROnPlateau semantics the reference configures
    (train_arcface.py:508-516): factor, patience, min mode on val loss.
    Use together with ``optax.inject_hyperparams`` or a scale-by-factor
    wrapper.
    """

    def __init__(
        self,
        factor: float = 0.1,
        patience: int = 5,
        mode: str = "min",
        min_scale: float = 1e-4,
    ):
        self.factor = factor
        self.patience = patience
        self.mode = mode
        self.min_scale = min_scale
        self.best: Optional[float] = None
        self.bad_epochs = 0
        self.scale = 1.0

    def update(self, metric: float) -> float:
        improved = (
            self.best is None
            or (self.mode == "min" and metric < self.best - 1e-12)
            or (self.mode == "max" and metric > self.best + 1e-12)
        )
        if improved:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale = max(self.scale * self.factor, self.min_scale)
                self.bad_epochs = 0
        return self.scale

    def state_dict(self) -> dict:
        return {
            "best": self.best,
            "bad_epochs": self.bad_epochs,
            "scale": self.scale,
        }

    def load_state_dict(self, state: dict) -> None:
        self.best = state["best"]
        self.bad_epochs = state["bad_epochs"]
        self.scale = state["scale"]


class EarlyStopping:
    """Patience-based early stop (reference train_arcface.py:214-278)."""

    def __init__(
        self, patience: int = 15, mode: str = "max", min_delta: float = 0.0
    ):
        self.patience = patience
        self.mode = mode
        self.min_delta = min_delta
        self.best: Optional[float] = None
        self.counter = 0
        self.should_stop = False

    def __call__(self, metric: float) -> bool:
        improved = (
            self.best is None
            or (self.mode == "max" and metric > self.best + self.min_delta)
            or (self.mode == "min" and metric < self.best - self.min_delta)
        )
        if improved:
            self.best = metric
            self.counter = 0
        else:
            self.counter += 1
            if self.counter >= self.patience:
                self.should_stop = True
        return self.should_stop

    def state_dict(self) -> dict:
        return {
            "best": self.best,
            "counter": self.counter,
            "should_stop": self.should_stop,
        }

    def load_state_dict(self, state: dict) -> None:
        self.best = state["best"]
        self.counter = state["counter"]
        self.should_stop = state["should_stop"]
