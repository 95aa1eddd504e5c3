"""Epoch driver: orchestrates steps, validation, CSV logs, checkpoints.

Mirrors the reference training loops' observable behavior
(pretrain_BreastPathQ.py:276-345): per-epoch train/validate, CSV append
('epoch, train_loss, train_acc, val_loss, val_acc'), periodic + best-val
checkpoints, Lookahead stepped per epoch, and resume."""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from ssl_cr_histo_tpu.train import optim
from ssl_cr_histo_tpu.train.checkpoint import save_checkpoint
from ssl_cr_histo_tpu.train.state import TrainState


class CsvLogger:
    """Append-only CSV with a fixed header (reference
    pretrain_BreastPathQ.py:272-273, 289-290).  On multi-host pods only
    process 0 writes — metrics are all-reduced identical on every process."""

    def __init__(self, path: str, header: str):
        from ssl_cr_histo_tpu.parallel.distributed import is_primary

        self.primary = is_primary()
        self.path = path
        if not self.primary:
            return
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        if not os.path.exists(path):
            with open(path, "w") as f:
                f.write(header.rstrip("\n") + "\n")

    def append(self, *values):
        if not self.primary:
            return
        with open(self.path, "a") as f:
            f.write(",".join(f"{v:.6f}" if isinstance(v, float) else str(v) for v in values) + "\n")


def lookahead_epoch(state: TrainState, la_steps: int = 5, la_alpha: float = 0.5) -> TrainState:
    """Apply the reference's per-epoch Lookahead 'scheduler' step
    (pretrain_BreastPathQ.py:247,293)."""
    if state.slow_params is None:
        return state
    params, slow, count = optim.lookahead_epoch_sync(
        state.params, state.slow_params, state.la_count, la_steps, la_alpha
    )
    return state.replace(params=params, slow_params=slow, la_count=count)


@dataclass
class BestTracker:
    """Best-validation checkpoint retention (reference keeps best-val copies,
    Camelyon16 gated to epoch > 80 — pretrain_Camelyon16.py:307)."""

    save_dir: str
    mode: str = "min"
    gate_epoch: int = 0
    best: float = field(default=float("inf"))

    @property
    def best_value(self) -> "float | None":
        """The raw (unsigned) best metric, or None before any update —
        checkpoint metas persist this so resume can restore the tracker."""
        if not np.isfinite(self.best):
            return None
        return self.best if self.mode == "min" else -self.best

    def restore(self, value: float) -> None:
        """Re-arm from a persisted raw best value (resume)."""
        self.best = value if self.mode == "min" else -value

    def update(self, value: float, epoch: int, state: TrainState, meta: dict) -> bool:
        if not np.isfinite(value):
            # a diverged (NaN/inf) metric must never overwrite best/ — NaN
            # compares False to everything, so the `v >= best` guard alone
            # would admit it AND poison every later comparison
            return False
        v = value if self.mode == "min" else -value
        if epoch <= self.gate_epoch or v >= self.best:
            return False
        self.best = v
        save_checkpoint(
            os.path.join(self.save_dir, "best"),
            state,
            dict(meta, best=value, best_val=value),
        )
        return True
