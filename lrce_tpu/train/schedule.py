"""Learning-rate schedules.

`cosine_warmup_restarts_lr` re-derives the semantics of the external
`pytorch-cosine-annealing-with-warmup` package the reference trains with
(reference lrce/agent/agent_base.py:56-64, env: readme.md:12), driven in
*fractional epoch* units because the reference steps it per batch with
`epoch + i/len(dl)` (agent_base.py:139). Notable semantics preserved:

  - every param group receives the SAME lr (the package initializes all
    base_lrs to min_lr and overwrites group lrs each step) — so under the
    cosine scheduler the reference's 3 per-module LRs collapse to one;
  - per-cycle peak decay: max_lr = base_max_lr * gamma**cycle;
  - warmup is linear min_lr -> max_lr over `warmup_steps` epochs;
  - for cycle_mult != 1 the cycle boundaries follow the geometric-series
    inversion, and cur_cycle_steps = first_cycle_steps * cycle_mult**n
    (warmup NOT subtracted in this branch — package quirk, kept).

`ReduceLROnPlateau` replicates torch's scheduler (mode/factor/patience/
min_lr, rel threshold 1e-4) for the non-cosine path (agent_base.py:66-73).
"""

from __future__ import annotations

import math
from typing import List, Sequence


def cosine_warmup_restarts_lr(t: float, first_cycle_steps: float,
                              cycle_mult: float, base_max_lr: float,
                              min_lr: float, warmup_steps: float,
                              gamma: float) -> float:
    """LR at fractional epoch t >= 0."""
    if t >= first_cycle_steps:
        if cycle_mult == 1.0:
            cycle = int(t // first_cycle_steps)
            step_in_cycle = t % first_cycle_steps
            cur_cycle_steps = first_cycle_steps
        else:
            n = int(math.log(t / first_cycle_steps * (cycle_mult - 1) + 1,
                             cycle_mult))
            cycle = n
            step_in_cycle = t - first_cycle_steps * (cycle_mult ** n - 1) / (
                cycle_mult - 1)
            cur_cycle_steps = first_cycle_steps * cycle_mult ** n
    else:
        cycle = 0
        step_in_cycle = t
        cur_cycle_steps = first_cycle_steps

    max_lr = base_max_lr * (gamma ** cycle)
    if step_in_cycle < warmup_steps:
        return (max_lr - min_lr) * step_in_cycle / warmup_steps + min_lr
    return min_lr + (max_lr - min_lr) * (
        1 + math.cos(math.pi * (step_in_cycle - warmup_steps)
                     / (cur_cycle_steps - warmup_steps))) / 2


class CosineWarmupRestarts:
    """Stateful wrapper mirroring the reference scheduler's call pattern:
    `step(epoch + i / len(dl))` -> same lr applied to every param group."""

    def __init__(self, num_groups: int, first_cycle_steps: float,
                 cycle_mult: float = 1.0, max_lr: float = 0.1,
                 min_lr: float = 0.001, warmup_steps: float = 0.0,
                 gamma: float = 1.0):
        self.num_groups = num_groups
        self.first_cycle_steps = first_cycle_steps
        self.cycle_mult = cycle_mult
        self.base_max_lr = max_lr
        self.min_lr = min_lr
        self.warmup_steps = warmup_steps
        self.gamma = gamma
        self.lrs: List[float] = [min_lr] * num_groups  # init_lr() semantics

    def step(self, t: float) -> List[float]:
        lr = cosine_warmup_restarts_lr(t, self.first_cycle_steps,
                                       self.cycle_mult, self.base_max_lr,
                                       self.min_lr, self.warmup_steps,
                                       self.gamma)
        self.lrs = [lr] * self.num_groups
        return self.lrs

    def state_dict(self) -> dict:
        return {"lrs": list(self.lrs)}

    def load_state_dict(self, state: dict) -> None:
        self.lrs = list(state["lrs"])


class ReduceLROnPlateau:
    """torch.optim.lr_scheduler.ReduceLROnPlateau semantics (rel threshold)."""

    def __init__(self, initial_lrs: Sequence[float], mode: str = "max",
                 factor: float = 0.5, patience: int = 10,
                 min_lr: float = 0.0, threshold: float = 1e-4):
        self.lrs = list(initial_lrs)
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.threshold = threshold
        self.best: float | None = None
        self.num_bad = 0

    def _is_better(self, metric: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "max":
            return metric > self.best * (1.0 + self.threshold) if self.best >= 0 \
                else metric > self.best * (1.0 - self.threshold)
        return metric < self.best * (1.0 - self.threshold) if self.best >= 0 \
            else metric < self.best * (1.0 + self.threshold)

    def step(self, metric: float) -> List[float]:
        if self._is_better(metric):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            self.lrs = [max(lr * self.factor, self.min_lr) for lr in self.lrs]
            self.num_bad = 0
        return self.lrs

    def state_dict(self) -> dict:
        return {"lrs": list(self.lrs), "best": self.best,
                "num_bad": self.num_bad}

    def load_state_dict(self, state: dict) -> None:
        self.lrs = list(state["lrs"])
        self.best = state["best"]
        self.num_bad = state["num_bad"]
