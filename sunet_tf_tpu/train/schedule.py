"""Learning-rate schedule reproducing the reference's exact LR sequence.

The reference composes GradualWarmupScheduler(multiplier=1, total_epoch=3)
around CosineAnnealingLR(T_max=EPOCHS-3, eta_min=LR_MIN) and calls
scheduler.step() once at startup (train.py:135) plus once per epoch
(train.py:718). Unrolling torch's stepping semantics
(warmup_scheduler/scheduler.py:25-37 + torch _LRScheduler init-step):

  epoch e (1-indexed) runs at
    e <= warmup:            base * e / warmup           (linear ramp, NOT
                                                         starting at 0 — the
                                                         startup step shifts
                                                         the ramp by one)
    e == warmup + 1:        base                        (cosine step 0)
    e >  warmup + 1:        eta_min + (base - eta_min)
                            * (1 + cos(pi * (e - warmup - 1) / T_max)) / 2

so with EPOCHS=500: epoch 500 runs at cosine step 496 of T_max=497 — the
schedule never quite reaches eta_min, exactly like the reference (SURVEY
defect #7, reproduced deliberately).

Resume replays steps (reference train.py:143-144) — with a closed form this
is just evaluating at the resumed epoch.
"""

from __future__ import annotations

import math


def reference_lr_schedule(
    epoch: int,
    base_lr: float,
    lr_min: float,
    total_epochs: int,
    warmup_epochs: int = 3,
) -> float:
    """LR used *during* 1-indexed ``epoch`` under the reference recipe."""
    if epoch <= warmup_epochs:
        return base_lr * epoch / warmup_epochs
    t_max = max(total_epochs - warmup_epochs, 1)
    step = epoch - warmup_epochs - 1  # cosine step 0 at epoch warmup+1
    return lr_min + (base_lr - lr_min) * (1.0 + math.cos(math.pi * step / t_max)) / 2.0


def lr_for_step(
    global_step: int,
    steps_per_epoch: int,
    base_lr: float,
    lr_min: float,
    total_epochs: int,
    warmup_epochs: int = 3,
) -> float:
    """Per-step wrapper: LR is constant within an epoch (reference steps the
    scheduler per epoch, not per batch)."""
    epoch = global_step // max(steps_per_epoch, 1) + 1
    return reference_lr_schedule(epoch, base_lr, lr_min, total_epochs, warmup_epochs)
