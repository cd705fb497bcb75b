"""Host-side ReduceLROnPlateau with torch semantics.

The reference uses ``torch.optim.lr_scheduler.ReduceLROnPlateau(mode="min",
factor=0.5, patience=500)`` stepped on the epoch validation loss
(reference ``models/base.py:51-53,164-165``). The learning rate is a plain
scalar fed to the jitted train step each call, so changing it never triggers
recompilation.
"""

from __future__ import annotations


class ReduceLROnPlateau:
    """torch-default semantics: rel threshold 1e-4, no cooldown, min_lr 0."""

    def __init__(
        self,
        lr: float,
        mode: str = "min",
        factor: float = 0.5,
        patience: int = 500,
        threshold: float = 1e-4,
        min_lr: float = 0.0,
    ) -> None:
        if mode not in ("min", "max"):
            raise ValueError("mode must be 'min' or 'max'")
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.lr = lr
        self.best = float("inf") if mode == "min" else float("-inf")
        self.num_bad_epochs = 0
        self.last_epoch = 0

    def _is_better(self, metric: float) -> bool:
        if self.mode == "min":
            return metric < self.best * (1.0 - self.threshold)
        return metric > self.best * (1.0 + self.threshold)

    def step(self, metric: float) -> float:
        """Advance one epoch with the monitored metric; returns current lr."""
        self.last_epoch += 1
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.num_bad_epochs = 0
        return self.lr

    def get_last_lr(self):
        """torch-compatible accessor (reference ``vae.py:225``)."""
        return [self.lr]

    def state_dict(self) -> dict:
        return {
            "lr": self.lr,
            "best": self.best,
            "num_bad_epochs": self.num_bad_epochs,
            "last_epoch": self.last_epoch,
        }

    def load_state_dict(self, state: dict) -> None:
        self.lr = state["lr"]
        self.best = state["best"]
        self.num_bad_epochs = state["num_bad_epochs"]
        self.last_epoch = state["last_epoch"]
