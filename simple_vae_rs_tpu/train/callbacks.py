"""Training callbacks: the reference's hook protocol, orbax-backed.

Parity targets: ``callbacks.py:9-28`` (``Callback`` ABC returning boolean
stop flags), ``callbacks.py:31-76`` (``EarlyStopping``), and
``callbacks.py:79-153`` (``ModelCheckpoint`` with best-only semantics and
fuzzy monitor-name matching at epoch 1).
"""

from __future__ import annotations

import abc
from difflib import get_close_matches
from typing import Any, Dict, Optional


class Callback(abc.ABC):
    """Hooks return True to stop training (reference ``callbacks.py:9-28``)."""

    @abc.abstractmethod
    def on_epoch_begin(self, **kwargs) -> bool:
        return False

    @abc.abstractmethod
    def on_epoch_end(self, **kwargs) -> bool:
        return False


class EarlyStopping(Callback):
    """Stop when val loss stops improving (reference ``callbacks.py:31-76``).

    Intended-behavior notes:

    - The reference hard-codes the key ``"val_loss"``, but its engine only
      ever passes logs keyed ``"Loss/val_loss"`` (``models/vae.py:136``), so
      upstream EarlyStopping can *never* fire — a latent bug (documented in
      docs/PARITY.md). Here the monitor is resolved against the actual log
      keys on first use, with the same difflib fuzzy matching that
      ``ModelCheckpoint`` uses, so the wired path really stops training.
    - Dead-band quirk preserved deliberately: a value inside
      ``[best - delta, best + delta]`` neither resets nor advances the
      patience counter.
    """

    def __init__(
        self,
        patience: int = 10,
        delta: float = 0.0,
        monitor: str = "Loss/val_loss",
    ) -> None:
        self.patience = patience
        self.delta = delta
        self.monitor = monitor
        self.counter = 0
        self.best_loss = float("inf")
        self.best_epoch = 0
        self._resolved = False

    def on_epoch_begin(self, **kwargs) -> bool:
        return False

    def _resolve_monitor(self, logs: Dict[str, float]) -> None:
        if self.monitor not in logs:
            matches = get_close_matches(self.monitor, logs.keys(), n=1, cutoff=0)
            if not matches:
                raise ValueError(
                    f"EarlyStopping monitor '{self.monitor}' not found and no "
                    f"logs to match against. Available: {list(logs.keys())}"
                )
            self.monitor = matches[0]
        self._resolved = True

    def on_epoch_end(self, **kwargs) -> bool:
        logs: Dict[str, float] = kwargs.get("logs", {})
        if not logs:
            return False
        if not self._resolved:
            self._resolve_monitor(logs)
        current = logs.get(self.monitor)
        if current is None:
            return False
        if current < self.best_loss - self.delta:
            self.best_loss = current
            self.best_epoch = kwargs.get("epoch", 0)
            self.counter = 0
        elif current > self.best_loss + self.delta:
            self.counter += 1
        return self.counter >= self.patience


class ModelCheckpoint(Callback):
    """Save the training state when the monitored metric improves.

    Matches reference ``callbacks.py:79-153``: ``monitor``/``mode``/
    ``save_best_only``, fuzzy metric-name resolution at epoch 1 via difflib
    (``callbacks.py:119-130``), per-epoch file naming otherwise. Storage is
    this framework's checkpoint module (orbax / msgpack) instead of
    ``torch.save``; the logical content additionally includes optimizer
    state, epoch, RNG and the gammas — fixing the reference's broken resume
    (SURVEY §2.2-2, §2.2-7).
    """

    def __init__(
        self,
        job_id: str,
        save_path: str,
        monitor: str = "val_loss",
        mode: str = "min",
        save_best_only: bool = True,
        async_save: bool = False,
    ) -> None:
        self.job_id = job_id
        self.save_path = save_path
        self.monitor = monitor
        self.mode = mode
        self.save_best_only = save_best_only
        # async_save commits the checkpoint on a background writer thread
        # so the train loop doesn't stall on serialize + disk IO; the
        # engine flushes pending saves when fit() exits
        self.async_save = async_save
        self.best_metric = float("inf") if mode == "min" else float("-inf")
        self.best_epoch = 0

    def on_epoch_begin(self, **kwargs) -> bool:
        return False

    def _resolve_monitor(self, logs: Dict[str, float]) -> None:
        if self.monitor not in logs:
            matches = get_close_matches(self.monitor, logs.keys(), n=1, cutoff=0)
            if matches:
                self.monitor = matches[0]
            else:
                raise ValueError(
                    f"Monitor metric '{self.monitor}' not found in logs. "
                    f"Available metrics: {list(logs.keys())}"
                )

    def on_epoch_end(self, **kwargs) -> bool:
        from simple_vae_rs_tpu.train.checkpoint import save_checkpoint

        logs: Dict[str, float] = kwargs.get("logs", {})
        epoch: int = kwargs.get("epoch", 0)
        state: Optional[Any] = kwargs.get("state")
        extra: Dict[str, Any] = kwargs.get("extra", {})
        if state is None:
            return False
        if epoch == 1:
            self._resolve_monitor(logs)

        current = logs.get(self.monitor, float("inf"))
        if self.save_best_only:
            improved = (self.mode == "min" and current < self.best_metric) or (
                self.mode == "max" and current > self.best_metric
            )
            if improved:
                self.best_metric = current
                self.best_epoch = epoch
                save_checkpoint(
                    f"{self.save_path}/{self.job_id}", state, epoch=epoch,
                    extra=extra, block=not self.async_save,
                )
        else:
            save_checkpoint(
                f"{self.save_path}/{self.job_id}_epoch_{epoch}",
                state,
                epoch=epoch,
                extra=extra,
                block=not self.async_save,
            )
        return False
