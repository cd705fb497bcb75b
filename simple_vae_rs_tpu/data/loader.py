"""Host loader feeding device-resident, on-device-patchified batches.

Pipeline per batch: gather raw tiles on host (background prefetch thread)
-> one host->device transfer (sharded over the mesh ``data`` axis) -> jitted
crop+normalize (``ops/patchify.py``) -> (lr, hr) patch batch.

Split semantics match the reference ``init_dataloader``
(``dataset.py:13-47``): sequential 80/20 train/val split, shuffled train
epochs, deterministic val order. Divergences (documented):

- grid mode is a first-class loader option (the reference never wires it
  from the CLI — SURVEY §2.2-3); effective batch = patches/tile x
  batch_size, as the reference README describes.
- batches have static shapes (`drop_last`) so the train step compiles once;
  the reference's ragged final batch would trigger a recompile per epoch.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Sequence, Tuple

import jax
import numpy as np

from simple_vae_rs_tpu.ops.patchify import grid_sr_batch, random_sr_crop_batch


class DeviceLoader:
    """Iterable over device-ready (lr, hr) patch batches."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        patch_size: int,
        crop: str = "random",
        shuffle: bool = False,
        seed: int = 0,
        mesh: Optional[jax.sharding.Mesh] = None,
        drop_last: bool = True,
        prefetch: int = 2,
        workers: int = 1,
    ) -> None:
        if crop not in ("random", "grid"):
            raise ValueError("Crop must be 'grid' or 'random'")
        if workers < 1:
            raise ValueError(f"workers must be >= 1 (got {workers})")
        self.dataset = dataset
        self.batch_size = batch_size
        self.patch_size = patch_size
        self.crop = crop
        self.shuffle = shuffle
        self.seed = seed
        self.mesh = mesh
        self.drop_last = drop_last
        self.prefetch = prefetch
        # Parallel item decode (the reference's DataLoader runs 6 worker
        # processes, dataset.py:37): a thread pool is the TPU-host-shaped
        # equivalent — tile decode is zlib / native-LZW / numpy, all of
        # which release the GIL, so threads scale across cores without
        # pickling batches between processes. Order is preserved
        # (pool.map), so batches are bit-identical at any worker count.
        self.workers = workers
        self._pool = None
        if workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=workers)
        self._epoch = 0

    def close(self) -> None:
        """Shut the decode pool down (idempotent). Loaders are often
        built repeatedly in one process (sweeps, parity harnesses, test
        suites); without this every ``workers>1`` loader would leak its
        threads for the process lifetime."""
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None
            self.workers = 1

    def __del__(self) -> None:  # best-effort backstop for dropped loaders
        try:
            self.close()
        except Exception:
            pass

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    # ------------------------------------------------------------- iteration
    def _index_batches(self) -> Sequence[np.ndarray]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        nb = len(self)
        return [order[i * self.batch_size : (i + 1) * self.batch_size] for i in range(nb)]

    def _gather(self, idxs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        if self._pool is not None:
            pairs = list(self._pool.map(
                lambda i: self.dataset[int(i)], idxs
            ))
        else:
            pairs = [self.dataset[int(i)] for i in idxs]
        lrs = [p[0] for p in pairs]
        hrs = [p[1] for p in pairs]
        return np.stack(lrs), np.stack(hrs)

    def _host_batches(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        batches = self._index_batches()
        if self.prefetch <= 0:
            for idxs in batches:
                yield self._gather(idxs)
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        sentinel = object()

        def worker():
            try:
                for idxs in batches:
                    item = self._gather(idxs)
                    # bounded put that gives up when the consumer abandoned
                    # iteration (e.g. `next(iter(loader))` for one batch) —
                    # otherwise the thread would block on the full queue
                    # forever and leak
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.2)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except Exception as exc:  # propagate IO errors to the consumer
                q.put(exc)
                return
            q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()

    def __iter__(self):
        self._epoch += 1
        base_rng = jax.random.PRNGKey(self.seed + 7919 * self._epoch)
        for step, (lr_tiles, hr_tiles) in enumerate(self._host_batches()):
            if self.mesh is not None:
                from simple_vae_rs_tpu.parallel.mesh import shard_batch

                lr_tiles, hr_tiles = shard_batch(self.mesh, (lr_tiles, hr_tiles))
            if self.crop == "grid":
                yield grid_sr_batch(lr_tiles, hr_tiles, self.patch_size)
            else:
                rng = jax.random.fold_in(base_rng, step)
                yield random_sr_crop_batch(rng, lr_tiles, hr_tiles, self.patch_size)


class _Subset:
    def __init__(self, dataset, indices: Sequence[int]) -> None:
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, i: int):
        return self.dataset[self.indices[i]]


def init_dataloader(
    dataset: str,
    batch_size: int = 16,
    patch_size: int = 256,
    crop: str = "random",
    data_root: Optional[str] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
    seed: int = 0,
    workers: int = 1,
) -> Tuple[DeviceLoader, DeviceLoader]:
    """Build (train_loader, val_loader): reference flag surface + grid mode.

    Dataset names as in reference ``dataset.py:23-29``: Sen2Venus aliases
    ("Sen2Venus"/"sen2venus"/"s2v"), "Floods"/"floods", plus "synthetic"
    (smooth fields) and "synthetic_hf" (band-correlated high-frequency
    scenes — the arm where SR beats the bicubic baseline).
    """
    from simple_vae_rs_tpu.data.datasets import (
        FloodDataset,
        Sen2VenusDataset,
        SyntheticHFDataset,
        SyntheticSRDataset,
    )

    name = dataset.lower()
    if name in ("sen2venus", "s2v"):
        ds = Sen2VenusDataset(root=data_root or "ARM", patch_size=patch_size)
    elif name == "floods":
        ds = FloodDataset(root=data_root or "floods", patch_size=256)
    elif name == "synthetic":
        ds = SyntheticSRDataset(seed=seed)
    elif name == "synthetic_hf":
        ds = SyntheticHFDataset(seed=seed)
    else:
        raise ValueError(f"Unknown dataset: {dataset}")

    train_size = int(0.8 * len(ds))
    train_ds = _Subset(ds, range(train_size))
    val_ds = _Subset(ds, range(train_size, len(ds)))
    train_loader = DeviceLoader(
        train_ds, batch_size, patch_size, crop=crop, shuffle=True, seed=seed,
        mesh=mesh, workers=workers,
    )
    val_loader = DeviceLoader(
        val_ds,
        batch_size,
        patch_size,
        # val uses the deterministic grid so metrics are reproducible
        crop="grid" if crop == "grid" else "random",
        shuffle=False,
        seed=seed + 1,
        mesh=mesh,
        workers=workers,
    )
    # static-shape batches drop ragged tails, so a split smaller than one
    # batch would silently yield ZERO batches and crash the epoch averages
    # downstream — fail here with an actionable message instead
    for split, ldr, n_items in (
        ("train", train_loader, len(train_ds)),
        ("val", val_loader, len(val_ds)),
    ):
        if len(ldr) == 0:
            raise ValueError(
                f"{split} split has {n_items} tiles — fewer than one "
                f"batch of {batch_size} (static shapes drop the ragged "
                f"tail). Reduce --batch_size or add data."
            )
    return train_loader, val_loader
