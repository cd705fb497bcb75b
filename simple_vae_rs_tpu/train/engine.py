"""Training engine: jitted, sharded train/val steps under a host epoch driver.

Replaces the reference's mutable epoch loop (``models/base.py:40-185``) with
the functional TPU pattern:

- one jit-compiled ``train_step`` (forward + ELBO + global-norm clip + Adam
  + BN-stat update) with the whole ``TrainState`` donated — weights never
  leave HBM;
- batches arrive sharded over the mesh ``data`` axis; XLA inserts the
  gradient all-reduce and computes BatchNorm statistics over the *global*
  batch (sync-BN for free);
- loss terms accumulate on device and are fetched once per epoch (the
  reference syncs ``loss.item()`` every step — ``models/base.py:116``);
- epoch-level semantics preserved: callback hooks with stop flags, NaN
  guard that raises (``base.py:125-128``), ReduceLROnPlateau stepped on val
  loss, full-val metrics cadence (``base.py:153-157``), identical metric
  names.
"""

from __future__ import annotations

import contextlib
import time
from math import isnan
from typing import Any, Dict, Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from simple_vae_rs_tpu.config import TrainConfig
from simple_vae_rs_tpu.models.cond_vae import CondSRVAE
from simple_vae_rs_tpu.models.vae import VAE
from simple_vae_rs_tpu.ops import pallas_elbo as L  # fused on TPU, jnp on CPU
from simple_vae_rs_tpu.ops.metrics import psnr, ssim
from simple_vae_rs_tpu.ops.resize import bicubic_upsample_2x
from simple_vae_rs_tpu.train.callbacks import Callback
from simple_vae_rs_tpu.train.schedule import ReduceLROnPlateau
from simple_vae_rs_tpu.train.state import TrainState, create_train_state, make_optimizer
from simple_vae_rs_tpu.utils.logging import Logger, NullLogger

Array = jnp.ndarray
Batch = Tuple[np.ndarray, ...]


def _tree_add(a, b):
    return jax.tree.map(jnp.add, a, b)


class Trainer:
    """Owns the compiled steps and the host epoch loop for one model."""

    def __init__(
        self,
        model: Any,
        train_cfg: Optional[TrainConfig] = None,
        callbacks: Sequence[Callback] = (),
        logger: Optional[Logger] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
        job_id: str = "local",
    ) -> None:
        self.model = model
        self.cfg = train_cfg or TrainConfig()
        self.callbacks = list(callbacks)
        self.logger = logger or NullLogger()
        self.mesh = mesh
        self.job_id = job_id
        # Multi-chip meshes keep the fused Pallas ELBO kernels: the loss
        # row reductions run per-shard under ``jax.shard_map`` (the mesh
        # is passed into ``fused_*_loss`` below), so GSPMD never has to
        # partition a Pallas custom call. Conv-block kernel routing is
        # unchanged here: at training shapes the measured thresholds
        # (``pallas_conv.wins_over_xla*``) already route the convs to
        # XLA's batched implementations (BASELINE.md sweep).
        from simple_vae_rs_tpu.models.srvae import SRVAE

        if isinstance(model, CondSRVAE):
            self.kind = "cond"
        elif isinstance(model, SRVAE):
            self.kind = "srvae"
        else:
            self.kind = "vae"
        self.tx = make_optimizer(self.cfg)
        self.scheduler = ReduceLROnPlateau(
            lr=self.cfg.learning_rate,
            factor=self.cfg.plateau_factor,
            patience=self.cfg.plateau_patience,
        )
        self.state: Optional[TrainState] = None
        self.current_epoch = 0
        self.baseline_metrics: Optional[Dict[str, float]] = None
        # scan_steps=0 (auto): resolved once, after the first trained
        # epoch, by probing dispatch latency against the measured
        # per-step time (see _maybe_autotune_scan)
        self._auto_scan_k: Optional[int] = None
        self._build_steps()

    def _model_meta(self) -> Dict[str, Any]:
        """Model config embedded in every checkpoint's sidecar meta, so a
        checkpoint path alone reconstructs the network at serving time
        (``SuperResolver.from_checkpoint`` reads it; explicit flags still
        override). Type names use the CLI's reference-parity spelling."""
        cfg = self.model.config
        name = {"CondSRVAE": "Cond_SRVAE"}.get(
            type(self.model).__name__, type(self.model).__name__
        )
        return {
            "type": name,
            "cr": float(cfg.cr),
            "patch_size": int(cfg.patch_size),
            "channels": int(cfg.channels),
            "latent_size_override": int(
                getattr(cfg, "latent_size_override", 0)
            ),
            "torch_regroup": bool(getattr(cfg, "torch_regroup", False)),
        }

    # ------------------------------------------------------------ state init
    def init_state(self, batch: Batch, seed: Optional[int] = None) -> TrainState:
        seed = self.cfg.seed if seed is None else seed
        rng = jax.random.PRNGKey(seed)
        init_rng, model_rng, state_rng = jax.random.split(rng, 3)
        batch = self._device_batch(batch)
        # jit the whole init: eager Flax init dispatches hundreds of tiny ops
        # (very slow against a remote/tunneled device); one compile instead.
        if self.kind == "cond":
            y, x = batch[0], batch[1]
            init_fn = jax.jit(lambda r1, xx, yy, r2: self.model.init(
                {"params": r1}, xx, yy, r2, train=False
            ))
            variables = init_fn(init_rng, x, y, model_rng)
        else:
            # vae trains on the LR stream (reference train.py:35-40);
            # srvae on the HR stream (its LR view is internal)
            x = batch[0] if self.kind == "vae" else batch[-1]
            init_fn = jax.jit(lambda r1, xx, r2: self.model.init(
                {"params": r1}, xx, r2, train=False
            ))
            variables = init_fn(init_rng, x, model_rng)
        self.state = create_train_state(variables, self.tx, state_rng)
        if self.mesh is not None:
            from simple_vae_rs_tpu.parallel.mesh import shard_state

            self.state = shard_state(self.mesh, self.state, zero1=self.cfg.zero1)
        return self.state

    # -------------------------------------------------------------- jit steps
    def _variables(self, state: TrainState) -> Dict[str, Any]:
        v = {"params": state.params}
        if state.batch_stats:
            v["batch_stats"] = state.batch_stats
        return v

    def _elbo_scope(self, train: bool):
        """Trace-time kernel routing for the ELBO reductions: training
        defaults to the plain XLA lowering (the fused Pallas rows measured
        0.9896x end-to-end inside the train step — BASELINE.md fused-ELBO
        A/B; ``cfg.train_elbo="pallas"`` restores them), eval keeps the
        fused kernels (single-pass, latency-bound)."""
        if train and getattr(self.cfg, "train_elbo", "xla") != "pallas":
            return L.force_xla()
        return contextlib.nullcontext()

    def _loss_and_terms(
        self, params, batch_stats, batch, rng, train: bool
    ) -> Tuple[Array, Tuple[Dict[str, Array], Any]]:
        with self._elbo_scope(train):
            return self._loss_and_terms_inner(params, batch_stats, batch, rng, train)

    def _loss_and_terms_inner(
        self, params, batch_stats, batch, rng, train: bool
    ) -> Tuple[Array, Tuple[Dict[str, Array], Any]]:
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        mutable = ["batch_stats"] if (train and batch_stats) else False
        if self.kind == "vae":
            x = batch[0]
            out = self.model.apply(variables, x, rng, train=train, mutable=mutable)
            (x_hat, mu, logvar), aux = out if mutable else (out, {})
            mse, kld = L.fused_base_loss(
                x_hat, x, mu, logvar, params["gamma"], mesh=self.mesh
            )
            loss = mse + kld
            terms = {"loss": loss, "mse": mse, "kld": kld}
        elif self.kind == "srvae":
            x = batch[-1]
            out = self.model.apply(variables, x, rng, train=train, mutable=mutable)
            outputs, aux = out if mutable else (out, {})
            x_hat, y_hat, mu_z, lv_z, mu_u, lv_u, mu_p, lv_p, y_int = outputs
            core_params = params["core"]
            mse_x, kld_u, mse_y, kld_z = L.fused_cond_loss(
                x_hat, x, y_hat, y_int, mu_u, lv_u, mu_z, lv_z, mu_p, lv_p,
                core_params["gammax"], core_params["gammay"], mesh=self.mesh,
            )
            loss = mse_x + kld_u + mse_y + kld_z
            terms = {
                "loss": loss,
                "mse_x": mse_x,
                "kld_u": kld_u,
                "mse_y": mse_y,
                "kld_z": kld_z,
            }
        else:
            y, x = batch[0], batch[1]
            out = self.model.apply(variables, x, y, rng, train=train, mutable=mutable)
            outputs, aux = out if mutable else (out, {})
            x_hat, y_hat, mu_z, lv_z, mu_u, lv_u, mu_p, lv_p = outputs
            mse_x, kld_u, mse_y, kld_z = L.fused_cond_loss(
                x_hat, x, y_hat, y, mu_u, lv_u, mu_z, lv_z, mu_p, lv_p,
                params["gammax"], params["gammay"], mesh=self.mesh,
            )
            loss = mse_x + kld_u + mse_y + kld_z
            terms = {
                "loss": loss,
                "mse_x": mse_x,
                "kld_u": kld_u,
                "mse_y": mse_y,
                "kld_z": kld_z,
            }
        new_stats = aux.get("batch_stats") if mutable else batch_stats
        return loss, (terms, new_stats)

    def _micro_grads(self, params, batch_stats, batch, rng):
        """One microbatch forward/backward: (grads, terms, new_stats)."""
        loss_fn = lambda p: self._loss_and_terms(p, batch_stats, batch, rng, True)
        if self.cfg.remat:
            # recompute the forward during backward instead of storing
            # activations (HBM headroom for large patch/batch configs)
            loss_fn = jax.checkpoint(loss_fn)
        (_, (terms, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        return grads, terms, new_stats

    def _build_steps(self) -> None:
        accum = max(1, int(getattr(self.cfg, "accum_steps", 1)))

        def accum_grads(state: TrainState, batch, step_rng):
            """lax.scan the microbatches inside the one jit step: grads and
            loss terms averaged (the losses are per-element means, so the
            equal-size microbatch average equals the full-batch value),
            BatchNorm running stats threaded through the scan carry."""
            b = jax.tree.leaves(batch)[0].shape[0]
            if b % accum:
                raise ValueError(
                    f"batch size {b} not divisible by accum_steps {accum}"
                )
            micro = jax.tree.map(
                lambda a: a.reshape(accum, b // accum, *a.shape[1:]), batch
            )
            first = jax.tree.map(lambda a: a[0], micro)
            rest = jax.tree.map(lambda a: a[1:], micro)
            g0, t0, stats = self._micro_grads(
                state.params, state.batch_stats, first,
                jax.random.fold_in(step_rng, 0),
            )

            def one(carry, xs):
                stats, gsum, tsum = carry
                mb, i = xs
                g, t, new_stats = self._micro_grads(
                    state.params, stats, mb, jax.random.fold_in(step_rng, i)
                )
                return (
                    new_stats if new_stats is not None else stats,
                    jax.tree.map(jnp.add, gsum, g),
                    jax.tree.map(jnp.add, tsum, t),
                ), None

            (stats, gsum, tsum), _ = jax.lax.scan(
                one,
                (stats if stats is not None else state.batch_stats, g0, t0),
                (rest, jnp.arange(1, accum)),
            )
            inv = 1.0 / accum
            return (
                jax.tree.map(lambda g: g * inv, gsum),
                jax.tree.map(lambda t: t * inv, tsum),
                stats,
            )

        def train_step(state: TrainState, batch, lr):
            step_rng = jax.random.fold_in(state.rng, state.step)
            if accum > 1:
                grads, terms, new_stats = accum_grads(state, batch, step_rng)
            else:
                grads, terms, new_stats = self._micro_grads(
                    state.params, state.batch_stats, batch, step_rng
                )
            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
            new_params = jax.tree.map(
                lambda p, u: p - lr * u, state.params, updates
            )
            new_state = state.replace(
                params=new_params,
                batch_stats=new_stats if new_stats is not None else {},
                opt_state=new_opt,
                step=state.step + 1,
            )
            return new_state, terms

        def val_step(state: TrainState, batch):
            rng = jax.random.fold_in(state.rng, 0xFFF1)
            _, (terms, _) = self._loss_and_terms(
                state.params, state.batch_stats, batch, rng, False
            )
            return terms

        def train_multi_step(state: TrainState, batches, lr):
            """``scan_steps`` FULL optimizer steps — each its own batch,
            grads and update — in ONE jit dispatch (``batches`` stacked on
            a leading k axis). Amortizes the per-dispatch launch latency,
            the dominant per-step cost on relayed/tunneled links (16 ms+
            per dispatch measured on this box's healthy tunnel, up to
            ~1 s degraded) and a real tail cost even locally. The scanned
            body IS ``train_step`` — same RNG folding (``state.step``
            advances in the carry), same accumulation path — so k fused
            steps compute exactly what k dispatches would."""
            new_state, terms_stack = jax.lax.scan(
                lambda st, b: train_step(st, b, lr), state, batches
            )
            # sum (not mean) over the k steps: the epoch accumulator
            # divides by the STEP count, so each fused step must weigh
            # the same as a dispatched one
            return new_state, jax.tree.map(
                lambda t: jnp.sum(t, axis=0), terms_stack
            )

        donate = (0,)
        self._step_fn = train_step  # raw (unjitted) step: scan fusion /
        self._train_step = jax.jit(train_step, donate_argnums=donate)  # flag sweeps
        self._train_multi_step = jax.jit(train_multi_step, donate_argnums=donate)
        self._val_step = jax.jit(val_step)
        self._eval_metrics_step = jax.jit(self._eval_metrics)
        self._eval_images_step = jax.jit(self._eval_images)
        if self.mesh is not None and self.mesh.size > 1:
            # The steps above run eval-mode model graphs (train=False)
            # under plain jit with mesh-sharded batches. The train step is
            # safe (the conv dispatch gates route training traces to XLA),
            # but at eval shapes the fused Pallas conv kernels can pass
            # their thresholds — and GSPMD cannot partition a pallas_call.
            # Trace those steps with the conv routing forced to XLA; the
            # fused ELBO row kernels inside val_step stay alive (they run
            # per-shard via the mesh= argument to fused_*_loss), as do the
            # serving endpoints (shard_map, serve.py).
            from simple_vae_rs_tpu.ops import pallas_conv as _pc

            def _xla_eval(f):
                def g(*a, **k):
                    with _pc.force_xla():
                        return f(*a, **k)
                return g

            self._val_step = _xla_eval(self._val_step)
            self._eval_metrics_step = _xla_eval(self._eval_metrics_step)
            self._eval_images_step = _xla_eval(self._eval_images_step)

    # ------------------------------------------------------------ evaluation
    def _eval_metrics(self, state: TrainState, batch):
        """Per-batch metric sums, all on device (reference evaluate loops
        per image on host — ``cond_vae.py:403-445``)."""
        variables = self._variables(state)
        rng = jax.random.fold_in(state.rng, 0xFFF2)
        if self.kind in ("vae", "srvae"):
            x = batch[0] if self.kind == "vae" else batch[-1]
            outputs = self.model.apply(variables, x, rng, train=False)
            x_hat = outputs[0]
            return {
                "ssim": jnp.sum(ssim(x, x_hat)),
                "psnr": jnp.sum(psnr(x, x_hat)),
                "count": jnp.float32(x.shape[0]),
            }
        y, x = batch[0], batch[1]
        outputs = self.model.apply(variables, x, y, rng, train=False)
        x_hat, y_hat = outputs[0], outputs[1]
        x_sr = self.model.apply(
            variables, y, rng, method=CondSRVAE.conditional_generation
        )
        return {
            "ssim_y": jnp.sum(ssim(y, y_hat)),
            "ssim_x": jnp.sum(ssim(x, x_hat)),
            "ssim_sr": jnp.sum(ssim(x, x_sr)),
            "psnr_sr": jnp.sum(psnr(x, x_sr)),
            "count": jnp.float32(x.shape[0]),
        }

    def _eval_images(self, state: TrainState, batch):
        variables = self._variables(state)
        rng = jax.random.fold_in(state.rng, 0xFFF3)
        if self.kind in ("vae", "srvae"):
            x = (batch[0] if self.kind == "vae" else batch[-1])[:4]
            outputs = self.model.apply(variables, x, rng, train=False)
            x_hat = outputs[0]
            return {"Images/Input": x, "Images/Reconstruction": x_hat}
        y, x = batch[0][:4], batch[1][:4]
        outputs = self.model.apply(variables, x, y, rng, train=False)
        x_hat, y_hat = outputs[0], outputs[1]
        x_sr = self.model.apply(
            variables, y, rng, method=CondSRVAE.conditional_generation
        )
        return {
            "Images/LR_Input": y,
            "Images/HR_Input": x,
            "Images/LR_Bicubic": bicubic_upsample_2x(y),
            "Images/LR_Recon": y_hat,
            "Images/HR_Recon": x_hat,
            "Images/SR_Output": x_sr,
        }

    @staticmethod
    @jax.jit
    def _baseline_metrics_step(y, x):
        up = bicubic_upsample_2x(y)
        sums = {
            "ssim": jnp.sum(ssim(x, up)),
            "psnr": jnp.sum(psnr(x, up)),
            "count": jnp.float32(x.shape[0]),
        }
        return sums, up[:4]

    def compute_bicubic_baseline(self, val_loader) -> Dict[str, float]:
        """Bicubic-2x SR baseline over the val set, on device.

        Parity with reference ``cond_vae.py:541-579`` (minus its averaging
        precedence bug, SURVEY §2.2-6 — this is the true mean). LPIPS of
        the bicubic baseline (reference logs it as ``Metrics/LPIPS_Baseline``,
        ``cond_vae.py:473``) is computed on the same first-4-images-per-batch
        subset ``_lpips_metrics`` uses for the SR rows, so the SR-vs-bicubic
        LPIPS comparison reads off matching samples.
        """
        from simple_vae_rs_tpu.utils.lpips_optional import lpips_batch

        want_lpips = self._want_lpips()
        sums: Dict[str, Array] = {}
        lp_sum, lp_n = 0.0, 0
        for batch in val_loader:
            y, x = self._device_batch(batch)[:2]
            part, up4 = self._baseline_metrics_step(y, x)
            sums = part if not sums else _tree_add(sums, part)
            if want_lpips:
                vals = lpips_batch(
                    np.asarray(self._host_fetch(x[:4])),
                    np.asarray(self._host_fetch(up4)),
                )
                if vals is not None:
                    lp_sum += float(np.sum(vals))
                    lp_n += len(vals)
        if not sums:  # empty loader (custom loaders can bypass the
            return {}  # init_dataloader guard); baseline rows just absent
        out = jax.device_get(sums)
        n = max(float(out["count"]), 1.0)
        base = {
            "ssim_base": float(out["ssim"]) / n,
            "psnr_base": float(out["psnr"]) / n,
        }
        if lp_n:
            base["lpips_base"] = lp_sum / lp_n
        return base

    def _want_lpips(self) -> bool:
        """LPIPS availability resolved GLOBALLY: the flag gates
        ``_host_fetch`` calls that are cross-process collectives under
        ``--multihost``, so a per-process answer (weights file present on
        some hosts only) would deadlock the eval loop. All processes agree
        on the all-reduced minimum — LPIPS runs only when every host can."""
        from simple_vae_rs_tpu.utils.lpips_optional import lpips_available

        want = lpips_available()
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            want = bool(
                np.min(multihost_utils.process_allgather(np.int32(want)))
            )
        return want

    # ------------------------------------------------------------- data feed
    @staticmethod
    def _host_fetch(tree):
        """``jax.device_get`` that also works on multi-process global
        arrays: batch-sharded eval outputs span non-addressable devices
        under ``--multihost``, so they gather across processes first
        (a collective — every process must reach it; they all walk the
        same eval loop). Single-process: a plain device_get."""
        if jax.process_count() == 1:
            return jax.device_get(tree)
        from jax.experimental import multihost_utils

        def fetch(x):
            if isinstance(x, jax.Array) and not (
                x.is_fully_addressable or x.is_fully_replicated
            ):
                return multihost_utils.process_allgather(x, tiled=True)
            return x

        return jax.device_get(jax.tree.map(fetch, tree))

    def _device_batch(self, batch: Batch):
        arrays = tuple(jnp.asarray(b, dtype=jnp.float32) for b in batch)
        if self.mesh is not None:
            from simple_vae_rs_tpu.parallel.mesh import shard_batch

            arrays = shard_batch(self.mesh, arrays)
        return arrays

    def _device_batch_stack(self, batches):
        """k same-shape batches -> one (k, B, ...) stack for the fused
        multi-step dispatch (stacked on host — one transfer, not k; on a
        mesh the k axis replicates and B shards over the batch axes)."""
        arrays = tuple(
            np.stack([np.asarray(b[i], np.float32) for b in batches])
            for i in range(len(batches[0]))
        )
        if self.mesh is not None:
            from simple_vae_rs_tpu.parallel.mesh import shard_batch

            return shard_batch(self.mesh, arrays, time_major=True)
        return tuple(jnp.asarray(a) for a in arrays)

    # ------------------------------------------------------- LR pre-training
    def pretrain_lr_branch(self, train_loader: Iterable[Batch], pre_epochs: int) -> None:
        """Stage-1: pre-train the LR autoencoder (encoder_y/decoder_y/gammay).

        Gives the ``--pre_epochs`` flag real semantics (the reference parses
        it but never reads it — SURVEY §2.2-4). Only the LR branch receives
        gradients (the loss touches nothing else); a throwaway optimizer is
        used so the main run starts with fresh Adam state. For the
        hierarchical ``SRVAE`` the LR view is computed from the HR batch.
        """
        if self.kind not in ("cond", "srvae") or pre_epochs <= 0 or self.state is None:
            return
        pre_tx = make_optimizer(self.cfg)
        pre_opt = pre_tx.init(self.state.params)
        srvae = self.kind == "srvae"

        def lr_method(m, y, r, train):
            if srvae:
                return m.core.lr_autoencode(y, r, train)
            return m.lr_autoencode(y, r, train)

        @jax.jit
        def pre_step(state: TrainState, opt_state, batch, lr):
            rng = jax.random.fold_in(state.rng, state.step)
            if srvae:
                from simple_vae_rs_tpu.models.srvae import box_downsample_2x

                y_in = box_downsample_2x(batch[-1])
            else:
                y_in = batch[0]

            def loss_fn(params):
                variables = {"params": params}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"] if state.batch_stats else False
                out = self.model.apply(
                    variables, y_in, rng, True, method=lr_method, mutable=mutable
                )
                (y_hat, mu_u, lv_u), aux = out if mutable else (out, {})
                gkey = "core" if srvae else None
                gammay = params[gkey]["gammay"] if gkey else params["gammay"]
                with self._elbo_scope(True):
                    mse_y, kld_u = L.fused_base_loss(
                        y_hat, y_in, mu_u, lv_u, gammay, mesh=self.mesh
                    )
                return mse_y + kld_u, aux.get("batch_stats", state.batch_stats)

            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            updates, new_opt = pre_tx.update(grads, opt_state, state.params)
            new_params = jax.tree.map(lambda p, u: p - lr * u, state.params, updates)
            new_state = state.replace(
                params=new_params, batch_stats=new_stats, step=state.step + 1
            )
            return new_state, new_opt, loss

        lr = jnp.float32(self.cfg.learning_rate)
        for epoch in range(1, pre_epochs + 1):
            last = None
            n = 0
            for batch in train_loader:
                self.state, pre_opt, last = pre_step(
                    self.state, pre_opt, self._device_batch(batch), lr
                )
                n += 1
            loss = float(jax.device_get(last)) if n else float("nan")
            self.logger.log({"Loss/pretrain_y_loss": loss}, step=epoch)
            print(f"Pre-epoch {epoch}/{pre_epochs}, LR-branch loss: {loss:.4f}")

    # ------------------------------------------------------------------- fit
    def fit(
        self,
        train_loader: Iterable[Batch],
        val_loader: Iterable[Batch],
        epochs: Optional[int] = None,
        start_epoch: int = 1,
        val_metrics_every: Optional[int] = None,
        state: Optional[TrainState] = None,
    ) -> TrainState:
        cfg = self.cfg
        epochs = epochs or cfg.epochs
        val_metrics_every = (
            val_metrics_every if val_metrics_every is not None else cfg.val_metrics_every
        )
        if state is not None:
            self.state = state
        if self.state is None:
            self.state = self.init_state(next(iter(train_loader)))

        if self.kind in ("cond", "srvae") and self.baseline_metrics is None:
            self.baseline_metrics = self.compute_bicubic_baseline(val_loader)

        prefix = ("Loss/", "Loss/val_")

        # finish() on every exit path (early stop, callback stop, exception) —
        # the reference leaves its wandb run open on non-completion paths.
        # Preemption safety: on SIGTERM (how preemptible TPU pods and most
        # schedulers ask a job to leave) finish the current epoch, write a
        # resumable checkpoint, and return cleanly instead of dying
        # mid-epoch with only the last best-only save on disk.
        import signal

        self._preempted = False
        old_handler = None

        def _on_term(signum, frame):
            self._preempted = True
            print("SIGTERM: will checkpoint and stop at the end of this epoch")

        try:
            old_handler = signal.signal(signal.SIGTERM, _on_term)
        except ValueError:
            pass  # not the main thread (embedded use): feature unavailable
        try:
            return self._fit_epochs(
                train_loader, val_loader, epochs, start_epoch,
                val_metrics_every, prefix,
            )
        finally:
            if old_handler is not None:
                signal.signal(signal.SIGTERM, old_handler)
            # flush any in-flight async checkpoint saves before returning —
            # callers (e.g. --test right after fit) may load the best
            # checkpoint immediately, and a writer error must surface.
            # When fit is ALREADY unwinding with an exception (NaN abort,
            # early-stop error), a deferred writer error must not replace
            # it as the propagating exception — report it and let the
            # original through.
            import sys as _sys

            from simple_vae_rs_tpu.train.checkpoint import wait_for_saves

            in_flight = _sys.exc_info()[1]
            try:
                try:
                    wait_for_saves()
                except Exception as ckpt_err:
                    if in_flight is None:
                        raise
                    print(f"checkpoint writer error (suppressed by the "
                          f"original failure): {ckpt_err!r}")
            finally:
                self.logger.finish()

    def _resolve_scan_steps(self) -> int:
        """Fused steps per dispatch for this epoch: an explicit
        ``cfg.scan_steps >= 1`` wins; 0 (auto) rides the probe's decision
        once made, unfused until then."""
        cfg_k = int(getattr(self.cfg, "scan_steps", 1) or 0)
        if cfg_k >= 1:
            return cfg_k
        return self._auto_scan_k or 1

    def _maybe_autotune_scan(self, train_time: float, n_steps: int) -> None:
        """Auto-engage dispatch fusion on dispatch-bound links.

        With ``cfg.scan_steps=0``, after the FIRST trained epoch (its
        per-step wall time is the real thing, compile noise and all the
        loop's overheads included), probe the warm per-dispatch round
        trip and fuse k=2 steps per dispatch for the remaining epochs
        when the latency rivals the step time
        (``utils.health.choose_scan_steps``). The measured case: a
        degraded tunnel collapsed unfused throughput to 7,592 p/s while
        k=2 held 10,540 in the same session; healthy, fusion costs
        0.994x (BASELINE.md scan-steps revision). Decided once per fit.
        """
        if (
            int(getattr(self.cfg, "scan_steps", 1) or 0) >= 1
            or self._auto_scan_k is not None
            or n_steps <= 0
        ):
            return
        from simple_vae_rs_tpu.utils import health

        latency = health.dispatch_latency()
        per_step = train_time / n_steps
        k = health.choose_scan_steps(per_step, latency)
        if jax.process_count() > 1:
            # every process must run the SAME jitted program (fused k=2 vs
            # unfused have different collective sequences): processes near
            # the threshold can measure different times, so process 0's
            # decision is broadcast and wins everywhere.
            from jax.experimental import multihost_utils

            k = int(multihost_utils.broadcast_one_to_all(np.int32(k)))
        self._auto_scan_k = k
        if self._auto_scan_k > 1:
            print(
                f"dispatch-bound link detected ({latency * 1e3:.1f} ms "
                f"round trip vs {per_step * 1e3:.1f} ms/step) — fusing "
                f"scan_steps={self._auto_scan_k} optimizer steps per "
                "dispatch for the remaining epochs"
            )

    def _fit_epochs(
        self, train_loader, val_loader, epochs, start_epoch,
        val_metrics_every, prefix,
    ) -> TrainState:
        for epoch in range(start_epoch, epochs + 1):
            self.current_epoch = epoch
            stop = False
            for cb in self.callbacks:
                if cb.on_epoch_begin(epoch=epoch, model=self.model, trainer=self):
                    print(
                        f"Stopping training before epoch {epoch} due to "
                        f"{cb.__class__.__name__} condition."
                    )
                    return self.state

            # ---------------------------------------------------- train loop
            # Profile the second trained epoch (first is compile-noisy) —
            # or the only/last one when the run is too short to have a
            # second (a 1-epoch run with --profile_dir still gets a trace).
            profiling = bool(self.cfg.profile_dir) and epoch == min(
                start_epoch + 1, epochs
            )
            if profiling:
                jax.profiler.start_trace(self.cfg.profile_dir)
            t0 = time.perf_counter()
            sums: Dict[str, Array] = {}
            n_train = 0
            lr = jnp.float32(self.scheduler.lr)
            k = self._resolve_scan_steps()
            pending: list = []

            def _accumulate(terms, steps):
                nonlocal sums, n_train
                sums = terms if not sums else _tree_add(sums, terms)
                n_train += steps

            def _flush_pending():
                # ragged tails (or a flush forced by a shape change) run
                # as single dispatched steps — same math, just unfused
                nonlocal pending
                for b in pending:
                    st, terms = self._train_step(
                        self.state, self._device_batch(b), lr
                    )
                    self.state = st
                    _accumulate(terms, 1)
                pending = []

            for batch in train_loader:
                if k == 1:
                    self.state, terms = self._train_step(
                        self.state, self._device_batch(batch), lr
                    )
                    _accumulate(terms, 1)
                    continue
                # fused dispatch needs same-shape batches to stack
                if pending and any(
                    np.shape(a) != np.shape(b)
                    for a, b in zip(batch, pending[0])
                ):
                    _flush_pending()
                pending.append(batch)
                if len(pending) == k:
                    self.state, terms = self._train_multi_step(
                        self.state, self._device_batch_stack(pending), lr
                    )
                    _accumulate(terms, k)
                    pending = []
            _flush_pending()
            train_terms = {
                prefix[0] + k: float(v) / n_train
                for k, v in jax.device_get(sums).items()
            }
            train_loss = train_terms[prefix[0] + "loss"]
            train_time = time.perf_counter() - t0
            if profiling:
                jax.profiler.stop_trace()
            self._maybe_autotune_scan(train_time, n_train)
            self.logger.log(
                {**train_terms, "Perf/train_epoch_seconds": train_time}, step=epoch
            )

            if isnan(train_loss):
                raise ValueError(
                    f"NaN detected in training loss at epoch {epoch}. "
                    "Check your model and data."
                )
            self._on_train_epoch_end(epoch)

            # ------------------------------------------------------ val loop
            vsums: Dict[str, Array] = {}
            n_val = 0
            for batch in val_loader:
                terms = self._val_step(self.state, self._device_batch(batch))
                vsums = terms if not vsums else _tree_add(vsums, terms)
                n_val += 1
            val_terms = {
                prefix[1] + k: float(v) / n_val
                for k, v in jax.device_get(vsums).items()
            }
            val_loss = val_terms[prefix[1] + "loss"]

            full_val = epoch % val_metrics_every == 0 or epoch in (1, epochs)
            self.evaluate(val_loader, epoch, full_val=full_val)

            self.scheduler.step(val_loss)
            self.logger.log(val_terms, step=epoch)

            for cb in self.callbacks:
                if cb.on_epoch_end(
                    epoch=epoch,
                    model=self.model,
                    trainer=self,
                    state=self.state,
                    logs=val_terms,
                    extra={
                        "scheduler": self.scheduler.state_dict(),
                        "model": self._model_meta(),
                    },
                ):
                    print(
                        f"Stopping training after epoch {epoch} due to "
                        f"{cb.__class__.__name__} condition."
                    )
                    stop = True
                    break
            if stop:
                return self.state

            print(
                f"Epoch {epoch}/{epochs}, Train Loss: {train_loss:.4f}, "
                f"Val Loss: {val_loss:.4f}"
            )
            if getattr(self, "_preempted", False):
                self._save_preempt(epoch)
                return self.state

        return self.state

    def _save_preempt(self, epoch: int) -> None:
        """Resumable checkpoint on preemption: CURRENT state (not best) to
        ``<save_path>/<job_id>_preempt`` next to the ModelCheckpoint target
        (or ``ckpt/<job_id>_preempt`` when no checkpoint callback is
        wired), written blocking so the process can exit right after."""
        import os

        from simple_vae_rs_tpu.train.callbacks import ModelCheckpoint
        from simple_vae_rs_tpu.train.checkpoint import save_checkpoint

        base = None
        for cb in self.callbacks:
            if isinstance(cb, ModelCheckpoint):
                base = f"{cb.save_path}/{cb.job_id}"
                break
        if base is None:
            os.makedirs("ckpt", exist_ok=True)
            base = f"ckpt/{self.job_id}"
        path = f"{base}_preempt"
        save_checkpoint(path, self.state, epoch=epoch, extra={
            "scheduler": self.scheduler.state_dict(),
            "model": self._model_meta(),
        }, block=True)
        print(f"preemption checkpoint written: {path} (epoch {epoch}); "
              f"resume with --model_ckpt {path}")

    # ------------------------------------------------------- eval + logging
    def evaluate(self, val_loader, epoch: int, full_val: bool = False) -> None:
        """Full-val metrics + LPIPS + image panel in ONE val-loader pass.

        The reference iterates its val set separately for metrics, LPIPS
        and images; on a disk-backed split each pass re-reads and
        re-decodes every tile, so everything here comes from a single
        iteration: per-batch metric sums, LPIPS accumulated from the same
        ``_eval_images_step`` outputs, and the first batch's images kept
        for the panel.
        """
        image_cadence = 10 if self.kind == "cond" else 5
        want_images = epoch % image_cadence == 0 or epoch == 1
        if not full_val:
            if want_images:
                first = next(iter(val_loader))
                images = self._eval_images_step(
                    self.state, self._device_batch(first)
                )
                self.logger.log_images(self._host_fetch(images), step=epoch)
            return

        want_lpips = self._want_lpips()
        sums: Dict[str, Array] = {}
        lp_sums: Dict[str, float] = {}
        lp_counts: Dict[str, int] = {}
        first_images = None
        for batch in val_loader:
            b = self._device_batch(batch)
            part = self._eval_metrics_step(self.state, b)
            sums = part if not sums else _tree_add(sums, part)
            if want_lpips or (want_images and first_images is None):
                images = self._eval_images_step(self.state, b)
                if first_images is None:
                    first_images = images
                if want_lpips:
                    self._acc_lpips(lp_sums, lp_counts,
                                    self._host_fetch(images))
        if not sums:  # empty loader: no metrics to log
            return
        out = jax.device_get(sums)
        n = max(float(out.pop("count")), 1.0)
        if self.kind in ("vae", "srvae"):
            metrics = {
                "Metrics/SSIM": out["ssim"] / n,
                "Metrics/PSNR": out["psnr"] / n,
            }
        else:
            metrics = {
                "Metrics/SSIM_LR": out["ssim_y"] / n,
                "Metrics/SSIM_HR": out["ssim_x"] / n,
                "Metrics/SSIM_SR": out["ssim_sr"] / n,
                "Metrics/PSNR_SR": out["psnr_sr"] / n,
            }
            if self.baseline_metrics:
                metrics["Metrics/SSIM_Baseline"] = self.baseline_metrics[
                    "ssim_base"
                ]
                metrics["Metrics/PSNR_Baseline"] = self.baseline_metrics[
                    "psnr_base"
                ]
                if "lpips_base" in self.baseline_metrics:
                    # reference cond_vae.py:473
                    metrics["Metrics/LPIPS_Baseline"] = self.baseline_metrics[
                        "lpips_base"
                    ]
        metrics.update(
            {k: lp_sums[k] / lp_counts[k] for k in lp_sums if lp_counts[k]}
        )
        self.logger.log(metrics, step=epoch)
        if want_images and first_images is not None:
            self.logger.log_images(self._host_fetch(first_images), step=epoch)

    def _acc_lpips(
        self, sums: Dict[str, float], counts: Dict[str, int], imgs: Dict[str, Any]
    ) -> None:
        """Accumulate host-side LPIPS from one batch's eval images; the
        reference's LPIPS-alex on BGR channels (``models/base.py:37``).
        Computed on the first 4 images of each val batch (host-transfer
        cost cap; the reference pays a full per-image device->host round
        trip). SSIM/PSNR remain the on-device spine."""
        from simple_vae_rs_tpu.utils.lpips_optional import lpips_batch

        def acc(key, a, b):
            vals = lpips_batch(a, b)
            if vals is None:  # e.g. inputs below AlexNet's 11px footprint
                return
            sums[key] = sums.get(key, 0.0) + float(np.sum(vals))
            counts[key] = counts.get(key, 0) + len(vals)

        if self.kind in ("vae", "srvae"):  # their eval images are
            acc("Metrics/LPIPS",           # input/reconstruction pairs
                imgs["Images/Input"], imgs["Images/Reconstruction"])
            return
        y, x = imgs["Images/LR_Input"], imgs["Images/HR_Input"]
        acc("Metrics/LPIPS_LR", y, imgs["Images/LR_Recon"])
        acc("Metrics/LPIPS_HR", x, imgs["Images/HR_Recon"])
        acc("Metrics/LPIPS_SR", x, imgs["Images/SR_Output"])

    def _on_train_epoch_end(self, epoch: int) -> None:
        params = self.state.params
        if self.kind == "vae":
            logs = {"HyperParameters/Gamma": float(params["gamma"])}
        elif self.kind == "srvae":
            logs = {
                "HyperParameters/Gamma_X": float(params["core"]["gammax"]),
                "HyperParameters/Gamma_Y": float(params["core"]["gammay"]),
            }
        else:
            logs = {
                "HyperParameters/Gamma_X": float(params["gammax"]),
                "HyperParameters/Gamma_Y": float(params["gammay"]),
            }
        logs["HyperParameters/Learning Rate"] = self.scheduler.get_last_lr()[0]
        self.logger.log(logs, step=epoch)
