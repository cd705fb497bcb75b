"""Serving API: load a checkpoint, super-resolve batches, quantify uncertainty.

The production entry point the reference lacks: its inference story is a
one-off script path inside training (``train.py --test``). Here a
``SuperResolver`` holds the variables on device and exposes compiled
endpoints that persist across calls (the flax module rides as a static jit
argument, so each (shape, batch) compiles once and then serves at device
speed — the 1000-draw uncertainty task runs in 0.083 s on a v5e,
BASELINE.md).

    sr = SuperResolver.from_checkpoint("ckpt/job", cr=1.2, patch_size=64)
    x_hat = sr.super_resolve(lr_batch)            # (B, ps, ps, C) in [0,1]
    maps = sr.uncertainty(lr_image, samples=32)   # mean/std/variance maps
    big = sr.super_resolve_tile(lr_raster)        # (H, W, C) -> (2H, 2W, C)

Serving-scale options the reference has no analogue for:

- ``int8_weights=True`` — weights-only int8 (the PREFERRED quantized live
  mode, DEPLOY.md): the big conv kernels are round-to-nearest quantized at
  load (per-output-channel scales, ``export.py``'s artifact formulation)
  and dequantized by plain graph ops inside each compiled request —
  quarter-size weight residency at **98.3 dB** vs f32. The round-5 paired
  v5e windows found live-arm THROUGHPUT rankings unresolvable through the
  tunneled relay (BASELINE.md round-5 re-measurement), so its case is
  quality + memory; re-rank locally on a quiet link.
- ``int8=True`` — live W8A8 Pallas decoder (opt-in; 86.1 dB vs f32, and
  no demonstrated end-to-end win at the B250 serving shape despite
  1.2-1.7x per-kernel gains — BASELINE.md int8 story): decoder conv
  weights are stochastic-round quantized once at load
  (``ops/quantize.py``) and the blocks dispatch the fused int8 Pallas
  kernels (``ops/pallas_int8.py``).
- ``mesh=make_mesh(...)`` — multi-chip serving: request batches shard over
  the mesh's batch axes and ``uncertainty``'s posterior draws decode
  data-parallel (N-draw UQ scales linearly in chips).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from simple_vae_rs_tpu.config import CondSRVAEConfig, TrainConfig
from simple_vae_rs_tpu.models import CondSRVAE, SRVAE
from simple_vae_rs_tpu.tasks import auto_chunk, sample_chunked
from simple_vae_rs_tpu.tiling import TileEndpoints
from simple_vae_rs_tpu.utils.image import normalize_image

Array = jnp.ndarray


# Weights-only int8 pack/unpack live in ops/quantize.py (shared with the
# chunked-draw decoder in tasks.py): dequantization stays *inside* the
# compiled graph (plain convert+multiply, no Pallas), so the weight-bound
# decode reads quarter-size tensors from HBM every call at 98.3 dB vs f32
# (BASELINE.md round-5 paired window; live-arm throughput rankings are
# relay-noise-bound on this box, so the claim is quality + memory).
from simple_vae_rs_tpu.ops.quantize import (  # noqa: E402
    pack_int8_weights as _pack_int8_weights,
    unpack_weights as _unpack_weights,
)


def _mesh_batch_axes(mesh) -> Optional[tuple]:
    """Batch axes of a mesh that actually spans more than one device."""
    if mesh is None:
        return None
    from simple_vae_rs_tpu.parallel.mesh import batch_axes

    axes = batch_axes(mesh)
    n = 1
    for a in axes:
        n *= int(mesh.shape[a])
    return axes if n > 1 else None


# One fused jit per request: normalize + noise draw + conditional
# generation. The RNG key lives on device and is threaded through the
# call, so a serving request is exactly one dispatch (round-trip latency
# dominates on remote links; three chained dispatches measured ~3x slower
# end to end).
#
# On a meshed resolver the generation runs under ``jax.shard_map`` over
# the mesh's batch axes: every chip runs the full fused-kernel pipeline
# (Pallas conv tails, int8 W8A8 decode) on its local batch slice — GSPMD
# never has to partition a Pallas custom call, so the fused kernels
# survive multi-chip serving. The reparameterization noise is drawn
# GLOBALLY (shapes via ``jax.eval_shape`` on the model's noise probe) and
# each shard consumes its slice, so meshed and single-chip resolvers with
# the same seed produce identical outputs.
@partial(jax.jit, static_argnames=("model", "normalize", "mesh", "pack_spec"))
def _sr_call(model, variables, y, key, normalize, mesh=None, pack_spec=None):
    key, k_u, k_z = jax.random.split(key, 3)
    y = y.astype(jnp.float32)
    if normalize:
        y = normalize_image(y)
    shapes = jax.eval_shape(
        lambda v, yy: model.apply(
            _unpack_weights(v, pack_spec), yy,
            method=type(model).generation_noise_shapes
        ),
        variables, y,
    )
    eps_u = jax.random.normal(k_u, shapes[0].shape, jnp.float32)
    eps_z = jax.random.normal(k_z, shapes[1].shape, jnp.float32)

    def gen(v, yy, eu, ez):
        # int8-weights mode dequantizes HERE, inside the generation (and
        # inside _sr_moments_call's scan body): the weights cross HBM as
        # int8 and widen in-core — the artifact arm's formulation.
        return model.apply(
            _unpack_weights(v, pack_spec), yy, eu, ez,
            method=type(model).conditional_generation_eps
        )

    axes = _mesh_batch_axes(mesh)
    if axes:
        from jax.sharding import PartitionSpec as P

        out = jax.shard_map(
            gen,
            mesh=mesh,
            in_specs=(P(), P(axes), P(axes), P(axes)),
            out_specs=P(axes),
            check_vma=False,
        )(variables, y, eps_u, eps_z)
    else:
        out = gen(variables, y, eps_u, eps_z)
    return key, out


# Whole-raster UQ runs `samples` posterior draws for EVERY tile window. The
# naive loop fetches each draw to the host and accumulates moments there —
# `samples`x more device->host bytes than the answer needs (the measured
# bottleneck of `uncertainty_tile`: BASELINE.md puts the decode at ~59k
# window-draws/s but the relayed endpoint at ~200). This kernel reduces the
# draws to per-pixel (sum, sum-of-squares) ON DEVICE — one `lax.scan` over k
# fresh-eps generations per window batch — so a window's UQ crosses the link
# as exactly two moment maps regardless of sample count. On a meshed
# resolver each scan step runs the generation under `jax.shard_map` with
# globally-drawn eps, same as `_sr_call`, so the fused Pallas / int8 kernels
# execute per shard and meshed == single-chip for the same key.
@partial(jax.jit, static_argnames=("model", "k", "normalize", "mesh", "pack_spec"))
def _sr_moments_call(model, variables, y, key, k, normalize, mesh=None,
                     pack_spec=None):
    y = y.astype(jnp.float32)
    if normalize:
        y = normalize_image(y)
    shapes = jax.eval_shape(
        lambda v, yy: model.apply(
            _unpack_weights(v, pack_spec), yy,
            method=type(model).generation_noise_shapes
        ),
        variables, y,
    )

    def gen(v, yy, eu, ez):
        return model.apply(
            _unpack_weights(v, pack_spec), yy, eu, ez,
            method=type(model).conditional_generation_eps
        )

    axes = _mesh_batch_axes(mesh)
    if axes:
        from jax.sharding import PartitionSpec as P

        gen_call = jax.shard_map(
            gen,
            mesh=mesh,
            in_specs=(P(), P(axes), P(axes), P(axes)),
            out_specs=P(axes),
            check_vma=False,
        )
    else:
        gen_call = gen

    def body(carry, key_i):
        s1, s2 = carry
        k_u, k_z = jax.random.split(key_i)
        eps_u = jax.random.normal(k_u, shapes[0].shape, jnp.float32)
        eps_z = jax.random.normal(k_z, shapes[1].shape, jnp.float32)
        out = gen_call(variables, y, eps_u, eps_z)
        return (s1 + out, s2 + out * out), None

    zero = jnp.zeros(
        (y.shape[0], y.shape[1] * 2, y.shape[2] * 2, y.shape[3]),
        jnp.float32,
    )
    (s1, s2), _ = jax.lax.scan(body, (zero, zero), jax.random.split(key, k))
    return s1, s2


class SuperResolver(TileEndpoints):
    """Compiled 2x super-resolution + uncertainty service for one model."""

    def __init__(
        self,
        model: Any,
        variables: Dict[str, Any],
        seed: int = 0,
        normalize: bool = True,
        int8: bool = False,
        int8_weights: bool = False,
        mesh: Optional[Any] = None,
    ) -> None:
        if not isinstance(model, (CondSRVAE, SRVAE)):
            raise TypeError("SuperResolver serves CondSRVAE/SRVAE models")
        if int8 and int8_weights:
            raise ValueError(
                "int8 (live W8A8 Pallas) and int8_weights (weights-only, "
                "dequantized in-graph) are different quantization modes — "
                "pick one (DEPLOY.md recommends int8_weights)"
            )
        self.model = model
        self.variables = variables
        self.normalize = normalize
        self.int8 = int8
        self.int8_weights = int8_weights
        # Multi-device serving: params replicate over the mesh; request
        # batches shard over the batch axes and posterior draws shard over
        # the same axes in ``uncertainty`` (each chip decodes its slice of
        # the draws — the UQ task is embarrassingly parallel in N).
        self.mesh = mesh
        self._batch_sharding = None
        self._n_shards = 1
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from simple_vae_rs_tpu.parallel.mesh import batch_axes, replicate

            axes = batch_axes(mesh)
            self._batch_sharding = NamedSharding(mesh, P(axes))
            self._n_shards = int(np.prod([mesh.shape[a] for a in axes]))
            self.variables = replicate(mesh, variables)
        # Kernel routing is per-call: meshed resolvers run their compiled
        # endpoints under ``jax.shard_map`` (each chip executes the fused
        # Pallas / int8 kernels on its local slice — see ``_sr_call`` and
        # ``tasks.sample_chunked``), single-chip resolvers run them
        # directly. Meshed and single-chip resolvers coexist in one
        # process with the correct kernels each.
        if int8:
            # W8A8 decoder serving (beyond-parity; the v5e MXU runs int8 at
            # 2x bf16). Decoder conv weights are stochastic-round quantized
            # ONCE here; the conv blocks route through the fused int8
            # kernels wherever their scope carries quant variables — the
            # collection's presence is the only switch, so f32 resolvers
            # in the same process are untouched.
            from simple_vae_rs_tpu.ops import quantize as qz

            if "quant" not in self.variables:
                self.variables = dict(self.variables)
                self.variables["quant"] = qz.quantize_params_tree(
                    self.variables["params"], jax.random.PRNGKey(seed)
                )
        # Weights-only int8 (the artifact arms' formulation, 98.3 dB vs
        # f32): big kernels quantized ONCE at load,
        # dequantized by plain graph ops inside super_resolve /
        # super_resolve_moments (and every tile/stream/HTTP path riding
        # them) AND the chunked-draw pipeline behind ``uncertainty``/
        # ``mmse_estimate`` (pack_spec threads into tasks.sample_chunked).
        self._pack_spec = None
        self._payload = None
        if int8_weights:
            host_vars = jax.device_get(self.variables)
            payload, self._pack_spec = _pack_int8_weights(host_vars)
            if mesh is not None:
                from simple_vae_rs_tpu.parallel.mesh import replicate

                payload = replicate(mesh, payload)
            self._payload = payload
        self._rng = jax.random.PRNGKey(seed)
        self._calls = 0

    # ------------------------------------------------------------ factory
    @classmethod
    def from_checkpoint(
        cls,
        path: str,
        cr: Optional[float] = None,
        patch_size: Optional[int] = None,
        channels: Optional[int] = None,
        latent_size: Optional[int] = None,
        model_type: Optional[str] = None,
        dtype: Optional[Any] = None,
        seed: int = 0,
        pallas_conv: bool = True,
        int8: bool = False,
        int8_weights: bool = False,
        mesh: Optional[Any] = None,
    ) -> "SuperResolver":
        """Rebuild the model around a checkpoint and serve it.

        Model-config arguments left ``None`` resolve from the config the
        trainer embedded in the checkpoint's sidecar meta (so a path alone
        is enough for checkpoints written after that was added), then from
        the legacy defaults (cr=1.2, ps=64, 4 bands, Cond_SRVAE). An
        explicit argument always wins; a conflict with the recorded config
        prints a warning because the weight restore will almost certainly
        fail on shapes.
        """
        from simple_vae_rs_tpu.train.checkpoint import load_checkpoint, read_meta
        from simple_vae_rs_tpu.train.state import create_train_state, make_optimizer
        from simple_vae_rs_tpu.utils.cache import enable_compilation_cache

        recorded = read_meta(path).get("model", {})

        def pick(explicit, key, legacy):
            saved = recorded.get(key)
            if explicit is None:
                return legacy if saved is None else saved
            if saved is not None and saved != explicit:
                print(f"warning: {key}={explicit} overrides the "
                      f"checkpoint's recorded {key}={saved}")
            return explicit

        cr = float(pick(cr, "cr", 1.2))
        patch_size = int(pick(patch_size, "patch_size", 64))
        channels = int(pick(channels, "channels", 4))
        latent_size = int(pick(latent_size, "latent_size_override", 0))
        model_type = pick(model_type, "type", "Cond_SRVAE")
        # converted reference checkpoints carry the C-major latent wiring;
        # serving must rebuild the identical graph (params load either way
        # — only the generation wiring would silently differ)
        torch_regroup = bool(recorded.get("torch_regroup", False))

        enable_compilation_cache()
        if pallas_conv:
            # serving default ON: the adaptive per-shape thresholds route
            # only measured-winning shapes to the fused kernels — notably
            # the deep-channel up1.convT at 3.15x over XLA at the serving
            # chunk (ops/pallas_conv.wins_over_xla_T) — and everything
            # else stays on XLA. Process-wide switch, set before any
            # graph traces.
            from simple_vae_rs_tpu.ops import pallas_conv as pc

            pc.enable(True)
        cfg = CondSRVAEConfig(cr=cr, patch_size=patch_size, channels=channels,
                              latent_size_override=latent_size,
                              torch_regroup=torch_regroup)
        cls_map = {"Cond_SRVAE": CondSRVAE, "SRVAE": SRVAE}
        if model_type not in cls_map:
            raise ValueError(
                f"SuperResolver serves Cond_SRVAE/SRVAE checkpoints, not "
                f"{model_type!r} (recorded in {path}.meta.json)"
            )
        cls_ = cls_map[model_type]
        model = cls_(cfg, dtype=dtype)
        x = jnp.zeros((1, patch_size, patch_size, channels))
        y = jnp.zeros((1, patch_size // 2, patch_size // 2, channels))
        rng = jax.random.PRNGKey(1)
        if model_type == "Cond_SRVAE":
            variables = jax.jit(
                lambda r: model.init({"params": r}, x, y, rng, train=False)
            )(jax.random.PRNGKey(0))
        else:
            variables = jax.jit(
                lambda r: model.init({"params": r}, x, rng, train=False)
            )(jax.random.PRNGKey(0))
        state = create_train_state(variables, make_optimizer(TrainConfig()),
                                   jax.random.PRNGKey(0))
        state, _ = load_checkpoint(path, state)
        vars_ = {"params": state.params}
        if state.batch_stats:
            vars_["batch_stats"] = state.batch_stats
        return cls(model, vars_, seed=seed, int8=int8,
                   int8_weights=int8_weights, mesh=mesh)

    # ---------------------------------------------------------- endpoints
    def _call_vars(self):
        """(variables, pack_spec) for the compiled SR endpoints: the int8
        payload + static spec in weights-only mode, the plain tree else."""
        if self._pack_spec is not None:
            return self._payload, self._pack_spec
        return self.variables, None

    def _next_rng(self) -> jax.Array:
        self._calls += 1
        return jax.random.fold_in(self._rng, self._calls)

    # Per-request reproducibility: every endpoint takes ``seed=None``.
    # Unseeded calls thread the resolver's rolling RNG state (fresh draws
    # each call); ``seed=N`` derives the request's key purely from N, so
    # the same input + seed + options reproduces the output bitwise on
    # repeat calls, across processes, and (for seeded *_tile/stream
    # requests, via ``tiling.subseed``) whether the windowing runs in this
    # process or on a remote client — given the same resolver graph
    # (model/config/int8 mode; meshed == single-chip already holds because
    # eps is drawn globally). Seeded calls do NOT advance the rolling
    # state, so they never perturb concurrent unseeded traffic.

    def _prep(self, y) -> Array:
        y = jnp.asarray(y)
        if y.ndim == 3:
            y = y[None]
        if self.normalize:
            y = normalize_image(y.astype(jnp.float32))
        return y

    def super_resolve(self, y, normalize: Optional[bool] = None,
                      seed: Optional[int] = None) -> Array:
        """LR batch (B, ps/2, ps/2, C) -> single-draw SR (B, ps, ps, C).

        On a meshed resolver the batch is padded to the shard count and
        sharded over the batch axes; XLA partitions the whole compiled
        request behind the input sharding. ``normalize`` overrides the
        resolver default for this call (the tile path normalizes once over
        the whole raster and sends pre-normalized windows). ``seed`` pins
        this request's posterior draw (see the class note above) without
        advancing the rolling RNG.
        """
        y = jnp.asarray(y)
        if y.ndim == 3:
            y = y[None]
        b = y.shape[0]
        pad = (-b) % self._n_shards
        if self._batch_sharding is not None:
            if pad:
                y = jnp.pad(
                    y, ((0, pad),) + ((0, 0),) * (y.ndim - 1), mode="edge"
                )
            y = jax.device_put(y, self._batch_sharding)
        key = self._rng if seed is None else jax.random.PRNGKey(int(seed))
        call_vars, pack_spec = self._call_vars()
        new_rng, out = _sr_call(
            self.model, call_vars, y, key,
            self.normalize if normalize is None else normalize,
            mesh=self.mesh, pack_spec=pack_spec,
        )
        if seed is None:
            self._rng = new_rng
        return out[:b] if (self._batch_sharding is not None and pad) else out

    def super_resolve_moments(
        self, y, samples: int, normalize: bool = False,
        seed: Optional[int] = None,
    ) -> tuple:
        """Per-row SR draw-moment sums: (B, ps/2, ps/2, C) LR windows ->
        ``(s1, s2)`` of shape (B, ps, ps, C), the per-pixel sum and
        sum-of-squares over ``samples`` fresh posterior draws, reduced on
        device (``_sr_moments_call``). The ``TileEndpoints`` mixin uses
        this hook for whole-raster UQ so only two moment maps per window
        cross the device->host link instead of every draw; divide by
        ``samples`` for the mean/second-moment the tile blender wants.
        Normalization defaults OFF because the tile path sends
        pre-normalized windows.
        """
        if samples < 1:
            raise ValueError(f"samples must be >= 1 (got {samples})")
        y = jnp.asarray(y)
        if y.ndim == 3:
            y = y[None]
        b = y.shape[0]
        pad = (-b) % self._n_shards
        if self._batch_sharding is not None:
            if pad:
                y = jnp.pad(
                    y, ((0, pad),) + ((0, 0),) * (y.ndim - 1), mode="edge"
                )
            y = jax.device_put(y, self._batch_sharding)
        key = (self._next_rng() if seed is None
               else jax.random.PRNGKey(int(seed)))
        call_vars, pack_spec = self._call_vars()
        s1, s2 = _sr_moments_call(
            self.model, call_vars, y, key, int(samples),
            bool(normalize), mesh=self.mesh, pack_spec=pack_spec,
        )
        if self._batch_sharding is not None and pad:
            s1, s2 = s1[:b], s2[:b]
        return s1, s2

    # Whole-raster endpoints (super_resolve_tile / uncertainty_tile /
    # iter_tile_rows) come from the shared TileEndpoints mixin
    # (simple_vae_rs_tpu/tiling.py) over this class's compiled
    # ``super_resolve`` — the same windowing/stitching the HTTP
    # client's RemoteResolver runs against a model server.
    @property
    def window(self) -> int:
        """LR window size: one model patch in LR space."""
        return int(self.model.config.patch_size) // 2

    def uncertainty(self, y, samples: int = 32,
                    chunk: Optional[int] = None,
                    seed: Optional[int] = None) -> Dict[str, Array]:
        """Posterior SR statistics for one LR image: mean/std/variance maps.

        ``chunk=None`` sizes decode chunks by HBM budget (``tasks.auto_chunk``
        — one dispatch for typical requests). On a meshed resolver the draws
        shard over the batch axes (chunk is rounded up to the shard count) —
        N-draw UQ scales linearly in chips. ``seed`` pins the draw set;
        the chunk layout feeds the key schedule, so cross-machine
        reproduction also needs an explicit matching ``chunk`` (auto_chunk
        is pure in (samples, patch_size) but HBM budgets may differ).
        """
        y = self._prep(y)[:1]
        if chunk is None:
            chunk = auto_chunk(samples, int(y.shape[1]) * 2)
        chunk = -(-chunk // self._n_shards) * self._n_shards
        key = (self._next_rng() if seed is None
               else jax.random.PRNGKey(int(seed)))
        call_vars, pack_spec = self._call_vars()
        draws = sample_chunked(
            self.model, call_vars, y, key,
            samples=samples, chunk=chunk, sharding=self._batch_sharding,
            mesh=self.mesh, pack_spec=pack_spec,
        )
        return {
            "mean": jnp.mean(draws, axis=0),
            "std": jnp.std(draws, axis=0),
            "variance": jnp.var(draws, axis=0),
        }

    def mmse_estimate(self, y, samples: int = 32,
                      chunk: Optional[int] = None,
                      seed: Optional[int] = None) -> Array:
        """Posterior-mean SR reconstruction (minimum-MSE estimator)."""
        return self.uncertainty(y, samples=samples, chunk=chunk,
                                seed=seed)["mean"]


def warmup(
    resolver: SuperResolver, lr_shape=(1, 32, 32, 4),
    tile_batch: Optional[int] = 16, uq_samples: Optional[int] = 32,
) -> None:
    """Compile the serving endpoints ahead of traffic.

    ``tile_batch`` also pre-compiles the fixed window-batch shape the
    ``*_tile`` endpoints dispatch (their default ``batch=16``) — otherwise
    the first whole-raster request pays that compile (~13 s measured on
    the tunneled v5e). Pass ``None`` to skip it. ``uq_samples`` likewise
    pre-compiles the device-moments graph ``uncertainty_tile`` dispatches
    at its default draw count (the scan length is a static jit argument);
    ``None`` skips it.
    """
    y = np.zeros(lr_shape, np.float32)
    jax.block_until_ready(resolver.super_resolve(y))
    jax.block_until_ready(resolver.uncertainty(y, samples=2, chunk=2)["mean"])
    if tile_batch:
        wins = np.zeros((tile_batch, *lr_shape[1:]), np.float32)
        jax.block_until_ready(resolver.super_resolve(wins, normalize=False))
        if uq_samples:
            jax.block_until_ready(
                resolver.super_resolve_moments(wins, uq_samples)[0]
            )
