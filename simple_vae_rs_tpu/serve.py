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

Two serving-scale options the reference has no analogue for:

- ``int8=True`` — W8A8 decoder: decoder conv weights are stochastic-round
  quantized once at load (``ops/quantize.py``) and the blocks dispatch the
  fused int8 Pallas kernels (``ops/pallas_int8.py``; the v5e MXU runs int8
  at 2x the bf16 rate).
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
from simple_vae_rs_tpu.utils.image import normalize_image

Array = jnp.ndarray


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
@partial(jax.jit, static_argnames=("model", "normalize", "mesh"))
def _sr_call(model, variables, y, key, normalize, mesh=None):
    key, k_u, k_z = jax.random.split(key, 3)
    y = y.astype(jnp.float32)
    if normalize:
        y = normalize_image(y)
    shapes = jax.eval_shape(
        lambda v, yy: model.apply(
            v, yy, method=type(model).generation_noise_shapes
        ),
        variables, y,
    )
    eps_u = jax.random.normal(k_u, shapes[0].shape, jnp.float32)
    eps_z = jax.random.normal(k_z, shapes[1].shape, jnp.float32)

    def gen(v, yy, eu, ez):
        return model.apply(
            v, yy, eu, ez, method=type(model).conditional_generation_eps
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


class SuperResolver:
    """Compiled 2x super-resolution + uncertainty service for one model."""

    def __init__(
        self,
        model: Any,
        variables: Dict[str, Any],
        seed: int = 0,
        normalize: bool = True,
        int8: bool = False,
        mesh: Optional[Any] = None,
    ) -> None:
        if not isinstance(model, (CondSRVAE, SRVAE)):
            raise TypeError("SuperResolver serves CondSRVAE/SRVAE models")
        self.model = model
        self.variables = variables
        self.normalize = normalize
        self.int8 = int8
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
            # kernels wherever their scope carries quant variables. Models
            # without a ``quant`` collection are untouched even with the
            # process switch on.
            from simple_vae_rs_tpu.ops import quantize as qz

            qz.enable_int8(True)
            if "quant" not in self.variables:
                self.variables = dict(self.variables)
                self.variables["quant"] = qz.quantize_params_tree(
                    self.variables["params"], jax.random.PRNGKey(seed)
                )
        self._rng = jax.random.PRNGKey(seed)
        self._calls = 0

    # ------------------------------------------------------------ factory
    @classmethod
    def from_checkpoint(
        cls,
        path: str,
        cr: float,
        patch_size: int = 64,
        channels: int = 4,
        latent_size: int = 0,
        model_type: str = "Cond_SRVAE",
        dtype: Optional[Any] = None,
        seed: int = 0,
        pallas_conv: bool = True,
        int8: bool = False,
        mesh: Optional[Any] = None,
    ) -> "SuperResolver":
        from simple_vae_rs_tpu.train.checkpoint import load_checkpoint
        from simple_vae_rs_tpu.train.state import create_train_state, make_optimizer
        from simple_vae_rs_tpu.utils.cache import enable_compilation_cache

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
                              latent_size_override=latent_size)
        cls_ = {"Cond_SRVAE": CondSRVAE, "SRVAE": SRVAE}[model_type]
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
        return cls(model, vars_, seed=seed, int8=int8, mesh=mesh)

    # ---------------------------------------------------------- endpoints
    def _next_rng(self) -> jax.Array:
        self._calls += 1
        return jax.random.fold_in(self._rng, self._calls)

    def _prep(self, y) -> Array:
        y = jnp.asarray(y)
        if y.ndim == 3:
            y = y[None]
        if self.normalize:
            y = normalize_image(y.astype(jnp.float32))
        return y

    def super_resolve(self, y, normalize: Optional[bool] = None) -> Array:
        """LR batch (B, ps/2, ps/2, C) -> single-draw SR (B, ps, ps, C).

        On a meshed resolver the batch is padded to the shard count and
        sharded over the batch axes; XLA partitions the whole compiled
        request behind the input sharding. ``normalize`` overrides the
        resolver default for this call (the tile path normalizes once over
        the whole raster and sends pre-normalized windows).
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
        self._rng, out = _sr_call(
            self.model, self.variables, y, self._rng,
            self.normalize if normalize is None else normalize,
            mesh=self.mesh,
        )
        return out[:b] if (self._batch_sharding is not None and pad) else out

    def super_resolve_tile(
        self, y, overlap: Optional[int] = None, batch: int = 16,
        samples: int = 1,
    ) -> np.ndarray:
        """Arbitrary-size LR raster (H, W, C) -> seam-free SR (2H, 2W, C).

        The reference (and ``super_resolve``) only handles model-sized
        patches; this covers a whole tile: one normalization over the FULL
        raster (per-window min-max would shift brightness between
        windows), an overlapping window grid (``ops/tiling.grid_starts``;
        ``overlap=None`` -> min(4, window//2)), fixed-shape batches
        through the compiled endpoint (every chunk is padded to ``batch``
        so one compile serves any tile size), and a feathered blend of the
        SR windows — overlap doubles in SR space (``ops/tiling.stitch``).
        Rasters smaller than one window are reflect-padded up and cropped
        after. ``samples > 1`` averages that many posterior draws per
        window (an MMSE-flavored output whose extra smoothness also
        suppresses seam variance); (window, draw) pairs pack into the same
        fixed-shape batches, so extra draws cost dispatches proportional
        to ``samples / batch``, not ``samples``.
        """
        from simple_vae_rs_tpu.ops.tiling import stitch

        if samples < 1:
            raise ValueError(f"samples must be >= 1 (got {samples})")
        wins, starts, (h, w), (hp, wp), overlap = self._tile_windows(y, overlap)
        if samples == 1:
            sr_wins = self._tile_pass(wins, batch)
        else:
            sr_wins, _ = self._tile_draw_moments(wins, samples, batch)
        out = stitch(
            sr_wins, [(2 * a, 2 * b) for a, b in starts],
            (2 * hp, 2 * wp), 2 * overlap,
        )
        return out[:2 * h, :2 * w]

    def uncertainty_tile(
        self, y, samples: int = 32, overlap: Optional[int] = None,
        batch: int = 16,
    ) -> Dict[str, np.ndarray]:
        """Whole-raster posterior SR statistics: mean/std/variance maps.

        Same window grid as ``super_resolve_tile``; per-pixel first and
        second moments over ``samples`` draws are accumulated per window
        (packed batches — see ``_tile_draw_moments``), then each moment
        field is feather-stitched. The stitched variance
        ``blend(E[x^2]) - blend(E[x])^2`` is the variance of the blended
        posterior mixture: inside overlap bands it adds the between-window
        disagreement on top of the blended within-window variance (Jensen
        keeps it >= that blend, so it is never negative).
        """
        from simple_vae_rs_tpu.ops.tiling import stitch

        if samples < 2:
            raise ValueError(f"samples must be >= 2 (got {samples})")
        wins, starts, (h, w), (hp, wp), overlap = self._tile_windows(y, overlap)
        m1, m2 = self._tile_draw_moments(wins, samples, batch)
        starts_sr = [(2 * a, 2 * b) for a, b in starts]
        out_hw = (2 * hp, 2 * wp)
        mean = stitch(m1, starts_sr, out_hw, 2 * overlap)[:2 * h, :2 * w]
        e2 = stitch(m2, starts_sr, out_hw, 2 * overlap)[:2 * h, :2 * w]
        var = np.maximum(e2 - mean * mean, 0.0)
        return {"mean": mean, "std": np.sqrt(var), "variance": var}

    def iter_tile_rows(
        self,
        read_rows,
        height: int,
        width: int,
        overlap: Optional[int] = None,
        batch: int = 16,
        samples: int = 1,
        moments: bool = False,
    ):
        """Streaming counterpart of the ``*_tile`` endpoints: a generator of
        finalized SR row bands over an arbitrarily tall raster, bounded
        memory (one window-row of LR input + ~one SR window-height of
        accumulation, independent of ``height``).

        ``read_rows(r0, r1)`` must return LR rows ``[r0, r1)`` as
        ``(rows, width, C)`` float32 **already normalized** the way the
        model expects (the caller owns the global min-max pass — per-band
        normalization would shift brightness between bands, the same
        reason ``super_resolve_tile`` normalizes once over the full
        raster). Yields ``(sr_row0, block)`` in order, where ``block`` is
        ``(rows, 2*width, C)`` float32 — or, with ``moments=True``, a dict
        of ``mean`` / ``std`` / ``variance`` blocks (the streamed form of
        ``uncertainty_tile``, same blended-mixture statistics). The window
        grid, feather weights and weighted-mean blend are identical to the
        in-memory endpoints, so on rasters that fit in memory the
        concatenated blocks reproduce ``super_resolve_tile`` /
        ``uncertainty_tile`` exactly (modulo the RNG draw order).

        Rasters smaller than one model window in either dimension are not
        streamable (the in-memory endpoints reflect-pad them up; use
        those).
        """
        from simple_vae_rs_tpu.ops.tiling import feather_profile, grid_starts

        p = int(self.model.config.patch_size) // 2
        if height < p or width < p:
            raise ValueError(
                f"raster {height}x{width} is smaller than one {p}px model "
                f"window; use super_resolve_tile/uncertainty_tile"
            )
        if overlap is None:
            overlap = min(4, p // 2)
        if not 0 <= overlap <= p // 2:
            raise ValueError(f"overlap must be in [0, {p // 2}] (got {overlap})")
        if samples < (2 if moments else 1):
            raise ValueError(
                f"samples must be >= {2 if moments else 1} (got {samples})"
            )
        stride = p - overlap if overlap else p
        row_starts = grid_starts(height, p, stride)
        col_starts = grid_starts(width, p, stride)
        ps = 2 * p
        prof = feather_profile(ps, 2 * overlap)
        w2d = (prof[:, None] * prof[None, :])[..., None]

        base = 0  # first SR row not yet yielded
        num1 = num2 = den = None  # accumulators cover SR rows [base, ...)

        def grown(buf, rows, chans):
            if buf is None:
                return np.zeros((rows, 2 * width, chans), np.float32)
            if rows > buf.shape[0]:
                pad = np.zeros((rows - buf.shape[0], 2 * width, buf.shape[2]),
                               np.float32)
                return np.concatenate([buf, pad])
            return buf

        for k, rs in enumerate(row_starts):
            lr = np.asarray(read_rows(rs, rs + p), np.float32)
            if lr.ndim != 3 or lr.shape[:2] != (p, width):
                raise ValueError(
                    f"read_rows({rs}, {rs + p}) returned shape {lr.shape}, "
                    f"expected ({p}, {width}, C)"
                )
            wins = np.stack([lr[:, cs:cs + p] for cs in col_starts])
            if moments or samples > 1:
                m1, m2 = self._tile_draw_moments(wins, samples, batch)
            else:
                m1, m2 = self._tile_pass(wins, batch), None
            top = 2 * rs + ps
            chans = m1.shape[-1]
            num1 = grown(num1, top - base, chans)
            den = grown(den, top - base, 1)
            if moments:
                num2 = grown(num2, top - base, chans)
            r_off = 2 * rs - base
            for j, cs in enumerate(col_starts):
                sl = (slice(r_off, r_off + ps), slice(2 * cs, 2 * cs + ps))
                num1[sl] += w2d * m1[j]
                den[sl] += w2d
                if moments:
                    num2[sl] += w2d * m2[j]
            flush_to = 2 * row_starts[k + 1] if k + 1 < len(row_starts) \
                else 2 * height
            n = flush_to - base
            if n <= 0:
                continue
            mean = num1[:n] / den[:n]
            if moments:
                e2 = num2[:n] / den[:n]
                var = np.maximum(e2 - mean * mean, 0.0)
                yield base, {"mean": mean, "std": np.sqrt(var),
                             "variance": var}
                num2 = num2[n:]
            else:
                yield base, mean
            num1, den, base = num1[n:], den[n:], flush_to

    # ------------------------------------------------------ tile plumbing
    def _tile_windows(self, y, overlap: Optional[int]):
        """Normalize a raster once, cover it with the overlapping window
        grid: (N, p, p, C) windows + starts + original/padded HW + the
        resolved overlap. All host-side numpy — the raster never touches
        the device until the windows go through the compiled endpoint
        (min-max + pad are trivial next to a full-raster transfer on a
        remote link)."""
        from simple_vae_rs_tpu.ops.tiling import grid_starts

        y = np.asarray(y, np.float32)
        if y.ndim == 4:
            if y.shape[0] != 1:
                raise ValueError("tile endpoints serve one raster per call")
            y = y[0]
        if y.ndim != 3:
            raise ValueError(f"expected (H, W, C) raster, got shape {y.shape}")
        p = int(self.model.config.patch_size) // 2
        if overlap is None:
            overlap = min(4, p // 2)
        if not 0 <= overlap <= p // 2:
            raise ValueError(f"overlap must be in [0, {p // 2}] (got {overlap})")
        if self.normalize:
            # host mirror of utils.image.normalize_image (same formula)
            mn = y.min(axis=(0, 1), keepdims=True)
            mx = y.max(axis=(0, 1), keepdims=True)
            y = (y - mn) / (mx - mn + 1e-5)
        h, w = y.shape[:2]
        pad_h, pad_w = max(0, p - h), max(0, p - w)
        if pad_h or pad_w:
            y = np.pad(y, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
        hp, wp = y.shape[:2]
        stride = p - overlap if overlap else p
        starts = [
            (sh, sw)
            for sh in grid_starts(hp, p, stride)
            for sw in grid_starts(wp, p, stride)
        ]
        wins = np.stack([y[a:a + p, b:b + p] for a, b in starts])
        return wins, starts, (h, w), (hp, wp), overlap

    # In-flight dispatch depth for the tile loops: JAX dispatch is async,
    # so keeping a few window batches in flight overlaps the device decode
    # and the device->host transfer of earlier batches with the dispatch of
    # later ones (a serial fetch-per-batch loop pays compute + transfer
    # end-to-end per batch). Bounded so a large raster's SR windows never
    # pile up on HBM.
    _TILE_PIPELINE = 4

    def _tile_pass(self, wins: np.ndarray, batch: int) -> np.ndarray:
        """One posterior draw for every window, in fixed-shape batches
        (ragged last chunk padded so one compile serves any tile size);
        dispatches ride ``_TILE_PIPELINE`` deep before the oldest is
        fetched."""
        if batch < 1:
            raise ValueError(f"batch must be >= 1 (got {batch})")
        from collections import deque

        pending: deque = deque()
        outs = []

        def fetch():
            # slice the pad off ON DEVICE so the ragged chunk's padding
            # never crosses the (slow) device->host link
            sr, short = pending.popleft()
            outs.append(np.asarray(sr[:sr.shape[0] - short] if short else sr))

        for i in range(0, len(wins), batch):
            chunk = wins[i:i + batch]
            short = batch - len(chunk)
            if short:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], short, axis=0)]
                )
            pending.append((self.super_resolve(chunk, normalize=False), short))
            if len(pending) >= self._TILE_PIPELINE:
                fetch()
        while pending:
            fetch()
        return np.concatenate(outs)

    def _tile_draw_moments(
        self, wins: np.ndarray, samples: int, batch: int
    ) -> tuple:
        """Per-window first/second per-pixel sample moments over
        ``samples`` posterior draws. The (window, draw) work list is
        window-major and packs into fixed-shape batches — so the cost is
        ceil(N*samples/batch) dispatches, not samples*ceil(N/batch):
        per-dispatch latency dominates on remote links, and a free batch
        slot might as well carry the next window's draw. Slots past the
        end repeat the last window and are dropped from the sums."""
        if batch < 1:
            raise ValueError(f"batch must be >= 1 (got {batch})")
        from collections import deque

        n = len(wins)
        total = n * samples
        s1 = s2 = None
        pending: deque = deque()

        def fetch():
            nonlocal s1, s2
            sr_dev, idx, valid = pending.popleft()
            # device-side slice: padding past `valid` never transfers
            if valid < sr_dev.shape[0]:
                sr_dev = sr_dev[:valid]
            sr = np.asarray(sr_dev, dtype=np.float32)
            if s1 is None:
                s1 = np.zeros((n, *sr.shape[1:]), np.float32)
                s2 = np.zeros_like(s1)
            np.add.at(s1, idx[:valid], sr)
            np.add.at(s2, idx[:valid], sr ** 2)

        for i in range(0, total, batch):
            idx = np.minimum(np.arange(i, i + batch) // samples, n - 1)
            pending.append((
                self.super_resolve(wins[idx], normalize=False),
                idx, min(batch, total - i),
            ))
            if len(pending) >= self._TILE_PIPELINE:
                fetch()
        while pending:
            fetch()
        return s1 / samples, s2 / samples

    def uncertainty(self, y, samples: int = 32,
                    chunk: Optional[int] = None) -> Dict[str, Array]:
        """Posterior SR statistics for one LR image: mean/std/variance maps.

        ``chunk=None`` sizes decode chunks by HBM budget (``tasks.auto_chunk``
        — one dispatch for typical requests). On a meshed resolver the draws
        shard over the batch axes (chunk is rounded up to the shard count) —
        N-draw UQ scales linearly in chips.
        """
        y = self._prep(y)[:1]
        if chunk is None:
            chunk = auto_chunk(samples, int(y.shape[1]) * 2)
        chunk = -(-chunk // self._n_shards) * self._n_shards
        draws = sample_chunked(
            self.model, self.variables, y, self._next_rng(),
            samples=samples, chunk=chunk, sharding=self._batch_sharding,
            mesh=self.mesh,
        )
        return {
            "mean": jnp.mean(draws, axis=0),
            "std": jnp.std(draws, axis=0),
            "variance": jnp.var(draws, axis=0),
        }

    def mmse_estimate(self, y, samples: int = 32,
                      chunk: Optional[int] = None) -> Array:
        """Posterior-mean SR reconstruction (minimum-MSE estimator)."""
        return self.uncertainty(y, samples=samples, chunk=chunk)["mean"]


def warmup(
    resolver: SuperResolver, lr_shape=(1, 32, 32, 4),
    tile_batch: Optional[int] = 16,
) -> None:
    """Compile the serving endpoints ahead of traffic.

    ``tile_batch`` also pre-compiles the fixed window-batch shape the
    ``*_tile`` endpoints dispatch (their default ``batch=16``) — otherwise
    the first whole-raster request pays that compile (~13 s measured on
    the tunneled v5e). Pass ``None`` to skip it.
    """
    y = np.zeros(lr_shape, np.float32)
    jax.block_until_ready(resolver.super_resolve(y))
    jax.block_until_ready(resolver.uncertainty(y, samples=2, chunk=2)["mean"])
    if tile_batch:
        wins = np.zeros((tile_batch, *lr_shape[1:]), np.float32)
        jax.block_until_ready(resolver.super_resolve(wins, normalize=False))
