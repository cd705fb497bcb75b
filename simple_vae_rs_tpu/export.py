"""Portable serving artifacts: the SR endpoint as one StableHLO file.

The reference's only deployment story is re-running its training script
with ``--test`` (``/root/reference/train.py:54-68``) — shipping a model
means shipping the whole torch codebase. Here the compiled serving
endpoint exports to a single self-contained **StableHLO artifact** via
``jax.export``: the conditional-generation graph (normalize + noise draw
+ decode) with the trained weights baked in as constants, serialized with
stable custom-call guarantees. The artifact

- needs only ``jax`` to serve (none of this package's Python — the
  loader below is a convenience, not a requirement);
- is lowered for an explicit platform set (default ``tpu`` + ``cpu``) at
  export time, so a dev box without a TPU can produce an artifact a TPU
  pod serves, and the same file smoke-tests on CPU;
- is deterministic given ``(input, key)`` — the reparameterization noise
  is derived inside the graph from an explicit key argument, so two
  deployments replaying a key agree bitwise.

The graph is traced with every Pallas dispatch gate forced to XLA
(``ops/pallas_conv.force_xla``) and without the int8 ``quant``
collection: custom calls would pin the artifact to one platform/runtime
version, and portability is the point of exporting. (The fused-kernel
fast paths remain the live-``SuperResolver`` story; export trades their
marginal wins for a file that runs anywhere XLA does.)

Artifacts can also ship **compressed weights** (``--weights int8|bf16``):
every large floating kernel is stored as an int8 tensor + per-channel f32
scales (round-to-nearest, the symmetric scheme of ``ops/quantize.py``) or
as bf16, and the graph dequantizes/upcasts them on entry — plain StableHLO
``convert``/``multiply`` ops, so the file stays portable with zero custom
calls. Measured on the canonical 48.95M-param Cond_SRVAE: 189.5 MB (f32)
→ 94.8 MB (bf16, 86.9 dB) → 47.5 MB (int8, 83.6 dB PSNR vs the f32
artifact on the same key; weight-only quantization does not touch
activations).

    sr = SuperResolver.from_checkpoint("ckpt/job")
    export_resolver(sr, "model.svrs")            # one ~4*params-byte file
    ...
    esr = load_exported("model.svrs")            # jax-only environment
    x_hat = esr.super_resolve(lr_batch)          # compiled endpoint
    big   = esr.super_resolve_tile(lr_raster)    # whole-raster serving

``ExportedResolver`` implements the same ``TileEndpoints`` contract as
the live resolver, so whole-raster SR/UQ and the bounded-memory
``iter_tile_rows`` streaming sweep all run off the artifact unchanged —
including the device-side draw-moments fast path: a deserialized graph
is traceable, so the k-draw (sum, sum-of-squares) reduction is rebuilt
around it at load time (``_moments_over``) and whole-raster UQ ships two
moment maps per window batch instead of every draw.

CLI::

    python -m simple_vae_rs_tpu.export ckpt/job model.svrs \
        [--batch 16] [--platforms tpu,cpu] [--verify]
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from simple_vae_rs_tpu.tiling import TileEndpoints
from simple_vae_rs_tpu.utils.image import normalize_image

_FORMAT = "svrs-export/1"

# Leaves smaller than this stay f32 under --weights compression: biases,
# BN affine/stats and the gamma scalars are numerically load-bearing and
# a rounding error of total file size.
_PACK_MIN_SIZE = 4096

WEIGHT_MODES = ("f32", "bf16", "int8")


def _rtn_numpy(arr: np.ndarray):
    """Round-to-nearest int8 + per-last-axis symmetric scales, in numpy.

    Mirrors ``ops.quantize.quantize_rtn`` exactly (absmax/127 per output
    channel, zero channels get scale 1 — pinned by a test) but runs on the
    host so exporting never dispatches to an accelerator.
    """
    a = arr.astype(np.float32)
    absmax = np.max(np.abs(a), axis=tuple(range(a.ndim - 1)))
    scale = np.where(absmax == 0.0, 1.0, absmax / 127.0).astype(np.float32)
    q = np.clip(np.rint(a / scale), -127, 127).astype(np.int8)
    return q, scale


def _pack_variables(variables: Dict[str, Any], weights: str):
    """Flatten ``variables`` and compress the large floating leaves.

    Returns ``(packed, treedef)`` where each packed entry is one of
    ``("raw", arr)``, ``("bf16", arr_bf16)`` or ``("int8", q, scale)``.
    Only floating leaves with ndim >= 2 and >= _PACK_MIN_SIZE elements are
    compressed — conv/dense kernels — so the scheme is per-output-channel
    symmetric on exactly the tensors where it is accurate.
    """
    if weights not in WEIGHT_MODES:
        raise ValueError(
            f"weights must be one of {WEIGHT_MODES} (got {weights!r})"
        )
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    packed = []
    for leaf in leaves:
        arr = np.asarray(leaf)
        big_float = (
            arr.ndim >= 2
            and arr.size >= _PACK_MIN_SIZE
            and np.issubdtype(arr.dtype, np.floating)
        )
        if weights == "f32" or not big_float:
            packed.append(("raw", arr))
        elif weights == "bf16":
            # host-only cast (ml_dtypes, same rounding as the device op):
            # a jnp round trip here would couple export to accelerator
            # health, exactly what _rtn_numpy exists to avoid
            import ml_dtypes

            packed.append(("bf16", arr.astype(ml_dtypes.bfloat16)))
        else:
            q, scale = _rtn_numpy(arr)
            packed.append(("int8", q, scale))
    return packed, treedef


def _unpack_variables(packed, treedef):
    """Rebuild the f32 variable tree INSIDE a trace: the compressed arrays
    enter the graph as int8/bf16 constants and the convert/multiply ops
    travel with the artifact."""
    leaves = []
    for entry in packed:
        if entry[0] == "raw":
            leaves.append(jnp.asarray(entry[1]))
        elif entry[0] == "bf16":
            leaves.append(jnp.asarray(entry[1]).astype(jnp.float32))
        else:
            q, scale = entry[1], entry[2]
            leaves.append(jnp.asarray(q).astype(jnp.float32)
                          * jnp.asarray(scale))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _generation_fn(model: Any, variables: Dict[str, Any]):
    """The exported computation: (y, key_data, do_norm) -> SR batch.

    Mirrors ``serve._sr_call`` exactly — float32 cast, optional per-channel
    min-max normalization, reparameterization noise drawn from the key via
    the model's shape probe, one conditional generation — except that
    ``variables`` is a closure (baked into the artifact as constants) and
    the normalize switch is a *traced* scalar so one artifact serves both
    the direct path (normalize on) and the tile/stream path (windows
    arrive pre-normalized, flag off) without recompilation.

    ``variables`` may be a zero-arg callable (the ``--weights`` compression
    path): it is invoked inside the trace so the compressed constants — not
    their f32 expansion — are what the artifact serializes.
    """

    def fn(y, key_data, do_norm):
        vs = variables() if callable(variables) else variables
        key = jax.random.wrap_key_data(key_data)
        y = y.astype(jnp.float32)
        y = jnp.where(do_norm, normalize_image(y), y)
        k_u, k_z = jax.random.split(key)
        shapes = jax.eval_shape(
            lambda v, yy: model.apply(
                v, yy, method=type(model).generation_noise_shapes
            ),
            vs, y,
        )
        eps_u = jax.random.normal(k_u, shapes[0].shape, jnp.float32)
        eps_z = jax.random.normal(k_z, shapes[1].shape, jnp.float32)
        return model.apply(
            vs, y, eps_u, eps_z,
            method=type(model).conditional_generation_eps,
        )

    return fn


def export_resolver(
    resolver: Any,
    path: str,
    batch: int = 16,
    platforms: Sequence[str] = ("tpu", "cpu"),
    weights: str = "f32",
) -> str:
    """Serialize a ``serve.SuperResolver``'s SR endpoint to ``path``.

    The artifact is fixed-shape — ``(batch, ps/2, ps/2, C)`` in,
    ``(batch, ps, ps, C)`` out — because serving already runs one warm
    compiled shape per endpoint (``serve.warmup``); ``ExportedResolver``
    re-batches arbitrary request sizes into it. A ``path + ".meta.json"``
    sidecar records the shapes and the export-time normalize default.

    ``weights`` compresses the baked constants: ``"bf16"`` halves the file,
    ``"int8"`` quarters it via per-output-channel round-to-nearest weight
    quantization (dequantized by plain ops inside the graph — see the
    module doc). ``"f32"`` (default) is exact.

    Returns ``path``.
    """
    from jax import export as jexport

    from simple_vae_rs_tpu.ops import pallas_conv

    if batch < 1:
        raise ValueError(f"batch must be >= 1 (got {batch})")
    model = resolver.model
    ps = int(model.config.patch_size)
    channels = int(model.config.channels)
    # host copies: the trace bakes them in as module constants, and a
    # device round-trip here would couple export to accelerator health
    variables = jax.device_get(resolver.variables)
    variables.pop("quant", None)  # int8 kernels are not portable — see module doc

    if weights == "f32":
        var_arg: Any = variables
    else:
        packed, treedef = _pack_variables(variables, weights)
        var_arg = lambda: _unpack_variables(packed, treedef)

    y_spec = jax.ShapeDtypeStruct((batch, ps // 2, ps // 2, channels),
                                  jnp.float32)
    key_spec = jax.ShapeDtypeStruct(
        jax.random.key_data(jax.random.key(0)).shape, jnp.uint32
    )
    flag_spec = jax.ShapeDtypeStruct((), jnp.bool_)

    with pallas_conv.force_xla():
        fn = jax.jit(_generation_fn(model, var_arg))
        exported = jexport.export(fn, platforms=list(platforms))(
            y_spec, key_spec, flag_spec
        )

    blob = exported.serialize()
    meta = {
        "format": _FORMAT,
        "model_type": type(model).__name__,
        "cr": float(model.config.cr),
        "patch_size": ps,
        "channels": channels,
        "batch": int(batch),
        "scale": 2,
        "normalize": bool(resolver.normalize),
        "platforms": list(platforms),
        "weights": weights,
        "n_params": int(
            sum(int(np.size(p)) for p in jax.tree.leaves(variables))
        ),
    }
    with open(path, "wb") as fh:
        fh.write(bytes(blob))
    with open(path + ".meta.json", "w") as fh:
        json.dump(meta, fh, indent=1)
    return path


def export_checkpoint(
    ckpt_path: str,
    out_path: str,
    batch: int = 16,
    platforms: Sequence[str] = ("tpu", "cpu"),
    weights: str = "f32",
    **model_kwargs: Any,
) -> str:
    """Checkpoint -> artifact in one call (config resolves from the
    checkpoint's sidecar meta exactly like serving does)."""
    from simple_vae_rs_tpu.serve import SuperResolver

    resolver = SuperResolver.from_checkpoint(
        ckpt_path, pallas_conv=False, **model_kwargs
    )
    return export_resolver(resolver, out_path, batch=batch,
                           platforms=platforms, weights=weights)


def _moments_over(exported: Any, ps: int, channels: int):
    """Device-side draw-moment reduction AROUND a deserialized artifact.

    A deserialized ``Exported.call`` is an ordinary traceable callable, so
    the k-draw reduction the live resolver gets from
    ``serve._sr_moments_call`` can be rebuilt at LOAD time: one jitted
    ``lax.scan`` whose body invokes the artifact's generation graph with a
    fresh per-draw key and accumulates (sum, sum-of-squares) on device.
    No second blob, no file-format change, no doubled weight constants —
    already-shipped artifacts gain whole-raster UQ's two-maps-per-batch
    fast path the moment they are loaded by this resolver.
    """
    from functools import partial

    @partial(jax.jit, static_argnames="k")
    def moments(y, key_data, flag, k):
        keys = jax.random.split(jax.random.wrap_key_data(key_data), k)
        key_datas = jax.vmap(jax.random.key_data)(keys)
        zero = jnp.zeros((y.shape[0], ps, ps, channels), jnp.float32)

        def body(carry, key_i):
            out = exported.call(y, key_i, flag)
            s1, s2 = carry
            return (s1 + out, s2 + out * out), None

        (s1, s2), _ = jax.lax.scan(body, (zero, zero), key_datas)
        return s1, s2

    return moments


class ExportedResolver(TileEndpoints):
    """Serve a deserialized artifact with the live resolver's API.

    Same endpoint surface as ``serve.SuperResolver`` — ``super_resolve``
    plus the whole-raster ``TileEndpoints`` (``super_resolve_tile`` /
    ``uncertainty_tile`` / ``iter_tile_rows``) and host-accumulated
    ``uncertainty`` / ``mmse_estimate`` — but the model is the artifact's
    fixed-shape StableHLO graph: requests re-batch into the exported
    ``batch`` (padding trimmed on device) and the RNG key threads through
    ``fold_in`` per dispatch, so repeated calls draw fresh posterior
    samples just like the live endpoint.
    """

    def __init__(self, exported: Any, meta: Dict[str, Any],
                 seed: int = 0) -> None:
        if meta.get("format") != _FORMAT:
            raise ValueError(
                f"not a {_FORMAT} artifact (sidecar says "
                f"{meta.get('format')!r})"
            )
        self.meta = dict(meta)
        self.normalize = bool(meta["normalize"])
        self.batch = int(meta["batch"])
        self._exported = exported
        self._call = jax.jit(exported.call)
        self._moments_call = _moments_over(
            exported, int(meta["patch_size"]), int(meta["channels"])
        )
        self._rng = jax.random.key_data(jax.random.key(seed))
        self._calls = 0

    # ------------------------------------------------------------- basics
    @property
    def window(self) -> int:
        """LR window size (one model patch in LR space) — TileEndpoints."""
        return int(self.meta["patch_size"]) // 2

    def _next_key(self) -> jax.Array:
        self._calls += 1
        return jax.random.key_data(
            jax.random.fold_in(
                jax.random.wrap_key_data(self._rng), self._calls
            )
        )

    @staticmethod
    def _seeded_key(seed: int, i: int) -> jax.Array:
        """Dispatch ``i``'s key for a seeded request: a pure function of
        (seed, i), independent of the resolver's rolling ``_calls`` state
        — the artifact graph is deterministic given (input, key), so the
        same input + seed reproduces the output bitwise across processes
        and deployments of the same artifact file."""
        return jax.random.key_data(
            jax.random.fold_in(jax.random.key(int(seed)), i)
        )

    def super_resolve(self, y, normalize: Optional[bool] = None,
                      seed: Optional[int] = None):
        """LR batch (B, ps/2, ps/2, C) -> single-draw SR (B, ps, ps, C).

        Arbitrary ``B`` runs as ceil(B/batch) fixed-shape dispatches of
        the artifact (ragged tail padded by repetition, trimmed on device
        before fetch). ``normalize`` overrides the export-time default
        for this call — it is a traced flag inside the artifact, so both
        settings share the one compiled graph. ``seed`` pins the draws
        (``_seeded_key`` per internal dispatch) without advancing the
        rolling RNG.
        """
        y = jnp.asarray(y, jnp.float32)
        if y.ndim == 3:
            y = y[None]
        w = self.window
        c = int(self.meta["channels"])
        if y.ndim != 4 or y.shape[1:] != (w, w, c):
            raise ValueError(
                f"artifact serves (B, {w}, {w}, {c}) LR batches, got "
                f"{tuple(y.shape)}"
            )
        flag = jnp.asarray(
            self.normalize if normalize is None else normalize, jnp.bool_
        )
        b = int(y.shape[0])
        outs = []
        for j, i in enumerate(range(0, b, self.batch)):
            chunk = y[i:i + self.batch]
            short = self.batch - int(chunk.shape[0])
            if short:
                chunk = jnp.concatenate(
                    [chunk, jnp.repeat(chunk[-1:], short, axis=0)]
                )
            key = (self._next_key() if seed is None
                   else self._seeded_key(seed, j))
            out = self._call(chunk, key, flag)
            outs.append(out[:out.shape[0] - short] if short else out)
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs)

    def super_resolve_moments(
        self, y, samples: int, normalize: bool = False,
        seed: Optional[int] = None,
    ) -> tuple:
        """Device-moments hook (``TileEndpoints`` / the server's
        ``/v1/super_resolve_moments``): LR windows (B, ps/2, ps/2, C) ->
        ``(s1, s2)`` per-pixel sum and sum-of-squares over ``samples``
        fresh posterior draws of the artifact graph, reduced on device by
        ``_moments_over``'s scan. Arbitrary ``B`` re-batches into the
        exported fixed batch exactly like ``super_resolve`` (tail padded
        by repetition, trimmed before the host copy); the key schedule is
        one ``fold_in`` per dispatch split into per-draw keys.
        """
        if samples < 1:
            raise ValueError(f"samples must be >= 1 (got {samples})")
        y = jnp.asarray(y, jnp.float32)
        if y.ndim == 3:
            y = y[None]
        w = self.window
        c = int(self.meta["channels"])
        if y.ndim != 4 or y.shape[1:] != (w, w, c):
            raise ValueError(
                f"artifact serves (B, {w}, {w}, {c}) LR batches, got "
                f"{tuple(y.shape)}"
            )
        flag = jnp.asarray(bool(normalize), jnp.bool_)
        ps = int(self.meta["patch_size"])
        b = int(y.shape[0])
        out1 = np.empty((b, ps, ps, c), np.float32)
        out2 = np.empty_like(out1)
        for j, i in enumerate(range(0, b, self.batch)):
            chunk = y[i:i + self.batch]
            valid = int(chunk.shape[0])
            if valid < self.batch:
                chunk = jnp.concatenate(
                    [chunk,
                     jnp.repeat(chunk[-1:], self.batch - valid, axis=0)]
                )
            key = (self._next_key() if seed is None
                   else self._seeded_key(seed, j))
            s1, s2 = self._moments_call(chunk, key, flag, int(samples))
            out1[i:i + valid] = np.asarray(s1[:valid], np.float32)
            out2[i:i + valid] = np.asarray(s2[:valid], np.float32)
        return out1, out2

    def uncertainty(self, y, samples: int = 32,
                    chunk: Optional[int] = None,
                    seed: Optional[int] = None) -> Dict[str, Any]:
        """Posterior SR statistics for one LR image: mean/std/variance.

        Draws accumulate host-side in ceil(samples/batch) artifact
        dispatches (each batch slot is an independent draw of the same
        conditioning — fresh key per dispatch). ``chunk`` is accepted for
        live-resolver signature compatibility; the artifact's fixed batch
        is the chunk.
        """
        if samples < 2:
            raise ValueError(f"samples must be >= 2 (got {samples})")
        y = jnp.asarray(y, jnp.float32)
        if y.ndim == 3:
            y = y[None]
        y = y[:1]
        if self.normalize:
            y = normalize_image(y)
        tile = jnp.repeat(y, self.batch, axis=0)
        flag = jnp.asarray(False, jnp.bool_)
        s1 = s2 = None
        done = 0
        j = 0
        while done < samples:
            take = min(self.batch, samples - done)
            key = (self._next_key() if seed is None
                   else self._seeded_key(seed, j))
            j += 1
            sr = np.asarray(self._call(tile, key, flag)[:take], np.float32)
            if s1 is None:
                s1 = np.zeros(sr.shape[1:], np.float32)
                s2 = np.zeros_like(s1)
            s1 += sr.sum(axis=0)
            s2 += (sr ** 2).sum(axis=0)
            done += take
        mean = s1 / samples
        var = np.maximum(s2 / samples - mean * mean, 0.0)
        return {"mean": mean, "std": np.sqrt(var), "variance": var}

    def mmse_estimate(self, y, samples: int = 32,
                      chunk: Optional[int] = None,
                      seed: Optional[int] = None):
        """Posterior-mean SR reconstruction (minimum-MSE estimator)."""
        return self.uncertainty(y, samples=samples, chunk=chunk,
                                seed=seed)["mean"]


def load_exported(path: str, seed: int = 0) -> ExportedResolver:
    """Deserialize ``path`` (+ its ``.meta.json`` sidecar) for serving."""
    from jax import export as jexport

    with open(path, "rb") as fh:
        exported = jexport.deserialize(bytearray(fh.read()))
    meta_path = path + ".meta.json"
    if not os.path.exists(meta_path):
        raise FileNotFoundError(
            f"{meta_path} missing — artifacts travel as the pair "
            f"(file, file.meta.json)"
        )
    with open(meta_path) as fh:
        meta = json.load(fh)
    return ExportedResolver(exported, meta, seed=seed)


def main(argv: Optional[Sequence[str]] = None) -> int:
    import argparse

    p = argparse.ArgumentParser(
        prog="python -m simple_vae_rs_tpu.export",
        description="Export a checkpoint's SR endpoint to a portable "
        "StableHLO artifact (weights baked in; serves with jax alone).",
    )
    p.add_argument("ckpt", help="checkpoint path (as given to --job_name "
                   "training, e.g. ckpt/job)")
    p.add_argument("out", help="artifact output path (writes out + "
                   "out.meta.json)")
    p.add_argument("--batch", type=int, default=16,
                   help="fixed serving batch baked into the artifact "
                   "(default 16 — the tile endpoints' window batch)")
    p.add_argument("--platforms", default="tpu,cpu",
                   help="comma-separated lowering platforms "
                   "(default tpu,cpu)")
    p.add_argument("--weights", default="f32", choices=WEIGHT_MODES,
                   help="constant precision baked into the artifact: f32 "
                   "(exact, default), bf16 (~2x smaller file) or int8 "
                   "(~4x smaller; per-channel weight-only quantization, "
                   "dequantized by plain StableHLO ops — stays portable)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no_normalize", action="store_true",
                   help="bake normalize-off as the artifact default "
                   "(inputs arrive pre-normalized)")
    p.add_argument("--verify", action="store_true",
                   help="after writing, reload the artifact and run one "
                   "batch on the current backend")
    p.add_argument("--backend", default="",
                   help="JAX platform override (e.g. 'cpu' to export "
                   "without touching the accelerator); same semantics as "
                   "train.py --backend")
    args = p.parse_args(argv)

    from simple_vae_rs_tpu.utils.backend import apply_backend

    apply_backend(args.backend)

    from simple_vae_rs_tpu.serve import SuperResolver
    from simple_vae_rs_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    resolver = SuperResolver.from_checkpoint(
        args.ckpt, seed=args.seed, pallas_conv=False
    )
    if args.no_normalize:
        resolver.normalize = False
    platforms = [s.strip() for s in args.platforms.split(",") if s.strip()]
    path = export_resolver(resolver, args.out, batch=args.batch,
                           platforms=platforms, weights=args.weights)
    size_mb = os.path.getsize(path) / 1e6
    print(f"wrote {path} ({size_mb:.1f} MB, platforms={platforms}, "
          f"weights={args.weights}) + {path}.meta.json")

    if args.verify:
        esr = load_exported(path, seed=args.seed)
        w, c = esr.window, int(esr.meta["channels"])
        y = np.random.default_rng(0).random(
            (args.batch, w, w, c), np.float32
        )
        out = np.asarray(esr.super_resolve(y))
        print(f"verify: super_resolve({y.shape}) -> {out.shape} on "
              f"{jax.devices()[0].platform}, "
              f"range [{out.min():.4f}, {out.max():.4f}]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
