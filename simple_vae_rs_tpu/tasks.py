"""Evaluation tasks: posterior-sampled uncertainty maps, MMSE, generation.

Unifies the reference's two duplicated report paths (``models/base.py:293-348``
``BaseVAE.task`` and the never-invoked ``task.py:10-81`` ``sr_task`` —
SURVEY §2.2-8) into one module producing both artifacts:

- ``results/{job}_CRx{cr}/error_mean_std_maps.png`` — input/sample/GT/mean
  panel + MAE/MSE/STD/mean-bias maps over N posterior draws (default 1000,
  reference ``base.py:306``), plus the printed MMSE;
- ``results/{job}_CRx{cr}/generated_image.png`` — unconditional generation
  panel (reference ``task.py:71-81``), device-agnostic (the reference
  hardcodes "cuda" — SURVEY §2.2-5).

The N-draw decode is the UQ north-star path: prior parameters are computed
once, then draws are decoded in fixed-size chunks under one compiled
function — HBM-safe at N=1000 x 64px and fast at N=32 per tile for variance
maps (BASELINE.json config 5).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from simple_vae_rs_tpu.models.cond_vae import CondSRVAE
from simple_vae_rs_tpu.models.srvae import SRVAE
from simple_vae_rs_tpu.models.vae import VAE

Array = jnp.ndarray


# --------------------------------------------------------------- sampling
def sample_chunked(
    model,
    variables,
    y: Array,
    rng: jax.Array,
    samples: int = 1000,
    chunk: int = 100,
    sharding=None,
    mesh=None,
    pack_spec=None,
) -> Array:
    """N posterior draws decoded in fixed-size chunks.

    The conditioning pass (encoder_y / y_to_z / prior heads) runs once; only
    the decoder runs per chunk. Matches reference semantics (one ``u`` draw
    shared by all samples — ``cond_vae.py:299-318``).

    ``sharding`` (a ``NamedSharding`` over the draw axis) spreads each
    chunk's decodes across a device mesh: the noise is drawn once and
    device_put with the sharding. Passing the ``mesh`` too runs the chunk
    decode under ``jax.shard_map`` over the mesh's batch axes — each chip
    executes the fused Pallas / int8 kernels on its local draw slice
    (GSPMD alone cannot partition a Pallas custom call); without ``mesh``
    XLA's SPMD partitioner slices the decoder behind the input sharding.
    Draw values are sharding-independent (same key -> same draws), so
    sharded and single-device results agree to float tolerance either way.

    ``pack_spec`` (with ``variables`` holding the matching payload) is the
    weights-only int8 mode (``ops.quantize.pack_int8_weights``): every
    helper below dequantizes IN-TRACE, so the per-chunk decodes read int8
    weights from HBM — the same formulation the serving endpoints and the
    exported artifacts use.
    """
    if sharding is None:
        chunk = min(chunk, samples)
    # (sharded callers size chunk to the shard count; a chunk larger than
    # samples just decodes once and trims)
    n_chunks = -(-samples // chunk)

    def draw(rng_i, shape):
        """Per-chunk noise. Unsharded: drawn INSIDE the decode jit (one
        dispatch per chunk — the latency contract serve.py documents).
        Sharded: drawn in its own dispatch and device_put with the draw
        sharding so XLA partitions the decode behind it. Same key + shape
        -> identical draws either way."""
        if sharding is None:
            return None
        return jax.device_put(_normal(rng_i, shape), sharding)

    if isinstance(model, (CondSRVAE, SRVAE)):
        rng_u, rng_z = jax.random.split(rng)
        mu_p, lv_p, y_feat = _cond_prep(model, variables, y, rng_u,
                                        pack_spec=pack_spec)
        std = jnp.exp(0.5 * lv_p)
        shape = (chunk,) + tuple(mu_p.shape[1:])
        outs = [
            _cond_decode_chunk(
                model, variables, mu_p, std, y_feat,
                jax.random.fold_in(rng_z, i), chunk,
                draw(jax.random.fold_in(rng_z, i), shape),
                mesh, pack_spec,
            )
            for i in range(n_chunks)
        ]
    else:
        mu, logvar = _vae_encode(model, variables, y, pack_spec=pack_spec)
        std = jnp.exp(0.5 * logvar)
        shape = (chunk, mu.shape[-1])
        outs = [
            _vae_decode_chunk(
                model, variables, mu, std,
                jax.random.fold_in(rng, i), chunk,
                draw(jax.random.fold_in(rng, i), shape),
                mesh, pack_spec,
            )
            for i in range(n_chunks)
        ]
    return jnp.concatenate(outs, axis=0)[:samples]


# Module-level jitted helpers: flax modules are hashable (frozen dataclasses
# over frozen configs), so they pass as static args and the compiled
# executables persist across sample_chunked calls — the serving path pays
# tracing/compilation once per (model, shapes), not once per request.
def _cond_prep_method(m, y, r):
    from simple_vae_rs_tpu.models.srvae import box_downsample_2x
    from simple_vae_rs_tpu.models.vae import reparameterize

    core = m.core if isinstance(m, SRVAE) else m
    if isinstance(m, SRVAE) and y.shape[1] == m.config.patch_size:
        y = box_downsample_2x(y)
    mu_u, logvar_u = core.encode_y(y, train=False)
    u = reparameterize(r, mu_u, logvar_u)
    y_feat = core.y_embedding(y, train=False)
    mu_p, lv_p = core.z_cond(y_feat, u, train=False)
    return mu_p, lv_p, y_feat


def _cond_decode_method(m, z, yf):
    core = m.core if isinstance(m, SRVAE) else m
    return core.decode_x_from_features(z, yf, train=False)


@partial(jax.jit, static_argnames=("model", "pack_spec"))
def _cond_prep(model, variables, y, rng, pack_spec=None):
    from simple_vae_rs_tpu.ops.quantize import unpack_weights

    return model.apply(unpack_weights(variables, pack_spec), y, rng,
                       method=_cond_prep_method)


@partial(jax.jit, static_argnames=("shape",))
def _normal(rng, shape):
    return jax.random.normal(rng, shape, jnp.float32)


def _sharded_decode(decode, mesh, variables, *batched):
    """Run a draw-batched decode under shard_map over the mesh's batch
    axes (params replicated, draw dim sharded) so the fused Pallas / int8
    kernels execute per-shard. Falls back to the plain call when the mesh
    spans one device or the draw count does not divide the shard count."""
    from simple_vae_rs_tpu.serve import _mesh_batch_axes

    axes = _mesh_batch_axes(mesh)
    if not axes:
        return decode(variables, *batched)
    n = 1
    for a in axes:
        n *= int(mesh.shape[a])
    if batched[0].shape[0] % n:
        return decode(variables, *batched)
    from jax.sharding import PartitionSpec as P

    return jax.shard_map(
        decode,
        mesh=mesh,
        in_specs=(P(),) + tuple(P(axes) for _ in batched),
        out_specs=P(axes),
        check_vma=False,
    )(variables, *batched)


# ``eps=None`` (default): noise drawn inside the jit — one dispatch per
# chunk, the serving latency contract. With a pre-sharded ``eps`` the
# compiled decode inherits its batch partitioning from it; passing the
# ``mesh`` too runs the decode per-shard under shard_map (fused kernels
# survive multi-chip — see ``_sharded_decode``).
@partial(jax.jit, static_argnames=("model", "chunk", "mesh", "pack_spec"))
def _cond_decode_chunk(model, variables, mu_p, std, y_feat, rng, chunk,
                       eps=None, mesh=None, pack_spec=None):
    from simple_vae_rs_tpu.ops.quantize import unpack_weights

    if eps is None:
        eps = jax.random.normal(rng, (chunk,) + mu_p.shape[1:], jnp.float32)
    z = mu_p + eps * std
    yf = jnp.broadcast_to(y_feat, (chunk,) + y_feat.shape[1:])

    def decode(v, z_b, yf_b):
        # int8-weights dequant happens HERE so the per-shard decode under
        # shard_map reads int8 from HBM (same placement as serve._sr_call)
        return model.apply(unpack_weights(v, pack_spec), z_b, yf_b,
                           method=_cond_decode_method)

    return _sharded_decode(decode, mesh, variables, z, yf)


@partial(jax.jit, static_argnames=("model", "pack_spec"))
def _vae_encode(model, variables, y, pack_spec=None):
    from simple_vae_rs_tpu.ops.quantize import unpack_weights

    return model.apply(unpack_weights(variables, pack_spec), y, train=False,
                       method=VAE.encode)


@partial(jax.jit, static_argnames=("model", "chunk", "mesh", "pack_spec"))
def _vae_decode_chunk(model, variables, mu, std, rng, chunk, eps=None,
                      mesh=None, pack_spec=None):
    from simple_vae_rs_tpu.ops.quantize import unpack_weights

    if eps is None:
        eps = jax.random.normal(rng, (chunk, mu.shape[-1]), jnp.float32)
    z = mu + eps * std

    def decode(v, z_b):
        return model.apply(unpack_weights(v, pack_spec), z_b, train=False,
                           method=VAE.decode)

    return _sharded_decode(decode, mesh, variables, z)


def auto_chunk(samples: int, patch_size: int,
               budget_bytes: int = 1 << 30) -> int:
    """HBM-aware decode chunk size.

    The widest live decoder activation is the full-resolution 64-channel
    tail (``ps*ps*64`` bf16 per draw); allow 2x for XLA double-buffering
    and cap the chunk so that stays under ``budget_bytes`` (1 GiB default
    — ~6% of a v5e's HBM). At the canonical 64px config this decodes the
    whole 1000-draw task in ONE dispatch, which measures 15.3k vs 14.3k
    draws/s at chunk=250 on this relay (per-dispatch latency dominates —
    see BASELINE.md's decode device-time profile); at 128px it caps at
    256 draws/chunk.
    """
    per_draw = patch_size * patch_size * 64 * 2 * 2
    return max(1, min(samples, budget_bytes // per_draw))


@partial(jax.jit, static_argnames=())
def error_statistics(samples: Array, target: Array) -> Dict[str, Array]:
    """Per-pixel statistics over the sample axis, all on device.

    Matches reference ``base.py:309-344``: mean/std of samples, MAE/MSE of
    (samples - target) reduced over (sample, channel), mean-bias map, MMSE.
    """
    samples = samples.astype(jnp.float32)
    target = target.astype(jnp.float32)
    diff = samples - target
    return {
        "mean": jnp.mean(samples, axis=0),  # (H, W, C)
        "std": jnp.mean(jnp.std(samples, axis=0), axis=-1),  # (H, W)
        "mae": jnp.mean(jnp.abs(diff), axis=(0, 3)),  # (H, W)
        "mse": jnp.mean(diff**2, axis=(0, 3)),  # (H, W)
        "mean_bias": jnp.mean(target[0] - jnp.mean(samples, axis=0), axis=-1),
        "mmse": jnp.mean(diff**2),
    }


def uncertainty_maps(
    model, variables, y: Array, rng: jax.Array, samples: int = 32, chunk: int = 32
) -> Dict[str, Array]:
    """Per-pixel SR variance maps from N posterior draws (BASELINE config 5)."""
    draws = sample_chunked(model, variables, y, rng, samples=samples, chunk=chunk)
    return {
        "mean": jnp.mean(draws, axis=0),
        "variance": jnp.var(draws, axis=0),
        "std": jnp.std(draws, axis=0),
    }


# ----------------------------------------------------------------- reports
def _rgb(img: np.ndarray) -> np.ndarray:
    """4-band NHW C -> displayable RGB using bands [2,1,0] (reference
    ``base.py:317``)."""
    img = np.asarray(img)
    if img.shape[-1] >= 3:
        img = img[..., [2, 1, 0]]
    else:
        img = np.repeat(img[..., :1], 3, axis=-1)
    return np.clip(img, 0.0, 1.0)


def run_task(
    model,
    variables,
    val_loader,
    job_id: str,
    cr: float,
    rng: Optional[jax.Array] = None,
    samples: int = 1000,
    chunk: Optional[int] = None,
    results_root: str = "results",
) -> Dict[str, float]:
    """Full reference task: error/uncertainty report + generation panel."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    results_dir = os.path.join(results_root, f"{job_id}_CRx{cr}")
    os.makedirs(results_dir, exist_ok=True)

    batch = next(iter(val_loader), None)
    if batch is None:
        raise ValueError(
            "Validation loader is empty (batch_size larger than the val "
            "split with drop_last?). Reduce --batch_size."
        )
    y_b, x_b = jnp.asarray(batch[0]), jnp.asarray(batch[1])
    if isinstance(model, (CondSRVAE, SRVAE)):
        # reference get_task_data picks item 1 (cond_vae.py:594-603)
        i = min(1, y_b.shape[0] - 1)
        pred, target = y_b[i : i + 1], x_b[i : i + 1]
    else:
        # plain VAE reconstructs the stream it trains on — batch[0], the LR
        # images (reference vae.py:233-238 takes x = batch[0])
        pred, target = y_b[0:1], y_b[0:1]

    if chunk is None:
        chunk = auto_chunk(samples, int(target.shape[1]))
    draws = sample_chunked(model, variables, pred, rng, samples=samples, chunk=chunk)
    stats = jax.device_get(error_statistics(draws, target))
    mmse = float(stats["mmse"])
    print(f"MMSE: {mmse:.4f}")

    _plot_error_maps(results_dir, pred, target, draws, stats)
    if isinstance(model, (CondSRVAE, SRVAE)):
        gen_method = SRVAE.generation if isinstance(model, SRVAE) else CondSRVAE.generation
        y_gen, x_gen = jax.jit(
            lambda v, r: model.apply(v, r, method=gen_method)
        )(variables, jax.random.fold_in(rng, 99))
        _plot_generation(results_dir, jax.device_get(y_gen), jax.device_get(x_gen))
    return {"mmse": mmse, "results_dir": results_dir}


def _plot_error_maps(results_dir, pred, target, draws, stats) -> None:
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    target_np = np.asarray(jax.device_get(target))
    sample0 = np.asarray(jax.device_get(draws[0:1]))

    plt.figure(figsize=(20, 10))
    plt.subplot(2, 4, 1)
    plt.imshow(_rgb(np.asarray(jax.device_get(pred))[0]))
    plt.title("Input Image")
    plt.subplot(2, 4, 2)
    plt.imshow(_rgb(sample0[0]))
    plt.title("Sampled Image")
    plt.subplot(2, 4, 3)
    plt.imshow(_rgb(target_np[0]))
    plt.title("Ground Truth Image")
    plt.subplot(2, 4, 4)
    plt.imshow(_rgb(stats["mean"]))
    plt.title("Mean of Samples")
    plt.subplot(2, 4, 5)
    plt.imshow(stats["mae"], cmap="hot")
    plt.colorbar()
    plt.title("MAE Map")
    plt.subplot(2, 4, 6)
    plt.imshow(stats["mse"], cmap="hot")
    plt.colorbar()
    plt.title("MSE Map")
    plt.subplot(2, 4, 7)
    plt.imshow(stats["std"], cmap="hot")
    plt.colorbar()
    plt.title(f"STD of Samples, Mean: {stats['std'].mean():.2f}")
    plt.subplot(2, 4, 8)
    plt.imshow(stats["mean_bias"], cmap="hot")
    plt.colorbar()
    plt.title(f"Mean Bias Map, Mean: {stats['mean_bias'].mean():.2f}")
    plt.savefig(f"{results_dir}/error_mean_std_maps.png", bbox_inches="tight")
    plt.close()


def _plot_generation(results_dir, y_gen, x_gen) -> None:
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    plt.figure(figsize=(10, 10))
    plt.subplot(2, 1, 1)
    plt.imshow(_rgb(np.asarray(y_gen)[0]))
    plt.title("Generated Image")
    plt.subplot(2, 1, 2)
    plt.imshow(_rgb(np.asarray(x_gen)[0]))
    plt.title("Generated Image from x")
    plt.savefig(f"{results_dir}/generated_image.png", bbox_inches="tight")
    plt.close()
