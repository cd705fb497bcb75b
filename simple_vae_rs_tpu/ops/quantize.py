"""Int8 weight quantization with Pallas stochastic rounding.

Serving-path weight quantization (beyond-parity: the reference
``/root/reference`` has no quantization story at all; its inference runs the
full fp32 decoder). On a v5e the MXU runs int8 at 2x the bf16 rate (394 TOPS
vs 197 TFLOP/s) and int8 weights halve the weight-side HBM traffic — the two
effects that matter for, respectively, the compute-bound batched and the
latency-bound small-batch serving regimes.

Scheme: symmetric per-output-channel int8. For a conv kernel ``(kh, kw, C,
O)`` each output channel o gets ``scale[o] = absmax(w[..., o]) / 127`` and
``q = stochastic_round(w / scale)``; dequantized weights are ``q * scale``.
Stochastic rounding (the guide's quantization pattern) keeps the quantizer
unbiased — E[q]*scale == w — so channel statistics survive quantization,
which round-to-nearest does not guarantee for the near-tie mass.

Two implementations, one contract:

- :func:`quantize_stochastic` — Pallas TPU kernel (`pltpu.prng_seed` +
  `pltpu.prng_random_bits`, explicit floor+Bernoulli carry — the built-in
  `pltpu.stochastic_round` only targets float dtypes), row-tiled over a 2D
  view of the tensor. TPU only (the TPU PRNG primitives have no CPU
  lowering).
- :func:`quantize_stochastic_ref` — pure-JAX emulation of the same math
  (floor + Bernoulli(frac) carry) driven by ``jax.random``; runs anywhere
  and is the CPU-test oracle for the *distributional* contract (unbiased,
  |err| < 1 ulp). Bitwise equality across the two is neither possible nor
  required — the PRNGs differ.

Weight quantization runs once at model load (see ``serve.SuperResolver``),
never in a hot loop.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pragma: no cover - import guard mirrors ops/pallas_conv.py
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAVE_PLTPU = False

Array = jnp.ndarray

_QMAX = 127.0


def channel_scales(w: Array) -> Array:
    """Per-output-channel symmetric scales: absmax over all but the last axis.

    A zero channel gets scale 1 (its quantized values are all zero anyway),
    keeping the dequant multiply well-defined.
    """
    red = tuple(range(w.ndim - 1))
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=red)
    return jnp.where(amax > 0, amax / _QMAX, 1.0)


# ------------------------------------------------------------- Pallas kernel
def _quant_kernel(x_ref, seed_ref, out_ref):
    # one seed per grid row-block: uncorrelated streams across programs
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
    # pltpu.stochastic_round only targets float dtypes (bf16/f8), so the
    # int8 rounding is explicit: floor + Bernoulli(frac) carry, with the
    # uniform built by the exponent trick (mantissa bits into [1, 2) - 1)
    mant = jax.lax.shift_right_logical(bits, jnp.uint32(9)) | jnp.uint32(
        0x3F800000
    )
    u = pltpu.bitcast(mant, jnp.float32) - 1.0
    x = x_ref[...]
    lo = jnp.floor(x)
    q = lo + (u < (x - lo)).astype(jnp.float32)
    out_ref[...] = jnp.clip(q, -_QMAX, _QMAX).astype(jnp.int8)


def _rows_2d(w: Array) -> Tuple[Array, int, int]:
    o = w.shape[-1]
    m = w.size // o
    return w.reshape(m, o), m, o


@partial(jax.jit, static_argnames=("block",))
def _quantize_tpu(w2: Array, scale: Array, seed: Array, block: int) -> Array:
    m, o = w2.shape
    pad = (-m) % block
    x = jnp.pad(w2 / scale, ((0, pad), (0, 0)))
    q = pl.pallas_call(
        _quant_kernel,
        grid=((m + pad) // block,),
        in_specs=[
            pl.BlockSpec((block, o), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block, o), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m + pad, o), jnp.int8),
    )(x.astype(jnp.float32), seed)
    return q[:m]


def quantize_stochastic(w: Array, key: jax.Array) -> Tuple[Array, Array]:
    """Quantize ``w`` to (int8 values, f32 per-last-axis scales).

    Pallas stochastic-round kernel on TPU; transparently falls back to the
    pure-JAX emulation elsewhere (identical contract, different stream).
    """
    if not _HAVE_PLTPU or jax.default_backend() != "tpu":
        return quantize_stochastic_ref(w, key)
    scale = channel_scales(w)
    w2, m, o = _rows_2d(w)
    # row-blocks sized to keep a (block, O) f32 tile well under VMEM
    block = max(8, min(1024, (2 * 1024 * 1024) // max(1, o * 4) // 8 * 8))
    # fold ALL key words into the kernel seed: a legacy PRNGKey(s) stores
    # (0, s) for s < 2^32, so taking only the first word would hand every
    # seed the identical stream
    words = jnp.asarray(jax.random.key_data(key)).ravel().astype(jnp.uint32)
    seed = jnp.bitwise_xor.reduce(
        words * jnp.uint32(0x9E3779B9) + jnp.arange(words.size, dtype=jnp.uint32)
    )[None].astype(jnp.int32)
    q = _quantize_tpu(w2, scale, seed, block)
    return q.reshape(w.shape), scale


# ------------------------------------------------------------ JAX reference
def quantize_stochastic_ref(w: Array, key: jax.Array) -> Tuple[Array, Array]:
    """Pure-JAX stochastic rounding: floor(x) + Bernoulli(frac(x)).

    Same distributional contract as the Pallas kernel (unbiased, error
    < 1 ulp of the int grid); runs on any backend.
    """
    scale = channel_scales(w)
    x = w.astype(jnp.float32) / scale
    lo = jnp.floor(x)
    u = jax.random.uniform(key, x.shape, jnp.float32)
    q = lo + (u < (x - lo)).astype(jnp.float32)
    q = jnp.clip(q, -_QMAX, _QMAX)
    return q.astype(jnp.int8), scale


def quantize_rtn(w: Array) -> Tuple[Array, Array]:
    """Deterministic round-to-nearest variant (no RNG; CI-stable goldens)."""
    scale = channel_scales(w)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -_QMAX, _QMAX)
    return q.astype(jnp.int8), scale


def dequantize(q: Array, scale: Array, dtype=jnp.float32) -> Array:
    """q * scale along the last axis."""
    return (q.astype(jnp.float32) * scale).astype(dtype)


# -------------------------------------------------------- model-tree builder
# Decoder submodule prefixes across the model zoo (matched against any path
# component, so SRVAE's nested ``core/dx_*`` scopes are covered):
# VAE ``dec_*`` (models/vae.py:68-73), CondSRVAE ``dx_*``/``dy_*``
# (models/cond_vae.py:86-109).
DECODER_PREFIXES = ("dec_", "dx_", "dy_")


def quantize_params_tree(
    params,
    key: jax.Array,
    prefixes: Tuple[str, ...] = DECODER_PREFIXES,
):
    """Build a ``quant`` variable collection mirroring ``params``.

    Every rank-4 ``kernel`` whose path crosses a module named with one of
    ``prefixes`` becomes ``{kernel_q: int8, kernel_s: (O,) f32}`` at the
    same path; everything else is omitted. The result plugs into
    ``model.apply({"params": ..., "quant": ...})`` — the conv blocks route
    through the W8A8 kernels exactly where their scope carries quant
    variables (presence of the collection IS the switch; there is no
    process-wide state, so int8 and f32 models coexist in one process).

    Per-leaf RNG streams are derived by folding a stable path hash into
    ``key``, so quantization is reproducible for a given (params, key).
    """
    import zlib

    def walk(node, path):
        out = {}
        for name, child in node.items():
            p = path + (name,)
            if isinstance(child, dict):
                sub = walk(child, p)
                if sub:
                    out[name] = sub
            elif (
                name == "kernel"
                and getattr(child, "ndim", 0) == 4
                and any(
                    comp.startswith(pref)
                    for comp in p
                    for pref in prefixes
                )
            ):
                leaf_key = jax.random.fold_in(
                    key, zlib.crc32("/".join(p).encode())
                )
                q, s = quantize_stochastic(child, leaf_key)
                out["kernel_q"] = q
                out["kernel_s"] = s
        return out

    return walk(params, ())


# ------------------------------------------------- weights-only int8 pack
def pack_int8_weights(variables):
    """Quantize the big floating kernels to int8 + per-output-channel f32
    scales — ``export.py``'s artifact formulation (``_pack_variables``),
    reused verbatim — returning a jit-traversable payload plus a hashable
    static spec ``(tags, treedef)``. The serving layer (``serve.py``) and
    the chunked-draw decoder (``tasks.sample_chunked``) pass the payload
    where the variables tree would go and the spec as a static jit arg;
    :func:`unpack_weights` rebuilds the f32 tree IN-TRACE, so the weights
    cross HBM quarter-size and widen in-core (98.3 dB vs f32 —
    BASELINE.md round-5 paired window)."""
    from simple_vae_rs_tpu.export import _pack_variables

    packed, treedef = _pack_variables(variables, "int8")
    tags = tuple(e[0] for e in packed)
    payload = tuple(
        (e[1], e[2]) if e[0] == "int8" else e[1] for e in packed
    )
    return payload, (tags, treedef)


def unpack_weights(variables, pack_spec):
    """In-trace inverse of :func:`pack_int8_weights`; identity when no
    spec rides the call (the plain f32 path)."""
    if pack_spec is None:
        return variables
    tags, treedef = pack_spec
    leaves = []
    for tag, ent in zip(tags, variables):
        if tag == "int8":
            q, s = ent
            leaves.append(q.astype(jnp.float32) * s)
        else:
            leaves.append(jnp.asarray(ent))
    return jax.tree_util.tree_unflatten(treedef, leaves)
