"""Pallas W8A8 int8 fused conv kernels for the serving path.

Int8 variants of the three fused block kernels in ``ops/pallas_conv.py``
(conv3x3/s1, conv4x4/s2/p1, convT4x4/s2/p1 — the only conv shapes the
models use, reference ``models/layers.py:217-297``). Weights arrive
pre-quantized (int8 values + per-output-channel f32 scales, see
``ops/quantize.py``); activations are quantized *inside* the kernel with a
dynamic per-tile symmetric scale, so the whole W8A8 pipeline —

    absmax -> quantize acts -> int8 MXU matmuls (int32 accum)
    -> dequant -> folded-BN affine -> ReLU

— is one HBM round trip. Why int8: the v5e MXU runs int8 at 2x the bf16
rate (394 TOPS vs 197 TFLOP/s) and int8 weights are half the HBM bytes of
bf16 — the compute- and bandwidth-bound wins respectively.

Eval/serving only (no VJP): quantized weights are frozen artifacts built at
model-load time (``serve.SuperResolver(int8=True)``); training never sees
this path. Numerical contract: kernels match the f32 reference computed on
*dequantized* weights + the same per-tile act quantization
(``int8_reference3`` etc.) to float tolerance; quantization *error* vs the
float model is a measured quality number (tests/test_int8.py,
BASELINE.md), not a kernel property.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from simple_vae_rs_tpu.ops.pallas_conv import (
    _HAVE_PLTPU,
    _VMEM,
    _VMEM_BUDGET,
    _batch_tile,
    _rnd,
    _T_TAPS,
    strip_rows,
)

try:  # SMEM for the global activation scale of the strip-tiled kernel
    from jax.experimental.pallas import tpu as _pltpu

    _SMEM = _pltpu.SMEM
except ImportError:  # pragma: no cover
    _SMEM = None

import os as _os

Array = jnp.ndarray

_QMAX = 127.0

# Measured-off by default (0.32-0.37x of XLA at the 64px tail shapes on
# v5e, 2026-08-17 — see the strip-tiling section below).
_STRIPS_ENABLED = _os.environ.get("SVRS_INT8_STRIPS", "0") == "1"

# Multi-chip note: meshed serving runs these kernels per-shard under
# ``jax.shard_map`` (serve._sr_call / tasks._sharded_decode), so no
# topology-based force-off exists — GSPMD never sees the custom call.


# ----------------------------------------------------------- in-kernel quant
def _quant_act(x):
    """Symmetric per-tile activation quantization: f32 tile -> (int8, scale)."""
    amax = jnp.max(jnp.abs(x))
    a_scale = jnp.maximum(amax / _QMAX, 1e-12)
    q = jnp.clip(jnp.round(x / a_scale), -_QMAX, _QMAX).astype(jnp.int8)
    return q, a_scale


def _tile_bytes_int8(h, w, c, o, ho=None, wo=None, out_mult=1, itemsize=4):
    """Conservative per-image VMEM bytes (padded-tile accounting like
    ``pallas_conv._tile_bytes``): f32 input copy + int8 quantized copy +
    int32 accumulator (x4 live temporaries) + int8 patch + output."""
    ho = h if ho is None else ho
    wo = w if wo is None else wo
    xin = (h + 2) * _rnd(w + 2, 32 // itemsize) * _rnd(c, 128) * itemsize
    xq = (h + 2) * _rnd(w + 2, 32) * _rnd(c, 128)
    acc = _rnd(ho * wo, 8) * _rnd(o, 128) * 4
    patch = _rnd(ho * wo, 32) * _rnd(c, 128)
    out = ho * _rnd(wo, 32 // itemsize) * _rnd(o * out_mult, 128) * itemsize
    return 2 * xin + xq + 4 * acc + patch + 2 * out


def _wbytes(taps: int, c: int, o: int) -> int:
    return taps * _rnd(c, 32) * _rnd(o, 128) + _rnd(o, 128) * 4 * 3


# --------------------------------------------------------------- 3x3 stride 1
def _kernel3_int8(bt, h, w, relu):
    def body(xp_ref, w_ref, ws_ref, s_ref, t_ref, out_ref):
        o = w_ref.shape[-1]
        qx, a_scale = _quant_act(xp_ref[...].astype(jnp.float32))
        acc = jnp.zeros((bt * h * w, o), jnp.int32)
        for dy in range(3):
            for dx in range(3):
                patch = qx[:, dy : dy + h, dx : dx + w, :].reshape(
                    bt * h * w, -1
                )
                acc += jnp.dot(
                    patch, w_ref[dy, dx], preferred_element_type=jnp.int32
                )
        out = acc.astype(jnp.float32) * (a_scale * ws_ref[...] * s_ref[...])
        out = out + t_ref[...]
        if relu:
            out = jnp.maximum(out, 0.0)
        out_ref[...] = out.reshape(bt, h, w, -1).astype(out_ref.dtype)

    return body


def fits_vmem3_int8(h, w, c, o, itemsize: int = 4) -> bool:
    return (
        _tile_bytes_int8(h, w, c, o, itemsize=itemsize) + _wbytes(9, c, o)
        < _VMEM_BUDGET
    )


# ------------------------------------------------- 3x3 spatial strip tiling
# The 64px decoder-tail convs (dx_conv1-4 at cr=1.2/ps=64) exceed the
# full-image VMEM tile. This strip variant (halo'd row strips, global
# activation scale in SMEM, numerics exactly ``int8_reference3``'s) makes
# the fused kernel *available* there — but the 2026-08-17 v5e measurement
# (scripts/bench_int8_kernels.py, BASELINE.md) recorded it 0.32-0.37x of
# XLA at those shapes: the tail is ACTIVATION-bandwidth-bound (weights are
# tiny, so W8 halves nothing that matters) and the strip overlap + small
# lane counts (O=16/64) cost more than the fusion saves. Default routing
# therefore stays on the XLA reference path; set ``SVRS_INT8_STRIPS=1``
# to re-enable for other shape regimes. The real tail lever is the fused
# linear-chain kernel in ``pallas_conv.fused_conv3x3_chain``.
def _strip3_rows(h, w, c, o, itemsize: int) -> int:
    """Largest strip height whose tile fits (policy: pallas_conv.strip_rows)."""
    return strip_rows(
        h,
        lambda th: _tile_bytes_int8(th, w, c, o, itemsize=itemsize)
        + _wbytes(9, c, o)
        < _VMEM_BUDGET,
    )


def _kernel3_int8_strip(bt, th, w, relu):
    def body(xs_ref, w_ref, ws_ref, s_ref, t_ref, a_ref, out_ref):
        o = w_ref.shape[-1]
        a_scale = a_ref[0]
        x = xs_ref[...].astype(jnp.float32)  # (bt, 1, th+2, w+2, c)
        qx = jnp.clip(jnp.round(x / a_scale), -_QMAX, _QMAX).astype(jnp.int8)
        acc = jnp.zeros((bt * th * w, o), jnp.int32)
        for dy in range(3):
            for dx in range(3):
                patch = qx[:, 0, dy : dy + th, dx : dx + w, :].reshape(
                    bt * th * w, -1
                )
                acc += jnp.dot(
                    patch, w_ref[dy, dx], preferred_element_type=jnp.int32
                )
        out = acc.astype(jnp.float32) * (a_scale * ws_ref[...] * s_ref[...])
        out = out + t_ref[...]
        if relu:
            out = jnp.maximum(out, 0.0)
        out_ref[...] = out.reshape(bt, 1, th, w, -1).astype(out_ref.dtype)

    return body


def _int8_conv3x3_strips(
    x, kernel_q, kernel_s, scale, shift, relu, th, interpret
):
    b, h, w, c = x.shape
    o = kernel_q.shape[-1]
    itemsize = jnp.dtype(x.dtype).itemsize
    ns = h // th
    xf = x.astype(jnp.float32)
    a_scale = jnp.maximum(
        jnp.max(jnp.abs(xf)) / _QMAX, 1e-12
    ).reshape(1)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xs = jnp.stack(
        [xp[:, j * th : j * th + th + 2] for j in range(ns)], axis=1
    )  # (b, ns, th+2, w+2, c)
    per = _tile_bytes_int8(th, w, c, o, itemsize=itemsize)
    bt = _batch_tile(b, per, _wbytes(9, c, o))
    out5 = pl.pallas_call(
        _kernel3_int8_strip(bt, th, w, relu),
        grid=(b // bt, ns),
        in_specs=[
            pl.BlockSpec((bt, 1, th + 2, w + 2, c),
                         lambda i, j: (i, j, 0, 0, 0), memory_space=_VMEM),
            pl.BlockSpec((3, 3, c, o), lambda i, j: (0, 0, 0, 0),
                         memory_space=_VMEM),
            pl.BlockSpec((o,), lambda i, j: (0,), memory_space=_VMEM),
            pl.BlockSpec((o,), lambda i, j: (0,), memory_space=_VMEM),
            pl.BlockSpec((o,), lambda i, j: (0,), memory_space=_VMEM),
            pl.BlockSpec(memory_space=_SMEM),
        ],
        out_specs=pl.BlockSpec((bt, 1, th, w, o),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ns, th, w, o), x.dtype),
        interpret=interpret,
    )(
        xs,
        kernel_q,
        kernel_s.astype(jnp.float32),
        scale.astype(jnp.float32),
        shift.astype(jnp.float32),
        a_scale,
    )
    return out5.reshape(b, h, w, o)


@partial(jax.jit, static_argnames=("relu", "interpret"))
def int8_conv3x3_bn_relu(
    x: Array,
    kernel_q: Array,
    kernel_s: Array,
    scale: Array,
    shift: Array,
    relu: bool = True,
    interpret: bool = False,
) -> Array:
    """y = act(conv3x3_int8(x) * scale + shift) in one W8A8 kernel.

    - ``x``: (B, H, W, C) float; quantized per program tile inside.
    - ``kernel_q``/``kernel_s``: (3, 3, C, O) int8 + (O,) f32 from
      :func:`ops.quantize.quantize_stochastic`.
    - ``scale``/``shift``: the folded pointwise tail (bias or eval-BN).
    """
    b, h, w, c = x.shape
    o = kernel_q.shape[-1]
    itemsize = jnp.dtype(x.dtype).itemsize
    if not _HAVE_PLTPU or (not interpret and jax.default_backend() != "tpu"):
        return int8_reference3(x, kernel_q, kernel_s, scale, shift, relu)
    if not fits_vmem3_int8(h, w, c, o, itemsize):
        th = _strip3_rows(h, w, c, o, itemsize) if _STRIPS_ENABLED else 0
        if th:
            return _int8_conv3x3_strips(
                x, kernel_q, kernel_s, scale, shift, relu, th, interpret
            )
        return int8_reference3(x, kernel_q, kernel_s, scale, shift, relu)

    per = _tile_bytes_int8(h, w, c, o, itemsize=itemsize)
    bt = _batch_tile(b, per, _wbytes(9, c, o))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return pl.pallas_call(
        _kernel3_int8(bt, h, w, relu),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, h + 2, w + 2, c), lambda i: (i, 0, 0, 0),
                         memory_space=_VMEM),
            pl.BlockSpec((3, 3, c, o), lambda i: (0, 0, 0, 0),
                         memory_space=_VMEM),
            pl.BlockSpec((o,), lambda i: (0,), memory_space=_VMEM),
            pl.BlockSpec((o,), lambda i: (0,), memory_space=_VMEM),
            pl.BlockSpec((o,), lambda i: (0,), memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec((bt, h, w, o), lambda i: (i, 0, 0, 0),
                               memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, o), x.dtype),
        interpret=interpret,
    )(
        xp,
        kernel_q,
        kernel_s.astype(jnp.float32),
        scale.astype(jnp.float32),
        shift.astype(jnp.float32),
    )


def _act_quant_host(x):
    """The kernels' per-tile act quantization, as plain JAX (reference path).

    Matches the single-program case (bt == b); with multiple batch tiles the
    Pallas kernel's per-tile scales can only be *finer* than this global one.
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    a_scale = jnp.maximum(amax / _QMAX, 1e-12)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / a_scale), -_QMAX, _QMAX)
    return q, a_scale


def int8_reference3(x, kernel_q, kernel_s, scale, shift, relu):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    qx, a_scale = _act_quant_host(xp)
    out = jax.lax.conv_general_dilated(
        qx, kernel_q.astype(jnp.float32), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    out = out * (a_scale * kernel_s * scale) + shift
    return (jnp.maximum(out, 0.0) if relu else out).astype(x.dtype)


# --------------------------------------------------------------- 4x4 stride 2
def _kernel4_int8(bt, ho, wo, relu):
    def body(ph_ref, w_ref, ws_ref, s_ref, t_ref, out_ref):
        o = w_ref.shape[-1]
        qx, a_scale = _quant_act(ph_ref[...].astype(jnp.float32))
        acc = jnp.zeros((bt * ho * wo, o), jnp.int32)
        for dy in range(4):
            for dx in range(4):
                r, a0 = dy % 2, dy // 2
                s0, b0 = dx % 2, dx // 2
                patch = qx[
                    :, r, s0, a0 : a0 + ho, b0 : b0 + wo, :
                ].reshape(bt * ho * wo, -1)
                acc += jnp.dot(
                    patch, w_ref[dy, dx], preferred_element_type=jnp.int32
                )
        out = acc.astype(jnp.float32) * (a_scale * ws_ref[...] * s_ref[...])
        out = out + t_ref[...]
        if relu:
            out = jnp.maximum(out, 0.0)
        out_ref[...] = out.reshape(bt, ho, wo, -1).astype(out_ref.dtype)

    return body


def fits_vmem4_int8(h, w, c, o, itemsize: int = 4) -> bool:
    per = _tile_bytes_int8(h, w, c, o, ho=h // 2, wo=w // 2, itemsize=itemsize)
    return h % 2 == 0 and w % 2 == 0 and per + _wbytes(16, c, o) < _VMEM_BUDGET


@partial(jax.jit, static_argnames=("relu", "interpret"))
def int8_conv4x4s2_bn_relu(
    x: Array,
    kernel_q: Array,
    kernel_s: Array,
    scale: Array,
    shift: Array,
    relu: bool = True,
    interpret: bool = False,
) -> Array:
    """W8A8 DownBlock tail: act(conv4x4/s2/p1 * scale + shift) fused.

    Same stride-2 phase decomposition as the f32 kernel
    (``pallas_conv.fused_conv4x4s2_bn_relu``): 16 contiguous-slice int8
    matmuls over the four phase planes.
    """
    b, h, w, c = x.shape
    o = kernel_q.shape[-1]
    itemsize = jnp.dtype(x.dtype).itemsize
    if not _HAVE_PLTPU or (not interpret and jax.default_backend() != "tpu"):
        return int8_reference4(x, kernel_q, kernel_s, scale, shift, relu)
    if not fits_vmem4_int8(h, w, c, o, itemsize):
        return int8_reference4(x, kernel_q, kernel_s, scale, shift, relu)

    ho, wo = h // 2, w // 2
    hp, wp = (h + 2) // 2, (w + 2) // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ph = xp.reshape(b, hp, 2, wp, 2, c).transpose(0, 2, 4, 1, 3, 5)
    per = _tile_bytes_int8(h, w, c, o, ho=ho, wo=wo, itemsize=itemsize)
    bt = _batch_tile(b, per, _wbytes(16, c, o))
    return pl.pallas_call(
        _kernel4_int8(bt, ho, wo, relu),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, 2, 2, hp, wp, c), lambda i: (i, 0, 0, 0, 0, 0),
                         memory_space=_VMEM),
            pl.BlockSpec((4, 4, c, o), lambda i: (0, 0, 0, 0),
                         memory_space=_VMEM),
            pl.BlockSpec((o,), lambda i: (0,), memory_space=_VMEM),
            pl.BlockSpec((o,), lambda i: (0,), memory_space=_VMEM),
            pl.BlockSpec((o,), lambda i: (0,), memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec((bt, ho, wo, o), lambda i: (i, 0, 0, 0),
                               memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ho, wo, o), x.dtype),
        interpret=interpret,
    )(
        ph,
        kernel_q,
        kernel_s.astype(jnp.float32),
        scale.astype(jnp.float32),
        shift.astype(jnp.float32),
    )


def int8_reference4(x, kernel_q, kernel_s, scale, shift, relu):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    qx, a_scale = _act_quant_host(xp)
    out = jax.lax.conv_general_dilated(
        qx, kernel_q.astype(jnp.float32), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    out = out * (a_scale * kernel_s * scale) + shift
    return (jnp.maximum(out, 0.0) if relu else out).astype(x.dtype)


# ------------------------------------------------------------ convT 4x4 s2 p1
def _kernelT_int8(bt, h, w, relu):
    def body(xq_ref, w_ref, ws_ref, s_ref, t_ref, out_ref):
        o = w_ref.shape[-1]
        qx, a_scale = _quant_act(xq_ref[...].astype(jnp.float32))
        outs = []
        # all four output phases in one program: qx is a materialized VMEM
        # value, so every slice must be static (Mosaic has no dynamic_slice
        # on values — the f32 kernel's traced row-phase trick is ref-only)
        for u in (0, 1):
            for v in (0, 1):
                acc = jnp.zeros((bt * h * w, o), jnp.int32)
                for a0, dy in _T_TAPS[u]:
                    for b0, dx in _T_TAPS[v]:
                        patch = qx[
                            :, a0 : a0 + h, b0 : b0 + w, :
                        ].reshape(bt * h * w, -1)
                        acc += jnp.dot(
                            patch,
                            w_ref[dy, dx],
                            preferred_element_type=jnp.int32,
                        )
                out = acc.astype(jnp.float32) * (
                    a_scale * ws_ref[...] * s_ref[...]
                )
                out = out + t_ref[...]
                if relu:
                    out = jnp.maximum(out, 0.0)
                outs.append(out.reshape(bt, h, w, o))
        # pack phases into the trailing dims: index (u, v*o + c); the
        # (bt, h, 2, w, 2, o) -> (bt, 2h, 2w, o) interleave is a free
        # row-major reshape outside the kernel
        packed = jnp.stack(
            [jnp.concatenate(outs[:2], -1), jnp.concatenate(outs[2:], -1)],
            axis=2,
        )
        out_ref[...] = packed.astype(out_ref.dtype)

    return body


def fits_vmemT_int8(h, w, c, o, itemsize: int = 4) -> bool:
    per = _tile_bytes_int8(h, w, c, o, out_mult=4, itemsize=itemsize)
    return per + _wbytes(16, c, o) < _VMEM_BUDGET


@partial(jax.jit, static_argnames=("relu", "interpret"))
def int8_convT4x4s2_bn_relu(
    x: Array,
    kernel_q: Array,
    kernel_s: Array,
    scale: Array,
    shift: Array,
    relu: bool = True,
    interpret: bool = False,
) -> Array:
    """W8A8 UpBlock tail: act(convT4x4/s2/p1 * scale + shift) fused.

    Same phase/tap scheme as ``pallas_conv.fused_convT4x4s2_bn_relu``
    (kernel in the input-dilated-conv parametrization, 4 non-zero taps per
    output phase, 16 int8 matmuls total); output (B, 2H, 2W, O).
    """
    b, h, w, c = x.shape
    o = kernel_q.shape[-1]
    itemsize = jnp.dtype(x.dtype).itemsize
    if not _HAVE_PLTPU or (not interpret and jax.default_backend() != "tpu"):
        return int8_referenceT(x, kernel_q, kernel_s, scale, shift, relu)
    if not fits_vmemT_int8(h, w, c, o, itemsize):
        return int8_referenceT(x, kernel_q, kernel_s, scale, shift, relu)

    xq = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    per = _tile_bytes_int8(h, w, c, o, out_mult=4, itemsize=itemsize)
    bt = _batch_tile(b, per, _wbytes(16, c, o))
    out6 = pl.pallas_call(
        _kernelT_int8(bt, h, w, relu),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, h + 2, w + 2, c), lambda i: (i, 0, 0, 0),
                         memory_space=_VMEM),
            pl.BlockSpec((4, 4, c, o), lambda i: (0, 0, 0, 0),
                         memory_space=_VMEM),
            pl.BlockSpec((o,), lambda i: (0,), memory_space=_VMEM),
            pl.BlockSpec((o,), lambda i: (0,), memory_space=_VMEM),
            pl.BlockSpec((o,), lambda i: (0,), memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bt, h, 2, w, 2 * o), lambda i: (i, 0, 0, 0, 0),
            memory_space=_VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, 2, w, 2 * o), x.dtype),
        interpret=interpret,
    )(
        xq,
        kernel_q,
        kernel_s.astype(jnp.float32),
        scale.astype(jnp.float32),
        shift.astype(jnp.float32),
    )
    return out6.reshape(b, 2 * h, 2 * w, o)


def int8_referenceT(x, kernel_q, kernel_s, scale, shift, relu):
    xq = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    q, a_scale = _act_quant_host(xq)
    # undo the outer pad: lhs_dilation path below re-pads with k-1-p = 2
    q = q[:, 1:-1, 1:-1, :]
    out = jax.lax.conv_general_dilated(
        q, kernel_q.astype(jnp.float32), (1, 1), [(2, 2), (2, 2)],
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    out = out * (a_scale * kernel_s * scale) + shift
    return (jnp.maximum(out, 0.0) if relu else out).astype(x.dtype)
