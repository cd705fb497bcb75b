"""Pallas-fused conv + bias/BN + ReLU block kernels.

The north-star block kernels (BASELINE.json: "conv encoder/decoder stacks
backed by Pallas-fused conv+norm+activation blocks"). Every conv shape the
Down/Up blocks use (reference ``models/layers.py:217-297``) has a fused
kernel here, each expressed the MXU-native way — shifted (rows, C) x (C, O)
matmuls accumulated in VMEM f32 — with the whole pointwise tail (bias,
folded eval-BatchNorm affine, ReLU) fused into the same kernel, so one HBM
round trip covers what torch runs as 3-4 kernels:

- :func:`fused_conv3x3_bn_relu` — 3x3/s1 SAME conv: nine shifted matmuls.
- :func:`fused_conv4x4s2_bn_relu` — 4x4/s2/p1 conv (DownBlock tail):
  the padded input is split into its four stride-2 phases *outside* the
  kernel (one XLA copy), turning the strided conv into sixteen
  contiguous-slice matmuls — no strided VMEM loads.
- :func:`fused_convT4x4s2_bn_relu` — convT 4x4/s2/p1 (UpBlock tail) in the
  input-dilated-conv parametrization the models store
  (``ops/conv_blocks.py:torch_conv_transpose``): each of the four *output*
  phases needs only 4 of the 16 taps (the rest hit dilation zeros), so the
  kernel does 16 matmuls total and interleaves the phases in VMEM —
  zero wasted FLOPs vs the 4x redundancy of materializing the dilated input.

Grids are batch-tiled: each program owns the largest image-tile count that
fits the VMEM budget (``_batch_tile``), so large training batches amortize
grid/dispatch overhead instead of paying one program per image.

Training: the custom VJP saves the kernel *output* as a residual and
computes the backward analytically — mask from the saved output, scale/shift
grads from reductions, and the two transposed convs via
``jax.linear_transpose`` (no forward replay; round-1 version re-ran the
whole forward inside the backward).

VMEM budget: a program holds its padded input tile, the kernel and the f32
accumulator. ``fits_vmem`` guards applicability; callers fall back to
``lax.conv`` beyond.
"""

from __future__ import annotations

import os as _os
from contextlib import contextmanager as _contextmanager
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
    _HAVE_PLTPU = True
except ImportError:  # pragma: no cover
    _VMEM = None
    _HAVE_PLTPU = False

Array = jnp.ndarray

_VMEM_BUDGET = 10 * 1024 * 1024  # conservative: ~16 MB scoped limit minus
# pipeline double-buffers and Mosaic stack temporaries (validated on v5e:
# the estimate below stays ~1.3x under the compiler-reported peak)


def _rnd(x: int, m: int) -> int:
    return -(-x // m) * m


def _tile_bytes(h: int, w: int, c: int, o: int, itemsize: int,
                ho: Optional[int] = None, wo: Optional[int] = None,
                out_mult: int = 1) -> int:
    """Conservative per-image VMEM bytes for one program.

    All buffers are counted in *padded tiles*: the lane (last) dim rounds
    up to 128 and the sublane (second-to-last) dim to 32/itemsize — a
    4-channel array really occupies 128 lanes of VMEM. Counts the padded
    input and output blocks twice (Pallas double-buffers pipelined blocks),
    four f32 accumulator-sized temporaries (acc + affine/relu/astype
    intermediates the Mosaic stack keeps live), and one materialized patch
    slice.
    """
    ho = h if ho is None else ho
    wo = w if wo is None else wo
    sub = 32 // itemsize
    xp = (h + 2) * _rnd(w + 2, sub) * _rnd(c, 128) * itemsize
    acc = _rnd(ho * wo, 8) * _rnd(o, 128) * 4
    patch = _rnd(ho * wo, sub) * _rnd(c, 128) * itemsize
    out = ho * _rnd(wo, sub) * _rnd(o * out_mult, 128) * itemsize
    return 2 * xp + 4 * acc + patch + 2 * out


def fits_vmem(h: int, w: int, c: int, o: int, itemsize: int = 4) -> bool:
    wgt = 9 * c * o * 4
    return _tile_bytes(h, w, c, o, itemsize) + wgt < _VMEM_BUDGET


def _batch_tile(b: int, per_image: int, weights: int) -> int:
    """Largest divisor of b whose tile fits the VMEM budget (>= 1)."""
    bt = 1
    for cand in (2, 4, 8, 16):
        if b % cand == 0 and cand * per_image + weights < _VMEM_BUDGET:
            bt = cand
    return bt


# --------------------------------------------------------------- 3x3 stride 1
def _kernel3(bt: int, h: int, w: int, relu: bool):
    def body(xp_ref, w_ref, scale_ref, shift_ref, out_ref):
        o = w_ref.shape[-1]
        acc = jnp.zeros((bt * h * w, o), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                patch = xp_ref[:, dy : dy + h, dx : dx + w, :].reshape(
                    bt * h * w, -1
                )
                acc += jnp.dot(
                    patch, w_ref[dy, dx], preferred_element_type=jnp.float32
                )
        out = acc * scale_ref[...] + shift_ref[...]
        if relu:
            out = jnp.maximum(out, 0.0)
        out_ref[...] = out.reshape(bt, h, w, -1).astype(out_ref.dtype)

    return body


@partial(jax.jit, static_argnames=("relu", "interpret"))
def fused_conv3x3_bn_relu(
    x: Array,
    kernel: Array,
    scale: Array,
    shift: Array,
    relu: bool = True,
    interpret: bool = False,
) -> Array:
    """y = act((conv3x3(x, kernel)) * scale + shift), one fused kernel.

    - ``x``: (B, H, W, C) — any float dtype; accumulation is f32.
    - ``kernel``: (3, 3, C, O).
    - ``scale``/``shift``: (O,) — the folded pointwise tail. For a plain
      conv+bias use scale=1, shift=bias; for eval BatchNorm see
      :func:`fold_conv_bn`.
    """
    b, h, w, c = x.shape
    o = kernel.shape[-1]
    itemsize = jnp.dtype(x.dtype).itemsize
    if not _HAVE_PLTPU or (not interpret and jax.default_backend() != "tpu"):
        return _reference3(x, kernel, scale, shift, relu)
    if not fits_vmem(h, w, c, o, itemsize):
        th = _strip3_rows(h, w, c, o, itemsize) if _STRIPS_ENABLED else 0
        if th:
            return _conv3_strips(x, kernel, scale, shift, relu, th, interpret)
        return _reference3(x, kernel, scale, shift, relu)

    wgt = 9 * c * o * 4
    bt = _batch_tile(b, _tile_bytes(h, w, c, o, itemsize), wgt)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return pl.pallas_call(
        _kernel3(bt, h, w, relu),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, h + 2, w + 2, c), lambda i: (i, 0, 0, 0),
                         memory_space=_VMEM),
            pl.BlockSpec((3, 3, c, o), lambda i: (0, 0, 0, 0), memory_space=_VMEM),
            pl.BlockSpec((o,), lambda i: (0,), memory_space=_VMEM),
            pl.BlockSpec((o,), lambda i: (0,), memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec((bt, h, w, o), lambda i: (i, 0, 0, 0),
                               memory_space=_VMEM),
        # output rides the input dtype (halves HBM write traffic for bf16);
        # the accumulation inside the kernel is f32 regardless
        out_shape=jax.ShapeDtypeStruct((b, h, w, o), x.dtype),
        interpret=interpret,
    )(xp, kernel, scale.astype(jnp.float32), shift.astype(jnp.float32))


# ------------------------------------------------- 3x3 spatial strip tiling
# Large-spatial tails (the 64px decoder convs at the canonical config)
# exceed the full-image VMEM tile; the strip variant (halo'd row strips,
# identical f32 numerics) makes the fused kernel available there. OFF by
# default: the int8 sibling measured 0.32-0.37x of XLA at those
# activation-bandwidth-bound shapes (BASELINE.md 2026-08-17), and the
# same strip-overlap cost applies here — enable with SVRS_PALLAS_STRIPS=1
# for other regimes. The tail's real win is :func:`fused_conv3x3_chain`.
_STRIPS_ENABLED = _os.environ.get("SVRS_PALLAS_STRIPS", "0") == "1"


def strip_rows(h: int, tile_fits) -> int:
    """Largest strip height (a divisor of h, >= 8) whose tile fits —
    THE strip-height policy, shared by the f32/bf16 kernels here and the
    int8 kernels (``pallas_int8``): the divisor ladder and the >= 8
    sublane floor must stay in one place so the two dispatch regions
    cannot drift apart."""
    for k in (2, 4, 8, 16):
        if h % k:
            continue
        th = h // k
        if th < 8:
            break
        if tile_fits(th):
            return th
    return 0


def _strip3_rows(h: int, w: int, c: int, o: int, itemsize: int) -> int:
    wgt = 9 * c * o * 4
    return strip_rows(
        h, lambda th: _tile_bytes(th, w, c, o, itemsize) + wgt < _VMEM_BUDGET
    )


def can_fuse3(h: int, w: int, c: int, o: int, itemsize: int = 4) -> bool:
    """Dispatch gate for the fused 3x3 kernel: full-image tile, or strips
    when the opt-in is set."""
    return fits_vmem(h, w, c, o, itemsize) or (
        _STRIPS_ENABLED and bool(_strip3_rows(h, w, c, o, itemsize))
    )


def _kernel3_strip(bt: int, th: int, w: int, relu: bool):
    def body(xs_ref, w_ref, scale_ref, shift_ref, out_ref):
        o = w_ref.shape[-1]
        acc = jnp.zeros((bt * th * w, o), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                patch = xs_ref[:, 0, dy : dy + th, dx : dx + w, :].reshape(
                    bt * th * w, -1
                )
                acc += jnp.dot(
                    patch, w_ref[dy, dx], preferred_element_type=jnp.float32
                )
        out = acc * scale_ref[...] + shift_ref[...]
        if relu:
            out = jnp.maximum(out, 0.0)
        out_ref[...] = out.reshape(bt, 1, th, w, -1).astype(out_ref.dtype)

    return body


def _conv3_strips(x, kernel, scale, shift, relu, th, interpret):
    b, h, w, c = x.shape
    o = kernel.shape[-1]
    itemsize = jnp.dtype(x.dtype).itemsize
    ns = h // th
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xs = jnp.stack(
        [xp[:, j * th : j * th + th + 2] for j in range(ns)], axis=1
    )  # (b, ns, th+2, w+2, c)
    wgt = 9 * c * o * 4
    bt = _batch_tile(b, _tile_bytes(th, w, c, o, itemsize), wgt)
    out5 = pl.pallas_call(
        _kernel3_strip(bt, th, w, relu),
        grid=(b // bt, ns),
        in_specs=[
            pl.BlockSpec((bt, 1, th + 2, w + 2, c),
                         lambda i, j: (i, j, 0, 0, 0), memory_space=_VMEM),
            pl.BlockSpec((3, 3, c, o), lambda i, j: (0, 0, 0, 0),
                         memory_space=_VMEM),
            pl.BlockSpec((o,), lambda i, j: (0,), memory_space=_VMEM),
            pl.BlockSpec((o,), lambda i, j: (0,), memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec((bt, 1, th, w, o),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ns, th, w, o), x.dtype),
        interpret=interpret,
    )(xs, kernel, scale.astype(jnp.float32), shift.astype(jnp.float32))
    return out5.reshape(b, h, w, o)


# --------------------------------------------------- fused 3x3 conv CHAIN
# The model decoders end in a LINEAR chain of 3x3/s1 convs with no
# activation between (reference ``models/cond_vae.py:131-143`` /
# ``models/vae.py:74-83``: Conv2d 64->64->16->16->4 straight into
# Sigmoid). Run separately, the chain is activation-bandwidth-bound: each
# layer round-trips its full feature map through HBM (the measured XLA
# tail at the canonical serving chunk is ~4-5 ms, BASELINE.md). This
# kernel runs the WHOLE chain on a row strip resident in VMEM: the strip
# carries an L-row halo per side (L = chain length), each layer consumes
# one halo row per side and re-pads W with zeros inside the kernel — so
# per-layer SAME zero-padding semantics are matched exactly (H image
# borders come in as outer zero padding; strip-interior halos are real
# neighbor rows, exactly what the full-image chain computes). HBM traffic
# collapses to one input read (+ halo duplication) and one final write.
# Intermediates are cast to the model dtype between layers, matching the
# per-module XLA path's inter-layer rounding.
#
# MEASURED OFF by default (2026-08-17, scripts/bench_chain.py on v5e,
# B250 64px 64->64->16->16->4): fused chain 10.8 ms vs XLA sequential
# 2.07 ms bf16 (0.19x; f32 0.15x). The tail is NOT purely
# bandwidth-bound — XLA runs the small-channel convs at ~48 effective
# TFLOPs with spatial-in-lanes layouts, while this kernel's
# channels-in-lanes matmul formulation wastes the MXU at O=16/4 (N fills
# 12.5-3% of the 128 lanes). A competitive fused chain needs a
# width-in-lanes kernel design; until then SVRS_CHAIN=1 re-enables for
# experimentation.
_CHAIN_ENABLED = _os.environ.get("SVRS_CHAIN", "0") == "1"


def chain_wanted() -> bool:
    """Model-side gate for routing eval decoder tails through the fused
    chain kernel (TPU backend + env opt-out)."""
    return _CHAIN_ENABLED and _HAVE_PLTPU and jax.default_backend() == "tpu"


def _chain_tile_bytes(th, w, chans, itemsize):
    """Conservative per-image VMEM bytes for one chain-strip program."""
    n = len(chans) - 1
    sub = 32 // itemsize
    rows = th + 2 * n
    total = 2 * rows * _rnd(w, sub) * _rnd(chans[0], 128) * itemsize  # input
    peak = 0
    for i in range(n):
        ci, co = chans[i], chans[i + 1]
        out_rows = rows - 2
        hp = rows * _rnd(w + 2, sub) * _rnd(ci, 128) * itemsize
        patch = _rnd(out_rows * w, sub) * _rnd(ci, 128) * itemsize
        acc = _rnd(out_rows * w, 8) * _rnd(co, 128) * 4
        hn = out_rows * _rnd(w, sub) * _rnd(co, 128) * itemsize
        peak = max(peak, hp + patch + 4 * acc + hn)
        rows = out_rows
    out = 2 * th * _rnd(w, sub) * _rnd(chans[-1], 128) * itemsize
    wgt = sum(
        9 * _rnd(chans[i], 32) * _rnd(chans[i + 1], 128) * 4 for i in range(n)
    )
    return total + peak + out + wgt


def _chain_strip_rows(h, w, chans, itemsize):
    """Largest strip height (a divisor of h, >= 8) whose chain tile fits."""
    for k in (1, 2, 4, 8, 16):
        if h % k:
            continue
        th = h // k
        if th < 8:
            break
        if _chain_tile_bytes(th, w, chans, itemsize) < _VMEM_BUDGET:
            return th
    return 0


def _kernel3_chain(bt, th, w, n_layers, dt, h_img):
    def body(xs_ref, *refs):
        ks = refs[:n_layers]
        bs = refs[n_layers : 2 * n_layers]
        out_ref = refs[-1]
        j = pl.program_id(1)
        base = j * th
        h_cur = xs_ref[...][:, 0]  # (bt, th + 2n, w, c0)
        rows = th + 2 * n_layers
        for i in range(n_layers):
            k = ks[i][...]
            o = k.shape[-1]
            hp = jnp.pad(h_cur, ((0, 0), (0, 0), (1, 1), (0, 0)))
            out_rows = rows - 2
            acc = jnp.zeros((bt * out_rows * w, o), jnp.float32)
            for dy in range(3):
                for dx in range(3):
                    patch = hp[:, dy : dy + out_rows, dx : dx + w, :].reshape(
                        bt * out_rows * w, -1
                    )
                    acc += jnp.dot(
                        patch, k[dy, dx], preferred_element_type=jnp.float32
                    )
            h_cur = (
                acc.reshape(bt, out_rows, w, o) + bs[i][...]
            ).astype(dt)
            if i < n_layers - 1:
                # rows outside the image must be ZERO before the next
                # layer — they stand in for its SAME zero-padding. (The
                # halo rows that ARE in-image stay: real neighbor rows,
                # exactly what the full-image chain computes there.)
                off = n_layers - i - 1  # halo rows remaining per side
                abs_r = (
                    jax.lax.broadcasted_iota(jnp.int32, (1, out_rows, 1, 1), 1)
                    + base - off
                )
                in_img = (abs_r >= 0) & (abs_r < h_img)
                h_cur = jnp.where(in_img, h_cur, jnp.zeros_like(h_cur))
            rows = out_rows
        out_ref[...] = h_cur.reshape(bt, 1, th, w, -1).astype(out_ref.dtype)

    return body


def _chain_reference(x, kernels, biases):
    h = x
    for k, b in zip(kernels, biases):
        h = (_conv(h, k.astype(h.dtype)) + b).astype(x.dtype)
    return h


# --------------------------------------------------- width-in-lanes chain
# The round-3 chain postmortem's prescribed redesign (BASELINE.md fused-
# chain entry): the failed kernel put OUTPUT CHANNELS in MXU lanes, which
# fills 12.5%/3% of the 128 lanes at O=16/4 — a 5x compute-geometry
# deficit no HBM saving recovers. This formulation transposes the problem:
# activations live as (C, rows, W) — channels in sublanes, SPATIAL WIDTH
# in lanes — and each conv tap is one matmul
#
#     (O, C) x (C, rows*W)     [einsum 'oc,crw->orw']
#
# whose lane dimension is rows*W (always full), independent of how few
# output channels the layer has. dx taps become lane rolls; the two
# wrapped columns per roll are exactly the image x-edges, where SAME
# zero-padding wants zeros anyway, so a lane mask reproduces the conv's
# padding semantics precisely. dy taps are sublane-window slices over the
# strip (halo rows as in the channels-in-lanes chain; out-of-image halo
# rows re-zeroed between layers).


def _wl_tile_bytes(th, w, chans, itemsize):
    """Per-program VMEM bytes for one width-in-lanes chain strip.

    Estimated in the layout the kernel actually stores: activations are
    FLATTENED ``(C, rows*W)`` — CHANNELS in sublanes (tile 8 for 4-byte,
    16 for 2-byte dtypes; a C=4 tail layer stores as a full 8/16-sublane
    tile, 2-4x its nominal bytes) and the row-major spatial index in
    lanes, rounded to 128 ONCE over ``rows*W`` (not per row). Weight
    blocks are ``(3, 3, Co, Ci)`` in the activation dtype: Co in
    sublanes, Ci in lanes."""

    def arr(c, n_spatial, isz):
        return _rnd(c, 8 if isz >= 4 else 16) * _rnd(n_spatial, 128) * isz

    n = len(chans) - 1
    rows = th + 2 * n
    total = 2 * arr(chans[0], rows * w, itemsize)  # input block x2
    peak = 0
    for i in range(n):
        ci, co = chans[i], chans[i + 1]
        out_rows = rows - 2
        cur = arr(ci, rows * w, itemsize)
        acc = arr(co, out_rows * w, 4)  # f32 accumulator
        rolled = arr(ci, rows * w, itemsize)
        nxt = arr(co, out_rows * w, itemsize)
        peak = max(peak, cur + 3 * rolled + 2 * acc + nxt)
        rows = out_rows
    out = 2 * arr(chans[-1], th * w, itemsize)
    wgt = sum(
        9 * arr(chans[i + 1], chans[i], itemsize) for i in range(n)
    ) + sum(arr(1, chans[i + 1], 4) for i in range(n))  # + f32 biases
    return total + peak + out + wgt


def _kernel3_chain_wl(th, w, n_layers, dt, h_img):
    # Fully-2D formulation for Mosaic friendliness: activations live
    # FLATTENED as (C, rows*W) — channels in sublanes, row-major spatial
    # in lanes. A tap (dy, dx) needs input flat index j + dy*W + (dx-1)
    # for output lane j, i.e. ONE lane roll by that shift plus an
    # aligned [:out_n] slice; lanes whose in_x wrapped a row boundary
    # are exactly the image x-edges, where SAME padding is zero — the
    # mod-W edge masks restore them. No 3-D dots, no in-kernel
    # reshapes, no misaligned slices (the remote Mosaic pipeline
    # rejected the 3-D dot_general: "unsupported shape cast").
    def body(xs_ref, *refs):
        ks = refs[:n_layers]
        bs = refs[n_layers : 2 * n_layers]
        out_ref = refs[-1]
        j = pl.program_id(1)
        base = j * th
        h_cur = xs_ref[0, 0]  # (C, rows*W)
        rows = th + 2 * n_layers
        for i in range(n_layers):
            k = ks[i][...]  # (3, 3, Co, Ci) — pre-transposed outside
            o = k.shape[-2]
            out_rows = rows - 2
            out_n = out_rows * w
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, out_n), 1)
            xmod = lane % w
            at_left = xmod == 0
            at_right = xmod == w - 1
            acc = jnp.zeros((o, out_n), jnp.float32)
            for dy in range(3):
                for dx in range(3):
                    shift = dy * w + dx - 1
                    rolled = (h_cur if shift == 0
                              else jnp.roll(h_cur, -shift, axis=-1))
                    xs = rolled[:, :out_n]
                    if dx == 0:
                        xs = jnp.where(at_left, 0, xs).astype(h_cur.dtype)
                    elif dx == 2:
                        xs = jnp.where(at_right, 0, xs).astype(h_cur.dtype)
                    kt = k[dy, dx].astype(dt)  # (Co, Ci)
                    acc += jax.lax.dot_general(
                        kt, xs, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            h_cur = (acc + bs[i][...][:, None]).astype(dt)
            if i < n_layers - 1:
                off = n_layers - i - 1
                abs_r = lane // w + base - off
                in_img = (abs_r >= 0) & (abs_r < h_img)
                h_cur = jnp.where(in_img, h_cur, 0).astype(dt)
            rows = out_rows
        out_ref[...] = h_cur[None, None].astype(out_ref.dtype)

    return body


@partial(jax.jit, static_argnames=("interpret",))
def fused_conv3x3_chain_wl(x, kernels, biases, interpret=False):
    """Width-in-lanes whole-chain kernel (SAME 3x3/s1 + bias per layer).

    Same contract as :func:`fused_conv3x3_chain` — ``x`` (B, H, W, C0)
    NHWC in, (B, H, W, C_last) out, numerically the sequential chain —
    but computed in a (C, rows, W) layout whose matmul lane dim is
    spatial, so small-output-channel layers (the decode tail's 16/4)
    stop starving the MXU. Entry/exit transposes (NHWC <-> NCHW) are
    XLA's; they are part of what the bench measures.
    """
    b, h, w, c0 = x.shape
    chans = [c0] + [int(k.shape[-1]) for k in kernels]
    n = len(kernels)
    itemsize = jnp.dtype(x.dtype).itemsize
    if not _HAVE_PLTPU or (not interpret and jax.default_backend() != "tpu"):
        return _chain_reference(x, kernels, biases)
    th = 0
    for kdiv in (1, 2, 4, 8, 16):
        if h % kdiv:
            continue
        cand = h // kdiv
        if cand < 8:
            break
        if _wl_tile_bytes(cand, w, chans, itemsize) < _VMEM_BUDGET:
            th = cand
            break
    if not th:
        return _chain_reference(x, kernels, biases)

    ns = h // th
    xc = jnp.transpose(x, (0, 3, 1, 2))  # (B, C, H, W)
    xh = jnp.pad(xc, ((0, 0), (0, 0), (n, n), (0, 0)))
    rows = th + 2 * n
    xs = jnp.stack(
        [xh[:, :, j * th : j * th + th + 2 * n] for j in range(ns)], axis=1
    ).reshape(b, ns, c0, rows * w)  # flat row-major spatial in lanes
    dt = x.dtype

    # pre-transpose each tap to (Co, Ci) host-side: an in-kernel bf16
    # 2-D transpose needs a minor-dim relayout Mosaic only supports for
    # 32-bit types
    kt_list = [k.transpose(0, 1, 3, 2) for k in kernels]
    k_specs = [
        pl.BlockSpec(tuple(k.shape), lambda i, j: (0, 0, 0, 0),
                     memory_space=_VMEM)
        for k in kt_list
    ]
    b_specs = [
        pl.BlockSpec(tuple(bb.shape), lambda i, j: (0,), memory_space=_VMEM)
        for bb in biases
    ]
    out5 = pl.pallas_call(
        _kernel3_chain_wl(th, w, n, dt, h),
        grid=(b, ns),
        in_specs=[
            pl.BlockSpec((1, 1, c0, rows * w),
                         lambda i, j: (i, j, 0, 0), memory_space=_VMEM),
            *k_specs,
            *b_specs,
        ],
        out_specs=pl.BlockSpec((1, 1, chans[-1], th * w),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ns, chans[-1], th * w), dt),
        interpret=interpret,
    )(
        xs,
        *[k.astype(dt) for k in kt_list],
        # biases stay f32: the kernel adds them to the f32 accumulator,
        # and a bf16 minor-dim insert ([:, None]) is unsupported anyway
        *[bb.astype(jnp.float32) for bb in biases],
    )
    # (b, ns, o, th*w) -> (b, o, h, w) -> NHWC
    out = out5.reshape(b, ns, chans[-1], th, w)
    out = out.transpose(0, 2, 1, 3, 4).reshape(b, chans[-1], h, w)
    return jnp.transpose(out, (0, 2, 3, 1))


@partial(jax.jit, static_argnames=("interpret",))
def fused_conv3x3_chain(x, kernels, biases, interpret=False):
    """Whole linear conv chain (SAME 3x3/s1 + bias each) in one kernel.

    ``x``: (B, H, W, C0); ``kernels``: tuple of (3, 3, C_i, C_{i+1});
    ``biases``: tuple of (C_{i+1},). Returns (B, H, W, C_last) in
    ``x.dtype``. Falls back to the sequential XLA chain off-TPU or when
    no strip height fits VMEM.
    """
    b, h, w, c0 = x.shape
    chans = [c0] + [int(k.shape[-1]) for k in kernels]
    n = len(kernels)
    itemsize = jnp.dtype(x.dtype).itemsize
    if not _HAVE_PLTPU or (not interpret and jax.default_backend() != "tpu"):
        return _chain_reference(x, kernels, biases)
    th = _chain_strip_rows(h, w, chans, itemsize)
    if not th:
        return _chain_reference(x, kernels, biases)

    ns = h // th
    xh = jnp.pad(x, ((0, 0), (n, n), (0, 0), (0, 0)))  # image SAME pad in H
    xs = jnp.stack(
        [xh[:, j * th : j * th + th + 2 * n] for j in range(ns)], axis=1
    )  # (b, ns, th+2n, w, c0)
    per = _chain_tile_bytes(th, w, chans, itemsize)
    bt = _batch_tile(b, per, 0)
    dt = x.dtype

    k_specs = [
        pl.BlockSpec(tuple(k.shape), lambda i, j: (0, 0, 0, 0),
                     memory_space=_VMEM)
        for k in kernels
    ]
    b_specs = [
        pl.BlockSpec(tuple(bb.shape), lambda i, j: (0,), memory_space=_VMEM)
        for bb in biases
    ]
    out5 = pl.pallas_call(
        _kernel3_chain(bt, th, w, n, dt, h),
        grid=(b // bt, ns),
        in_specs=[
            pl.BlockSpec((bt, 1, th + 2 * n, w, c0),
                         lambda i, j: (i, j, 0, 0, 0), memory_space=_VMEM),
            *k_specs,
            *b_specs,
        ],
        out_specs=pl.BlockSpec((bt, 1, th, w, chans[-1]),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ns, th, w, chans[-1]), dt),
        interpret=interpret,
    )(
        xs,
        *[k.astype(dt) for k in kernels],
        *[bb.astype(dt) for bb in biases],
    )
    return out5.reshape(b, h, w, chans[-1])


def _conv(x, kernel, strides=(1, 1), padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def _reference3(x, kernel, scale, shift, relu):
    out = _conv(x, kernel) * scale + shift
    return (jnp.maximum(out, 0.0) if relu else out).astype(x.dtype)


# --------------------------------------------------------------- 4x4 stride 2
def _kernel4(bt: int, ho: int, wo: int, relu: bool):
    def body(ph_ref, w_ref, scale_ref, shift_ref, out_ref):
        o = w_ref.shape[-1]
        acc = jnp.zeros((bt * ho * wo, o), jnp.float32)
        for dy in range(4):
            for dx in range(4):
                r, a0 = dy % 2, dy // 2
                s, b0 = dx % 2, dx // 2
                patch = ph_ref[
                    :, r, s, a0 : a0 + ho, b0 : b0 + wo, :
                ].reshape(bt * ho * wo, -1)
                acc += jnp.dot(
                    patch, w_ref[dy, dx], preferred_element_type=jnp.float32
                )
        out = acc * scale_ref[...] + shift_ref[...]
        if relu:
            out = jnp.maximum(out, 0.0)
        out_ref[...] = out.reshape(bt, ho, wo, -1).astype(out_ref.dtype)

    return body


def fits_vmem4(h: int, w: int, c: int, o: int, itemsize: int = 4) -> bool:
    wgt = 16 * c * o * 4
    per = _tile_bytes(h, w, c, o, itemsize, ho=h // 2, wo=w // 2)
    return h % 2 == 0 and w % 2 == 0 and per + wgt < _VMEM_BUDGET


@partial(jax.jit, static_argnames=("relu", "interpret"))
def fused_conv4x4s2_bn_relu(
    x: Array,
    kernel: Array,
    scale: Array,
    shift: Array,
    relu: bool = True,
    interpret: bool = False,
) -> Array:
    """y = act(conv4x4(x, kernel, stride 2, pad 1) * scale + shift), fused.

    The DownBlock tail (reference ``models/layers.py:217-256``: strided conv
    -> BN -> ReLU) as one kernel. ``x``: (B, H, W, C) with H, W even;
    ``kernel``: (4, 4, C, O); output (B, H/2, W/2, O).

    out[i, j] = sum_{dy,dx} xp[2i+dy, 2j+dx] @ W[dy, dx] with xp = pad(x, 1).
    Writing dy = 2*a + r: xp[2i+dy] = phase_r[i + a] where phase_r = xp[r::2]
    — so the strided conv becomes 16 contiguous-slice matmuls over the four
    (r, s) phase planes, built outside the kernel by one reshape/transpose.
    """
    b, h, w, c = x.shape
    o = kernel.shape[-1]
    itemsize = jnp.dtype(x.dtype).itemsize
    if not _HAVE_PLTPU or (not interpret and jax.default_backend() != "tpu"):
        return _reference4(x, kernel, scale, shift, relu)
    if not fits_vmem4(h, w, c, o, itemsize):
        return _reference4(x, kernel, scale, shift, relu)

    ho, wo = h // 2, w // 2
    hp, wp = (h + 2) // 2, (w + 2) // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # (B, 2, 2, hp, wp, C): ph[b, r, s, a, e] = xp[b, 2a+r, 2e+s]
    ph = xp.reshape(b, hp, 2, wp, 2, c).transpose(0, 2, 4, 1, 3, 5)

    wgt = 16 * c * o * 4
    per = _tile_bytes(h, w, c, o, itemsize, ho=ho, wo=wo)
    bt = _batch_tile(b, per, wgt)
    return pl.pallas_call(
        _kernel4(bt, ho, wo, relu),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, 2, 2, hp, wp, c), lambda i: (i, 0, 0, 0, 0, 0),
                         memory_space=_VMEM),
            pl.BlockSpec((4, 4, c, o), lambda i: (0, 0, 0, 0), memory_space=_VMEM),
            pl.BlockSpec((o,), lambda i: (0,), memory_space=_VMEM),
            pl.BlockSpec((o,), lambda i: (0,), memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec((bt, ho, wo, o), lambda i: (i, 0, 0, 0),
                               memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ho, wo, o), x.dtype),
        interpret=interpret,
    )(ph, kernel, scale.astype(jnp.float32), shift.astype(jnp.float32))


def _reference4(x, kernel, scale, shift, relu):
    out = _conv(x, kernel, strides=(2, 2), padding=[(1, 1), (1, 1)])
    out = out * scale + shift
    return (jnp.maximum(out, 0.0) if relu else out).astype(x.dtype)


# ------------------------------------------------------------ convT 4x4 s2 p1
# Tap tables for the four output phases, in the input-dilated-conv
# parametrization the models store (torch_conv_transpose: convT(x) ==
# conv(dilate2(x), W', pad=2)). Output row p = 2i+u only sees dilated rows
# of matching parity, leaving 2 taps per axis per phase:
#   u=0: o[2i] = xq[i]   @ W'[0] + xq[i+1] @ W'[2]
#   u=1: o[2i+1] = xq[i+1] @ W'[1] + xq[i+2] @ W'[3]
# with xq = pad(x, 1). Same table for columns.
_T_TAPS = {0: ((0, 0), (1, 2)), 1: ((1, 1), (2, 3))}


def _kernelT(bt: int, h: int, w: int, relu: bool):
    def body(xq_ref, w_ref, scale_ref, shift_ref, out_ref):
        o = w_ref.shape[-1]
        u = pl.program_id(1)
        outs = []
        for v in (0, 1):  # both column phases in one program (see out spec)
            acc = jnp.zeros((bt * h * w, o), jnp.float32)
            # the (a, dy) tap table for phase 1 is phase 0's shifted by +1
            # (rows and columns alike), so the row phase u is a traced
            # offset via pl.ds and one body serves both row-phase programs
            for a0, dy in _T_TAPS[0]:
                for b0, dx in _T_TAPS[v]:
                    patch = xq_ref[
                        :, pl.ds(a0 + u, h), b0 : b0 + w, :
                    ].reshape(bt * h * w, -1)
                    # W'[dy+u, dx]: row phase u=1 uses kernel rows (1, 3)
                    kmat = w_ref[pl.ds(dy + u, 1), dx].reshape(
                        w_ref.shape[-2], o
                    )
                    acc += jnp.dot(
                        patch, kmat, preferred_element_type=jnp.float32
                    )
            out = acc * scale_ref[...] + shift_ref[...]
            if relu:
                out = jnp.maximum(out, 0.0)
            outs.append(out.reshape(bt, h, w, o))
        # pack the two column phases into the channel dim: index v*O + c
        packed = jnp.concatenate(outs, axis=-1)
        out_ref[...] = packed.reshape(bt, h, 1, w, 2 * o).astype(out_ref.dtype)

    return body


def fits_vmemT(h: int, w: int, c: int, o: int, itemsize: int = 4) -> bool:
    wgt = 16 * c * o * 4
    per = _tile_bytes(h, w, c, o, itemsize, out_mult=2)
    return per + wgt < _VMEM_BUDGET


@partial(jax.jit, static_argnames=("relu", "interpret"))
def fused_convT4x4s2_bn_relu(
    x: Array,
    kernel: Array,
    scale: Array,
    shift: Array,
    relu: bool = True,
    interpret: bool = False,
) -> Array:
    """y = act(convT4x4(x, stride 2, pad 1) * scale + shift), fused.

    The UpBlock tail (reference ``models/layers.py:259-297``: convT -> BN ->
    ReLU) as one kernel. ``kernel`` is the input-dilated-conv weight the
    models store ((4, 4, C, O), see ``torch_conv_transpose``); output
    (B, 2H, 2W, O). Each output phase touches only the 4 non-zero taps, so
    the kernel runs 16 matmuls total — no dilation zeros are materialized
    or multiplied.
    """
    b, h, w, c = x.shape
    o = kernel.shape[-1]
    itemsize = jnp.dtype(x.dtype).itemsize
    if not _HAVE_PLTPU or (not interpret and jax.default_backend() != "tpu"):
        return _referenceT(x, kernel, scale, shift, relu)
    if not fits_vmemT(h, w, c, o, itemsize):
        return _referenceT(x, kernel, scale, shift, relu)

    xq = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wgt = 16 * c * o * 4
    per = _tile_bytes(h, w, c, o, itemsize, out_mult=2)
    bt = _batch_tile(b, per, wgt)
    # each program owns one row phase u and both column phases (packed into
    # the channel dim); the phase layout (B, H, 2, W, 2*O) reshapes to the
    # interleaved (B, 2H, 2W, O) as a free row-major view — no in-kernel
    # transposes, and the out block keeps Mosaic's (sublane, lane) rules
    out5 = pl.pallas_call(
        _kernelT(bt, h, w, relu),
        grid=(b // bt, 2),
        in_specs=[
            pl.BlockSpec((bt, h + 2, w + 2, c), lambda i, u: (i, 0, 0, 0),
                         memory_space=_VMEM),
            pl.BlockSpec((4, 4, c, o), lambda i, u: (0, 0, 0, 0),
                         memory_space=_VMEM),
            pl.BlockSpec((o,), lambda i, u: (0,), memory_space=_VMEM),
            pl.BlockSpec((o,), lambda i, u: (0,), memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bt, h, 1, w, 2 * o), lambda i, u: (i, 0, u, 0, 0),
            memory_space=_VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, 2, w, 2 * o), x.dtype),
        interpret=interpret,
    )(xq, kernel, scale.astype(jnp.float32), shift.astype(jnp.float32))
    return out5.reshape(b, 2 * h, 2 * w, o)


def _referenceT(x, kernel, scale, shift, relu):
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=[(2, 2), (2, 2)],
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    out = out * scale + shift
    return (jnp.maximum(out, 0.0) if relu else out).astype(x.dtype)


# ---------------------------------------------------------------- custom VJP
# Forward = fused Pallas kernel; backward = analytic, from the SAVED output:
# the ReLU mask and the pre-affine conv result are both recoverable from
# out/scale/shift, and the two transposed convs come from
# jax.linear_transpose of the (linear-in-each-argument) conv — so, unlike a
# jax.vjp of the reference expression, the forward conv is never recomputed
# in the backward pass.
def _make_grad(fused_fn, conv_fn, dx_fn=None):
    @partial(jax.custom_vjp, nondiff_argnums=(4,))
    def fwd_op(x, kernel, scale, shift, relu=True):
        return fused_fn(x, kernel, scale, shift, relu=relu)

    def fwd(x, kernel, scale, shift, relu):
        out = fused_fn(x, kernel, scale, shift, relu=relu)
        return out, (x, kernel, scale, shift, out)

    def bwd(relu, res, g):
        x, kernel, scale, shift, out = res
        out32 = out.astype(jnp.float32)
        g32 = g.astype(jnp.float32)
        if relu:
            g32 = jnp.where(out32 > 0.0, g32, 0.0)
        # pre-affine conv result; where scale==0 the factor is irrelevant
        # (only reached when g32==0 or d(scale) contributions vanish), and
        # the training path always folds scale=1.
        inv = jnp.where(scale == 0.0, 0.0, 1.0 / scale)
        conv_raw = (out32 - shift) * inv
        dscale = jnp.sum(g32 * conv_raw, axis=(0, 1, 2))
        dshift = jnp.sum(g32, axis=(0, 1, 2))
        g_conv = (g32 * scale).astype(x.dtype)
        if dx_fn is not None:
            dx = dx_fn(g_conv, kernel, x)
        else:
            dx = jax.linear_transpose(lambda x_: conv_fn(x_, kernel), x)(g_conv)[0]
        dk = jax.linear_transpose(lambda k_: conv_fn(x, k_), kernel)(g_conv)[0]
        return dx, dk, dscale.astype(scale.dtype), dshift.astype(shift.dtype)

    fwd_op.defvjp(fwd, bwd)
    return fwd_op


def _conv3_samedtype(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(x.dtype)


def _conv4_samedtype(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(x.dtype)


def _convT_samedtype(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(2, 2), (2, 2)], lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(x.dtype)


def _flip_swap(kernel: Array) -> Array:
    """(4,4,C,O) -> the transposed-conv weight of the adjoint: spatial flip
    + in/out swap (k'[i,j,o,c] = k[3-i,3-j,c,o])."""
    return jnp.flip(kernel, (0, 1)).swapaxes(2, 3)


def conv4x4s2_dx(
    g: Array,
    kernel: Array,
    in_hw: Optional[tuple] = None,
    interpret: bool = False,
) -> Array:
    """Input-gradient of ``y = conv4x4/s2/p1(x, kernel)``.

    Mathematically a convT4x4/s2/p1 of ``g`` with the flipped/swapped
    kernel — an input-dilated pattern the Pallas kernel computes with only
    the 4 live taps per output phase. Routed through
    :func:`fused_convT4x4s2_bn_relu` below the measured crossover
    (``wins_over_xla_T`` — XLA wins at compute-bound training shapes,
    BASELINE.md sweep) and when it fits VMEM; XLA transpose otherwise.

    ``in_hw`` is the primal input's true (H, W) — required whenever it is
    not exactly ``(2*ho, 2*wo)`` (odd sizes: the forward floors, so the
    cotangent must be rebuilt at the original size, which the phase-packed
    Pallas kernel cannot produce — those shapes take the XLA transpose).
    Same-dtype contract: returns ``g.dtype``.
    """
    b, ho, wo, o = g.shape
    c = kernel.shape[2]
    h_in, w_in = in_hw if in_hw is not None else (2 * ho, 2 * wo)
    itemsize = jnp.dtype(g.dtype).itemsize
    even = (h_in, w_in) == (2 * ho, 2 * wo)
    use_pallas = even and (
        interpret
        or (
            _HAVE_PLTPU
            and jax.default_backend() == "tpu"
            and wins_over_xla_T(b, 2 * ho, 2 * wo, o)
            and fits_vmemT(ho, wo, o, c, itemsize)
        )
    )
    if use_pallas:
        return fused_convT4x4s2_bn_relu(
            g,
            _flip_swap(kernel).astype(g.dtype),
            jnp.ones((c,), jnp.float32),
            jnp.zeros((c,), jnp.float32),
            relu=False,
            interpret=interpret,
        )
    x_like = jax.ShapeDtypeStruct((b, h_in, w_in, c), g.dtype)
    return jax.linear_transpose(lambda x_: _conv4_samedtype(x_, kernel), x_like)(g)[0]


fused_conv3x3_bn_relu_grad = _make_grad(fused_conv3x3_bn_relu, _conv3_samedtype)
fused_conv4x4s2_bn_relu_grad = _make_grad(
    fused_conv4x4s2_bn_relu,
    _conv4_samedtype,
    dx_fn=lambda g, k, x: conv4x4s2_dx(g, k, in_hw=x.shape[1:3]),
)
fused_convT4x4s2_bn_relu_grad = _make_grad(fused_convT4x4s2_bn_relu, _convT_samedtype)


# Plain strided conv with per-pass algorithm selection (cuDNN-style): the
# forward rides XLA's strong batched conv, but the input-gradient — the
# weak dilated pattern — rides the Pallas convT kernel when it fits. This
# is the training-path complement of the fused eval ops above.
@partial(jax.custom_vjp, nondiff_argnums=())
def conv4x4s2_pdx(x: Array, kernel: Array, bias: Array) -> Array:
    return _conv4_samedtype(x, kernel) + bias.astype(x.dtype)


def _conv4_pdx_fwd(x, kernel, bias):
    return conv4x4s2_pdx(x, kernel, bias), (x, kernel)


def _conv4_pdx_bwd(res, g):
    x, kernel = res
    dx = conv4x4s2_dx(g, kernel, in_hw=x.shape[1:3])
    dk = jax.linear_transpose(lambda k_: _conv4_samedtype(x, k_), kernel)(g)[0]
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
    return dx, dk.astype(kernel.dtype), db


conv4x4s2_pdx.defvjp(_conv4_pdx_fwd, _conv4_pdx_bwd)


def fold_conv_bn(
    kernel: Array,
    bias: Optional[Array],
    bn_scale: Array,
    bn_bias: Array,
    running_mean: Array,
    running_var: Array,
    eps: float = 1e-5,
):
    """Fold eval-mode BatchNorm into (scale, shift) for the fused kernels.

    conv -> BN(eval) == conv * s + t with s = gamma/sqrt(var+eps) and
    t = beta - mean*s (+ bias*s when the conv has a bias).
    """
    s = bn_scale / jnp.sqrt(running_var + eps)
    t = bn_bias - running_mean * s
    if bias is not None:
        t = t + bias * s
    return kernel, s, t


# ------------------------------------------------------------- global switch
# Process-wide opt-in for routing the models' convs through the fused
# kernels (CLI --pallas_conv, or SVRS_PALLAS_CONV=1). Read at TRACE time:
# set it before the first jit of a graph (startup), not mid-run — compiled
# executables do not retrace on a flag flip.
_ENABLED = _os.environ.get("SVRS_PALLAS_CONV", "0") == "1"

# Adaptive dispatch threshold (total output rows = B*Ho*Wo). Measured on
# v5e (chained single-dispatch towers, bf16, 64ch): the VMEM-grid kernels
# win the latency-bound regime (<= ~64k rows — small-batch serving, where
# the fused tail also saves HBM round trips) while XLA's batched conv runs
# at ~63% MFU beyond and is the right path for 512-patch training steps.
# Like cuDNN heuristics: per-shape kernel selection, not one winner.
_MAX_ROWS = int(_os.environ.get("SVRS_PALLAS_CONV_MAX_ROWS", 65536))


def enable(value: bool = True) -> None:
    global _ENABLED
    _ENABLED = bool(value)


def is_enabled() -> bool:
    return _ENABLED


@_contextmanager
def force_xla():
    """Trace-time scope that routes every conv dispatch gate to XLA.

    GSPMD cannot partition a ``pallas_call``: a fused kernel traced into a
    jit whose operands are sharded over a >1-device mesh fails to compile
    (or silently replicates). Callers that jit eval-mode model graphs over
    a mesh (the training engine's val/metric/image steps) trace under this
    scope; meshed *serving* instead runs its endpoints per-shard inside
    ``jax.shard_map``, which keeps the fused kernels alive (serve.py)."""
    global _ENABLED
    prev = _ENABLED
    _ENABLED = False
    try:
        yield
    finally:
        _ENABLED = prev


# Channel- and spatial-aware refinements (v5e, 2026-08-17 healthy-tunnel
# measurements — scripts/bench_int8_kernels.py --batch 250 and the chained
# re-verification of the round-1 claims):
# - deep channels lose even under the row threshold (bf16 1.65 vs 1.02 ms
#   XLA at 64k rows x 256ch; 1.48 vs 0.98 at 16k rows x 424ch) →
#   rows*channels cap at _MAX_ROWS x 64ch.
# - large per-image tiles lose at identical row counts (B4/64px/64ch:
#   0.875 vs 0.605 ms XLA; B16/32px/64ch at the same 16k rows: 1.1x WIN)
#   → per-image spatial cap at 32px tiles (1024 px).
_MAX_ROWS_X_CH = _MAX_ROWS * 64
_MAX_HW = int(_os.environ.get("SVRS_PALLAS_CONV_MAX_HW", 1024))


def _wins(rows_cap: int, batch: int, out_h: int, out_w: int,
          channels: Optional[int]) -> bool:
    """One measured policy, two thresholds: the spatial and row*channel
    caps are shared; only the row cap differs per conv pattern."""
    rows = batch * out_h * out_w
    if out_h * out_w > _MAX_HW:
        return False
    if channels is not None and rows * channels > _MAX_ROWS_X_CH:
        return False
    return rows <= rows_cap


def wins_over_xla(
    batch: int, out_h: int, out_w: int, channels: Optional[int] = None
) -> bool:
    """True when the fused kernels beat XLA at this output-row count
    (``channels`` = input channel count, when known)."""
    return _wins(_MAX_ROWS, batch, out_h, out_w, channels)


# The convT (input-dilated) pattern gets its own tunable crossover for the
# UpBlock forward and conv4x4s2's input-gradient (the same pattern
# transposed). Measured on v5e (scripts/bench_conv_sweep.py, 2026-08-16):
# XLA lowers the dilated pattern well at compute-bound shapes — Pallas is
# 0.6-0.9x at 512-patch training steps and ~1.1x only below ~8k output
# rows — so the default matches the generic threshold and training shapes
# ride XLA. (Round 1's 7.5 ms XLA figure for this pattern did not
# reproduce — 1.3 ms on a healthy tunnel — and is superseded.)
_MAX_ROWS_T = int(_os.environ.get("SVRS_PALLAS_CONVT_MAX_ROWS", _MAX_ROWS))

# Deep-channel small-spatial exception, measured 2026-08-17 at the
# serving chunk (B250, scripts/bench_int8_kernels.py): up1.convT
# (424->256ch, out 16x16) runs **3.15x faster fused** (1.16 vs 3.66 ms
# XLA) — XLA's input-dilated lowering collapses at deep input channels —
# while up2.convT (256ch, out 32x32) is parity (0.94x). Shapes with
# channels >= 384 and out <= 16x16 therefore route to the fused kernel
# past the generic rows*channels cap, bounded to ~2x the measured row
# count to stay near the data.
_DEEP_T_CH = int(_os.environ.get("SVRS_PALLAS_CONVT_DEEP_CH", 384))
_DEEP_T_HW = 256


def deep_channel_T(
    batch: int, out_h: int, out_w: int, channels: Optional[int]
) -> bool:
    """The measured deep-channel convT win region (see above). Inside it
    the bf16 fused kernel also beats the int8 kernel (1.16 vs 1.78 ms at
    the measured point), so blocks prefer bf16 there even in int8 mode."""
    return (
        channels is not None
        and channels >= _DEEP_T_CH
        and out_h * out_w <= _DEEP_T_HW
        and batch * out_h * out_w <= 2 * _MAX_ROWS_T
    )


def wins_over_xla_T(
    batch: int, out_h: int, out_w: int, channels: Optional[int] = None
) -> bool:
    """Crossover test for the transposed/dilated-conv pattern."""
    if deep_channel_T(batch, out_h, out_w, channels):
        return True
    return _wins(_MAX_ROWS_T, batch, out_h, out_w, channels)
