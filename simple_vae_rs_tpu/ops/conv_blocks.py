"""NHWC conv building blocks for the VAE encoder/decoder stacks.

Functional parity targets (reference ``models/layers.py:217-297``):

- ``DownBlock``: conv3x3(s1, C->C) -> conv4x4(s2, p1, C->C') -> BN -> ReLU
- ``UpBlock``:   conv3x3(s1, C->C) -> convT4x4(s2, p1, C->C') -> BN -> ReLU

TPU-first design notes:

- NHWC layout throughout (the layout XLA:TPU prefers for convolutions; the
  reference is NCHW torch). Conversion only happens at user-facing image IO.
- Weight/bias initialization matches torch's ``kaiming_uniform_(a=sqrt(5))``
  + uniform-bias scheme so learning dynamics are comparable:
  ``U(-1/sqrt(fan), 1/sqrt(fan))`` with fan = in*k*k for Conv and
  fan = out*k*k for ConvTranspose (torch's fan convention for transposed
  weight layout ``(in, out, kh, kw)``).
- ``dtype`` selects the activation/compute dtype (bf16 on TPU feeds the MXU
  at full rate); parameters always live in f32.
- Every 3x3/s1 conv is a :class:`PallasCapableConv3x3` — identical
  parameter tree to ``nn.Conv`` — and eval-mode blocks fuse their whole
  strided-conv→BN→ReLU tail into one Pallas kernel
  (``ops/pallas_conv.py``) when the process-wide switch is on. Dispatch is
  adaptive per shape: Pallas in the latency-bound small-batch regime, XLA's
  ~63%-MFU batched conv at training scale (``pallas_conv.wins_over_xla``).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray
Dtype = Any


def calculate_padding(
    in_size: int, out_size: int, kernel_size: int, stride: int = 1, dilation: int = 1
) -> int:
    """Padding needed for a conv layer (reference ``models/layers.py:7-13``)."""
    effective_kernel_size = (kernel_size - 1) * dilation + 1
    return max(0, (in_size - out_size * stride + effective_kernel_size - 1) // 2)


def calculate_output_size(
    in_size: int, kernel_size: int, stride: int = 1, padding: int = 0, dilation: int = 1
) -> int:
    """Conv output size (reference ``models/layers.py:16-22``)."""
    effective_kernel_size = (kernel_size - 1) * dilation + 1
    return (in_size + 2 * padding - effective_kernel_size) // stride + 1


def _uniform_init(bound: float) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


# torch kaiming_uniform_(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in)),
# i.e. variance_scaling(scale=1/3, fan_in, uniform).
_torch_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class PallasCapableConv3x3(nn.Module):
    """3x3/s1 conv, drop-in for ``nn.Conv`` (identical param tree/init),
    that routes through the fused Pallas kernel when the process-wide
    switch is on (``ops.pallas_conv.enable()`` / ``SVRS_PALLAS_CONV=1``)
    and the shape fits VMEM. Differentiable either way (the fused path
    carries a custom VJP), so the switch covers training and inference.
    """

    features: int
    in_features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from simple_vae_rs_tpu.ops import pallas_conv as pc

        fan_in = self.in_features * 9
        kernel = self.param(
            "kernel", _torch_kernel_init, (3, 3, self.in_features, self.features)
        )
        bias = self.param(
            "bias", _uniform_init(1.0 / math.sqrt(fan_in)), (self.features,)
        )
        dt = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
        # W8A8 serving path: quantized weights present in the ``quant``
        # collection (serve.SuperResolver(int8=True)) — the collection in
        # scope IS the switch; no process-global state, so int8 and f32
        # models of the same class coexist in one process.
        # Eval-only — training never routes here (batch_stats mutable).
        if (
            x.ndim == 4
            and not self.is_mutable_collection("batch_stats")
            and self.has_variable("quant", "kernel_q")
        ):
            from simple_vae_rs_tpu.ops import pallas_int8 as p8

            out = p8.int8_conv3x3_bn_relu(
                x.astype(dt),
                self.get_variable("quant", "kernel_q"),
                self.get_variable("quant", "kernel_s"),
                jnp.ones((self.features,), jnp.float32),
                bias.astype(jnp.float32),
                relu=False,
            )
            return out.astype(dt)
        if (
            pc.is_enabled()
            and x.ndim == 4
            # trace-time train/eval split with zero API churn: training
            # steps run apply(mutable=["batch_stats"]); eval/serving don't.
            # Training batches ride XLA's ~63%-MFU batched conv; the fused
            # kernel serves the latency-bound eval path.
            and not self.is_mutable_collection("batch_stats")
            and pc.wins_over_xla(x.shape[0], x.shape[1], x.shape[2], x.shape[3])
            and pc.can_fuse3(  # full-image tile OR spatial strips
                x.shape[1], x.shape[2], x.shape[3], self.features,
                jnp.dtype(dt).itemsize,
            )
        ):
            out = pc.fused_conv3x3_bn_relu_grad(
                x.astype(dt),
                kernel.astype(dt),
                jnp.ones((self.features,), jnp.float32),
                bias.astype(jnp.float32),
                False,
            )
            return out.astype(dt)
        out = jax.lax.conv_general_dilated(
            x.astype(dt),
            kernel.astype(dt),
            window_strides=(1, 1),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias.astype(dt)


class PallasGradConv4x4s2(nn.Module):
    """4x4/s2/p1 conv, drop-in for the ``nn.Conv`` from :func:`torch_conv`
    (identical param tree/init). Per-pass algorithm selection behind the
    global switch: the forward keeps XLA's strong batched conv, but the
    input-gradient — an input-dilated pattern — can ride the Pallas convT
    kernel (``pallas_conv.conv4x4s2_dx``) where measurement favors it
    (small-batch regime; XLA wins at training scale — see
    ``wins_over_xla_T`` and the BASELINE.md sweep). The forward/backward
    split keeps both passes on their best implementation per shape.
    """

    features: int
    in_features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from simple_vae_rs_tpu.ops import pallas_conv as pc

        fan_in = self.in_features * 16
        kernel = self.param(
            "kernel", _torch_kernel_init, (4, 4, self.in_features, self.features)
        )
        bias = self.param(
            "bias", _uniform_init(1.0 / math.sqrt(fan_in)), (self.features,)
        )
        dt = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
        # small-channel inputs (the image-facing convs) keep plain XLA:
        # their dx lanes (2*C) are too narrow to feed the MXU well
        if pc.is_enabled() and x.ndim == 4 and x.shape[-1] >= 16:
            return pc.conv4x4s2_pdx(
                x.astype(dt), kernel.astype(dt), bias.astype(jnp.float32)
            ).astype(dt)
        out = jax.lax.conv_general_dilated(
            x.astype(dt),
            kernel.astype(dt),
            window_strides=(2, 2),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias.astype(dt)


class PallasCapableConvT4x4s2(nn.Module):
    """convT4x4/s2/p1, drop-in for :func:`torch_conv_transpose`'s
    ``nn.Conv`` (same param tree, init, and fractionally-strided-conv
    geometry). Behind the global switch the forward rides the
    phase-decomposed Pallas kernel below the measured crossover
    (``wins_over_xla_T``; XLA wins at compute-bound training shapes —
    BASELINE.md sweep) via the existing custom VJP, so it is
    differentiable and serves training (bias only; BN stays separate) and
    eval alike.
    """

    features: int
    in_features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from simple_vae_rs_tpu.ops import pallas_conv as pc

        fan = self.features * 16  # torch fan for ConvT: out * kh * kw
        bound = 1.0 / math.sqrt(fan)
        kernel = self.param(
            "kernel", _uniform_init(bound), (4, 4, self.in_features, self.features)
        )
        bias = self.param("bias", _uniform_init(bound), (self.features,))
        dt = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
        if (
            pc.is_enabled()
            and x.ndim == 4
            # skip Pallas during the throwaway init pass (cold remote
            # compiles are minutes-slow on this tunnel), like the siblings
            and not self.is_initializing()
            and pc.wins_over_xla_T(x.shape[0], 2 * x.shape[1], 2 * x.shape[2], x.shape[3])
            and pc.fits_vmemT(
                x.shape[1], x.shape[2], x.shape[3], self.features,
                jnp.dtype(dt).itemsize,
            )
        ):
            out = pc.fused_convT4x4s2_bn_relu_grad(
                x.astype(dt),
                kernel.astype(dt),
                jnp.ones((self.features,), jnp.float32),
                bias.astype(jnp.float32),
                False,
            )
            return out.astype(dt)
        out = jax.lax.conv_general_dilated(
            x.astype(dt),
            kernel.astype(dt),
            window_strides=(1, 1),
            padding=[(2, 2), (2, 2)],
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias.astype(dt)


def torch_conv(
    features: int,
    in_features: int,
    kernel_size: int = 3,
    stride: int = 1,
    padding: int = 1,
    dtype: Optional[Dtype] = None,
    name: Optional[str] = None,
) -> nn.Module:
    """Conv with torch-default initialization (NHWC).

    The 3x3/s1 case returns :class:`PallasCapableConv3x3` and the 4x4/s2/p1
    case :class:`PallasGradConv4x4s2` (same parameter trees as ``nn.Conv``)
    so every conv in the models can ride the Pallas kernels behind the
    global switch.
    """
    if kernel_size == 3 and stride == 1 and padding == 1:
        return PallasCapableConv3x3(features, in_features, dtype=dtype, name=name)
    if kernel_size == 4 and stride == 2 and padding == 1:
        return PallasGradConv4x4s2(features, in_features, dtype=dtype, name=name)
    fan_in = in_features * kernel_size * kernel_size
    return nn.Conv(
        features,
        (kernel_size, kernel_size),
        strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        kernel_init=_torch_kernel_init,
        bias_init=_uniform_init(1.0 / math.sqrt(fan_in)),
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def torch_conv_transpose(
    features: int,
    in_features: int,
    kernel_size: int = 4,
    stride: int = 2,
    padding: int = 1,
    dtype: Optional[Dtype] = None,
    name: Optional[str] = None,
) -> nn.Module:
    """Transposed conv matching torch ConvT(k, s, p) geometry exactly.

    Implemented as a fractionally-strided regular conv — input dilation
    ``s`` with padding ``k-1-p`` — which is precisely how XLA lowers
    ``conv_transpose`` onto the MXU; the learned kernel is a spatially
    flipped reparametrization of torch's, with identical expressiveness.
    Output spatial = ``s*(i-1) + k - 2p`` (= ``s*i`` for k=4, s=2, p=1).

    Torch's init fan for the transposed weight ``(in, out, kh, kw)`` is
    ``out * kh * kw`` — reproduced here for matched learning dynamics.
    """
    if kernel_size == 4 and stride == 2 and padding == 1:
        return PallasCapableConvT4x4s2(features, in_features, dtype=dtype, name=name)
    del in_features  # torch fan for ConvT depends on out channels only
    fan = features * kernel_size * kernel_size
    bound = 1.0 / math.sqrt(fan)
    pad_t = kernel_size - 1 - padding
    return nn.Conv(
        features,
        (kernel_size, kernel_size),
        strides=(1, 1),
        input_dilation=(stride, stride),
        padding=[(pad_t, pad_t), (pad_t, pad_t)],
        kernel_init=_uniform_init(bound),
        bias_init=_uniform_init(bound),
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def batch_norm(
    use_running_average: bool, dtype: Optional[Dtype] = None, name: Optional[str] = None
) -> nn.BatchNorm:
    """BatchNorm with torch semantics: eps=1e-5, running-stat momentum 0.1.

    Under ``jit`` with a batch-sharded global array, XLA computes the batch
    statistics over the *global* batch (cross-replica sync for free) — the
    TPU-native answer to "sync-BN" (SURVEY.md §7 hard part a).
    """
    return nn.BatchNorm(
        use_running_average=use_running_average,
        momentum=0.9,  # new_running = 0.9*running + 0.1*batch, as in torch
        epsilon=1e-5,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class _FusedTailMixin:
    """Shared fused-eval-tail logic for Down/UpBlock.

    In eval mode with the Pallas switch on, the strided conv + BatchNorm +
    ReLU tail runs as ONE fused kernel: the child conv/BN parameters are
    read from ``self.variables`` (same tree — the submodules still own
    them), eval-BN is folded into (scale, shift) via ``fold_conv_bn``, and
    the whole tail dispatches once. Training mode keeps the separate ops
    (batch statistics can't fold).
    """

    def _fused_tail_params(self, dt):
        from simple_vae_rs_tpu.ops import pallas_conv as pc

        p = self.variables["params"]
        kernel = p[self._tail_name]["kernel"]
        bias = p[self._tail_name]["bias"]
        if self.with_bn:
            bs = self.variables["batch_stats"]["bn"]
            kernel, s, t = pc.fold_conv_bn(
                kernel, bias, p["bn"]["scale"], p["bn"]["bias"],
                bs["mean"], bs["var"],
            )
        else:
            s = jnp.ones((self.features,), jnp.float32)
            t = bias.astype(jnp.float32)
        return kernel.astype(dt), s, t

    def _has_quant_tail(self) -> bool:
        return self._tail_name in self.variables.get("quant", {})

    def _int8_tail_params(self):
        """(kernel_q, kernel_s, scale, shift): quantized tail conv weights
        plus the same folded-BN affine the f32 fused path uses (the bias is
        folded into shift — the int8 matmul runs bias-free)."""
        _, s, t = self._fused_tail_params(jnp.float32)
        qv = self.variables["quant"][self._tail_name]
        return qv["kernel_q"], qv["kernel_s"], s, t


class DownBlock(nn.Module, _FusedTailMixin):
    """conv3x3 -> strided conv4x4 (spatial /2) -> BN -> ReLU.

    Parity: reference ``models/layers.py:217-256`` (``down_block``).
    Eval mode with the Pallas switch on fuses the conv4x4+BN+ReLU tail
    into one kernel (``ops/pallas_conv.fused_conv4x4s2_bn_relu``).
    """

    in_features: int
    features: int
    with_relu: bool = True
    with_bn: bool = True
    dtype: Optional[Dtype] = None

    _tail_name = "downsample"

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        from simple_vae_rs_tpu.ops import pallas_conv as pc

        x = torch_conv(
            self.in_features, self.in_features, 3, 1, 1, dtype=self.dtype, name="conv"
        )(x)
        dt = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
        if (
            not train
            and not self.is_initializing()
            and self._has_quant_tail()
        ):
            from simple_vae_rs_tpu.ops import pallas_int8 as p8

            kq, ks, s, t = self._int8_tail_params()
            return p8.int8_conv4x4s2_bn_relu(
                x.astype(dt), kq, ks, s, t, self.with_relu
            )
        if (
            pc.is_enabled()
            and not train
            and not self.is_initializing()
            and pc.wins_over_xla(x.shape[0], x.shape[1] // 2, x.shape[2] // 2, x.shape[3])
            and pc.fits_vmem4(
                x.shape[1], x.shape[2], x.shape[3], self.features,
                jnp.dtype(dt).itemsize,
            )
        ):
            kernel, s, t = self._fused_tail_params(dt)
            return pc.fused_conv4x4s2_bn_relu_grad(
                x.astype(dt), kernel, s, t, self.with_relu
            )
        x = torch_conv(
            self.features, self.in_features, 4, 2, 1, dtype=self.dtype, name="downsample"
        )(x)
        if self.with_bn:
            x = batch_norm(not train, dtype=self.dtype, name="bn")(x)
        if self.with_relu:
            x = nn.relu(x)
        return x


class UpBlock(nn.Module, _FusedTailMixin):
    """conv3x3 -> convT4x4 (spatial *2) -> BN -> ReLU.

    Parity: reference ``models/layers.py:259-297`` (``up_block``).
    Eval mode with the Pallas switch on fuses the convT+BN+ReLU tail into
    one kernel (``ops/pallas_conv.fused_convT4x4s2_bn_relu``).
    """

    in_features: int
    features: int
    with_relu: bool = True
    with_bn: bool = True
    dtype: Optional[Dtype] = None

    _tail_name = "upsample"

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        from simple_vae_rs_tpu.ops import pallas_conv as pc

        x = torch_conv(
            self.in_features, self.in_features, 3, 1, 1, dtype=self.dtype, name="conv"
        )(x)
        dt = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
        if (
            not train
            and not self.is_initializing()
            and self._has_quant_tail()
            # measured per-shape routing (B250 serving chunk, BASELINE.md):
            # the int8 convT loses to plain XLA below ~192 input channels
            # (128ch: 2.01 vs 1.30 ms) — shallow shapes fall through
            and x.shape[3] >= 192
            # and inside the deep-channel convT win region the bf16 fused
            # kernel beats int8 too (1.16 vs 1.78 ms) — fall through there
            and not (
                pc.is_enabled()
                and pc.deep_channel_T(
                    x.shape[0], 2 * x.shape[1], 2 * x.shape[2], x.shape[3]
                )
                and pc.fits_vmemT(
                    x.shape[1], x.shape[2], x.shape[3], self.features,
                    jnp.dtype(dt).itemsize,
                )
            )
        ):
            from simple_vae_rs_tpu.ops import pallas_int8 as p8

            kq, ks, s, t = self._int8_tail_params()
            return p8.int8_convT4x4s2_bn_relu(
                x.astype(dt), kq, ks, s, t, self.with_relu
            )
        if (
            pc.is_enabled()
            and not train
            and not self.is_initializing()
            # convT pattern: same crossover knob as the train-path module
            and pc.wins_over_xla_T(
                x.shape[0], 2 * x.shape[1], 2 * x.shape[2], x.shape[3]
            )
            and pc.fits_vmemT(
                x.shape[1], x.shape[2], x.shape[3], self.features,
                jnp.dtype(dt).itemsize,
            )
        ):
            kernel, s, t = self._fused_tail_params(dt)
            return pc.fused_convT4x4s2_bn_relu_grad(
                x.astype(dt), kernel, s, t, self.with_relu
            )
        x = torch_conv_transpose(
            self.features, self.in_features, 4, 2, 1, dtype=self.dtype, name="upsample"
        )(x)
        if self.with_bn:
            x = batch_norm(not train, dtype=self.dtype, name="bn")(x)
        if self.with_relu:
            x = nn.relu(x)
        return x


def tail_chain(mdl: nn.Module, h: Array, names, train: bool) -> Optional[Array]:
    """Route an eval-mode LINEAR conv tail (3x3/s1 + bias each, no
    activation between — the models' decoder endings) through the fused
    chain kernel (``pallas_conv.fused_conv3x3_chain``): the whole chain
    runs on VMEM-resident row strips, one HBM read + one write instead of
    a round trip per layer. Returns ``None`` when the per-module path
    should run instead (training, init, non-TPU backend, or the chain not
    opted in — it is measured-off by default, ``SVRS_CHAIN=1`` to enable;
    see the negative result in ``pallas_conv`` / BASELINE.md)."""
    from simple_vae_rs_tpu.ops import pallas_conv as pc

    if train or mdl.is_initializing() or not pc.chain_wanted():
        return None
    if mdl.variables.get("quant"):
        # int8 serving quantizes these tail convs per-layer; the float
        # chain would silently de-quantize them — defer to the per-module
        # path so the W8A8 kernels keep running under SVRS_CHAIN=1
        return None
    params = mdl.variables.get("params", {})
    if any(n not in params for n in names):
        return None
    ks = tuple(params[n]["kernel"] for n in names)
    bs = tuple(params[n]["bias"] for n in names)
    dt = mdl.dtype or jnp.promote_types(h.dtype, jnp.float32)
    return pc.fused_conv3x3_chain(h.astype(dt), ks, bs)


class Residual(nn.Module):
    """Residual wrapper (reference ``models/layers.py:357-369``)."""

    module: nn.Module

    @nn.compact
    def __call__(self, x: Array, *args, **kwargs) -> Array:
        return x + self.module(x, *args, **kwargs)
