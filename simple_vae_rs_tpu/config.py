"""Typed configuration for models, training and the device mesh.

The reference drives everything through argparse flags and hard-coded
hyper-parameters (reference ``train.py:83-148``, ``train.py:65`` Adam lr=1e-4,
``models/base.py:51-53,106`` scheduler/clip, ``train.py:32`` early stopping).
Here those live in dataclasses; the CLI (``cli.py``) builds them from the same
flag surface.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


def _vae_latent_size(patch_size: int, cr: float) -> int:
    """Latent-size formula of the plain VAE (reference ``models/vae.py:29-31``).

    The literal ``4`` is the reference's band count baked into its formula;
    it stays 4 even for other ``channels`` so that ``cr`` keeps the same
    meaning as the reference's flag (compression relative to 4-band pixels).
    """
    return int((patch_size * patch_size * 4 // cr) // 16) * 16


def _cond_latent_size(patch_size: int, cr: float) -> int:
    """Latent-size formula of Cond_SRVAE (reference ``models/cond_vae.py:21``).

    Same note as :func:`_vae_latent_size` regarding the literal ``4``.
    """
    return int((patch_size * patch_size * 4 / cr) // 256) * 256


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """Plain Gaussian VAE (reference ``models/vae.py``).

    ``latent_size`` reproduces the reference attribute; the *actual* flattened
    latent dimension is ``latent_channels * (patch_size // 4) ** 2`` which
    equals ``latent_size`` only at canonical configs (see SURVEY.md §2.1).
    This framework always uses the actual dimension, so every config is
    shape-sound.
    """

    cr: float = 1.5
    patch_size: int = 32
    channels: int = 4
    # Fixed latent budget: when > 0 this overrides the cr-derived
    # ``latent_size``. Decouples latent width from ``patch_size`` so
    # large-patch configs keep bounded latent-head channel counts (at
    # ps=128 the cr formula quadruples ``latent_channels`` and with it
    # every latent-head conv). Must be a positive multiple of 64 so the
    # (ps/4)-grid channel regrouping stays integral.
    latent_size_override: int = 0

    def __post_init__(self) -> None:
        if self.latent_size_override and (
            self.latent_size_override < 0 or self.latent_size_override % 64
        ):
            raise ValueError(
                "latent_size_override must be a positive multiple of 64 "
                f"(got {self.latent_size_override})"
            )

    @property
    def latent_size(self) -> int:
        if self.latent_size_override > 0:
            return self.latent_size_override
        return _vae_latent_size(self.patch_size, self.cr)

    @property
    def latent_channels(self) -> int:
        return self.latent_size // 64

    @property
    def latent_spatial(self) -> int:
        return self.patch_size // 4

    @property
    def latent_dim(self) -> int:
        """True flattened latent dimension implied by the encoder graph."""
        return self.latent_channels * self.latent_spatial**2


@dataclasses.dataclass(frozen=True)
class CondSRVAEConfig:
    """Conditional SR-VAE (reference ``models/cond_vae.py:16-235``).

    ``patch_size`` is the high-resolution patch edge; the low-resolution
    conditioning patch is ``patch_size // 2`` (2x super-resolution).
    """

    cr: float = 1.2
    patch_size: int = 64
    channels: int = 4
    # Use the reference's C-major Flatten/Unflatten reinterpretation for the
    # latent regroupings instead of the default structure-preserving
    # pixel-shuffle (ops/reshape.py). Required for functionally-exact
    # converted reference checkpoints (utils/convert.py); same parameter
    # tree and shapes either way.
    torch_regroup: bool = False
    # Fixed latent budget (see VAEConfig.latent_size_override): overrides
    # the cr-derived ``latent_size`` when > 0. The canonical 64px budget
    # (13,568) at ps=128 keeps the prior heads at their canonical widths,
    # where the cr formula alone would 4x them (~600M params — beyond
    # some compile services). Must be a positive multiple of 256 so both
    # the z (//64) and u (//256·64) channel regroupings stay integral.
    latent_size_override: int = 0

    def __post_init__(self) -> None:
        if self.latent_size_override and (
            self.latent_size_override < 0 or self.latent_size_override % 256
        ):
            raise ValueError(
                "latent_size_override must be a positive multiple of 256 "
                f"(got {self.latent_size_override})"
            )

    @property
    def lr_patch_size(self) -> int:
        return self.patch_size // 2

    @property
    def latent_size(self) -> int:
        if self.latent_size_override > 0:
            return self.latent_size_override
        return _cond_latent_size(self.patch_size, self.cr)

    @property
    def latent_size_y(self) -> int:
        return self.latent_size // 4

    # z lives on an (ps/8, ps/8) grid with latent_size//64 channels.
    @property
    def z_channels(self) -> int:
        return self.latent_size // 64

    @property
    def z_spatial(self) -> int:
        return self.patch_size // 8

    @property
    def z_dim(self) -> int:
        return self.z_channels * self.z_spatial**2

    # u lives on an (ps/8, ps/8) grid of the LR encoder with
    # latent_size_y//64 channels.
    @property
    def u_channels(self) -> int:
        return self.latent_size_y // 64

    @property
    def u_spatial(self) -> int:
        return self.patch_size // 8

    @property
    def u_dim(self) -> int:
        return self.u_channels * self.u_spatial**2


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout: ``dcn`` (slice) x ``data`` (batch) x ``model``.

    The reference is single-device (reference ``train.py:51``); parallelism is
    new here. Batch shards over ``(dcn, data)`` — the ``data`` axis rides the
    ICI ring within a slice; ``dcn`` spans slices over the data-center
    network (multi-slice), carrying only the once-per-step gradient
    all-reduce. The widest conv channel dims may shard over ``model``
    (intra-slice: activations move every layer — keep it on ICI). The mesh
    stays 2-axis unless ``dcn > 1``, so single-slice jobs see the familiar
    ``(data, model)`` layout.
    """

    data: int = -1  # -1: use all remaining devices on the data axis
    model: int = 1
    dcn: int = 1  # number of slices (multi-slice over DCN)

    def axis_sizes(self, n_devices: int) -> Tuple[int, int, int]:
        dcn = max(1, self.dcn)
        model = max(1, self.model)
        data = self.data if self.data > 0 else n_devices // (model * dcn)
        return dcn, data, model


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training-engine hyper-parameters (reference defaults preserved)."""

    epochs: int = 200
    batch_size: int = 16
    learning_rate: float = 1e-4  # reference train.py:65
    grad_clip_norm: float = 1.0  # reference models/base.py:106
    # ReduceLROnPlateau (reference models/base.py:51-53)
    plateau_factor: float = 0.5
    plateau_patience: int = 500
    # EarlyStopping (reference train.py:32)
    early_stop_patience: int = 25
    early_stop_delta: float = 0.01
    val_metrics_every: int = 5
    seed: int = 0
    # Numerical policy: compute convs in bf16 on TPU, accumulate/loss in f32.
    use_bfloat16: bool = False
    # Keep Adam's first moment in bf16 (optax mu_dtype): halves that
    # state's HBM traffic in the (bandwidth-bound) optimizer fusion.
    # Profiled headroom is ~2% of the step (BASELINE.md); opt-in because
    # it changes optimizer numerics (second moment stays f32).
    bf16_moments: bool = False
    # ZeRO-1: shard the large Adam moment tensors over the mesh's data
    # axis (params stay replicated; GSPMD turns the sharded update into
    # per-shard compute + a param all-gather). The profiled win: the
    # update of the two ~46MB prior-head kernels is ~9% of the step and
    # divides by the data-axis size (BASELINE.md). No-op on 1 device.
    zero1: bool = False
    # jax.profiler trace of the second trained epoch is written here
    # (SURVEY §5.a: the reference has no tracing at all).
    profile_dir: str = ""
    # Rematerialize the forward pass during backward (jax.checkpoint):
    # trades ~1 extra forward of FLOPs for dropping all activation storage —
    # for configs whose activations outgrow HBM (large patch/batch).
    remat: bool = False
    # Gradient accumulation: lax.scan the forward/backward over this many
    # microbatches inside ONE jit step (activation memory scales with the
    # microbatch), average the grads, apply ONE optimizer update. Effective
    # batches beyond HBM without host-loop overhead; composes with remat.
    # BatchNorm normalizes per microbatch (running stats thread through
    # the scan) — the standard accumulation semantics.
    accum_steps: int = 1
    # Dispatch fusion: lax.scan this many FULL optimizer steps (each its
    # own batch + update) inside ONE jit dispatch. Amortizes per-dispatch
    # launch latency — the dominant per-step cost on high-latency links
    # (a relayed/tunneled TPU pays the round trip per dispatch) and a real
    # tail cost even locally. Orthogonal to accum_steps (which scans
    # microbatches WITHIN one update); the two compose. Epoch-tail batches
    # that don't fill a chunk run as single steps.
    # 0 = AUTO: after the first epoch the engine probes the warm
    # per-dispatch round trip (utils/health.dispatch_latency) and engages
    # k=2 fusion when it rivals the measured per-step time — the case
    # where unfused throughput collapses (7,592 vs 10,540 p/s in one
    # degraded session, BASELINE.md) — at a measured ~0.994x cost when
    # the link is healthy. Any explicit k >= 1 overrides the probe.
    scan_steps: int = 0
    # Training ELBO reduction kernels: "xla" (default) traces the training
    # loss under ops/pallas_elbo.force_xla — the round-4 end-to-end A/B
    # measured the fused Pallas rows at 0.9896x inside the train step
    # (BASELINE.md; the reductions live in the step's loop-fusion tail
    # where XLA fuses them for free). "pallas" keeps the fused row kernels
    # in training too (the A/B's other arm; eval keeps them either way).
    train_elbo: str = "xla"
