"""Pallas-fused ELBO reductions: Gaussian NLL + KL in single passes.

The north-star kernel (BASELINE.json): the reference evaluates its losses as
chains of torch ops — ``sub``/``pow``/``mean`` temporaries plus separate KL
reductions (``loss/vae_loss.py``, ``loss/cond_vae_loss.py``) — each
materializing intermediates in memory. Here each loss term is ONE kernel
pass per input tensor: a Pallas grid over batch rows computes the row-level
sums (squared error, standard-normal KL, general Gaussian KL) entirely in
VMEM, writing one scalar per row. The scalar assembly with the learned
``gamma`` runs in f32 on the outputs.

Backward passes are analytic one-liner elementwise expressions (registered
via ``jax.custom_vjp``) that XLA fuses into single passes on its own — a
hand-written Pallas bwd would add nothing.

On non-TPU backends the same kernels run in Pallas interpret mode inside
tests; production CPU falls back to the reference jnp implementation in
``ops/losses.py`` (bit-identical semantics, see tests/test_pallas_elbo.py).

Routing (round-4 measurement, BASELINE.md fused-ELBO A/B): inside a
*training* step the fused rows are an end-to-end **0.9896x** against the
plain XLA lowering — the reductions sit inside the step's loop-fusion tail
where XLA already fuses them for free, and the custom call only adds
launch overhead. The training engine therefore traces its loss under
:func:`force_xla` by default (``TrainConfig.train_elbo``), while eval and
any latency-bound single-pass caller keep the fused kernels. The scope is
trace-time and per-context — no process-global kernel mode (that
machinery was deleted in round 3 for a reason).
"""

from __future__ import annotations

import contextlib
from contextvars import ContextVar
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-specific memory spaces; absent on some CPU-only installs
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
    _SMEM = pltpu.SMEM
    _HAVE_PLTPU = True
except ImportError:  # pragma: no cover
    _VMEM = _SMEM = None
    _HAVE_PLTPU = False

Array = jnp.ndarray


_FORCE_XLA: ContextVar[bool] = ContextVar("svrs_elbo_force_xla", default=False)


@contextlib.contextmanager
def force_xla():
    """Trace-time scope: row reductions entered under it lower through the
    plain jnp math (identical semantics to ``ops/losses.py``; same analytic
    custom-VJP backward) instead of the Pallas kernels. The training engine
    wraps its loss construction in this — the fused rows measured 0.9896x
    end-to-end inside the jitted train step (see module docstring) — while
    eval/serving callers outside the scope keep the kernels."""
    tok = _FORCE_XLA.set(True)
    try:
        yield
    finally:
        _FORCE_XLA.reset(tok)


def _use_pallas() -> bool:
    return _HAVE_PLTPU and not _FORCE_XLA.get() and jax.default_backend() == "tpu"


# ------------------------------------------------- multi-chip row dispatch
# GSPMD cannot partition a Pallas custom call over a sharded batch (it
# would gather the full per-row loss inputs onto every chip), so on a
# multi-chip mesh each row reduction runs under ``jax.shard_map`` over the
# mesh's batch axes instead: every chip runs the SAME fused kernel on its
# local rows, the (B,) row-sum output stays batch-sharded, and the scalar
# assembly around it (``jnp.sum``/``jnp.mean``) reduces through GSPMD's
# ordinary cross-shard collectives. Row sums are per-row independent, so
# sharded and single-chip results agree exactly. Routing is per-call (the
# caller passes its mesh) — no process-global state.


def _mesh_batch_info(mesh) -> Tuple[Tuple[str, ...], int]:
    # single source of truth for which mesh axes carry the batch dim
    # (parallel.mesh.batch_axes), filtered by presence so hand-built
    # meshes without those axes degrade to the plain call
    from simple_vae_rs_tpu.parallel.mesh import batch_axes

    axes = tuple(a for a in batch_axes(mesh) if a in mesh.axis_names)
    n = 1
    for a in axes:
        n *= int(mesh.shape[a])
    return axes, n


def _rows_op(fn, mesh, *args: Array) -> Array:
    """Apply a (B, D)... -> (B,) row reduction, shard_mapped over the
    mesh's batch axes when it spans more than one chip. Falls back to the
    plain call when the batch does not divide the shard count (ragged
    final batches) — same numerics either way."""
    if mesh is None:
        return fn(*args)
    axes, n = _mesh_batch_info(mesh)
    if n <= 1 or args[0].shape[0] % n:
        return fn(*args)
    from jax.sharding import PartitionSpec as P

    row_spec = P(axes, None)
    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=tuple(row_spec for _ in args),
        out_specs=P(axes),
        check_vma=False,
    )(*args)


# Mosaic requires the sublane (second-to-last) block dim to be a multiple
# of 8 (f32 tile is 8x128), so the grid walks 8-row blocks. The feature
# dim is tiled too — the 128px configs reach 218k features per row, far
# beyond VMEM for a full-row block — with the row-sum accumulated across
# inner grid steps (the output block revisits the same index for every
# column block). Ragged edges are zero-padded: all three reductions map
# zero elements to an exactly-zero contribution (for the general-Gaussian
# KL, (0-0-1) + e^0 + 0 = 0).
_ROWS = 8
_MAX_COLS = 32768  # 8 x 32768 x 4B = 1 MB per input block


def _rows_call(kernel, n_in: int, rows: Tuple[Array, ...], interpret: bool):
    b, d = rows[0].shape
    bp = -(-b // _ROWS) * _ROWS
    cb = min(d, _MAX_COLS)
    dp = -(-d // cb) * cb
    if (bp, dp) != (b, d):
        rows = tuple(jnp.pad(r, ((0, bp - b), (0, dp - d))) for r in rows)
    out = pl.pallas_call(
        kernel,
        grid=(bp // _ROWS, dp // cb),
        in_specs=[
            pl.BlockSpec((_ROWS, cb), lambda i, j: (i, j), memory_space=_VMEM)
            for _ in range(n_in)
        ],
        out_specs=pl.BlockSpec((_ROWS, 1), lambda i, j: (i, 0), memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, 1), jnp.float32),
        interpret=interpret,
    )(*rows)
    return out[:b, 0]


def _accumulate(out_ref, partial: Array) -> None:
    """Zero the accumulator on the first column block, then accumulate."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += partial


# ------------------------------------------------------------ sq_rows
def _sq_kernel(a_ref, b_ref, out_ref):
    d = a_ref[...] - b_ref[...]
    _accumulate(out_ref, jnp.sum(d * d, axis=1, keepdims=True))


@jax.custom_vjp
def sq_rows(a: Array, b: Array) -> Array:
    """(B, D) x2 -> (B,) row sums of (a - b)^2, one fused pass."""
    return _sq_rows_impl(a, b)


def _sq_rows_impl(a, b, interpret=False):
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if not (interpret or _use_pallas()):
        return jnp.sum((a - b) ** 2, axis=1)
    return _rows_call(_sq_kernel, 2, (a, b), interpret)


def _sq_fwd(a, b):
    return sq_rows(a, b), (a, b)


def _sq_bwd(res, g):
    a, b = res
    ga = (2.0 * g[:, None]) * (a.astype(jnp.float32) - b.astype(jnp.float32))
    return ga.astype(a.dtype), (-ga).astype(b.dtype)


sq_rows.defvjp(_sq_fwd, _sq_bwd)


# -------------------------------------------------------- kl_std_rows
def _kl_std_kernel(mu_ref, lv_ref, out_ref):
    mu = mu_ref[...]
    lv = lv_ref[...]
    _accumulate(
        out_ref, jnp.sum(mu * mu + jnp.exp(lv) - 1.0 - lv, axis=1, keepdims=True)
    )


@jax.custom_vjp
def kl_std_rows(mu: Array, logvar: Array) -> Array:
    """(B, D) -> (B,) row sums of mu^2 + e^lv - 1 - lv, one fused pass."""
    return _kl_std_rows_impl(mu, logvar)


def _kl_std_rows_impl(mu, logvar, interpret=False):
    mu = mu.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    if not (interpret or _use_pallas()):
        return jnp.sum(mu**2 + jnp.exp(logvar) - 1.0 - logvar, axis=1)
    return _rows_call(_kl_std_kernel, 2, (mu, logvar), interpret)


def _kl_std_fwd(mu, lv):
    return kl_std_rows(mu, lv), (mu, lv)


def _kl_std_bwd(res, g):
    mu, lv = res
    g = g[:, None]
    return (
        (2.0 * g * mu).astype(mu.dtype),
        (g * (jnp.exp(lv) - 1.0)).astype(lv.dtype),
    )


kl_std_rows.defvjp(_kl_std_fwd, _kl_std_bwd)


# -------------------------------------------------------- kl_gen_rows
def _kl_gen_kernel(mu2_ref, lv2_ref, mu3_ref, lv3_ref, out_ref):
    mu2, lv2 = mu2_ref[...], lv2_ref[...]
    mu3, lv3 = mu3_ref[...], lv3_ref[...]
    dm = mu2 - mu3
    _accumulate(
        out_ref,
        jnp.sum(
            (lv3 - lv2 - 1.0) + jnp.exp(lv2 - lv3) + dm * dm * jnp.exp(-lv3),
            axis=1,
            keepdims=True,
        ),
    )


@jax.custom_vjp
def kl_gen_rows(mu2: Array, lv2: Array, mu3: Array, lv3: Array) -> Array:
    """General-Gaussian KL row sums (reference cond_vae_loss.py:50-57)."""
    return _kl_gen_rows_impl(mu2, lv2, mu3, lv3)


def _kl_gen_rows_impl(mu2, lv2, mu3, lv3, interpret=False):
    args = tuple(t.astype(jnp.float32) for t in (mu2, lv2, mu3, lv3))
    if not (interpret or _use_pallas()):
        mu2, lv2, mu3, lv3 = args
        return jnp.sum(
            (lv3 - lv2 - 1.0)
            + jnp.exp(lv2 - lv3)
            + (mu2 - mu3) ** 2 * jnp.exp(-lv3),
            axis=1,
        )
    return _rows_call(_kl_gen_kernel, 4, args, interpret)


def _kl_gen_fwd(mu2, lv2, mu3, lv3):
    return kl_gen_rows(mu2, lv2, mu3, lv3), (mu2, lv2, mu3, lv3)


def _kl_gen_bwd(res, g):
    mu2, lv2, mu3, lv3 = (t.astype(jnp.float32) for t in res)
    g = g[:, None]
    e_dlv = jnp.exp(lv2 - lv3)
    e_nlv3 = jnp.exp(-lv3)
    dm = mu2 - mu3
    dmu2 = g * 2.0 * dm * e_nlv3
    dlv2 = g * (e_dlv - 1.0)
    dmu3 = -dmu2
    dlv3 = g * (1.0 - e_dlv - dm * dm * e_nlv3)
    o = res
    return (
        dmu2.astype(o[0].dtype),
        dlv2.astype(o[1].dtype),
        dmu3.astype(o[2].dtype),
        dlv3.astype(o[3].dtype),
    )


kl_gen_rows.defvjp(_kl_gen_fwd, _kl_gen_bwd)


# ----------------------------------------------------------- assembly
def _flat(t: Array) -> Array:
    return t.reshape(t.shape[0], -1)


def fused_base_loss(
    recon_x: Array, x: Array, mu: Array, logvar: Array, gamma: Array,
    mesh=None,
) -> Tuple[Array, Array]:
    """Plain-VAE (mse, kld), numerically identical to ``ops.losses.base_loss``.

    ``mse = d*(MSE/(2g^2) + log g) = sum_sq/(2g^2) + d*log g``.
    ``mesh`` routes the fused row kernels per-shard on multi-chip meshes
    (see ``_rows_op``).
    """
    gamma = gamma.astype(jnp.float32)
    d = recon_x.size
    sum_sq = jnp.sum(_rows_op(sq_rows, mesh, _flat(recon_x), _flat(x)))
    mse = sum_sq / (2.0 * gamma**2) + d * jnp.log(gamma)
    kld = 0.5 * jnp.mean(_rows_op(kl_std_rows, mesh, mu, logvar))
    return mse, kld


def fused_cond_loss(
    recon_x: Array,
    x: Array,
    recon_y: Array,
    y: Array,
    mu_u: Array,
    logvar_u: Array,
    mu_z: Array,
    logvar_z: Array,
    mu_z_uy: Array,
    logvar_z_uy: Array,
    gammax: Array,
    gammay: Array,
    mesh=None,
) -> Tuple[Array, Array, Array, Array]:
    """Cond_SRVAE terms, numerically identical to ``ops.losses.cond_loss``.

    ``mesh`` routes the fused row kernels per-shard on multi-chip meshes
    (see ``_rows_op``).
    """
    gammax = gammax.astype(jnp.float32)
    gammay = gammay.astype(jnp.float32)
    nx, ny = recon_x.size, recon_y.size
    mse_x = jnp.sum(_rows_op(sq_rows, mesh, _flat(recon_x), _flat(x))) / (
        2.0 * gammax**2
    ) + nx * jnp.log(gammax)
    mse_y = jnp.sum(_rows_op(sq_rows, mesh, _flat(recon_y), _flat(y))) / (
        2.0 * gammay**2
    ) + ny * jnp.log(gammay)
    kld_u = 0.5 * jnp.mean(_rows_op(kl_std_rows, mesh, mu_u, logvar_u))
    kld_z = 0.5 * jnp.mean(
        _rows_op(kl_gen_rows, mesh, mu_z, logvar_z, mu_z_uy, logvar_z_uy)
    )
    return mse_x, kld_u, mse_y, kld_z
