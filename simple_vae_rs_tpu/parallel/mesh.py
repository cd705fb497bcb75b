"""Device mesh and sharding layout.

The reference has no distributed story at all (single device, SURVEY §2
rows 14-15). This module is the TPU-native replacement: a
``jax.sharding.Mesh`` with

- ``data`` axis — batch/patch sharding over the ICI ring. The grid-mode
  16x-patch axis folds into the batch, so one 256px tile's patches spread
  across chips.
- ``model`` axis — optional tensor sharding of the widest conv channel
  dims (the flatten-side heads at cr=1.2 reach 848 channels), for configs
  whose activations outgrow one chip's HBM. Size 1 by default: at ~49M
  params DP is the right parallelism, but every entry point keeps the axis
  open (BASELINE.json multispectral config).

Everything below runs under plain ``jit``: arrays carry
``NamedSharding``s, XLA's SPMD partitioner inserts the collectives
(gradient ``psum`` over ``data``, channel all-gathers over ``model``) —
exactly the scaling-book recipe: pick a mesh, annotate shardings, let XLA
insert collectives.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from simple_vae_rs_tpu.config import MeshConfig


def make_mesh(
    cfg: Optional[MeshConfig] = None, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """Build a ``(data, model)`` — or, when ``cfg.dcn > 1``,
    ``(dcn, data, model)`` — mesh over the available devices.

    ``jax.devices()`` orders devices slice-major on multi-slice TPU
    deployments, so the leading ``dcn`` reshape axis lands on the DCN
    boundary: only the gradient all-reduce crosses it, while ``data``/
    ``model`` collectives ride the intra-slice ICI."""
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    dcn, data, model = cfg.axis_sizes(len(devices))
    need = dcn * data * model
    if need > len(devices):
        raise ValueError(
            f"mesh {dcn}x{data}x{model} needs {need} devices, have {len(devices)}"
        )
    if dcn > 1:
        dev_array = np.asarray(devices[:need]).reshape(dcn, data, model)
        return Mesh(dev_array, axis_names=("dcn", "data", "model"))
    dev_array = np.asarray(devices[:need]).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_axes(mesh: Mesh) -> Tuple[str, ...]:
    """Mesh axes the batch dim shards over (dcn included when present)."""
    return ("dcn", "data") if "dcn" in mesh.axis_names else ("data",)


def shard_batch(mesh: Mesh, batch: Tuple[Any, ...],
                time_major: bool = False) -> Tuple[Any, ...]:
    """Shard each (B, H, W, C) array's batch dim over the batch axes
    (``data``, plus ``dcn`` on a multi-slice mesh).

    Multi-host: each process passes its *local* slice of the global batch
    and ``jax.make_array_from_process_local_data`` assembles the global
    array (SURVEY §5.h); single-host uses a plain ``device_put``.

    ``time_major=True`` handles (k, B, H, W, C) stacks — the fused
    multi-step dispatch's input (``scan_steps``): the leading scan axis
    replicates and the SECOND axis is the batch dim to shard.
    """
    out = []
    multihost = jax.process_count() > 1
    axes = batch_axes(mesh)
    lead = (None,) if time_major else ()
    for arr in batch:
        spec = P(*lead, axes, *([None] * (arr.ndim - 1 - len(lead))))
        sharding = NamedSharding(mesh, spec)
        if multihost:
            out.append(jax.make_array_from_process_local_data(sharding, arr))
        else:
            out.append(jax.device_put(arr, sharding))
    return tuple(out)


# Conv kernels whose output-channel dim shards over the `model` axis when
# it has size > 1: the wide prior/conditioning heads (latent//16 channels).
_MODEL_SHARDED = re.compile(
    r"(yz_conv2|uz_conv2|pz_mu_conv\d|pz_lv_conv\d|ex_head|ey_head|enc_head)"
)


def _spec_for(path: str, leaf) -> P:
    if leaf.ndim == 4 and _MODEL_SHARDED.search(path):
        return P(None, None, None, "model")  # (kh, kw, in, out)
    if leaf.ndim == 1 and _MODEL_SHARDED.search(path):
        return P("model")  # bias
    return P()  # replicated


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """NamedSharding tree for the params: replicated, except wide heads
    channel-sharded over ``model`` (no-op when the axis has size 1)."""
    if mesh.shape.get("model", 1) == 1:
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), params)

    def to_sharding(path, leaf):
        name = jax.tree_util.keystr(path)
        return NamedSharding(mesh, _spec_for(name, leaf))

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Place a pytree fully replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


# ZeRO-1 only pays off on tensors whose update traffic matters; tiny
# leaves would trade a fused elementwise op for collective latency.
_ZERO1_MIN_ELEMS = 1 << 20


def _zero1_spec(spec: P, leaf, data_axis: int) -> P:
    """Extend ``spec`` (the model-axis channel rule) by sharding the
    largest still-unsharded dim of a big moment tensor over ``data``."""
    if leaf.ndim == 0 or leaf.size < _ZERO1_MIN_ELEMS or data_axis <= 1:
        return spec
    dims = list(spec) + [None] * (leaf.ndim - len(spec))
    # largest divisible unsharded dim; ties -> later dim (channels,
    # contiguous lanes stay whole when an earlier dim works)
    best, best_size = None, 0
    for i, (d, cur) in enumerate(zip(leaf.shape, dims)):
        if cur is None and d % data_axis == 0 and d >= best_size:
            best, best_size = i, d
    if best is None:
        return spec
    dims[best] = "data"
    return P(*dims)


def shard_state(mesh: Mesh, state: Any, zero1: bool = False) -> Any:
    """Place a TrainState: params and Adam moments per ``param_shardings``
    (the moment trees repeat the param names, so the same channel rules
    apply), everything else replicated.

    ``zero1=True`` additionally shards each large Adam moment tensor over
    the ``data`` axis (params stay replicated): XLA's partitioner then
    computes the optimizer update per shard and all-gathers the updated
    params — ZeRO-1 from sharding annotations alone.
    """
    data_axis = int(mesh.shape.get("data", 1))

    def put(path, leaf, moments=False):
        name = jax.tree_util.keystr(path)
        if mesh.shape.get("model", 1) > 1 and hasattr(leaf, "ndim"):
            spec = _spec_for(name, leaf)
        else:
            spec = P()
        if moments and zero1 and hasattr(leaf, "ndim"):
            spec = _zero1_spec(spec, leaf, data_axis)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    params = jax.tree_util.tree_map_with_path(put, state.params)
    opt_state = jax.tree_util.tree_map_with_path(
        lambda p, x: put(p, x, moments=True), state.opt_state
    )
    rest = replicate(mesh, (state.batch_stats, state.rng, state.step))
    return state.replace(
        params=params,
        opt_state=opt_state,
        batch_stats=rest[0],
        rng=rest[1],
        step=rest[2],
    )
