"""Convert checkpoints between the reference's PyTorch format and ours.

Both migration directions: a ``.pth`` ``state_dict`` saved by the
reference's ``ModelCheckpoint`` (``callbacks.py:140-143``) maps onto this
framework's parameter tree (``convert_*``), and a tree trained here
exports back to a strict-loadable reference ``state_dict``
(``export_*``) for torch-side serving. Tensor-level rules:

- ``Conv2d.weight``  (out, in, kh, kw)  -> kernel (kh, kw, in, out)
- ``ConvTranspose2d.weight`` (in, out, kh, kw) -> kernel (kh, kw, in, out),
  spatially flipped (our transposed conv is the input-dilated regular conv,
  which is the flipped-kernel reparametrization — see
  ``ops/conv_blocks.torch_conv_transpose``)
- ``BatchNorm2d``: weight->scale, bias->bias, running_mean/var->batch_stats
- gammas: NOT in reference checkpoints (plain tensors, SURVEY §2.2-7);
  initialized to 1.0.

Fidelity notes:

- **VAE**: conversion is *functionally exact*. The latent flattening order
  differs (HWC vs the reference's CHW) but is internal: our encoder and
  decoder agree with each other, and every parameterized op is a conv on
  the same feature maps.
- **Cond_SRVAE**: conversion is *functionally exact* when the model is
  built with ``CondSRVAEConfig(torch_regroup=True)``, which reproduces the
  reference's C-major Flatten/Unflatten reinterpretations
  (``cond_vae.py:167-231``) as explicit reshapes
  (``ops/reshape.cmajor_regroup_{down,up}``) — proven end-to-end against a
  torch re-derivation of the full 8-tuple in ``tests/test_torch_parity.py``.
  With the default pixel-shuffle regrouping the encoder/decoder paths are
  still exact but the prior heads see a different fixed permutation of
  their inputs — fine-tune briefly after converting in that case.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

Tensors = Dict[str, np.ndarray]


def _conv(src: Tensors, torch_prefix: str, transpose: bool = False) -> Dict:
    w = np.asarray(src[f"{torch_prefix}.weight"])
    if transpose:
        kernel = w.transpose(2, 3, 0, 1)[::-1, ::-1]  # (in,out,kh,kw)->flip
    else:
        kernel = w.transpose(2, 3, 1, 0)  # (out,in,kh,kw)->(kh,kw,in,out)
    out = {"kernel": np.ascontiguousarray(kernel, dtype=np.float32)}
    bias = src.get(f"{torch_prefix}.bias")
    if bias is not None:
        out["bias"] = np.asarray(bias, dtype=np.float32)
    return out


def _bn(src: Tensors, torch_prefix: str) -> Tuple[Dict, Dict]:
    params = {
        "scale": np.asarray(src[f"{torch_prefix}.weight"], np.float32),
        "bias": np.asarray(src[f"{torch_prefix}.bias"], np.float32),
    }
    stats = {
        "mean": np.asarray(src[f"{torch_prefix}.running_mean"], np.float32),
        "var": np.asarray(src[f"{torch_prefix}.running_var"], np.float32),
    }
    return params, stats


def _block(src: Tensors, torch_prefix: str, up: bool) -> Tuple[Dict, Dict]:
    """down_block / up_block -> DownBlock/UpBlock params + batch_stats."""
    sub = "upsample" if up else "downsample"
    params = {
        "conv": _conv(src, f"{torch_prefix}.conv"),
        sub: _conv(src, f"{torch_prefix}.{sub}", transpose=up),
    }
    stats = {}
    if f"{torch_prefix}.bn.weight" in src:
        bn_p, bn_s = _bn(src, f"{torch_prefix}.bn")
        params["bn"] = bn_p
        stats["bn"] = bn_s
    return params, stats


# our module name -> (reference Sequential entry, is_block, is_up)
_VAE_ENCODER: List[Tuple[str, str, bool, bool]] = [
    ("enc_down1", "encoder.0", True, False),
    ("enc_down2", "encoder.1", True, False),
    ("enc_conv1", "encoder.2", False, False),
    ("enc_conv2", "encoder.3", False, False),
    ("enc_conv3", "encoder.4", False, False),
    ("enc_head", "encoder.5", False, False),
]
_VAE_DECODER: List[Tuple[str, str, bool, bool]] = [
    ("dec_up1", "decoder.1", True, True),
    ("dec_up2", "decoder.2", True, True),
    ("dec_conv1", "decoder.3", False, False),
    ("dec_conv2", "decoder.4", False, False),
    ("dec_conv3", "decoder.5", False, False),
    ("dec_conv4", "decoder.6", False, False),
]

_COND_MAP: List[Tuple[str, str, bool, bool]] = [
    # encoder_y (cond_vae.py:27-49)
    ("ey_down1", "encoder_y.0", True, False),
    ("ey_down2", "encoder_y.1", True, False),
    ("ey_conv1", "encoder_y.2", False, False),
    ("ey_conv2", "encoder_y.3", False, False),
    ("ey_conv3", "encoder_y.4", False, False),
    ("ey_head", "encoder_y.5", False, False),
    # decoder_y (51-81)
    ("dy_up1", "decoder_y.1", True, True),
    ("dy_up2", "decoder_y.2", True, True),
    ("dy_conv1", "decoder_y.3", False, False),
    ("dy_conv2", "decoder_y.4", False, False),
    ("dy_conv3", "decoder_y.5", False, False),
    ("dy_conv4", "decoder_y.6", False, False),
    # encoder_x (83-108)
    ("ex_down1", "encoder_x.0", True, False),
    ("ex_down2", "encoder_x.1", True, False),
    ("ex_down3", "encoder_x.2", True, False),
    ("ex_conv1", "encoder_x.3", False, False),
    ("ex_conv2", "encoder_x.4", False, False),
    ("ex_conv3", "encoder_x.5", False, False),
    ("ex_head", "encoder_x.6", False, False),
    # decoder_x (110-144)
    ("dx_up1", "decoder_x.1", True, True),
    ("dx_up2", "decoder_x.2", True, True),
    ("dx_up3", "decoder_x.3", True, True),
    ("dx_conv1", "decoder_x.4", False, False),
    ("dx_conv2", "decoder_x.5", False, False),
    ("dx_conv3", "decoder_x.6", False, False),
    ("dx_conv4", "decoder_x.7", False, False),
    # y_to_z (146-165)
    ("yz_down1", "y_to_z.0", True, False),
    ("yz_down2", "y_to_z.1", True, False),
    ("yz_down3", "y_to_z.2", True, False),
    ("yz_conv1", "y_to_z.3", False, False),
    ("yz_conv2", "y_to_z.4", False, False),
    # u_to_z (167-189)
    ("uz_conv1", "u_to_z.1", False, False),
    ("uz_conv2", "u_to_z.2", False, False),
    # prior heads (191-231)
    ("pz_mu_conv1", "mu_u_y_to_z.1", False, False),
    ("pz_mu_conv2", "mu_u_y_to_z.2", False, False),
    ("pz_lv_conv1", "logvar_u_y_to_z.1", False, False),
    ("pz_lv_conv2", "logvar_u_y_to_z.2", False, False),
]


def _convert(mapping, src: Tensors) -> Tuple[Dict, Dict]:
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for ours, theirs, is_block, is_up in mapping:
        if is_block:
            p, s = _block(src, theirs, is_up)
            params[ours] = p
            if s:
                stats[ours] = s
        else:
            params[ours] = _conv(src, theirs)
    return params, stats


def convert_vae_state_dict(src: Tensors) -> Dict[str, Any]:
    """Reference VAE state_dict -> {'params', 'batch_stats'} trees."""
    params, stats = _convert(_VAE_ENCODER + _VAE_DECODER, src)
    params["gamma"] = np.float32(src.get("gamma", 1.0))
    return {"params": params, "batch_stats": stats}


def convert_cond_state_dict(src: Tensors) -> Dict[str, Any]:
    """Reference Cond_SRVAE state_dict -> {'params', 'batch_stats'} trees."""
    params, stats = _convert(_COND_MAP, src)
    params["gammax"] = np.float32(src.get("gammax", 1.0))
    params["gammay"] = np.float32(src.get("gammay", 1.0))
    return {"params": params, "batch_stats": stats}


# ----------------------------------------------------------------- export
# The inverse direction: this framework's variable trees -> a reference
# PyTorch ``state_dict``, so models trained here drop into the reference's
# own code (``Cond_SRVAE.load_state_dict``) and any torch serving stack.
# Exact inverses of the tensor rules above; gammas are NOT emitted because
# the reference's checkpoints never contain them (plain tensors, SURVEY
# §2.2-7) — its ``state_dict`` loads strictly without them.


def _conv_export(params: Dict, torch_prefix: str,
                 transpose: bool = False) -> Tensors:
    k = np.asarray(params["kernel"], np.float32)
    if transpose:
        # inverse of (in,out,kh,kw)->transpose(2,3,0,1)->spatial flip
        w = np.ascontiguousarray(k[::-1, ::-1].transpose(2, 3, 0, 1))
    else:
        w = np.ascontiguousarray(k.transpose(3, 2, 0, 1))
    out = {f"{torch_prefix}.weight": w}
    if "bias" in params:
        out[f"{torch_prefix}.bias"] = np.asarray(params["bias"], np.float32)
    return out


def _bn_export(params: Dict, stats: Dict, torch_prefix: str) -> Tensors:
    return {
        f"{torch_prefix}.weight": np.asarray(params["scale"], np.float32),
        f"{torch_prefix}.bias": np.asarray(params["bias"], np.float32),
        f"{torch_prefix}.running_mean": np.asarray(stats["mean"], np.float32),
        f"{torch_prefix}.running_var": np.asarray(stats["var"], np.float32),
        # BatchNorm2d state_dicts carry this buffer; torch's strict load
        # requires the key, and the value only matters for momentum=None
        # cumulative averaging (the reference uses the default momentum)
        f"{torch_prefix}.num_batches_tracked": np.asarray(0, np.int64),
    }


def _export(mapping, params: Dict, stats: Dict) -> Tensors:
    sd: Tensors = {}
    for ours, theirs, is_block, is_up in mapping:
        mod = params[ours]
        if is_block:
            sub = "upsample" if is_up else "downsample"
            sd.update(_conv_export(mod["conv"], f"{theirs}.conv"))
            sd.update(_conv_export(mod[sub], f"{theirs}.{sub}", transpose=is_up))
            if "bn" in mod:
                sd.update(_bn_export(mod["bn"], stats[ours]["bn"],
                                     f"{theirs}.bn"))
        else:
            sd.update(_conv_export(mod, theirs))
    return sd


def export_vae_state_dict(tree: Dict[str, Any],
                          include_gammas: bool = False) -> Tensors:
    """{'params', 'batch_stats'} trees -> reference VAE ``state_dict``.

    Functionally exact (the latent flattening-order difference is internal
    to matched encoder/decoder pairs — see the conversion notes above).
    ``include_gammas`` adds the trained ``gamma`` as an extra key: a
    LOSSLESS roundtrip through ``convert_vae_state_dict`` (which reads
    it), but the reference's ``load_state_dict`` then needs
    ``strict=False``.
    """
    import jax

    params = jax.device_get(tree["params"])
    sd = _export(_VAE_ENCODER + _VAE_DECODER, params,
                 jax.device_get(tree.get("batch_stats", {})))
    if include_gammas:
        sd["gamma"] = np.asarray(params["gamma"], np.float32)
    return sd


def export_cond_state_dict(tree: Dict[str, Any],
                           include_gammas: bool = False) -> Tensors:
    """{'params', 'batch_stats'} trees -> reference Cond_SRVAE ``state_dict``.

    Exact for models built with ``torch_regroup=True``; with the default
    pixel-shuffle regrouping the prior heads see a permuted latent in the
    reference graph (mirror of the import caveat) — fine-tune after
    loading in that case. ``include_gammas`` as in
    :func:`export_vae_state_dict` (adds ``gammax``/``gammay``).
    """
    import jax

    params = jax.device_get(tree["params"])
    sd = _export(_COND_MAP, params,
                 jax.device_get(tree.get("batch_stats", {})))
    if include_gammas:
        sd["gammax"] = np.asarray(params["gammax"], np.float32)
        sd["gammay"] = np.asarray(params["gammay"], np.float32)
    return sd


def save_torch_state_dict(path: str, sd: Tensors) -> None:
    """Write an exported state_dict as a ``.pth`` loadable by the reference
    (plain tensor leaves — survives ``torch.load(weights_only=True)``)."""
    import torch

    # copy=True: device_get views can be non-writable, which torch rejects
    torch.save({k: torch.from_numpy(np.array(v, copy=True))
                for k, v in sd.items()}, path)


def load_torch_state_dict(path: str, allow_pickle: bool = False) -> Tensors:
    """Read a ``.pth`` state_dict into numpy (requires torch).

    Tries the safe ``weights_only=True`` first (plain tensor state_dicts,
    the reference's format). Checkpoints that pickle numpy arrays or other
    non-tensor leaves need the legacy unpickler, which executes arbitrary
    pickle bytecode — that path requires the explicit ``allow_pickle=True``
    opt-in (never a silent fallback) and still warns.
    """
    import numpy as np
    import torch

    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as exc:
        if not allow_pickle:
            raise ValueError(
                f"{path}: not loadable with weights_only=True (non-tensor "
                "pickle content). Loading it requires the legacy "
                "unpickler, which can execute arbitrary code — pass "
                "allow_pickle=True (CLI: --allow_pickle) only for "
                "checkpoints you trust."
            ) from exc
        import warnings

        warnings.warn(
            f"{path}: not loadable with weights_only=True (non-tensor "
            "pickle content); falling back to the legacy unpickler — only "
            "convert checkpoints you trust.",
            stacklevel=2,
        )
        sd = torch.load(path, map_location="cpu", weights_only=False)
    out = {}
    for k, v in sd.items():
        out[k] = v.numpy() if isinstance(v, torch.Tensor) else np.asarray(v)
    return out
