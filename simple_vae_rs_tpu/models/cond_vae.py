"""Conditional super-resolution VAE (srVAE-style, after Gatopoulos et al.).

Architecture parity with reference ``models/cond_vae.py:16-235``; six
sub-networks:

- ``encoder_y``  q(u|y):   LR ps/2 -> 2 DownBlocks + 4 convs -> u grid
- ``decoder_y``  p(y|u):   u grid -> 2 UpBlocks + 4 convs + sigmoid -> LR
- ``encoder_x``  q(z|x):   HR ps -> 3 DownBlocks + 4 convs -> z grid
- ``decoder_x``  p(x|z,y): concat(y-embedding, z) -> 3 UpBlocks + 4 convs
- ``y_to_z``:    LR -> 3 DownBlocks + 2 convs -> conditioning features
- ``u_to_z`` + ``mu/logvar_u_y_to_z``: conditional prior p(z|u, y), logvar
  clamped to [-7, 7] (reference ``cond_vae.py:230`` Hardtanh)

plus learnable decoder stds ``gammax``/``gammay`` (init 1.0).

TPU-first redesign (documented divergences, same capability/param counts):

- NHWC; latent quantities stay *feature maps* on their natural grids.
  q(z|x) and p(z|u,y) both live on the (ps/8, ps/8, latent//64) z-grid —
  prior heads emit (ps/16, ps/16, latent//16) and are pixel-shuffled up,
  replacing the reference's C-major flatten/unflatten reinterpretations
  (see ``ops/reshape.py``). Set ``config.torch_regroup`` to use the
  reference's exact C-major bijection instead — required for
  functionally-exact converted reference checkpoints
  (``utils/convert.py``; proven in ``tests/test_torch_parity.py``).
- ``y_to_z`` is computed once per forward and shared between the prior and
  ``decoder_x`` (the reference runs it twice per step —
  ``cond_vae.py:239,271``; SURVEY §3.2 flags the fusion).
- posterior sampling is a chunked batched decode (``sample``), HBM-safe for
  the 1000-draw uncertainty task (reference ``models/base.py:306``).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from simple_vae_rs_tpu.config import CondSRVAEConfig
from simple_vae_rs_tpu.models.vae import reparameterize
from simple_vae_rs_tpu.ops.conv_blocks import DownBlock, UpBlock, torch_conv
from simple_vae_rs_tpu.ops.reshape import (
    cmajor_regroup_down,
    cmajor_regroup_up,
    depth_to_space,
    flatten_map,
    space_to_depth,
)

Array = jnp.ndarray


class CondSRVAE(nn.Module):
    """Conditional SR-VAE; ``__call__`` returns the reference 8-tuple."""

    config: CondSRVAEConfig
    dtype: Optional[Any] = None

    def setup(self):
        cfg = self.config
        ch = cfg.channels
        lz64 = cfg.latent_size // 64  # z-grid channels
        lz16 = cfg.latent_size // 16  # prior-head channels (ps/16 grid)
        ly64 = cfg.latent_size_y // 64  # u-grid channels
        ly16 = cfg.latent_size_y // 16
        if min(lz64, ly64) < 1:
            raise ValueError(
                f"latent channels < 1 for patch_size={cfg.patch_size}, cr={cfg.cr}"
            )
        dt = self.dtype

        self.gammax = self.param("gammax", nn.initializers.ones, ())
        self.gammay = self.param("gammay", nn.initializers.ones, ())

        # encoder_y (reference cond_vae.py:27-49)
        self.ey_down1 = DownBlock(ch, 16, dtype=dt)
        self.ey_down2 = DownBlock(16, 64, dtype=dt)
        self.ey_conv1 = torch_conv(64, 64, dtype=dt)
        self.ey_conv2 = torch_conv(128, 64, dtype=dt)
        self.ey_conv3 = torch_conv(128, 128, dtype=dt)
        self.ey_head = torch_conv(2 * ly64, 128, dtype=dt)

        # decoder_y (cond_vae.py:51-81)
        self.dy_up1 = UpBlock(ly64, 128, dtype=dt)
        self.dy_up2 = UpBlock(128, 64, dtype=dt)
        self.dy_conv1 = torch_conv(64, 64, dtype=dt)
        self.dy_conv2 = torch_conv(16, 64, dtype=dt)
        self.dy_conv3 = torch_conv(16, 16, dtype=dt)
        self.dy_conv4 = torch_conv(ch, 16, dtype=dt)

        # encoder_x (cond_vae.py:83-108)
        self.ex_down1 = DownBlock(ch, 16, dtype=dt)
        self.ex_down2 = DownBlock(16, 64, dtype=dt)
        self.ex_down3 = DownBlock(64, 128, dtype=dt)
        self.ex_conv1 = torch_conv(128, 128, dtype=dt)
        self.ex_conv2 = torch_conv(128, 128, dtype=dt)
        self.ex_conv3 = torch_conv(128, 128, dtype=dt)
        self.ex_head = torch_conv(2 * lz64, 128, dtype=dt)

        # decoder_x (cond_vae.py:110-144)
        self.dx_up1 = UpBlock(2 * lz64, 256, dtype=dt)
        self.dx_up2 = UpBlock(256, 128, dtype=dt)
        self.dx_up3 = UpBlock(128, 64, dtype=dt)
        self.dx_conv1 = torch_conv(64, 64, dtype=dt)
        self.dx_conv2 = torch_conv(16, 64, dtype=dt)
        self.dx_conv3 = torch_conv(16, 16, dtype=dt)
        self.dx_conv4 = torch_conv(ch, 16, dtype=dt)

        # y_to_z conditioning embedding (cond_vae.py:146-165)
        self.yz_down1 = DownBlock(ch, 16, dtype=dt)
        self.yz_down2 = DownBlock(16, 64, dtype=dt)
        self.yz_down3 = DownBlock(64, 128, dtype=dt)
        self.yz_conv1 = torch_conv(128, 128, dtype=dt)
        self.yz_conv2 = torch_conv(lz16, 128, dtype=dt)

        # u_to_z (cond_vae.py:167-189)
        self.uz_conv1 = torch_conv(ly16, ly16, dtype=dt)
        self.uz_conv2 = torch_conv(lz16, ly16, dtype=dt)

        # conditional prior heads (cond_vae.py:191-231)
        self.pz_mu_conv1 = torch_conv(lz16, 2 * lz16, dtype=dt)
        self.pz_mu_conv2 = torch_conv(lz16, lz16, dtype=dt)
        self.pz_lv_conv1 = torch_conv(lz16, 2 * lz16, dtype=dt)
        self.pz_lv_conv2 = torch_conv(lz16, lz16, dtype=dt)

    # ------------------------------------------------------------- encoders
    def encode_y(self, y: Array, train: bool = True) -> Tuple[Array, Array]:
        """LR (B, ps/2, ps/2, C) -> (mu_u, logvar_u) maps on the u grid."""
        from simple_vae_rs_tpu.ops.conv_blocks import tail_chain

        h = self.ey_down1(y, train)
        h = self.ey_down2(h, train)
        chained = tail_chain(
            self, h, ("ey_conv1", "ey_conv2", "ey_conv3", "ey_head"), train
        )
        if chained is None:
            h = self.ey_conv1(h)
            h = self.ey_conv2(h)
            h = self.ey_conv3(h)
            h = self.ey_head(h)
        else:
            h = chained
        c = self.config.u_channels
        return (
            h[..., :c].astype(jnp.float32),
            h[..., c:].astype(jnp.float32),
        )

    def encode_x(self, x: Array, train: bool = True) -> Tuple[Array, Array]:
        """HR (B, ps, ps, C) -> (mu_z, logvar_z) maps on the z grid."""
        from simple_vae_rs_tpu.ops.conv_blocks import tail_chain

        h = self.ex_down1(x, train)
        h = self.ex_down2(h, train)
        h = self.ex_down3(h, train)
        chained = tail_chain(
            self, h, ("ex_conv1", "ex_conv2", "ex_conv3", "ex_head"), train
        )
        if chained is None:
            h = self.ex_conv1(h)
            h = self.ex_conv2(h)
            h = self.ex_conv3(h)
            h = self.ex_head(h)
        else:
            h = chained
        c = self.config.z_channels
        return (
            h[..., :c].astype(jnp.float32),
            h[..., c:].astype(jnp.float32),
        )

    # latent regroupings: structure-preserving pixel-shuffle by default;
    # the reference's exact C-major reinterpretation under torch_regroup
    # (functionally-exact converted checkpoints — utils/convert.py)
    def _regroup_down(self, x: Array) -> Array:
        if self.config.torch_regroup:
            return cmajor_regroup_down(x, 2)
        return space_to_depth(x, 2)

    def _regroup_up(self, x: Array) -> Array:
        if self.config.torch_regroup:
            return cmajor_regroup_up(x, 2)
        return depth_to_space(x, 2)

    # ----------------------------------------------------- conditional prior
    def y_embedding(self, y: Array, train: bool = True) -> Array:
        """Shared conditioning features (ps/16, ps/16, latent//16)."""
        h = self.yz_down1(y, train)
        h = self.yz_down2(h, train)
        h = self.yz_down3(h, train)
        h = self.yz_conv1(h)
        return self.yz_conv2(h)

    def z_cond(
        self, y_feat: Array, u_map: Array, train: bool = True
    ) -> Tuple[Array, Array]:
        """p(z|u, y): prior (mu, logvar) maps on the z grid.

        ``logvar`` clamped to [-7, 7] (reference ``cond_vae.py:230``).
        """
        del train  # prior heads have no BatchNorm
        u_feat = self._regroup_down(u_map.astype(y_feat.dtype))
        u_feat = self.uz_conv1(u_feat)
        u_feat = self.uz_conv2(u_feat)
        joint = jnp.concatenate([y_feat, u_feat], axis=-1)
        mu = self.pz_mu_conv2(self.pz_mu_conv1(joint))
        logvar = self.pz_lv_conv2(self.pz_lv_conv1(joint))
        logvar = jnp.clip(logvar, -7.0, 7.0)
        return (
            self._regroup_up(mu.astype(jnp.float32)),
            self._regroup_up(logvar.astype(jnp.float32)),
        )

    # ------------------------------------------------------------- decoders
    def decode_y(self, u_map: Array, train: bool = True) -> Array:
        """u grid -> LR reconstruction (B, ps/2, ps/2, C) in [0, 1]."""
        from simple_vae_rs_tpu.ops.conv_blocks import tail_chain

        h = u_map.astype(self.dtype or u_map.dtype)
        h = self.dy_up1(h, train)
        h = self.dy_up2(h, train)
        chained = tail_chain(
            self, h, ("dy_conv1", "dy_conv2", "dy_conv3", "dy_conv4"), train
        )
        if chained is None:
            h = self.dy_conv1(h)
            h = self.dy_conv2(h)
            h = self.dy_conv3(h)
            h = self.dy_conv4(h)
        else:
            h = chained
        return nn.sigmoid(h.astype(jnp.float32))

    def decode_x_from_features(
        self, z_map: Array, y_feat: Array, train: bool = True
    ) -> Array:
        """z grid + precomputed y features -> HR reconstruction."""
        y_grid = self._regroup_up(y_feat)  # -> (ps/8, ps/8, latent//64)
        h = jnp.concatenate(
            [y_grid.astype(z_map.dtype), z_map], axis=-1
        ).astype(self.dtype or z_map.dtype)
        from simple_vae_rs_tpu.ops.conv_blocks import tail_chain

        h = self.dx_up1(h, train)
        h = self.dx_up2(h, train)
        h = self.dx_up3(h, train)
        # eval/serving: the whole linear tail runs as ONE fused strip
        # kernel (the per-draw hot path of the UQ task)
        chained = tail_chain(
            self, h, ("dx_conv1", "dx_conv2", "dx_conv3", "dx_conv4"), train
        )
        if chained is None:
            h = self.dx_conv1(h)
            h = self.dx_conv2(h)
            h = self.dx_conv3(h)
            h = self.dx_conv4(h)
        else:
            h = chained
        return nn.sigmoid(h.astype(jnp.float32))

    def decode_x(self, z_map: Array, y: Array, train: bool = True) -> Array:
        """Parity API: recomputes the y embedding (reference ``cond_vae.py:270``)."""
        return self.decode_x_from_features(z_map, self.y_embedding(y, train), train)

    # -------------------------------------------------------------- forward
    def __call__(
        self, x: Array, y: Array, rng: jax.Array, train: bool = True
    ) -> Tuple[Array, ...]:
        """Returns the reference 8-tuple (reference ``cond_vae.py:275-286``):

        ``(x_hat, y_hat, mu_z, logvar_z, mu_u, logvar_u, mu_z_uy,
        logvar_z_uy)`` with the mu/logvar entries flattened to
        ``(B, dim)`` f32 vectors for the loss.
        """
        rng_u, rng_z = jax.random.split(rng)
        mu_u, logvar_u = self.encode_y(y, train)
        u = reparameterize(rng_u, mu_u, logvar_u)
        mu_z, logvar_z = self.encode_x(x, train)
        z = reparameterize(rng_z, mu_z, logvar_z)

        y_feat = self.y_embedding(y, train)
        mu_z_uy, logvar_z_uy = self.z_cond(y_feat, u, train)

        x_hat = self.decode_x_from_features(z, y_feat, train)
        y_hat = self.decode_y(u, train)

        return (
            x_hat,
            y_hat,
            flatten_map(mu_z),
            flatten_map(logvar_z),
            flatten_map(mu_u),
            flatten_map(logvar_u),
            flatten_map(mu_z_uy),
            flatten_map(logvar_z_uy),
        )

    def lr_autoencode(
        self, y: Array, rng: jax.Array, train: bool = True
    ) -> Tuple[Array, Array, Array]:
        """LR branch only: q(u|y) -> p(y|u). Used by staged pre-training
        (the ``--pre_epochs`` flag the reference parses but never uses —
        SURVEY §2.2-4; here it actually pre-trains the LR autoencoder)."""
        mu_u, logvar_u = self.encode_y(y, train)
        u = reparameterize(rng, mu_u, logvar_u)
        y_hat = self.decode_y(u, train)
        return y_hat, flatten_map(mu_u), flatten_map(logvar_u)

    # ------------------------------------------------------------ inference
    def _conditional_generation(self, y: Array, draw_u, draw_z) -> Array:
        """y -> u ~ q(u|y) -> z ~ p(z|u,y) -> x_hat, with the latent draws
        injected as ``(mu, logvar) -> latent`` callables — the ONE copy of
        the SR sampling pipeline behind both public entry points (the
        training-eval metrics use the rng form, serving the eps form;
        their equivalence is what the meshed == single-chip tests rely
        on)."""
        mu_u, logvar_u = self.encode_y(y, train=False)
        u = draw_u(mu_u, logvar_u)
        y_feat = self.y_embedding(y, train=False)
        mu_z_uy, logvar_z_uy = self.z_cond(y_feat, u, train=False)
        z = draw_z(mu_z_uy, logvar_z_uy)
        return self.decode_x_from_features(z, y_feat, train=False)

    def conditional_generation(self, y: Array, rng: jax.Array) -> Array:
        """Single-draw 2x super-resolution (reference ``cond_vae.py:288-297``)."""
        rng_u, rng_z = jax.random.split(rng)
        return self._conditional_generation(
            y,
            lambda mu, lv: reparameterize(rng_u, mu, lv),
            lambda mu, lv: reparameterize(rng_z, mu, lv),
        )

    def conditional_generation_eps(
        self, y: Array, eps_u: Array, eps_z: Array
    ) -> Array:
        """``conditional_generation`` with the noise passed in.

        Same math but deterministic given ``(eps_u, eps_z)`` — the
        mesh-sharded serving path draws the noise once globally and feeds
        each shard its slice, so multi-chip results match the single-chip
        resolver exactly (``serve._sr_call``). Noise shapes come from
        :meth:`generation_noise_shapes` under ``jax.eval_shape``.
        """
        return self._conditional_generation(
            y,
            lambda mu, lv: mu + eps_u * jnp.exp(0.5 * lv),
            lambda mu, lv: mu + eps_z * jnp.exp(0.5 * lv),
        )

    def generation_noise_shapes(self, y: Array) -> Tuple[Array, Array]:
        """Shape probe for :meth:`conditional_generation_eps` — returns
        arrays shaped like ``(eps_u, eps_z)``. Only ever run abstractly
        (``jax.eval_shape``), so the extra compute is free."""
        mu_u, _ = self.encode_y(y, train=False)
        y_feat = self.y_embedding(y, train=False)
        mu_z_uy, _ = self.z_cond(y_feat, mu_u, train=False)
        return mu_u, mu_z_uy

    def sample(
        self, y: Array, rng: jax.Array, samples: int = 1000, chunk: int = 128
    ) -> Array:
        """N posterior-prior draws decoded to HR (reference ``cond_vae.py:299-318``).

        ``y`` is (1, ps/2, ps/2, C); returns (samples, ps, ps, C). The prior
        parameters are computed once from a single u draw (reference
        semantics); the N decodes run in fixed-size chunks under a lifted
        ``nn.scan`` — only one chunk's decoder activations are live at a
        time, so the canonical N=1000 call is HBM-safe from *any* entry
        point (the decoder is traced once, not unrolled).
        """
        rng_u, rng_z = jax.random.split(rng)
        mu_u, logvar_u = self.encode_y(y, train=False)
        u = reparameterize(rng_u, mu_u, logvar_u)
        y_feat = self.y_embedding(y, train=False)
        mu_z_uy, logvar_z_uy = self.z_cond(y_feat, u, train=False)

        std = jnp.exp(0.5 * logvar_z_uy)
        eps = jax.random.normal(rng_z, (samples,) + mu_z_uy.shape[1:], jnp.float32)
        z = mu_z_uy + eps * std

        chunk = min(chunk, samples)
        n_chunks = -(-samples // chunk)
        total = n_chunks * chunk
        if total != samples:  # pad the last chunk (trimmed below)
            z = jnp.concatenate([z, z[: total - samples]], axis=0)
        z = z.reshape((n_chunks, chunk) + z.shape[1:])
        y_feat_b = jnp.broadcast_to(y_feat, (chunk,) + y_feat.shape[1:])

        def body(mdl, carry, z_chunk):
            return carry, mdl.decode_x_from_features(
                z_chunk, y_feat_b, train=False
            )

        scan = nn.scan(
            body,
            variable_broadcast=["params", "batch_stats", "quant"],
            split_rngs={"params": False},
        )
        _, outs = scan(self, None, z)
        return outs.reshape((total,) + outs.shape[2:])[:samples]

    def generation(self, rng: jax.Array) -> Tuple[Array, Array]:
        """Unconditional generation: u ~ N(0, I) -> y_hat -> SR(x_hat).

        Reference ``cond_vae.py:320-324`` (minus its hardcoded "cuda",
        SURVEY §2.2-5).
        """
        cfg = self.config
        rng_u, rng_c = jax.random.split(rng)
        u = jax.random.normal(
            rng_u, (1, cfg.u_spatial, cfg.u_spatial, cfg.u_channels), jnp.float32
        )
        y_hat = self.decode_y(u, train=False)
        return y_hat, self.conditional_generation(y_hat, rng_c)
