"""GAN + feature-matching losses (pix2pixHD trio, SURVEY.md §2 #18).

LSGAN objective (reference default: not --no_lsgan) over the multiscale
PatchGAN outputs, plus the discriminator feature-matching L1 weighted
4/(n_layers+1) * 1/num_D * lambda_feat exactly as pix2pixHD. All reductions
in float32 (GAN losses are the numerically delicate part under bf16).
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp


def _mse_to(outs: List[List[jnp.ndarray]], target: float) -> jnp.ndarray:
    loss = 0.0
    for feats in outs:
        logits = feats[-1].astype(jnp.float32)
        loss = loss + jnp.mean((logits - target) ** 2)
    return loss / len(outs)


def lsgan_loss_g(fake_outs: List[List[jnp.ndarray]]) -> jnp.ndarray:
    """Generator LSGAN loss: D(fake) -> 1."""
    return _mse_to(fake_outs, 1.0)


def lsgan_loss_d(real_outs: List[List[jnp.ndarray]],
                 fake_outs: List[List[jnp.ndarray]]) -> jnp.ndarray:
    """Discriminator LSGAN loss: D(real) -> 1, D(fake) -> 0 (x0.5 each)."""
    return 0.5 * (_mse_to(real_outs, 1.0) + _mse_to(fake_outs, 0.0))


def feature_matching_loss(real_outs: List[List[jnp.ndarray]],
                          fake_outs: List[List[jnp.ndarray]],
                          lambda_feat: float = 10.0) -> jnp.ndarray:
    """L1 between D activations of real (stop-grad) and fake."""
    num_d = len(real_outs)
    loss = 0.0
    for rf, ff in zip(real_outs, fake_outs):
        n_layers = len(rf) - 1
        w = 4.0 / (n_layers + 1) / num_d
        for r, f in zip(rf[:-1], ff[:-1]):
            loss = loss + w * jnp.mean(
                jnp.abs(f.astype(jnp.float32) - r.astype(jnp.float32)))
    return lambda_feat * loss
