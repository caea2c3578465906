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


def _bce_to(outs: List[List[jnp.ndarray]], target: float) -> jnp.ndarray:
    """Sigmoid BCE-with-logits vs a constant target (vanilla GAN)."""
    loss = 0.0
    for feats in outs:
        z = feats[-1].astype(jnp.float32)
        # log(1+e^-|z|) + max(z,0) - t*z  (numerically stable BCE)
        loss = loss + jnp.mean(jnp.logaddexp(0.0, -jnp.abs(z))
                               + jnp.maximum(z, 0.0) - target * z)
    return loss / len(outs)


def lsgan_loss_g(fake_outs: List[List[jnp.ndarray]],
                 use_lsgan: bool = True) -> jnp.ndarray:
    """Generator GAN loss: D(fake) -> 1. LSGAN (reference default) or
    vanilla BCE when --no_lsgan (pix2pixHD GANLoss use_lsgan switch)."""
    f = _mse_to if use_lsgan else _bce_to
    return f(fake_outs, 1.0)


def lsgan_loss_d(real_outs: List[List[jnp.ndarray]],
                 fake_outs: List[List[jnp.ndarray]],
                 use_lsgan: bool = True) -> jnp.ndarray:
    """Discriminator GAN loss: D(real) -> 1, D(fake) -> 0 (x0.5 each)."""
    f = _mse_to if use_lsgan else _bce_to
    return 0.5 * (f(real_outs, 1.0) + f(fake_outs, 0.0))


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
