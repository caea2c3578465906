"""Multiscale PatchGAN discriminators (SURVEY.md §2 #17).

pix2pixHD `MultiscaleDiscriminator` semantics: num_D PatchGAN discriminators
applied to an average-pool image pyramid; every conv layer's activations are
returned for the feature-matching loss (reference lineage: README.md:101).
NHWC, LeakyReLU(0.2), InstanceNorm on middle layers, train-only.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import InstanceNorm, space_to_depth

Dtype = Any


class NLayerDiscriminator(nn.Module):
    """70x70-style PatchGAN: C64-C128-C256-C512 -> 1 channel patch logits.

    stem_s2d > 1 space-to-depth-packs the input before the first conv: the
    pose+image concat is a ~6-channel full-resolution tensor, and few-
    channel convs are layout-bound on TPU (see layers.space_to_depth). The
    packed stem (2x2 kernel, stride 1 on the half-res grid) has the same
    stride-2 4x4 receptive field and parameter count as the original stem.
    """
    ndf: int = 64
    n_layers: int = 3
    stem_s2d: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        feats = []
        x = x.astype(self.dtype)
        if self.stem_s2d > 1 and x.shape[1] % self.stem_s2d == 0 \
                and x.shape[2] % self.stem_s2d == 0:
            f = self.stem_s2d
            x = space_to_depth(x, f)
            x = nn.Conv(self.ndf, (4 // f + 1, 4 // f + 1), strides=(1, 1),
                        padding="SAME", dtype=self.dtype,
                        param_dtype=jnp.float32)(x)
        else:
            x = nn.Conv(self.ndf, (4, 4), strides=(2, 2),
                        padding=((2, 2), (2, 2)),
                        dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.leaky_relu(x, 0.2)
        feats.append(x)
        nf = self.ndf
        for n in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            x = nn.Conv(nf, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)),
                        dtype=self.dtype, param_dtype=jnp.float32)(x)
            x = InstanceNorm()(x)
            x = nn.leaky_relu(x, 0.2)
            feats.append(x)
        nf = min(nf * 2, 512)
        x = nn.Conv(nf, (4, 4), strides=(1, 1), padding=((2, 2), (2, 2)),
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = InstanceNorm()(x)
        x = nn.leaky_relu(x, 0.2)
        feats.append(x)
        x = nn.Conv(1, (4, 4), strides=(1, 1), padding=((2, 2), (2, 2)),
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        feats.append(x.astype(jnp.float32))
        return feats


class MultiscaleDiscriminator(nn.Module):
    """num_D PatchGANs over a 2x average-pool pyramid.

    Returns a list (one per scale) of per-layer feature lists; the last entry
    of each inner list is that scale's patch logits.
    """
    num_D: int = 2
    ndf: int = 64
    n_layers: int = 3
    stem_s2d: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[List[jnp.ndarray]]:
        outs = []
        cur = x
        for d in range(self.num_D):
            outs.append(NLayerDiscriminator(self.ndf, self.n_layers,
                                            stem_s2d=self.stem_s2d,
                                            dtype=self.dtype,
                                            name=f"scale_{d}")(cur))
            if d != self.num_D - 1:
                cur = nn.avg_pool(cur, (3, 3), strides=(2, 2),
                                  padding=((1, 1), (1, 1)))
        return outs
