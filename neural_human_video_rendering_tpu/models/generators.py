"""Generator networks: GlobalGenerator trunk, TransG, TexG, BGNet.

Behavioral spec from SURVEY.md §2 #12/#13/#16 (reference flag surface:
--n_blocks_translate pretrainTrans.sh:13; --n_downsample_global
--n_blocks_global --ngf_global test_start/start.sh:15-17; --n_downsample_bg
--n_blocks_bg test_start/start.sh:20-21). Architectures are pix2pixHD-style
conv encoder / ResNet-blocks / decoder stacks, rebuilt in NHWC flax.linen.

Outputs:
  TransG:  pose labels -> IUV: part logits (P+1, bg at 0) + per-part UV in
           [0,1] (2P channels).
  TexG:    pose labels -> per-part dynamic-texture residual at atlas-tile
           resolution, (B, P, T, T, 3) added onto the static atlas.
  BGNet:   static background -> refined background (online bg refinement,
           reference: README.md:15,52).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import (ConvNormRelu, ResnetBlock, Upsample, depth_to_space,
                     space_to_depth)

Dtype = Any


class GlobalGenerator(nn.Module):
    """pix2pixHD GlobalGenerator: c7s1-ngf, n_down x d-stride2, n_blocks x
    ResNet, n_down x u-stride2, c7s1-out.

    TPU-native packing knobs (1 = exact pix2pixHD topology):
      stem_s2d: space-to-depth the input by this factor and start the
        encoder that many levels down the resolution/channel schedule —
        the few-channel full-resolution stem conv is layout-bound on TPU
        (see layers.space_to_depth). The trunk (resolution, channels) is
        unchanged.
      head_s2d: produce the last head_s2d levels of the decoder as a
        pixel-shuffle: the final 7x7 conv emits out_nc*f^2 channels at
        1/f resolution and depth_to_space rearranges — skips the last
        upsample(s) and runs the wide head conv at MXU-friendly width.
    Both factors must be powers of two <= 2**n_downsampling.
    """
    out_nc: int
    ngf: int = 64
    n_downsampling: int = 4
    n_blocks: int = 9
    final_tanh: bool = True
    pad_mode: str = "reflect"
    upsample_mode: str = "deconv"
    stem_s2d: int = 1
    head_s2d: int = 1
    return_features: bool = False   # skip the head: yield (B,H,W,ngf) trunk
    aux_heads: int = 0   # emit aux out_nc predictions at coarser decoder levels
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        s = self.stem_s2d.bit_length() - 1      # log2
        h = 0 if self.return_features else self.head_s2d.bit_length() - 1
        assert 2 ** s == self.stem_s2d and (
            self.return_features or 2 ** h == self.head_s2d), \
            "s2d factors must be powers of two"
        # clamp to what the resolution schedule supports (tiny test configs)
        s = min(s, self.n_downsampling)
        h = min(h, self.n_downsampling)
        x = x.astype(self.dtype)
        if s:
            x = space_to_depth(x, 2 ** s)
        x = ConvNormRelu(self.ngf * 2 ** s, 7, pad_mode=self.pad_mode,
                         dtype=self.dtype)(x)
        for i in range(s, self.n_downsampling):
            x = ConvNormRelu(self.ngf * 2 ** (i + 1), 3, stride=2,
                             pad_mode=self.pad_mode, dtype=self.dtype)(x)
        for _ in range(self.n_blocks):
            x = ResnetBlock(self.ngf * 2 ** self.n_downsampling,
                            pad_mode=self.pad_mode, dtype=self.dtype)(x)
        aux = []
        for i in range(self.n_downsampling):
            feats = self.ngf * 2 ** (self.n_downsampling - i - 1)
            if i < self.n_downsampling - h:
                x = Upsample(feats, mode=self.upsample_mode,
                             pad_mode=self.pad_mode, dtype=self.dtype)(x)
            else:
                # pixel-shuffle head: the skipped upsample becomes a
                # stride-1 conv so the channel schedule (and the head
                # conv's FLOPs) match the parity topology exactly
                x = ConvNormRelu(feats, 3, pad_mode=self.pad_mode,
                                 dtype=self.dtype)(x)
            # deep-supervision taps: the LAST aux_heads decoder stages
            # before the final one each emit an out_nc prediction at their
            # own resolution (a single 3x3 head conv — train-time only,
            # callers ignore aux at inference). Coarse heads shape the
            # decoder features the full-res head consumes.
            if self.aux_heads and i >= self.n_downsampling - 1 - self.aux_heads \
                    and i < self.n_downsampling - 1:
                aux.append(ConvNormRelu(
                    self.out_nc, 3, use_norm=False, use_relu=False,
                    pad_mode=self.pad_mode, dtype=self.dtype,
                    name=f"aux_head{i}")(x).astype(jnp.float32))
        if self.return_features:
            return x          # (B, H, W, ngf) decoder features, model dtype
        x = ConvNormRelu(self.out_nc * 4 ** h, 7, use_norm=False,
                         use_relu=False, pad_mode=self.pad_mode,
                         dtype=self.dtype)(x)
        if h:
            x = depth_to_space(x, 2 ** h)
        x = x.astype(jnp.float32)
        out = jnp.tanh(x) if self.final_tanh else x
        return (out, tuple(aux)) if self.aux_heads else out


class LocalEnhancer(nn.Module):
    """pix2pixHD LocalEnhancer (--netG local): coarse-to-fine generator for
    high resolutions. A GlobalGenerator trunk (at 2^n_local_enhancers x
    downsampled input, width ngf * 2^n) produces features that are summed
    into per-level full(er)-resolution enhancer branches (stem conv +
    stride-2 down, + trunk features, n_blocks_local ResNet blocks, upsample)
    before the final 7x7 head. The reference's launchers only exercise
    'global', but the forked framework ships 'local' for 1024px+ training —
    capability parity, same class as flip/scale_width (pix2pixHD
    networks.py lineage per README.md:101).
    """
    out_nc: int
    ngf: int = 32
    n_downsample_global: int = 4
    n_blocks_global: int = 9
    n_local_enhancers: int = 1
    n_blocks_local: int = 3
    final_tanh: bool = True
    pad_mode: str = "reflect"
    upsample_mode: str = "deconv"
    stem_s2d: int = 1
    head_s2d: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n = self.n_local_enhancers
        x = x.astype(self.dtype)
        pyramid = [x]
        for _ in range(n):
            pyramid.append(nn.avg_pool(pyramid[-1], (3, 3), strides=(2, 2),
                                       padding=((1, 1), (1, 1))))
        # coarse trunk, width ngf * 2^n, named for --niter_fix_global
        feat = GlobalGenerator(self.out_nc, self.ngf * 2 ** n,
                               self.n_downsample_global, self.n_blocks_global,
                               pad_mode=self.pad_mode,
                               upsample_mode=self.upsample_mode,
                               stem_s2d=self.stem_s2d, head_s2d=1,
                               return_features=True, dtype=self.dtype,
                               name="global_trunk")(pyramid[-1])
        for level in range(n, 0, -1):          # coarse -> fine
            ngf_l = self.ngf * 2 ** (level - 1)
            inp = pyramid[level - 1]
            stem = ConvNormRelu(ngf_l, 7, pad_mode=self.pad_mode,
                                dtype=self.dtype,
                                name=f"enh{level}_stem")(inp)
            down = ConvNormRelu(ngf_l * 2, 3, stride=2,
                                pad_mode=self.pad_mode, dtype=self.dtype,
                                name=f"enh{level}_down")(stem)
            feat = down + feat                 # channel counts match: 2*ngf_l
            for b in range(self.n_blocks_local):
                feat = ResnetBlock(ngf_l * 2, pad_mode=self.pad_mode,
                                   dtype=self.dtype,
                                   name=f"enh{level}_block{b}")(feat)
            feat = Upsample(ngf_l, mode=self.upsample_mode,
                            pad_mode=self.pad_mode, dtype=self.dtype,
                            name=f"enh{level}_up")(feat)
        out = ConvNormRelu(self.out_nc, 7, use_norm=False, use_relu=False,
                           pad_mode=self.pad_mode, dtype=self.dtype,
                           name="head")(feat)
        out = out.astype(jnp.float32)
        return jnp.tanh(out) if self.final_tanh else out


def make_backbone(netG: str, out_nc: int, ngf: int, n_downsampling: int,
                  n_blocks: int, *, n_local_enhancers: int = 1,
                  n_blocks_local: int = 3, final_tanh: bool = True,
                  pad_mode: str = "reflect", upsample_mode: str = "deconv",
                  stem_s2d: int = 1, head_s2d: int = 1, aux_heads: int = 0,
                  dtype: Dtype = jnp.float32, name: str = None):
    """pix2pixHD define_G dispatch: 'global' | 'local'."""
    if netG == "local":
        assert aux_heads == 0, \
            "--ms_uv deep supervision is implemented for netG=global only"
        return LocalEnhancer(out_nc, ngf, n_downsampling, n_blocks,
                             n_local_enhancers, n_blocks_local,
                             final_tanh=final_tanh, pad_mode=pad_mode,
                             upsample_mode=upsample_mode, stem_s2d=stem_s2d,
                             head_s2d=head_s2d, dtype=dtype, name=name)
    assert netG == "global", f"unknown netG {netG!r} (global|local)"
    return GlobalGenerator(out_nc, ngf, n_downsampling, n_blocks,
                           final_tanh=final_tanh, pad_mode=pad_mode,
                           upsample_mode=upsample_mode, stem_s2d=stem_s2d,
                           head_s2d=head_s2d, aux_heads=aux_heads,
                           dtype=dtype, name=name)


class TransG(nn.Module):
    """UV/translation generator (SURVEY.md §2 #12): pose -> IUV heads.

    uv_refine > 0 adds a shallow refinement stack past the encoder-decoder
    bottleneck: the pose input and the coarse raw IUV are space-to-depth
    packed to HALF resolution (MXU-friendly width, no full-res few-channel
    convs), run through uv_refine ResNet blocks, and the head emits a
    pixel-shuffled RESIDUAL on the raw logits/UV. The quality decomposition
    (docs/QUALITY.md) pins the held-out gap on UV/part accuracy — this is a
    dedicated high-resolution path for exactly those channels. Identity at
    init is not forced; the final head is a fresh conv so early training
    perturbs, then the same IUV losses supervise the refined output end to
    end (TransG's output IS the supervised quantity).
    """
    n_parts: int = 24
    ngf: int = 64
    n_downsampling: int = 4
    n_blocks: int = 9
    netG: str = "global"
    n_local_enhancers: int = 1
    n_blocks_local: int = 3
    stem_s2d: int = 1
    head_s2d: int = 1
    uv_refine: int = 0
    uv_refine_ngf: int = 64
    ms_uv: int = 0       # deep supervision: aux IUV heads at coarser scales
    pad_mode: str = "reflect"
    upsample_mode: str = "deconv"
    dtype: Dtype = jnp.float32

    def _split_iuv(self, raw: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """raw (B,h,w,out_nc) -> (logits (B,h,w,P+1), uv (B,h,w,P,2)) — the
        ONE place the IUV channel layout + UV squashing live, shared by the
        full-res head and every --ms_uv aux head."""
        logits = raw[..., : 1 + self.n_parts]
        uv = raw[..., 1 + self.n_parts:]
        B, H, W = uv.shape[0], uv.shape[1], uv.shape[2]
        uv = uv.reshape(B, H, W, self.n_parts, 2)
        uv = 0.5 * (jnp.tanh(uv) + 1.0)   # pinned: UV in [0,1]
        return logits, uv

    @nn.compact
    def __call__(self, pose: jnp.ndarray):
        """pose (B,H,W,Cp) -> (part_logits (B,H,W,P+1), uv (B,H,W,P,2)).

        With ms_uv > 0 a third element rides along: a tuple of
        (logits_k, uv_k) at the decoder's intermediate resolutions
        (coarse -> fine), for deep supervision against subsampled
        DensePose pseudo-GT (train-time only — inference ignores it; the
        aux heads cost one 3x3 conv each). Motivation: the round-4 quality
        decomposition (docs/quality/quality_profile_ep100.json) attributes
        the remaining held-out gap to TransG's IUV accuracy; supervising
        the decoder's intermediate features directly shortens their
        gradient path to the IUV objective.
        """
        out_nc = (1 + self.n_parts) + 2 * self.n_parts
        raw = make_backbone(self.netG, out_nc, self.ngf, self.n_downsampling,
                            self.n_blocks,
                            n_local_enhancers=self.n_local_enhancers,
                            n_blocks_local=self.n_blocks_local,
                            final_tanh=False,
                            pad_mode=self.pad_mode,
                            upsample_mode=self.upsample_mode,
                            stem_s2d=self.stem_s2d,
                            head_s2d=self.head_s2d,
                            aux_heads=self.ms_uv,
                            dtype=self.dtype)(pose)
        aux_raw = ()
        if self.ms_uv > 0:
            raw, aux_raw = raw
        if self.uv_refine > 0:
            f = 2 if pose.shape[1] % 2 == 0 else 1
            x = jnp.concatenate([pose, raw], axis=-1).astype(self.dtype)
            if f > 1:
                x = space_to_depth(x, f)
            x = ConvNormRelu(self.uv_refine_ngf, 3, pad_mode=self.pad_mode,
                             dtype=self.dtype, name="refine_stem")(x)
            for b in range(self.uv_refine):
                x = ResnetBlock(self.uv_refine_ngf, pad_mode=self.pad_mode,
                                dtype=self.dtype, name=f"refine_block{b}")(x)
            delta = ConvNormRelu(out_nc * f * f, 3, use_norm=False,
                                 use_relu=False, pad_mode=self.pad_mode,
                                 dtype=self.dtype, name="refine_head")(x)
            if f > 1:
                delta = depth_to_space(delta, f)
            raw = raw + delta.astype(jnp.float32)
        logits, uv = self._split_iuv(raw)
        if self.ms_uv > 0:
            return logits, uv, tuple(self._split_iuv(a) for a in aux_raw)
        return logits, uv


class TexG(nn.Module):
    """Dynamic texture generator, 'part' variant (SURVEY.md §2 #13).

    Encodes the pose at input resolution, decodes a (P*3)-channel map at
    atlas-tile resolution: each channel group is one part's dynamic residual
    over the static atlas tile. The pose input is average-pooled to the tile
    size first so all conv work happens at tile resolution (TPU-friendly:
    fixed small spatial dims, big channel dim on the lanes).
    """
    n_parts: int = 24
    tile: int = 128
    ngf: int = 64
    n_downsampling: int = 2
    n_blocks: int = 5
    netG: str = "global"
    n_local_enhancers: int = 1
    n_blocks_local: int = 3
    stem_s2d: int = 1
    head_s2d: int = 1
    pad_mode: str = "reflect"
    upsample_mode: str = "deconv"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pose: jnp.ndarray) -> jnp.ndarray:
        """pose (B,H,W,Cp) -> residual (B, P, tile, tile, 3) in [-1,1]."""
        B, H, W = pose.shape[0], pose.shape[1], pose.shape[2]
        if H != self.tile or W != self.tile:
            # bring pose context to tile resolution exactly (works for any
            # loadSize, e.g. the reference tex-pretrain's 200px with 128 tiles)
            import jax
            pose = jax.image.resize(
                pose, (B, self.tile, self.tile, pose.shape[-1]), "linear")
        out = make_backbone(self.netG, self.n_parts * 3, self.ngf,
                            self.n_downsampling, self.n_blocks,
                            n_local_enhancers=self.n_local_enhancers,
                            n_blocks_local=self.n_blocks_local,
                            final_tanh=True,
                            pad_mode=self.pad_mode,
                            upsample_mode=self.upsample_mode,
                            stem_s2d=self.stem_s2d,
                            head_s2d=self.head_s2d,
                            dtype=self.dtype)(pose)
        out = out.reshape(B, self.tile, self.tile, self.n_parts, 3)
        return jnp.moveaxis(out, 3, 1)    # (B, P, T, T, 3)


def region_mean(fmap: jnp.ndarray, onehot: jnp.ndarray) -> jnp.ndarray:
    """Mean feature per region: fmap (B,H,W,F), onehot (B,H,W,C) ->
    (B,C,F). The single source of the pooling math — part_pool scatters
    from it and tools/encode_features.py clusters it, so training-time
    pooling and precomputed cluster codes can never diverge."""
    s = jnp.einsum("bhwc,bhwf->bcf", onehot, fmap)
    n = jnp.einsum("bhwc->bc", onehot)
    return s / (n[..., None] + 1e-6)


def part_pool(fmap: jnp.ndarray, onehot: jnp.ndarray) -> jnp.ndarray:
    """Region-wise average pooling, pix2pixHD Encoder semantics.

    fmap (B,H,W,F) features, onehot (B,H,W,C) region one-hots ->
    (B,H,W,F): every pixel receives the mean feature of its region.
    Formulated as three einsums (MXU contractions) instead of pix2pixHD's
    per-instance Python loop — jit-able, static shapes, no host sync.
    """
    return jnp.einsum("bhwc,bcf->bhwf", onehot, region_mean(fmap, onehot))


class FeatEncoder(nn.Module):
    """pix2pixHD Encoder E (--instance_feat / --label_feat, networks.define_E
    lineage per README.md:101; flag evidence: test_start/start.sh:23).

    c7s1-nef, n_downsample_E stride-2 convs, mirrored upsamples, c7s1-
    feat_num head with tanh. The caller pools the output per region
    (part_pool) so the generator receives one appearance code per region —
    in this pipeline the "instance map" is the DensePose 24-part body-part
    map (the human-video data contract has no object-instance maps), a
    documented adaptation of pix2pixHD's instance-wise feature encoding.
    """
    feat_num: int = 3
    nef: int = 16
    n_downsampling: int = 4
    pad_mode: str = "reflect"
    upsample_mode: str = "deconv"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img: jnp.ndarray) -> jnp.ndarray:
        x = img.astype(self.dtype)
        x = ConvNormRelu(self.nef, 7, pad_mode=self.pad_mode,
                         dtype=self.dtype)(x)
        for i in range(self.n_downsampling):
            x = ConvNormRelu(self.nef * 2 ** (i + 1), 3, stride=2,
                             pad_mode=self.pad_mode, dtype=self.dtype)(x)
        for i in range(self.n_downsampling):
            x = Upsample(self.nef * 2 ** (self.n_downsampling - i - 1),
                         mode=self.upsample_mode, pad_mode=self.pad_mode,
                         dtype=self.dtype)(x)
        x = ConvNormRelu(self.feat_num, 7, use_norm=False, use_relu=False,
                         pad_mode=self.pad_mode, dtype=self.dtype)(x)
        return jnp.tanh(x.astype(jnp.float32))


class BGNet(nn.Module):
    """Background refinement net (SURVEY.md §2 #16): bg + residual."""
    ngf: int = 32
    n_downsampling: int = 2
    n_blocks: int = 2
    s2d: int = 1
    pad_mode: str = "reflect"
    upsample_mode: str = "deconv"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, bg: jnp.ndarray) -> jnp.ndarray:
        """bg (B,H,W,3) static background -> refined background in [-1,1]."""
        res = GlobalGenerator(3, self.ngf, self.n_downsampling, self.n_blocks,
                              final_tanh=True, pad_mode=self.pad_mode,
                              upsample_mode=self.upsample_mode,
                              stem_s2d=self.s2d, head_s2d=self.s2d,
                              dtype=self.dtype)(bg)
        return jnp.clip(bg + res, -1.0, 1.0)
