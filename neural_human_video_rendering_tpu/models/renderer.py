"""The flagship composed model: pose -> IUV -> textured foreground -> frame.

Composes TransG + TexG + the static texture atlas + the fused texture-warp
op + BGNet + the mask compositor into one flax module (SURVEY.md §3.1's hot
loop as a single jittable function). Parameters are namespaced per subnet
("TransG" / "TexG" / "BGNet") so stage-1 pretrained TransG params load
directly into stage-2 state (reference: --load_pretrain_TransG /
--which_epoch_TransG, train_start/pretrain_start.sh:29-30).

The predicted soft mask (1 - background probability) composites foreground
over the refined background and is itself trained past the noisy
segmentation GT — the reference's online mask refinement (README.md:60).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.pallas_warp import texture_warp
from .generators import BGNet, FeatEncoder, TexG, TransG, part_pool

Dtype = Any


class NeuralRenderer(nn.Module):
    """Full generator stack (everything the discriminator judges)."""
    n_parts: int = 24
    tex_tile: int = 128
    # TransG sizing (reference: pretrainTrans.sh:13)
    transg_ngf: int = 64
    transg_downs: int = 4
    transg_blocks: int = 9
    uv_refine: int = 0
    uv_refine_ngf: int = 64
    ms_uv: int = 0       # deep-supervision aux IUV heads (train-time only)
    # TexG sizing (reference: test_start/start.sh:15-17)
    texg_ngf: int = 48
    texg_downs: int = 2
    texg_blocks: int = 10
    # BG sizing (reference: test_start/start.sh:20-21)
    bg_downs: int = 2
    bg_blocks: int = 2
    netG: str = "global"                  # global | local (pix2pixHD define_G)
    n_local_enhancers: int = 1
    n_blocks_local: int = 3
    use_texg: bool = True
    use_bg: bool = True
    use_mask_texture: bool = False
    # pix2pixHD encoder E (--instance_feat/--label_feat); region map is the
    # DensePose part map — see generators.FeatEncoder docstring
    use_feat: bool = False
    feat_num: int = 3
    nef: int = 16
    n_downsample_E: int = 4
    use_pallas: bool = True
    warp_k: int = 4
    warp_block_parts: int = 0
    warp_eps: float = 1e-3
    warp_dtype: str = "float32"           # bf16 kernel compute (--warp_dtype)
    stem_s2d: int = 1
    head_s2d: int = 1
    bg_s2d: int = 1
    pad_mode: str = "reflect"
    upsample_mode: str = "deconv"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pose: jnp.ndarray, bg: jnp.ndarray,
                 static_tex: jnp.ndarray,
                 tex_mask: Optional[jnp.ndarray] = None,
                 feat_image: Optional[jnp.ndarray] = None,
                 cluster_feats: Optional[jnp.ndarray] = None,
                 bg_flip: Optional[jnp.ndarray] = None
                 ) -> Dict[str, jnp.ndarray]:
        """Render one batch of frames.

        Args:
          pose: (B, H, W, Cp) rasterized pose labels (+LaplaceProj channels).
          bg: (B or 1, H, W, 3) static background in [-1, 1]. Pass batch 1
            when every sample shares the background (the training case:
            one bg.jpg per person) — BGNet then runs once per step instead
            of B times and the compositor broadcasts.
          static_tex: (B or 1, P, T, T, 3) static per-part atlas in [-1, 1];
            batch 1 broadcasts the shared atlas the same way.
          tex_mask: optional (P, T, T, 1) validity mask of atlas texels
            (--use_mask_texture, reference: test_start/start.sh:18).
          feat_image: (use_feat, training) (B, H, W, 3) real frame; encoder
            E pools its features per predicted body part and feeds them to
            TexG — pix2pixHD's instance-feature path, parts as instances.
          cluster_feats: (use_feat, inference) (P+1, feat_num) appearance
            codes per part (from tools/encode_features.py clustering);
            replaces E when no real frame exists. Both None under use_feat
            => zero codes (neutral; keeps param/channel shapes identical).
          bg_flip: optional (B,) float flags from horizontal-flip
            augmentation: samples with flag 1 composite against the
            horizontally MIRRORED refined background. Shipping a 1-float
            flag instead of a per-sample bg image keeps the batch-1
            shared-asset path (BGNet runs once) and saves a frame-sized
            upload per sample on throughput-bound links; the mirrored
            sample's refined background is defined as the mirror of the
            learned refined background.

        Returns dict: fake, fg, mask, probs, uv, logits, texture, bg_refined.
        """
        B = pose.shape[0]
        transg_out = TransG(self.n_parts, self.transg_ngf, self.transg_downs,
                            self.transg_blocks, netG=self.netG,
                            n_local_enhancers=self.n_local_enhancers,
                            n_blocks_local=self.n_blocks_local,
                            stem_s2d=self.stem_s2d,
                            head_s2d=self.head_s2d,
                            uv_refine=self.uv_refine,
                            uv_refine_ngf=self.uv_refine_ngf,
                            ms_uv=self.ms_uv,
                            pad_mode=self.pad_mode,
                            upsample_mode=self.upsample_mode,
                            dtype=self.dtype, name="TransG")(pose)
        ms_aux = ()
        if self.ms_uv > 0:
            logits, uv, ms_aux = transg_out
        else:
            logits, uv = transg_out
        probs = nn.softmax(logits, axis=-1)

        texg_in = pose
        if self.use_feat:
            # region map = predicted part argmax (selection-only: constant
            # under autodiff, like top-k). E itself IS differentiated —
            # it trains jointly with the generator, pix2pixHD-style.
            onehot = jax.nn.one_hot(
                jax.lax.stop_gradient(jnp.argmax(probs, -1)),
                probs.shape[-1], dtype=jnp.float32)
            enc = FeatEncoder(self.feat_num, self.nef, self.n_downsample_E,
                              pad_mode=self.pad_mode,
                              upsample_mode=self.upsample_mode,
                              dtype=self.dtype, name="FeatE")
            if feat_image is not None:
                pooled = part_pool(enc(feat_image), onehot)
            elif cluster_feats is not None:
                pooled = jnp.einsum("bhwc,cf->bhwf", onehot,
                                    cluster_feats.astype(jnp.float32))
            elif self.is_initializing():
                # params must exist whatever mode later applies use
                # (checkpoint-shape stability): trace E once at init
                pooled = jnp.zeros_like(
                    enc(jnp.zeros(pose.shape[:3] + (3,), jnp.float32)))
            else:
                # neutral mode: zero codes, no dead encoder compute
                # (flax apply tolerates params unused by the trace)
                pooled = jnp.zeros(pose.shape[:3] + (self.feat_num,),
                                   jnp.float32)
            texg_in = jnp.concatenate([pose, pooled], axis=-1)

        texture = static_tex
        if self.use_texg:
            residual = TexG(self.n_parts, self.tex_tile, self.texg_ngf,
                            self.texg_downs, self.texg_blocks,
                            netG=self.netG,
                            n_local_enhancers=self.n_local_enhancers,
                            n_blocks_local=self.n_blocks_local,
                            stem_s2d=self.stem_s2d, head_s2d=self.head_s2d,
                            pad_mode=self.pad_mode,
                            upsample_mode=self.upsample_mode,
                            dtype=self.dtype, name="TexG")(texg_in)
            if self.use_mask_texture and tex_mask is not None:
                residual = residual * tex_mask[None]
            texture = jnp.clip(static_tex + residual, -1.0, 1.0)
        if texture.shape[0] != B:
            texture = jnp.broadcast_to(texture, (B,) + texture.shape[1:])

        fg = texture_warp(texture, uv, probs, use_pallas=self.use_pallas,
                          k=self.warp_k, block_parts=self.warp_block_parts,
                          eps=self.warp_eps, compute_dtype=self.warp_dtype)

        bg_refined = bg
        if self.use_bg:
            bg_refined = BGNet(32, self.bg_downs, self.bg_blocks,
                               s2d=self.bg_s2d, pad_mode=self.pad_mode,
                               upsample_mode=self.upsample_mode,
                               dtype=self.dtype, name="BGNet")(bg)

        if bg_flip is not None:
            flag = bg_flip.reshape(-1, 1, 1, 1).astype(bg_refined.dtype)
            bg_refined = (flag * bg_refined[:, :, ::-1, :]
                          + (1.0 - flag) * bg_refined)

        mask = (1.0 - probs[..., :1])          # (B, H, W, 1) soft fg mask
        fake = mask * fg + (1.0 - mask) * bg_refined
        out = {
            "fake": fake, "fg": fg, "mask": mask, "probs": probs,
            "logits": logits, "uv": uv, "texture": texture,
            "bg_refined": bg_refined,
        }
        if self.ms_uv > 0:
            out["ms_aux"] = ms_aux   # tuple of (logits_k, uv_k), train-only
        return out


def renderer_from_options(opt) -> NeuralRenderer:
    """Build the flagship model from the reference-compatible Options."""
    import jax.numpy as jnp  # local to avoid cycle at import time
    dtype = jnp.bfloat16 if opt.dtype == "bfloat16" else jnp.float32
    return NeuralRenderer(
        n_parts=opt.n_parts,
        tex_tile=opt.tex_tile,
        transg_ngf=opt.ngf,
        transg_downs=opt.n_downsample_translate,
        transg_blocks=opt.n_blocks_translate,
        uv_refine=opt.uv_refine,
        uv_refine_ngf=opt.uv_refine_ngf,
        ms_uv=opt.ms_uv,
        texg_ngf=opt.ngf_global,
        texg_downs=opt.n_downsample_global,
        texg_blocks=opt.n_blocks_global,
        netG=opt.netG,
        n_local_enhancers=opt.n_local_enhancers,
        n_blocks_local=opt.n_blocks_local,
        bg_downs=opt.n_downsample_bg,
        bg_blocks=opt.n_blocks_bg,
        use_mask_texture=opt.use_mask_texture,
        use_feat=(opt.instance_feat or opt.label_feat),
        feat_num=opt.feat_num,
        nef=opt.nef,
        n_downsample_E=opt.n_downsample_E,
        use_pallas=opt.use_pallas_warp,
        warp_k=opt.warp_topk,
        warp_block_parts=opt.warp_block_parts,
        warp_eps=opt.warp_eps,
        warp_dtype=opt.warp_dtype,
        stem_s2d=opt.stem_s2d,
        head_s2d=opt.head_s2d,
        bg_s2d=opt.bg_s2d,
        pad_mode=opt.pad_mode,
        upsample_mode=opt.upsample_mode,
        dtype=dtype,
    )
