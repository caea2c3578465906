"""Jitted train/eval steps (SURVEY.md §3.2-3.4 control flow, one XLA program).

The whole iteration — on-device pose rasterization, generator forward,
all losses, both gradient computations, and both optimizer updates — is ONE
jitted function per stage (SURVEY.md §7 hard part 1). The alternating G/D
update of the reference becomes two `value_and_grad` calls inside the same
compiled step: G's loss sees D's params frozen (grads taken only w.r.t.
g_params), D's loss sees the fake detached via stop_gradient — identical
update semantics to pix2pixHD's G-then-D step, zero Python in the loop.

For data-parallel meshes, batches arrive sharded on the `data` axis and the
returned state is replicated, so XLA inserts the gradient all-reduce
(psum over ICI) automatically — no hand-written collectives.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .. import losses as L
from ..data.rasterize import render_skeleton_batch
from ..data.wire import unpack_batch
from .state import TrainState


# ----------------------------------------------------------------------
# pose input assembly (on device, inside jit)
# ----------------------------------------------------------------------

def build_pose_input(opt, joints: jnp.ndarray,
                     laplace: Optional[jnp.ndarray],
                     pose_img: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """(B,18,3) joints (+ optional LaplaceProj channels) -> (B,S,S,pose_nc).

    When the dataset supplies a pre-rendered pose image (reference:
    pre_train_tex.sh:5 feeds an openpose_img directory), it replaces the
    on-device skeleton rasterization. LaplaceProj contributes
    opt.laplace_nc_eff channels — 78 under the --input_nc 81 contract
    (pre_train_tex.sh:18), laplace_nc otherwise.
    """
    S = opt.train_size
    chans = []
    if opt.use_pose_render:
        chans.append(pose_img if pose_img is not None
                     else render_skeleton_batch(joints, S, S))
    if opt.pose_heatmaps:
        # "18Feature" joint encoding (reference flagship run name,
        # test_start/start.sh:7): per-joint Gaussian heatmaps give the UV
        # heads direct joint-relative geometry the 3-channel line render
        # only encodes implicitly. On-device, fuses into the forward.
        from ..data.rasterize import joint_heatmaps
        hm = jax.vmap(lambda j: joint_heatmaps(
            j, S, S, sigma=opt.heatmap_sigma))(joints)
        chans.append(hm * 2.0 - 1.0)
    if opt.coord_conv:
        # CoordConv channels: normalized x/y in [-1,1]. The UV heads regress
        # absolute atlas coordinates from screen position; plain convs must
        # reconstruct position from padding asymmetries, these hand it over.
        B = joints.shape[0]
        ramp = jnp.linspace(-1.0, 1.0, S, dtype=jnp.float32)
        xs = jnp.broadcast_to(ramp[None, None, :, None], (B, S, S, 1))
        ys = jnp.broadcast_to(ramp[None, :, None, None], (B, S, S, 1))
        chans += [xs, ys]
    if opt.limb_coords:
        # limb-local (t, signed d) frames — the UV heads' natural input
        # coordinates (rasterize.limb_coord_maps). On-device, fuses in.
        from ..data.rasterize import limb_coord_maps
        lc = jax.vmap(lambda j: limb_coord_maps(
            j, S, S, sigma=opt.limb_sigma))(joints)
        chans.append(lc)
    if opt.use_laplace:
        if laplace is None:
            B = joints.shape[0]
            laplace = jnp.zeros((B, S, S, opt.laplace_nc_eff), jnp.float32)
        chans.append(laplace)
    pose = jnp.concatenate(chans, axis=-1)
    assert pose.shape[-1] == opt.pose_nc, (
        f"pose input has {pose.shape[-1]} channels, config demands "
        f"{opt.pose_nc} (input_nc={opt.input_nc}, use_laplace="
        f"{opt.use_laplace}, laplace channels {opt.laplace_nc_eff})")
    return pose


def ema_blend(g_ema, new_params, step, decay: float):
    """Horizon-warmup EMA update (Adam-style debiasing): the effective decay
    ramps from ~0.1 so the early EMA tracks the fast-moving init instead of
    averaging random weights in; converges to `decay` within ~10/(1-d)
    steps. All math f32 on-device — one fused elementwise pass per leaf.
    `step` is the step count BEFORE this update (state.step)."""
    t = (step + 1).astype(jnp.float32)
    d = jnp.minimum(jnp.float32(decay), (1.0 + t) / (10.0 + t))
    return jax.tree.map(lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                        g_ema, new_params)


def _shared_assets(state: TrainState):
    """Static per-person assets as batch-1 tensors.

    The background and texture atlas are the same for every sample, so they
    enter the renderer with batch 1: BGNet runs once per step (not B times)
    and XLA broadcasts in the compositor — same math, B x less conv work on
    the bg path.
    """
    return state.static_tex[None], state.bg[None]


# ----------------------------------------------------------------------
# stage 2: end-to-end GAN training (train.py equivalent)
# ----------------------------------------------------------------------

def make_train_step(opt, renderer, disc, vgg_params, g_tx, d_tx
                    ) -> Callable[[TrainState, Dict[str, jnp.ndarray]],
                                  Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the jitted end-to-end G+D train step."""
    use_temporal = opt.lambda_Temp > 0
    use_vgg = (not opt.no_vgg_loss) and vgg_params is not None
    use_fm = not opt.no_ganFeat_loss
    use_lsgan = not opt.no_lsgan
    real_prev = use_temporal and opt.temporal_prev == "real"
    detach_prev = use_temporal and opt.temporal_detach_prev and not real_prev
    use_feat = opt.instance_feat or opt.label_feat

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        batch = unpack_batch(batch)   # wire-format (uint8/f16) -> f32, fused
        B = batch["joints"].shape[0]
        pose = build_pose_input(opt, batch["joints"], batch.get("laplace"),
                                batch.get("pose_img"))
        real = batch["image"]
        tex, bg = _shared_assets(state)
        if "bg" in batch:
            # crop-mode: each sample sees its own background window (the
            # dataset crops bg.jpg at the sample's offset) — bg enters with
            # batch B and BGNet runs per sample
            bg = batch["bg"]

        # horizontal-flip bg flag (1 float/sample): renderer mirrors the
        # shared refined background on device for flipped samples
        flip_kw = ({"bg_flip": batch["bg_flip"]} if "bg_flip" in batch
                   else {})

        if use_temporal and not real_prev:
            pose_prev = build_pose_input(opt, batch["joints_prev"],
                                         batch.get("laplace"),
                                         batch.get("pose_img_prev"))
        if detach_prev:
            # t-1 render is a forward-only target (stop-grad): the temporal
            # loss pulls frame t toward the flow-warped frame t-1 but not
            # the reverse. Saves the whole prev-frame backward INCLUDING the
            # flow-warp's gather-transpose scatter (~180 ms/step at 512px);
            # the symmetric pull is statistically redundant — both frames
            # come from the same weights. --no_temporal_detach_prev restores
            # the symmetric gradient.
            prev_kw = ({"feat_image": batch.get("image_prev", real)}
                       if use_feat else {})
            prev_kw.update(flip_kw)
            prev_det = jax.lax.stop_gradient(renderer.apply(
                {"params": state.g_params}, pose_prev, bg, tex,
                state.tex_mask, **prev_kw)["fake"])

        def g_loss_fn(g_params):
            if use_temporal and not detach_prev and not real_prev:
                # render t and t-1 in one forward (2B batch: MXU-friendly)
                pose2 = jnp.concatenate([pose, pose_prev], axis=0)
                kw2 = {}
                if use_feat:
                    kw2["feat_image"] = jnp.concatenate(
                        [real, batch.get("image_prev", real)], axis=0)
                if flip_kw:
                    # the pair shares its sample's mirror flag
                    kw2["bg_flip"] = jnp.concatenate(
                        [batch["bg_flip"], batch["bg_flip"]], axis=0)
                # per-sample bg (crop modes) applies to both frames of
                # the pair (same window/mirror) — tile it to the 2B batch
                bg2 = (jnp.concatenate([bg, bg], axis=0)
                       if bg.shape[0] == B else bg)
                outs = renderer.apply({"params": g_params}, pose2, bg2, tex,
                                      state.tex_mask, **kw2)
                cur = jax.tree.map(lambda x: x[:B], outs)
                prev_fake = outs["fake"][B:]
            else:
                kw1 = {"feat_image": real} if use_feat else {}
                kw1.update(flip_kw)
                cur = renderer.apply({"params": g_params}, pose, bg, tex,
                                     state.tex_mask, **kw1)
                if real_prev:
                    # --temporal_prev real: flow-warp consistency against
                    # the REAL t-1 frame — no second render at all. Cheaper
                    # than the parity fake-prev mode; the target is clean
                    # video, so the pull is toward ground-truth motion.
                    prev_fake = batch["image_prev"]
                else:
                    prev_fake = prev_det if detach_prev else None
            fake = cur["fake"]

            d_fake = disc.apply({"params": state.d_params},
                                jnp.concatenate([pose, fake], -1))
            losses = {"G_GAN": L.lsgan_loss_g(d_fake, use_lsgan)}
            if use_fm:
                d_real = disc.apply({"params": state.d_params},
                                    jnp.concatenate([pose, real], -1))
                d_real = jax.tree.map(jax.lax.stop_gradient, d_real)
                losses["G_FM"] = L.feature_matching_loss(d_real, d_fake,
                                                         opt.lambda_feat)
            if use_vgg:
                losses["G_VGG"] = opt.lambda_feat * L.vgg_loss(
                    vgg_params, fake, real)
            if opt.lambda_L2 > 0:
                losses["G_L2"] = opt.lambda_L2 * L.l2_loss(fake, real)
            if opt.use_densepose_loss and "dp_parts" in batch:
                losses["G_UV"] = opt.lambda_UV * L.uv_loss(
                    cur["uv"], batch["dp_uv"], batch["dp_parts"])
                losses["G_Prob"] = opt.lambda_Prob * L.part_ce_loss(
                    cur["logits"], batch["dp_parts"])
                if opt.lambda_UVgrad > 0:
                    losses["G_UVgrad"] = opt.lambda_UVgrad * L.uv_grad_loss(
                        cur["uv"], batch["dp_uv"], batch["dp_parts"])
                if opt.ms_uv > 0:
                    # deep supervision at the decoder's intermediate scales
                    # (--ms_uv), weighted lambda_MS relative to the full-res
                    # UV/CE terms
                    ms_uv_l, ms_ce_l = L.ms_iuv_loss(
                        cur["ms_aux"], batch["dp_uv"], batch["dp_parts"])
                    losses["G_MSUV"] = opt.lambda_MS * (
                        opt.lambda_UV * ms_uv_l + opt.lambda_Prob * ms_ce_l)
            if opt.lambda_Mask > 0 and "mask" in batch:
                losses["G_Mask"] = opt.lambda_Mask * L.mask_loss(
                    cur["mask"], batch["mask"])
            if use_temporal and "flow" in batch:
                losses["G_Temp"] = opt.lambda_Temp * L.temporal_flow_loss(
                    fake, prev_fake, batch["flow"], batch["flow_inv"])
            total = functools.reduce(jnp.add, losses.values())
            return total, (losses, fake)

        (g_total, (g_losses, fake)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params)

        fake_det = jax.lax.stop_gradient(fake)
        d_in_fake = jnp.concatenate([pose, fake_det], -1)
        pool_kwargs = {}
        if opt.pool_size > 0:
            # pix2pixHD ImagePool: D trains on a mix of fresh and historical
            # (label, fake) pairs — device-side ring buffer, zero host sync
            from .image_pool import pool_query
            d_in_fake, pool_buf, pool_n, pool_rng = pool_query(
                state.pool_buf, state.pool_n, state.pool_rng, d_in_fake)
            pool_kwargs = dict(pool_buf=pool_buf, pool_n=pool_n,
                               pool_rng=pool_rng)

        def d_loss_fn(d_params):
            d_real = disc.apply({"params": d_params},
                                jnp.concatenate([pose, real], -1))
            d_fake = disc.apply({"params": d_params}, d_in_fake)
            return L.lsgan_loss_d(d_real, d_fake, use_lsgan)

        d_total, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)

        g_ups, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        d_ups, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        new_g = optax.apply_updates(state.g_params, g_ups)
        ema_kwargs = {}
        if opt.ema_decay > 0 and state.g_ema is not None:
            ema_kwargs["g_ema"] = ema_blend(state.g_ema, new_g,
                                            state.step, opt.ema_decay)
        new_state = state.replace(
            step=state.step + 1,
            g_params=new_g,
            d_params=optax.apply_updates(state.d_params, d_ups),
            g_opt=g_opt, d_opt=d_opt, **pool_kwargs, **ema_kwargs)
        metrics = dict(g_losses)
        metrics["G_total"] = g_total
        metrics["D_total"] = d_total
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


def make_forward_fn(opt, renderer, cluster_feats=None):
    """Jitted inference forward: joints (+laplace) -> rendered frame dict.

    cluster_feats: (P+1, feat_num) per-part appearance codes for the
    --instance_feat inference path (--load_features); None under use_feat
    renders with zero codes (renderer warns upstream)."""
    kw = {}
    if renderer.use_feat and cluster_feats is not None:
        kw["cluster_feats"] = jnp.asarray(cluster_feats, jnp.float32)

    def fwd(g_params, state_assets, joints, laplace=None, pose_img=None,
            feat_image=None):
        static_tex, bg, tex_mask = state_assets
        pose = build_pose_input(opt, joints, laplace, pose_img)
        fkw = dict(kw)
        if renderer.use_feat and feat_image is not None:
            # eval-with-reference-frame mode: encode the real frame like
            # the train step does, so held-out metrics measure the model
            # in the configuration it actually trains in
            fkw = {"feat_image": feat_image}
        # batch-1 shared assets: BGNet runs once, compositor broadcasts
        return renderer.apply({"params": g_params}, pose, bg[None],
                              static_tex[None], tex_mask, **fkw)
    return jax.jit(fwd)


# ----------------------------------------------------------------------
# stage 1: person-agnostic UV pretrain (pre_train.py equivalent)
# ----------------------------------------------------------------------

def make_pretrain_uv_step(opt, transg, tx):
    """Supervised IUV regression step: UV L1 + part CE, masked
    (SURVEY.md §3.3; reference: pretrainTrans.sh)."""
    w_uv = opt.lambda_UV if opt.lambda_UV > 0 else 1000.0
    w_prob = opt.lambda_Prob if opt.lambda_Prob > 0 else 10.0

    def step(params, opt_state, batch):
        batch = unpack_batch(batch)
        pose = build_pose_input(opt, batch["joints"], batch.get("laplace"),
                                batch.get("pose_img"))

        def loss_fn(p):
            tout = transg.apply({"params": p}, pose)
            logits, uv = tout[0], tout[1]
            l_uv = w_uv * L.uv_loss(uv, batch["dp_uv"], batch["dp_parts"])
            l_ce = w_prob * L.part_ce_loss(logits, batch["dp_parts"],
                                           batch.get("mask"))
            out = {"UV": l_uv, "Prob": l_ce}
            if opt.lambda_UVgrad > 0:
                out["UVgrad"] = opt.lambda_UVgrad * L.uv_grad_loss(
                    uv, batch["dp_uv"], batch["dp_parts"])
            if opt.ms_uv > 0:
                ms_uv_l, ms_ce_l = L.ms_iuv_loss(
                    tout[2], batch["dp_uv"], batch["dp_parts"],
                    batch.get("mask"))
                out["MSUV"] = opt.lambda_MS * (w_uv * ms_uv_l
                                               + w_prob * ms_ce_l)
            return functools.reduce(jnp.add, out.values()), out

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        ups, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, ups)
        losses["total"] = total
        return params, opt_state, losses

    return jax.jit(step, donate_argnums=(0, 1))


# ----------------------------------------------------------------------
# optional stage: texture-generator pretrain (pre_train_tex.py equivalent)
# ----------------------------------------------------------------------

def make_pretrain_tex_step(opt, texg, tx, static_tex, tex_mask=None):
    """TexG reconstruction pretrain: dynamic texture vs per-part GT textures
    (SURVEY.md §3.4; reference: pre_train_tex.sh — L1-style recon, masked)."""
    static = jnp.asarray(static_tex, jnp.float32)

    def step(params, opt_state, batch):
        batch = unpack_batch(batch)
        pose = build_pose_input(opt, batch["joints"], batch.get("laplace"),
                                batch.get("pose_img"))
        gt = batch["part_texture"]           # (B, P, T, T, 3)

        def loss_fn(p):
            res = texg.apply({"params": p}, pose)
            if tex_mask is not None:
                res = res * tex_mask[None]
            dyn = jnp.clip(static[None] + res, -1.0, 1.0)
            err = jnp.abs(dyn - gt)
            if tex_mask is not None:
                err = err * tex_mask[None]
            loss = jnp.mean(err)
            aux = {}
            if "pose_texture" in batch:
                # pose-conditioned texture supervision (pre_train_tex.sh:9)
                pt = jnp.mean(jnp.abs(dyn - batch["pose_texture"]))
                aux["Tex_pose"] = pt
                loss = loss + pt
            return loss, aux

        (total, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        ups, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, ups)
        return params, opt_state, {"Tex_L1": total}

    return jax.jit(step, donate_argnums=(0, 1))
