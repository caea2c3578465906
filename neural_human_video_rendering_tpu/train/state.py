"""Train state: generator + discriminator params, two optimizers, assets.

Functional redesign of the reference's stateful Pix2PixHDModel-analog
(SURVEY.md §2 #18/#19): everything the step mutates lives in one PyTree so
the whole G/D update is a single jitted function. The static background and
texture atlas are part of the state (they are per-identity assets the online
refinement reads), and the *refined* background / mask exist implicitly as
BGNet params and TransG's bg-probability head — "stateful side outputs"
become trained parameters (SURVEY.md §7 hard part 4).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..models.discriminator import MultiscaleDiscriminator
from ..models.renderer import NeuralRenderer, renderer_from_options
from ..models.vgg import get_vgg_params


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    g_params: Any
    d_params: Any
    g_opt: Any
    d_opt: Any
    # per-identity assets (replicated; part of the checkpoint)
    static_tex: jnp.ndarray          # (P, T, T, 3)
    bg: jnp.ndarray                  # (H, W, 3)
    tex_mask: Optional[jnp.ndarray]  # (P, T, T, 1) or None
    # fake-image history pool (--pool_size > 0; train/image_pool.py)
    pool_buf: Optional[jnp.ndarray] = None   # (K, S, S, pose_nc+3)
    pool_n: Optional[jnp.ndarray] = None     # () int32 valid entries
    pool_rng: Optional[jnp.ndarray] = None   # PRNG key
    # EMA of g_params (--ema_decay > 0): evaluated/served weights; the raw
    # g_params keep training. None when EMA is off (parity default).
    g_ema: Optional[Any] = None


class FreezeUntilState(NamedTuple):
    """Step counter for freeze_scope_until. A distinct type (not a bare
    array) so checkpoint restore can recognize it and fast-forward the
    count from the restored global step — otherwise a tolerant resume
    that drops the optimizer state would silently re-freeze the trunk
    for another niter_fix_global epochs."""
    count: jnp.ndarray


def freeze_scope_until(scope: str, n_steps: int) -> optax.GradientTransformation:
    """Zero gradients for every param whose path has a component equal to
    `scope` for the first n_steps optimizer steps (pix2pixHD
    --niter_fix_global: with --netG local, train only the enhancer branches
    first, then unfreeze the global trunk). Placed BEFORE adam so trunk
    moments stay at zero while frozen — unfreezing starts momentum-clean,
    matching pix2pixHD's re-created optimizer."""
    import flax.traverse_util as tu

    def init(params):
        return FreezeUntilState(count=jnp.zeros((), jnp.int32))

    def update(updates, state, params=None):
        gate = (state.count >= n_steps).astype(jnp.float32)
        flat = tu.flatten_dict(updates)
        # exact component match, not substring: a user module named e.g.
        # "my_global_trunk_ext" must not be accidentally frozen
        flat = {k: (v * gate if any(scope == str(p) for p in k) else v)
                for k, v in flat.items()}
        return tu.unflatten_dict(flat), FreezeUntilState(count=state.count + 1)

    return optax.GradientTransformation(init, update)


def make_optimizer(opt, steps_per_epoch: int = 0) -> optax.GradientTransformation:
    """Adam(lr, beta1, beta2) with pix2pixHD's LR schedule: constant for
    `niter` epochs then linear decay to 0 over `niter_decay` epochs
    (disabled by --no_decay, cf. the reference's *_noDecay run names)."""
    if opt.no_decay or steps_per_epoch <= 0:
        sched = opt.lr
    else:
        flat = opt.niter * steps_per_epoch
        decay = max(opt.niter_decay * steps_per_epoch, 1)
        sched = optax.join_schedules(
            [optax.constant_schedule(opt.lr),
             optax.linear_schedule(opt.lr, 0.0, decay)],
            boundaries=[flat])
    tx = optax.adam(sched, b1=opt.beta1, b2=opt.beta2)
    if (getattr(opt, "niter_fix_global", 0) > 0 and opt.netG == "local"
            and steps_per_epoch > 0):
        tx = optax.chain(
            freeze_scope_until("global_trunk",
                               opt.niter_fix_global * steps_per_epoch), tx)
    return tx


def build_discriminator(opt) -> MultiscaleDiscriminator:
    dtype = jnp.bfloat16 if opt.dtype == "bfloat16" else jnp.float32
    return MultiscaleDiscriminator(num_D=opt.num_D, ndf=opt.ndf,
                                   n_layers=opt.n_layers_D,
                                   stem_s2d=opt.stem_s2d, dtype=dtype)


def create_train_state(opt, rng: jax.Array, static_tex, bg,
                       tex_mask=None, with_discriminator: bool = True,
                       steps_per_epoch: int = 0) -> Dict[str, Any]:
    """Initialize all params + optimizers; returns dict with 'state',
    'renderer', 'disc', 'vgg_params', 'g_tx', 'd_tx'."""
    renderer = renderer_from_options(opt)
    S = opt.train_size
    B = 1
    pose = jnp.zeros((B, S, S, opt.pose_nc), jnp.float32)
    bg_b = jnp.zeros((B, S, S, 3), jnp.float32)
    tex_b = jnp.zeros((B, opt.n_parts, opt.tex_tile, opt.tex_tile, 3), jnp.float32)
    rng, g_rng, d_rng = jax.random.split(rng, 3)
    init_kwargs = {}
    if renderer.use_feat:
        # encoder E params must exist from the start (checkpoint shape
        # stability between train / inference feature modes)
        init_kwargs["feat_image"] = jnp.zeros((B, S, S, 3), jnp.float32)
    # jit the inits: eager flax init dispatches op-by-op (hundreds of tiny
    # device calls — minutes over a remote TPU link); compiled it's one call
    g_params = jax.jit(functools.partial(renderer.init, **init_kwargs))(
        g_rng, pose, bg_b, tex_b, tex_mask)["params"]

    disc = None
    d_params = {}
    if with_discriminator:
        disc = build_discriminator(opt)
        d_in = jnp.zeros((B, S, S, opt.pose_nc + 3), jnp.float32)
        d_params = jax.jit(disc.init)(d_rng, d_in)["params"]

    g_tx = make_optimizer(opt, steps_per_epoch)
    d_tx = make_optimizer(opt, steps_per_epoch)
    pool_buf = pool_n = pool_rng = None
    if with_discriminator and opt.pool_size > 0:
        rng, pool_rng = jax.random.split(rng)
        pool_buf = jnp.zeros((opt.pool_size, S, S, opt.pose_nc + 3),
                             jnp.float32)
        pool_n = jnp.zeros((), jnp.int32)
    state = TrainState(
        pool_buf=pool_buf, pool_n=pool_n, pool_rng=pool_rng,
        g_ema=(jax.tree.map(jnp.copy, g_params)
               if with_discriminator and getattr(opt, "ema_decay", 0.0) > 0
               else None),
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        d_params=d_params,
        g_opt=g_tx.init(g_params),
        d_opt=d_tx.init(d_params) if with_discriminator else {},
        static_tex=jnp.asarray(static_tex, jnp.float32),
        bg=jnp.asarray(bg, jnp.float32),
        tex_mask=None if tex_mask is None else jnp.asarray(tex_mask, jnp.float32),
    )
    vgg_params = None
    if with_discriminator and not opt.no_vgg_loss:
        vgg_params = get_vgg_params()
    return {"state": state, "renderer": renderer, "disc": disc,
            "vgg_params": vgg_params, "g_tx": g_tx, "d_tx": d_tx}
