#!/usr/bin/env python3
"""On-TPU kernel equivalence self-test (run manually on real hardware).

The pytest suite pins the Pallas kernels against their jnp references in
INTERPRET mode on CPU (tests never grab the TPU tunnel — see
tests/conftest.py). This script runs the same equivalence checks with the
kernels actually COMPILED by Mosaic on the attached TPU: texture warp
forward + all gradients, flow warp, top-k selection.

    python tools/tpu_selftest.py        # prints PASS/FAIL per check
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from neural_human_video_rendering_tpu.runtime import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neural_human_video_rendering_tpu.ops import pallas_warp2 as pw2
    from neural_human_video_rendering_tpu.ops.pallas_flow_warp import \
        flow_warp_fast
    import neural_human_video_rendering_tpu.ops.grid_sample as _
    gs = sys.modules["neural_human_video_rendering_tpu.ops.grid_sample"]

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    assert jax.default_backend() == "tpu", "run this on the TPU"

    failures = 0

    def check(name, a, b, atol, rtol=0.0):
        # tolerance is atol + rtol*max|b|: accumulation-heavy grads (dtex
        # sums hundreds of per-pixel contributions in implementation-
        # dependent order) carry absolute error proportional to magnitude
        nonlocal failures
        bf = b.astype(jnp.float32)
        d = float(jnp.max(jnp.abs(a.astype(jnp.float32) - bf)))
        tol = atol + rtol * float(jnp.max(jnp.abs(bf)))
        ok = d <= tol
        failures += 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL'}  {name}: maxdiff {d:.3e} "
              f"(tol {tol:.3e})")

    key = jax.random.PRNGKey(0)
    B, P, T, H, W, C = 2, 24, 128, 128, 128, 3
    k1, k2, k3 = jax.random.split(key, 3)
    tex = jax.random.uniform(k1, (B, P, T, T, C), jnp.float32)
    uv = jax.random.uniform(k2, (B, H, W, P, 2), jnp.float32)
    probs = jax.nn.softmax(jax.random.normal(k3, (B, H, W, P + 1)), -1)

    # texture warp forward: compiled kernel vs all-parts jnp reference (k=P
    # to eliminate top-k tie noise between implementations)
    ref = jax.jit(gs.texture_warp_reference)(tex, uv, probs)
    out = jax.jit(lambda t, u, p: pw2.texture_warp_pallas(t, u, p, P, 0))(
        tex, uv, probs)
    check("warp fwd (k=P, all parts)", out, ref, 2e-5)

    # gradients w.r.t. tex / uv / probs
    def loss_ref(t, u, p):
        return jnp.sum(gs.texture_warp_reference(t, u, p) ** 2)

    def loss_ker(t, u, p):
        return jnp.sum(pw2.texture_warp_pallas(t, u, p, P, 0) ** 2)

    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(tex, uv, probs)
    gk = jax.jit(jax.grad(loss_ker, argnums=(0, 1, 2)))(tex, uv, probs)
    for name, a, b in zip(("dtex", "duv", "dprobs"), gk, gr):
        check(f"warp bwd {name}", a, b, 5e-3)

    # sub-128 tile via the dispatch pad-to-128 path (the tile-64 quality
    # config): compiled forward + all gradients vs the unpadded reference
    from neural_human_video_rendering_tpu.ops.pallas_warp import texture_warp
    T64 = 64
    tex64 = jax.random.uniform(k1, (B, P, T64, T64, C), jnp.float32)
    # the dispatch passes the effective tile edge (`ext`) into the kernel,
    # which samples and clips on the (T-1) grid directly — the padded op
    # is bit-identical to the unpadded reference for ARBITRARY uv (the
    # old uv-rescale dispatch double-rounded and flipped floor() cells at
    # integer texels, which forced boundary-safe uv here)
    uv64 = uv
    ref64 = jax.jit(gs.texture_warp_reference)(tex64, uv64, probs)
    out64 = jax.jit(lambda t, u, p: texture_warp(t, u, p, True, P, 0))(
        tex64, uv64, probs)
    check("warp fwd tile64 padded (k=P)", out64, ref64, 2e-5)

    def loss_ref64(t, u, p):
        return jnp.sum(gs.texture_warp_reference(t, u, p) ** 2)

    def loss_ker64(t, u, p):
        return jnp.sum(texture_warp(t, u, p, True, P, 0) ** 2)

    gr64 = jax.jit(jax.grad(loss_ref64, argnums=(0, 1, 2)))(tex64, uv64, probs)
    gk64 = jax.jit(jax.grad(loss_ker64, argnums=(0, 1, 2)))(tex64, uv64, probs)
    for name, a, b in zip(("dtex", "duv", "dprobs"), gk64, gr64):
        check(f"warp bwd tile64 padded {name}", a, b, 5e-3)

    # the actual training configuration: per-pixel top-k=4, NO block cap,
    # padded tile-64 — all gradients vs the XLA top-k path (this is the
    # exact path the 512px quality runs train through; the bp=8 block cap
    # was demoted to opt-in after it collapsed a resumed run, see
    # ops/pallas_warp2.py:_topk_dense_weights docstring)
    probs_pk = jax.nn.softmax(
        8.0 * jax.random.normal(k3, (B, H, W, P + 1)), -1)

    def loss_xla4(t, u, p):
        return jnp.sum(gs.texture_warp_topk(t, u, p, 4) ** 2)

    def loss_ker4(t, u, p):
        return jnp.sum(texture_warp(t, u, p, True, 4, 0) ** 2)

    out4 = jax.jit(lambda t, u, p: texture_warp(t, u, p, True, 4, 0))(
        tex64, uv64, probs_pk)
    ref4 = jax.jit(lambda t, u, p: gs.texture_warp_topk(t, u, p, 4))(
        tex64, uv64, probs_pk)
    check("warp fwd tile64 k=4 bp=0", out4, ref4, 2e-5)
    gr4 = jax.jit(jax.grad(loss_xla4, argnums=(0, 1, 2)))(tex64, uv64, probs_pk)
    gk4 = jax.jit(jax.grad(loss_ker4, argnums=(0, 1, 2)))(tex64, uv64, probs_pk)
    for name, a, b in zip(("dtex", "duv", "dprobs"), gk4, gr4):
        check(f"warp bwd tile64 k=4 bp=0 {name}", a, b, 5e-3, rtol=1e-3)

    # DEFAULT training path: k=4 + warp_eps=1e-3 (sub-eps weight drop),
    # kernel vs XLA with the same eps — must agree to float tolerance,
    # and differ from exact by at most k*eps
    EPS = 1e-3
    oute = jax.jit(lambda t, u, p: texture_warp(t, u, p, True, 4, 0, EPS))(
        tex64, uv64, probs_pk)
    refe = jax.jit(lambda t, u, p: gs.texture_warp_topk(t, u, p, 4, EPS))(
        tex64, uv64, probs_pk)
    check("warp fwd tile64 k=4 eps=1e-3", oute, refe, 2e-5)
    check("warp eps bound vs exact (<=k*eps)", oute, ref4, 4 * EPS)

    # bf16 warp compute (--warp_dtype bfloat16): verifies the Mosaic bf16
    # lane-gather lowering ON HARDWARE — interpret mode already pins the
    # semantics (tests/test_pallas_warp.py bf16 suite), but the compiled
    # take_along_axis on (16,128)-tiled bf16 rows is exactly the part no
    # CPU test can vouch for. Tolerance is the bf16 product-rounding bound.
    outb = jax.jit(lambda t, u, p: texture_warp(
        t, u, p, True, 4, 0, 0.0, "bfloat16"))(tex64, uv64, probs_pk)
    check("warp fwd tile64 k=4 bf16", outb, ref4, 2.5e-2)

    def loss_kb(t, u, p):
        return jnp.sum(texture_warp(t, u, p, True, 4, 0, 0.0,
                                    "bfloat16") ** 2)

    gkb = jax.jit(jax.grad(loss_kb, argnums=(0, 1, 2)))(tex64, uv64, probs_pk)
    for name, a, b in zip(("dtex", "duv", "dprobs"), gkb, gr4):
        scale = float(jnp.max(jnp.abs(b))) + 1e-6
        check(f"warp bwd tile64 bf16 {name} (rel)", a / scale, b / scale,
              3e-2)

    # flow warp vs jnp reference
    img = jax.random.uniform(k1, (B, H, W, C), jnp.float32)
    flow = 8.0 * jax.random.normal(k2, (B, H, W, 2), jnp.float32)
    ref_f = jax.jit(gs.flow_warp)(img, flow)
    out_f = jax.jit(flow_warp_fast)(img, flow)
    check("flow warp fwd", out_f, ref_f, 2e-5)

    # top-k selection kernel vs XLA formulation
    fg = jnp.moveaxis(probs[..., 1:], -1, 1).reshape(B, P, H * W)
    w_xla = pw2._topk_dense_weights(fg, 4, 8)
    fg_planes = fg.reshape(B, P, (H * W) // 1024, 8, 128)
    w_ker = pw2._topk_call(fg_planes, 4, 8).reshape(B, P, H * W)
    check("top-k selection", w_ker, w_xla, 1e-6)

    print("ALL PASS" if failures == 0 else f"{failures} FAILURES")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
