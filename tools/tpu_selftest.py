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

    def check(name, a, b, atol):
        nonlocal failures
        d = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                  - b.astype(jnp.float32))))
        ok = d <= atol
        failures += 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL'}  {name}: maxdiff {d:.3e} "
              f"(atol {atol})")

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
