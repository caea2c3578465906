#!/usr/bin/env python3
"""Secondary benchmark: 512px inference FPS per chip (BASELINE.md metric 2).

Measures the full keypoints -> frame forward (on-device rasterization,
TransG, TexG, Pallas texture warp, BG composite) at the reference inference
config (test_start/start.sh sizing), batched. Prints one JSON line.
(bench.py remains the driver-run headline; this one is run manually.)
"""

import json
import sys
import time


def main():
    from neural_human_video_rendering_tpu.runtime import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neural_human_video_rendering_tpu.config import Options
    from neural_human_video_rendering_tpu.data import dataset as dsm
    from neural_human_video_rendering_tpu.train.state import create_train_state
    from neural_human_video_rendering_tpu.train.steps import make_forward_fn

    batch = 8
    opt = Options(loadSize=512, batchSize=batch, tex_tile=128,
                  ngf=64, n_downsample_translate=4, n_blocks_translate=9,
                  ngf_global=48, n_downsample_global=2, n_blocks_global=10,
                  n_downsample_bg=2, n_blocks_bg=2, dtype="bfloat16")
    ds = dsm.SyntheticDataset(opt, length=batch)
    bundle = create_train_state(opt, jax.random.PRNGKey(0),
                                ds.texture_atlas(), ds.background(),
                                with_discriminator=False)
    state = bundle["state"]
    fwd = make_forward_fn(opt, bundle["renderer"])
    joints = jnp.asarray(np.stack([ds[i]["joints"] for i in range(batch)]))
    assets = (state.static_tex, state.bg, state.tex_mask)

    t0 = time.time()
    out = fwd(state.g_params, assets, joints)
    _ = float(out["fake"].sum())
    print(f"# compile: {time.time() - t0:.1f}s", file=sys.stderr)

    iters = 20
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        for _ in range(iters):
            out = fwd(state.g_params, assets, joints)
        _ = float(out["fake"].sum())
        best = min(best, (time.time() - t0) / iters)
    fps = batch / best
    print(json.dumps({"metric": "inference_fps_512px", "value": round(fps, 2),
                      "unit": "frames/s", "vs_baseline": round(fps / 30.0, 3)}))


if __name__ == "__main__":
    main()
