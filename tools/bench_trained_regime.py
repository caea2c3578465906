#!/usr/bin/env python3
"""Trained-regime warp speedup, measured WITHOUT a saved checkpoint.

The warp kernel predicates each (block, part) step away when the block's
top-k weight mass is zero (`@pl.when`, ops/pallas_warp2.py). At random
init, softmax part probabilities are near-uniform, so `warp_eps` drops
nothing and every block runs every part — bench.py's headline is that
worst case. On a TRAINED checkpoint the probabilities are peaked and
spatially coherent, so most (block, part) pairs skip (57% measured on the
round-2 512px checkpoint) and the same compiled step runs faster.

This harness demonstrates the transition directly: it trains bench.py's
EXACT flagship step (same Options -> same cached XLA program; no cold
compile through the relay) on its synthetic batch and reports steps/s per
100-step window as the part head converges under the supervised CE loss.
The step rate rising window-over-window IS the block-skip engaging —
no checkpoint round-trip, no second graph.

Timing fence per window: N chained steps + one scalar fetch (see
bench.py's relay note — block_until_ready does not sync through the axon
relay). Prints one JSON line per window and a final summary line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--windows", type=int, default=12)
    ap.add_argument("--window_steps", type=int, default=100)
    ns = ap.parse_args()

    from neural_human_video_rendering_tpu.runtime import setup_jax
    setup_jax()
    import jax

    # bounded backend init, same pattern as bench.py: if the axon relay is
    # down, the first device touch blocks forever and would hang any driver
    # that queued this harness — fail loudly instead (rc=3)
    import threading

    def _die():
        print("bench_trained_regime: TPU backend init exceeded 15 min — "
              "relay down? aborting", file=sys.stderr, flush=True)
        os._exit(3)

    _wd = threading.Timer(900.0, _die)
    _wd.daemon = True
    _wd.start()
    jax.devices()
    _wd.cancel()

    import jax.numpy as jnp

    from neural_human_video_rendering_tpu.config import Options
    from neural_human_video_rendering_tpu.data import dataset as dsm
    from neural_human_video_rendering_tpu.train import steps as st
    from neural_human_video_rendering_tpu.train.state import create_train_state

    # EXACTLY bench.py's operating point -> compile-cache hit
    opt = Options(
        loadSize=512, batchSize=2, tex_tile=128,
        ngf=64, n_downsample_translate=4, n_blocks_translate=9,
        ngf_global=48, n_downsample_global=2, n_blocks_global=10,
        n_downsample_bg=2, n_blocks_bg=2,
        num_D=2, n_layers_D=3, ndf=64,
        lambda_L2=500, lambda_UV=1000, lambda_Prob=10, lambda_Temp=500,
        use_densepose_loss=True, dtype="bfloat16", use_pallas_warp=True,
    )
    ds = dsm.SyntheticDataset(opt, length=opt.batchSize)
    batch = dsm.collate([ds[i] for i in range(opt.batchSize)])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    bundle = create_train_state(opt, jax.random.PRNGKey(0),
                                ds.texture_atlas(), ds.background())
    step = st.make_train_step(opt, bundle["renderer"], bundle["disc"],
                              bundle["vgg_params"], bundle["g_tx"],
                              bundle["d_tx"])
    state = bundle["state"]

    t0 = time.time()
    state, metrics = step(state, batch)
    _ = float(metrics["G_total"])
    print(f"# compile+first step: {time.time() - t0:.1f}s", file=sys.stderr)

    first = last = None
    for wi in range(ns.windows):
        t0 = time.time()
        for _ in range(ns.window_steps):
            state, metrics = step(state, batch)
        prob = float(metrics["G_Prob"])      # the scalar fetch IS the fence
        sps = ns.window_steps / (time.time() - t0)
        if first is None:
            first = sps
        last = sps
        print(json.dumps({"window": wi, "steps_per_sec": round(sps, 4),
                          "G_Prob": round(prob, 4)}), flush=True)
    print(json.dumps({"metric": "trained_regime_speedup_512px_bs2",
                      "first_window_sps": round(first, 4),
                      "last_window_sps": round(last, 4),
                      "speedup": round(last / first, 3)}))


if __name__ == "__main__":
    main()
