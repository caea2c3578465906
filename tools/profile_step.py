#!/usr/bin/env python3
"""Trace-driven per-source-line profile of the 512px train step (or inference).

Runs the flagship stage-2 step under ``jax.profiler.trace`` and aggregates
device-op time by the first /root/repo source frame in each op's
``source_stack`` — the method every optimization in docs/PERFORMANCE.md came
from (previously an ad-hoc script; now checked in).

Usage:
    python tools/profile_step.py [--infer] [--steps 6] [--out /tmp/nhvr_prof]
    python tools/profile_step.py --analyze /tmp/nhvr_prof   # parse only
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_trace(out_dir: str, steps: int, infer: bool, size: int = 512,
              netG: str = "global", tex_tile: int = 128,
              warp_dtype: str = "float32", batch: int = 2,
              ngf: int = 64, ngf_global: int = 48) -> None:
    sys.path.insert(0, REPO)
    from neural_human_video_rendering_tpu.runtime import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    from neural_human_video_rendering_tpu.config import Options
    from neural_human_video_rendering_tpu.data import dataset as dsm
    from neural_human_video_rendering_tpu.train import steps as st
    from neural_human_video_rendering_tpu.train.state import create_train_state

    opt = Options(
        loadSize=size, batchSize=batch, tex_tile=tex_tile,
        ngf=ngf, n_downsample_translate=4, n_blocks_translate=9,
        ngf_global=ngf_global, n_downsample_global=2, n_blocks_global=10,
        n_downsample_bg=2, n_blocks_bg=2,
        num_D=2, n_layers_D=3, ndf=64,
        netG=netG,
        lambda_L2=500, lambda_UV=1000, lambda_Prob=10, lambda_Temp=500,
        use_densepose_loss=True, dtype="bfloat16", use_pallas_warp=True,
        warp_dtype=warp_dtype,
    )
    ds = dsm.SyntheticDataset(opt, length=opt.batchSize)
    batch = dsm.collate([ds[i] for i in range(opt.batchSize)])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    bundle = create_train_state(opt, jax.random.PRNGKey(0),
                                ds.texture_atlas(), ds.background())

    if infer:
        fwd = st.make_forward_fn(opt, bundle["renderer"])
        state = bundle["state"]
        assets = (state.static_tex, state.bg, state.tex_mask)

        def one(_):
            return fwd(state.g_params, assets, batch["joints"])["fake"]
        out = one(None)
        _ = float(jnp.sum(out))          # compile + fence
        jax.profiler.start_trace(out_dir)
        for _ in range(steps):
            out = one(None)
        _ = float(jnp.sum(out))
        jax.profiler.stop_trace()
    else:
        step = st.make_train_step(opt, bundle["renderer"], bundle["disc"],
                                  bundle["vgg_params"], bundle["g_tx"],
                                  bundle["d_tx"])
        state = bundle["state"]
        state, metrics = step(state, batch)
        _ = float(metrics["G_total"])    # compile + fence
        jax.profiler.start_trace(out_dir)
        for _ in range(steps):
            state, metrics = step(state, batch)
        _ = float(metrics["G_total"])
        jax.profiler.stop_trace()
    print(f"trace -> {out_dir}", file=sys.stderr)


def analyze(out_dir: str, steps: int, top: int = 30) -> None:
    paths = sorted(glob.glob(os.path.join(
        out_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        sys.exit(f"no trace under {out_dir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)

    by_line = defaultdict(float)
    by_op = defaultdict(float)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        args = ev.get("args") or {}
        stack = args.get("source_stack") or ""
        if not stack and "tf_op" not in args:
            continue
        dur_ms = ev["dur"] / 1e3
        total += dur_ms
        frame = next((ln.strip() for ln in stack.splitlines()
                      if "/repo/" in ln), stack.splitlines()[0].strip()
                     if stack else "<no-stack>")
        by_line[frame] += dur_ms
        by_op[ev.get("name", "?")[:60]] += dur_ms

    n = max(steps, 1)
    print(f"\ndevice-op time: {total:.1f} ms over {steps} steps "
          f"= {total / n:.1f} ms/step\n")
    print("== by source line (ms/step) ==")
    for k, v in sorted(by_line.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{v / n:9.3f}  {k}")
    print("\n== by op name (ms/step) ==")
    for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{v / n:9.3f}  {k}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/nhvr_prof")
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--infer", action="store_true")
    p.add_argument("--loadSize", type=int, default=512)
    p.add_argument("--netG", default="global", choices=["global", "local"])
    p.add_argument("--tex_tile", type=int, default=128)
    p.add_argument("--warp_dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--batchSize", type=int, default=2)
    p.add_argument("--ngf", type=int, default=64, help=(
        "TransG trunk width; the measured 1024px --netG local config is "
        "--ngf 32 --ngf_global 24 --batchSize 1 (docs/PERFORMANCE.md) — "
        "the 512px defaults OOM at 1024px"))
    p.add_argument("--ngf_global", type=int, default=48)
    p.add_argument("--analyze", default="",
                   help="skip the run; analyze this trace dir")
    a = p.parse_args()
    if a.analyze:
        analyze(a.analyze, a.steps)
    else:
        run_trace(a.out, a.steps, a.infer, a.loadSize, a.netG, a.tex_tile,
                  a.warp_dtype, a.batchSize, a.ngf, a.ngf_global)
        analyze(a.out, a.steps)
