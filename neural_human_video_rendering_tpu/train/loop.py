"""Shared epoch/iteration training loop (SURVEY.md §2 #19 driver layer).

One loop serves all three stages: epoch loop -> prefetched batch loop ->
jitted step -> periodic console/HTML/TensorBoard output + epoch checkpoints
(reference cadence flags: --display_freq --print_freq --save_epoch_freq
--continue_train, train_start/pretrain_start.sh:35,40-43).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax
import numpy as np

from ..data.dataset import BatchLoader
from ..utils.visualizer import Visualizer


def device_iter(loader, mesh=None):
    """Yield loader batches as device arrays, uploading ONE BATCH AHEAD.

    jax.device_put dispatches asynchronously, so the next batch's
    host->device transfer overlaps the current step's compute — on a
    bandwidth-limited link this hides most of the wire time that remains
    after wire-format packing (data/wire.py). With a mesh, the upload is
    the sharded placement (shard_batch)."""
    if mesh is not None:
        from ..parallel.mesh import shard_batch
        put = lambda b: shard_batch(mesh, b)          # noqa: E731
    else:
        put = lambda b: jax.tree.map(jax.device_put, b)  # noqa: E731
    pending = None
    for b in loader:
        nxt = put(b)
        if pending is not None:
            yield pending
        pending = nxt
    if pending is not None:
        yield pending


def run_training(opt, loader: BatchLoader, step_fn: Callable,
                 carry, epochs: int,
                 save_fn: Callable[[object, int], None],
                 visuals_fn: Optional[Callable] = None,
                 eval_fn: Optional[Callable] = None,
                 start_epoch: int = 1,
                 mesh=None) -> object:
    """Generic loop. `carry` is whatever PyTree the step threads (TrainState
    or (params, opt_state)); step_fn(carry, batch) -> (carry, metrics);
    eval_fn(carry, epoch) -> metrics dict, run after every epoch (the
    reference's --data_ratio held-out split, made measurable).

    Multi-host: every process runs the identical SPMD step (collectives
    require it), but only process 0 touches shared artifacts — checkpoints,
    HTML/TensorBoard, metrics.jsonl. Concurrent writers to the same
    {checkpoints_dir}/{name} would race (observed class of bug the
    2-process test pins, tests/test_multihost.py)."""
    lead = jax.process_index() == 0
    vis = Visualizer(opt) if lead else None
    total_steps = 0
    prof_active = False
    try:
        for epoch in range(start_epoch, epochs + 1):
            t_epoch = time.time()
            for it, batch in enumerate(device_iter(loader, mesh)):
                # jax.profiler trace window (SURVEY.md §5: the reference has
                # no tracing at all; --profile_dir adds a real device trace)
                if opt.profile_dir and total_steps == opt.profile_start:
                    jax.profiler.start_trace(opt.profile_dir)
                    prof_active = True
                carry, metrics = step_fn(carry, batch)
                total_steps += 1
                if prof_active and total_steps >= opt.profile_start + opt.profile_steps:
                    jax.tree.map(lambda x: x.block_until_ready()
                                 if hasattr(x, "block_until_ready") else x, metrics)
                    jax.profiler.stop_trace()
                    prof_active = False
                    print(f"[profile] trace written -> {opt.profile_dir}", flush=True)
                if lead and total_steps % opt.print_freq == 0:
                    vis.log_losses(epoch, it, jax.device_get(metrics),
                                   total_steps)
                if (lead and visuals_fn is not None
                        and total_steps % opt.display_freq == 0):
                    vis.display_results(visuals_fn(carry, batch), epoch,
                                        total_steps)
                if (lead and opt.save_latest_freq > 0
                        and total_steps % opt.save_latest_freq == 0):
                    # iteration-level 'latest' save (--save_latest_freq,
                    # pix2pixHD cadence): epoch tag 'latest' only; the last
                    # COMPLETED epoch rides along so resume knows where the
                    # save sits in the schedule
                    save_fn(carry, "latest", epoch - 1)
            print(f"End of epoch {epoch} / {epochs} "
                  f"({time.time() - t_epoch:.1f}s)", flush=True)
            if eval_fn is not None:
                # all processes evaluate (their own loader shard) so any
                # collectives inside the forward stay collective; only the
                # lead logs
                ev = eval_fn(carry, epoch)
                if lead and ev:
                    vis.log_losses(epoch, -1, ev, total_steps)
            if lead and (epoch % opt.save_epoch_freq == 0 or epoch == epochs):
                save_fn(carry, epoch)
    finally:
        if prof_active:
            jax.profiler.stop_trace()
        if vis is not None:
            vis.close()
    return carry
