"""Multi-host worker for tests/test_multihost.py (NOT collected by pytest).

Each invocation is one jax.distributed process: 4 virtual CPU devices,
coordinator on localhost, and a short stage-2 training run through
train/drivers.run_train's OWN multi-host mesh path (global mesh +
make_array_from_process_local_data). The launching test compares the lead
process's metrics.jsonl against a single-process 8-device run.

Usage: python mh_worker.py <process_id> <num_processes> <port> <ckpt_dir>
Env (set by the test): JAX_PLATFORMS=cpu, PALLAS_AXON_POOL_IPS=,
XLA_FLAGS=--xla_force_host_platform_device_count=4.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nproc, port, ckpt_dir = (int(sys.argv[1]), int(sys.argv[2]),
                                  int(sys.argv[3]), sys.argv[4])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc, jax.devices()

    from neural_human_video_rendering_tpu.config import Options
    from neural_human_video_rendering_tpu.train.drivers import run_train

    opt = Options(loadSize=32, tex_tile=16, batchSize=8,
                  n_blocks_translate=1, n_downsample_translate=2,
                  n_blocks_global=1, n_downsample_global=1,
                  n_blocks_bg=1, n_downsample_bg=1,
                  ngf=4, ngf_global=4, ndf=4, num_D=2, n_layers_D=2,
                  dtype="float32", use_pallas_warp=False, no_flip=True,
                  serial_batches=True, pool_size=0,
                  lambda_L2=500, no_vgg_loss=True, use_densepose_loss=True,
                  lambda_UV=1000, lambda_Prob=10, lambda_Temp=500,
                  niter=1, no_decay=True, save_epoch_freq=1, print_freq=1,
                  display_freq=10 ** 9, no_html=True, nThreads=1,
                  checkpoints_dir=ckpt_dir, name="mh")
    run_train(opt)
    print(f"[mh_worker {pid}] done", flush=True)


if __name__ == "__main__":
    main()
