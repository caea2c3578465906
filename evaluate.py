#!/usr/bin/env python3
"""Quality-parity eval CLI: PSNR / SSIM / VGG perceptual distance between a
rendered-frames directory and a ground-truth directory.

The reference ships no eval script (SURVEY.md §6); this is the measurement
contract for BASELINE.md's "LPIPS/SSIM parity" north star:

    python evaluate.py --results_dir out/images --gt_dir data/frames

Prints one JSON line with the mean metrics.
"""

if __name__ == "__main__":
    from neural_human_video_rendering_tpu.runtime import setup_jax
    setup_jax()
    from neural_human_video_rendering_tpu.infer.evaluate import main
    main()
