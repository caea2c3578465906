#!/usr/bin/env python
"""Retroactively dedupe a run dir's metrics.jsonl (superseded series).

Usage: python tools/round5/dedup_metrics.py RUN_DIR [RUN_DIR ...]

Applies resume-prune semantics over the whole file (see
utils.visualizer.dedup_metrics): records superseded by a later restart of
the same epochs are dropped, so curves read one record set per epoch.
Only run on run dirs with NO live trainer attached.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from neural_human_video_rendering_tpu.utils.visualizer import dedup_metrics  # noqa: E402

if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    total = 0
    for run_dir in sys.argv[1:]:
        n = dedup_metrics(run_dir)
        print(f"{run_dir}: dropped {n}")
        total += n
    print(f"total dropped: {total}")
