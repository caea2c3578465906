"""Checkpointing (SURVEY.md §2 #21; reference semantics preserved).

Artifact contract matches pix2pixHD: per-subnet files named
``{epoch}_net_{label}`` plus a ``latest_net_{label}`` copy under
``{checkpoints_dir}/{name}/`` (reference: --save_epoch_freq
train_start/pretrain_start.sh:35, --which_epoch test_start/start.sh:28,
--load_pretrain_TransG/--which_epoch_TransG :29-30, --continue_train :43).
Serialization is flax msgpack (pure PyTrees — params, optimizer state,
assets), extension ``.msgpack``.

Partial loads: stage-2 pulls a stage-1 TransG checkpoint into
g_params["TransG"] (the renderer namespaces subnets, models/renderer.py).
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Optional

import flax.serialization as fser
import jax
import numpy as np

EXT = ".msgpack"


def _path(run_dir: str, epoch, label: str) -> str:
    return os.path.join(run_dir, f"{epoch}_net_{label}{EXT}")


def _write_atomic(path: str, data: bytes) -> None:
    """Write-then-rename so a crash mid-write can't truncate an existing
    checkpoint, and an in-place overwrite can't leak through hardlinks
    (run dirs are cloned with `cp -al` for --continue_train forks;
    os.replace gives the destination a fresh inode)."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def save_net(run_dir: str, label: str, epoch, tree: Any) -> str:
    """Save one subnet's PyTree as {epoch}_net_{label} + latest_net_{label}."""
    os.makedirs(run_dir, exist_ok=True)
    tree = jax.tree.map(np.asarray, tree)
    path = _path(run_dir, epoch, label)
    blob = fser.msgpack_serialize(tree)
    _write_atomic(path, blob)
    latest = _path(run_dir, "latest", label)
    if os.path.abspath(path) != os.path.abspath(latest):
        _write_atomic(latest, blob)
    return path


def load_net(run_dir: str, label: str, epoch="latest",
             target: Optional[Any] = None) -> Any:
    """Load one subnet's PyTree; validates against `target` if given."""
    path = _path(run_dir, epoch, label)
    with open(path, "rb") as f:
        raw = fser.msgpack_restore(f.read())
    if target is not None:
        return fser.from_state_dict(target, raw)
    return raw


def has_latest(run_dir: str, label: str) -> bool:
    """True when a latest_net_{label} file exists — the only artifact a run
    saved purely via --save_latest_freq iteration saves leaves behind
    (numeric tags appear only at --save_epoch_freq boundaries)."""
    return os.path.exists(_path(run_dir, "latest", label))


def save_epoch_anchor(run_dir: str, epoch: int) -> None:
    """Tiny sidecar recording the last COMPLETED epoch for runs whose only
    checkpoints are iteration 'latest' saves and whose save path carries no
    latest_state blob (the single-net pretrain stages). Lets
    --continue_train recover its position instead of restarting at 1."""
    import json
    _write_atomic(os.path.join(run_dir, "latest_anchor.json"),
                  json.dumps({"epoch": int(epoch)}).encode())


def load_epoch_anchor(run_dir: str) -> Optional[int]:
    import json
    path = os.path.join(run_dir, "latest_anchor.json")
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return int(json.load(f)["epoch"])
    except (ValueError, KeyError, OSError):
        return None


def latest_epoch(run_dir: str, label: str) -> Optional[str]:
    """Highest numeric epoch with a saved file for `label`, or None."""
    if not os.path.isdir(run_dir):
        return None
    best = None
    for f in os.listdir(run_dir):
        if f.endswith(f"_net_{label}{EXT}"):
            tag = f.split("_net_")[0]
            if tag.isdigit():
                best = tag if best is None or int(tag) > int(best) else best
    return best


def save_train_state(run_dir: str, state: Any, epoch) -> str:
    """Save the non-parameter training state (both optimizer states + step
    counter + epoch) as latest_state. Together with the latest_net_* files
    this makes --continue_train a FULL resume (params + Adam moments +
    schedule position), which the reference could not do (it reloads
    weights only and restarts the optimizer)."""
    os.makedirs(run_dir, exist_ok=True)
    # to_state_dict flattens optax's tuple/namedtuple states into dicts
    # (msgpack cannot serialize tuples)
    blob = {
        "g_opt": fser.to_state_dict(jax.tree.map(np.asarray, state.g_opt)),
        "d_opt": fser.to_state_dict(jax.tree.map(np.asarray, state.d_opt)),
        "step": int(state.step),
        "epoch": int(epoch) if str(epoch).isdigit() else -1,
    }
    path = os.path.join(run_dir, f"latest_state{EXT}")
    _write_atomic(path, fser.msgpack_serialize(jax.tree.map(np.asarray, blob)))
    return path


def _tolerant_from_state_dict(target: Any, raw: Any, label: str) -> Any:
    """from_state_dict that survives optimizer-structure drift.

    Resuming with a different LR schedule than the checkpoint was written
    with (e.g. --no_decay run continued WITH decay) changes the optax
    state tree (ScaleByScheduleState gains/loses a `count`). Restore every
    leaf whose path+shape still matches; keep fresh init for the rest and
    say so — same spirit as pix2pixHD's loose network loads."""
    try:
        restored = fser.from_state_dict(target, raw)
        # flax's plain-dict restore can silently graft a checkpoint
        # subtree where the target has a leaf (it just returns `state`
        # for unknown shapes) and never shape-checks leaves — only trust
        # the fast path when the tree structure round-tripped AND every
        # leaf kept its shape (the function's documented contract)
        if jax.tree.structure(restored) == jax.tree.structure(target):
            shapes_ok = all(
                getattr(a, "shape", None) == getattr(b, "shape", None)
                for a, b in zip(jax.tree.leaves(restored),
                                jax.tree.leaves(target)))
            if shapes_ok:
                return restored
    except (ValueError, AttributeError, TypeError, KeyError):
        # e.g. AttributeError when the checkpoint holds a leaf where the
        # new state expects a subtree (from_state_dict calls .keys() on
        # the ndarray) — exactly the drift the merge path tolerates
        pass

    dropped = []

    def keep_fresh(t, path):
        dropped.append(path or "/")
        return t

    def merge(t, r, path):
        if isinstance(t, dict):
            if not isinstance(r, dict):
                return keep_fresh(t, path)
            out = {}
            for k, v in t.items():
                out[k] = (merge(v, r[k], f"{path}/{k}") if k in r
                          else keep_fresh(v, f"{path}/{k}"))
            return out
        if isinstance(r, dict):
            # checkpoint has a subtree where the new state expects a leaf
            # (e.g. adam state vs a freeze counter after an optax-chain
            # change) — np.asarray(dict) would make a 0-d object array
            # whose astype raises TypeError, so branch before converting
            return keep_fresh(t, path)
        try:
            ra = np.asarray(r) if r is not None else None
            ta = np.asarray(t) if t is not None else None
            if ra is not None and ta is not None and ra.shape == ta.shape:
                return ra.astype(ta.dtype)
        except (TypeError, ValueError):
            pass
        return keep_fresh(t, path)

    merged = merge(fser.to_state_dict(target), raw, "")
    if dropped:
        print(f"[ckpt] {label}: optimizer structure changed; kept fresh "
              f"init for {len(dropped)} subtree(s) (schedule change?)")
    return fser.from_state_dict(target, merged)


def _stamp_schedule_counts(opt_state: Any, step: int) -> Any:
    """Any schedule whose count is still 0 after a resume at step>0 gets
    fast-forwarded to the global step, so an LR schedule added on resume
    starts from the checkpoint's position instead of from scratch."""
    import optax

    from ..train.state import FreezeUntilState

    stampable = (optax.ScaleByScheduleState, FreezeUntilState)

    def fix(node):
        if isinstance(node, stampable) and step > 0 and int(node.count) == 0:
            return type(node)(
                count=np.asarray(step, dtype=np.asarray(node.count).dtype))
        return node

    return jax.tree.map(
        fix, opt_state, is_leaf=lambda n: isinstance(n, stampable))


def load_train_state(run_dir: str, state: Any):
    """Restore optimizer states + step into `state`; returns
    (state, saved_epoch) or (state, None) when no state blob exists."""
    path = os.path.join(run_dir, f"latest_state{EXT}")
    if not os.path.exists(path):
        return state, None
    with open(path, "rb") as f:
        raw = fser.msgpack_restore(f.read())
    step = int(raw["step"])
    g_opt = _tolerant_from_state_dict(state.g_opt, raw["g_opt"], "g_opt")
    d_opt = _tolerant_from_state_dict(state.d_opt, raw["d_opt"], "d_opt")
    g_opt = _stamp_schedule_counts(g_opt, step)
    d_opt = _stamp_schedule_counts(d_opt, step)
    state = state.replace(g_opt=g_opt, d_opt=d_opt, step=step)
    return state, int(raw["epoch"])


def load_transg_into(g_params: Any, pretrain_dir: str, epoch="latest") -> Any:
    """Per-subnet partial restore: stage-1 TransG -> stage-2 generator params
    (reference: --load_pretrain_TransG/--which_epoch_TransG)."""
    transg = load_net(pretrain_dir, "TransG", epoch,
                      target=g_params["TransG"])
    out = dict(g_params)
    out["TransG"] = transg
    return out
