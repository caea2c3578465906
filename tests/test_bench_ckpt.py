"""bench.py checkpoint resolution + loading (VERDICT r4 next #1c).

Round 4's driver bench went RED because bench.py's auto-checkpoint path —
resolve the durable flagship dir, read its recipe, load G and D — had no
test anywhere and crashed on a flagship dir missing latest_net_D.msgpack
(the restore tool had installed G only). These tests pin every branch of
the resolution (auto hit / fallback / miss / forced-off), the provenance
string that keeps the regime label honest, and the G-only graceful
degradation of the load itself.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

from neural_human_video_rendering_tpu.utils import checkpoint as ckpt


def _mkdir_with_g(path):
    os.makedirs(path, exist_ok=True)
    ckpt.save_net(str(path), "G", "latest", {"w": jnp.zeros(2)})


def test_resolve_auto_no_checkpoints(tmp_path):
    d, cfg, prov = bench.resolve_checkpoint(str(tmp_path), "auto")
    assert d == "" and cfg == {} and prov == ""


def test_resolve_auto_prefers_flagship(tmp_path):
    flag = tmp_path / "checkpoints" / "flagship"
    base = tmp_path / "checkpoints" / "r4" / "e2e_base"
    _mkdir_with_g(flag)
    _mkdir_with_g(base)
    d, _, _ = bench.resolve_checkpoint(str(tmp_path), "auto")
    assert d == str(flag)


def test_resolve_auto_falls_back_to_e2e_base(tmp_path):
    base = tmp_path / "checkpoints" / "r4" / "e2e_base"
    _mkdir_with_g(base)
    d, _, _ = bench.resolve_checkpoint(str(tmp_path), "auto")
    assert d == str(base)


def test_resolve_forced_off(tmp_path):
    _mkdir_with_g(tmp_path / "checkpoints" / "flagship")
    d, cfg, prov = bench.resolve_checkpoint(str(tmp_path), "")
    assert d == "" and cfg == {} and prov == ""


def test_resolve_reads_recipe_and_provenance(tmp_path):
    flag = tmp_path / "checkpoints" / "flagship"
    _mkdir_with_g(flag)
    (flag / "recipe.json").write_text(json.dumps(
        {"config": {"tex_tile": 64, "pose_heatmaps": True}}))
    lines = [
        {"epoch": 1, "it": 3, "step": 45, "G_total": 9.0},
        {"epoch": 1, "it": -1, "step": 45, "val_PSNR": 21.0,
         "val_SSIM": 0.7},
        "not json",  # a torn line must not break provenance parsing
        {"epoch": 22, "it": -1, "step": 990, "val_PSNR": 27.23,
         "val_SSIM": 0.92},
    ]
    (flag / "metrics.jsonl").write_text(
        "\n".join(x if isinstance(x, str) else json.dumps(x)
                  for x in lines) + "\n")
    d, cfg, prov = bench.resolve_checkpoint(str(tmp_path), "auto")
    assert d == str(flag)
    assert cfg["tex_tile"] == 64 and cfg["pose_heatmaps"] is True
    # provenance carries final epoch + last val PSNR so the bench regime
    # can't claim a 33 dB flagship while benching a 3-epoch stub
    assert prov == "ep22,val27.2dB"


def test_resolve_provenance_without_metrics(tmp_path):
    flag = tmp_path / "checkpoints" / "flagship"
    _mkdir_with_g(flag)
    _, _, prov = bench.resolve_checkpoint(str(tmp_path), "auto")
    assert prov == "ep?"


class _FakeState:
    """Minimal .replace()-able stand-in for TrainState."""

    def __init__(self, g_params, d_params):
        self.g_params = g_params
        self.d_params = d_params

    def replace(self, **kw):
        out = _FakeState(self.g_params, self.d_params)
        for k, v in kw.items():
            setattr(out, k, v)
        return out


def _trained(seed):
    k = jax.random.PRNGKey(seed)
    return {"w": jax.random.normal(k, (3, 3))}


def test_load_bench_state_g_only(tmp_path, capsys):
    """A flagship dir with no D net loads G and keeps random D — the exact
    failure that zeroed BENCH_r04.json must degrade, not crash."""
    d = str(tmp_path)
    g_saved = _trained(1)
    ckpt.save_net(d, "G", "latest", g_saved)
    st = _FakeState(_trained(2), _trained(3))
    d_before = np.asarray(st.d_params["w"]).copy()
    out, suffix = bench.load_bench_state(d, st)
    assert suffix == "+randD"
    np.testing.assert_allclose(np.asarray(out.g_params["w"]),
                               np.asarray(g_saved["w"]))
    np.testing.assert_allclose(np.asarray(out.d_params["w"]), d_before)


def test_load_bench_state_full(tmp_path):
    d = str(tmp_path)
    g_saved, d_saved = _trained(1), _trained(4)
    ckpt.save_net(d, "G", "latest", g_saved)
    ckpt.save_net(d, "D", "latest", d_saved)
    st = _FakeState(_trained(2), _trained(3))
    out, suffix = bench.load_bench_state(d, st)
    assert suffix == ""
    np.testing.assert_allclose(np.asarray(out.g_params["w"]),
                               np.asarray(g_saved["w"]))
    np.testing.assert_allclose(np.asarray(out.d_params["w"]),
                               np.asarray(d_saved["w"]))


def test_real_flagship_dir_is_loadable():
    """The durable flagship on THIS box (what the driver bench will hit at
    round close) must resolve and carry self-consistent provenance."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    d, cfg, prov = bench.resolve_checkpoint(repo, "auto")
    if not d:
        return  # fresh clone without weights: resolution correctly empty
    assert os.path.exists(os.path.join(d, "latest_net_G.msgpack"))
    assert prov.startswith("ep")
