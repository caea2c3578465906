"""Multi-host input sharding invariants (ADVICE r1 #2) + FlowNet2 pairwise
flow layout (VERDICT r1 weak #7)."""

import dataclasses

import numpy as np

from neural_human_video_rendering_tpu.data import dataset as dsm

from corpus import make_corpus


class _Tiny:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"index": np.int32(i)}


def test_shard_lengths_host_invariant():
    """len(loader) (steps/epoch -> LR schedule) must agree across hosts even
    when strided slices differ by one sample (e.g. N=9, k=2, bs=5)."""
    ds = _Tiny(9)
    l0 = dsm.BatchLoader(ds, 5, shuffle=False, shard=(0, 2))
    l1 = dsm.BatchLoader(ds, 5, shuffle=False, shard=(1, 2))
    assert len(l0) == len(l1) == 0
    l0 = dsm.BatchLoader(ds, 2, shuffle=False, shard=(0, 2))
    l1 = dsm.BatchLoader(ds, 2, shuffle=False, shard=(1, 2))
    assert len(l0) == len(l1) == 2
    b0, b1 = list(l0), list(l1)
    assert len(b0) == len(b1) == 2


def test_shards_disjoint_and_cover():
    ds = _Tiny(16)
    seen = []
    for r in range(4):
        loader = dsm.BatchLoader(ds, 2, shuffle=True, seed=7, shard=(r, 4))
        for b in loader:
            seen.extend(b["index"].tolist())
    assert sorted(seen) == list(range(16))


def test_loader_advances_dataset_epoch():
    class EpochAware(_Tiny):
        epoch = 0

    ds = EpochAware(4)
    loader = dsm.BatchLoader(ds, 2, shuffle=False)
    list(loader)
    assert ds.epoch == 0
    list(loader)
    assert ds.epoch == 1


def test_flow_pairwise_layout(tiny_opt, tmp_path):
    """FlowNet2 writes N-1 pairwise files; frame t consumes file t-1 and
    frame 0 gets zero flow (it is its own temporal pair)."""
    c = make_corpus(str(tmp_path), n=5, size=32)
    import os
    assert len(os.listdir(c["flow"])) == 4     # N-1 files on disk
    opt = dataclasses.replace(
        tiny_opt, loadSize=32, pose_path=c["openpose_json"],
        img_path=c["frames"], flow_path=c["flow"],
        flow_inv_path=c["flow_inv"])
    ds = dsm.FrameDataset(opt, "train")
    assert len(ds) == 5                        # frames drive length, not flow
    s0 = ds[0]
    assert np.all(s0["flow"] == 0) and np.all(s0["flow_inv"] == 0)
    s2 = ds[2]
    expected = dsm.load_flow(f"{c['flow']}/frame00001.flo", 32)
    np.testing.assert_allclose(s2["flow"], expected)
    s4 = ds[4]
    expected = dsm.load_flow(f"{c['flow']}/frame00003.flo", 32)
    np.testing.assert_allclose(s4["flow"], expected)


def test_device_iter_order_and_placement(tiny_opt):
    """device_iter uploads one batch ahead but preserves order and content."""
    import jax
    from neural_human_video_rendering_tpu.train.loop import device_iter

    ds = dsm.SyntheticDataset(tiny_opt, length=6)
    loader = dsm.BatchLoader(ds, 2, shuffle=False)
    out = list(device_iter(loader))
    assert len(out) == 3
    for b_dev, b_host in zip(out, dsm.BatchLoader(ds, 2, shuffle=False)):
        assert isinstance(b_dev["image"], jax.Array)
        np.testing.assert_array_equal(np.asarray(b_dev["index"]),
                                      b_host["index"])
        np.testing.assert_allclose(np.asarray(b_dev["image"]),
                                   b_host["image"])
