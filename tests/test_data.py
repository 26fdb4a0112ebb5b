"""Data-layer tests: episode roundtrips, segment padding masks, dataset counters/state,
sampler windows, traverser chunking (SURVEY.md section 4 items 1 and 4)."""

import numpy as np
import pytest

from diamond_tpu.data import (Batch, BatchPrefetcher, BatchSampler, Dataset, DatasetTraverser,
                              Episode, SegmentId, collate_segments_to_batch, make_segment,
                              obs_to_float, obs_to_uint8, sample_batch)


def make_episode(t=10, h=8, w=8, c=3, seed=0, with_final=True, end_at_last=True):
    rng = np.random.default_rng(seed)
    end = np.zeros(t, np.uint8)
    if end_at_last:
        end[-1] = 1
    info = {}
    if with_final:
        info["final_observation"] = rng.integers(0, 255, (h, w, c), dtype=np.uint8)
    return Episode(
        obs=rng.integers(0, 255, (t, h, w, c), dtype=np.uint8),
        act=rng.integers(0, 4, t, dtype=np.int64).astype(np.int32),
        rew=rng.choice([-1.0, 0.0, 0.0, 2.0], t).astype(np.float32),
        end=end,
        trunc=np.zeros(t, np.uint8),
        info=info,
    )


def test_episode_save_load_roundtrip(tmp_path):
    ep = make_episode()
    path = tmp_path / "ep.npz"
    ep.save(path)
    ep2 = Episode.load(path)
    np.testing.assert_array_equal(ep.obs, ep2.obs)
    np.testing.assert_array_equal(ep.rew, ep2.rew)
    np.testing.assert_array_equal(ep.info["final_observation"],
                                  ep2.info["final_observation"])
    assert ep2.compute_metrics()["length"] == 10


def test_episode_concat_and_obs_conversion():
    a = make_episode(t=4, end_at_last=False, with_final=False)
    b = make_episode(t=6, seed=1)
    ab = a + b
    assert len(ab) == 10
    assert ab.dead.sum() == 1
    f = obs_to_float(a.obs)
    assert f.min() >= -1 and f.max() <= 1
    np.testing.assert_array_equal(obs_to_uint8(f), a.obs)


def test_make_segment_padding_and_mask():
    ep = make_episode(t=10)
    # left padding
    s = make_segment(ep, SegmentId(0, -3, 4))
    assert s.obs.shape[0] == 7
    np.testing.assert_array_equal(s.mask_padding, [0, 0, 0, 1, 1, 1, 1])
    assert (s.obs[:3] == 0).all()
    np.testing.assert_array_equal(s.obs[3:], ep.obs[:4])
    # right padding
    s = make_segment(ep, SegmentId(0, 6, 14))
    np.testing.assert_array_equal(s.mask_padding, [1, 1, 1, 1, 0, 0, 0, 0])
    assert (s.obs[4:] == 0).all()
    assert s.effective_size == 4


def test_dataset_add_extend_counters(tmp_path):
    ds = Dataset(tmp_path / "train", "train_dataset", cache_in_ram=True)
    ep = make_episode(t=6, end_at_last=False, with_final=False)
    eid = ds.add_episode(ep)
    assert (ds.num_episodes, ds.num_steps) == (1, 6)
    # extend in place (ongoing episode across collect boundaries, reference dataset.py:101-113)
    ep2 = ep + make_episode(t=4, seed=2)
    eid2 = ds.add_episode(ep2, episode_id=eid)
    assert eid2 == eid
    assert (ds.num_episodes, ds.num_steps) == (1, 10)
    assert ds.counter_end[1] == 1
    assert sum(ds.counts_rew) == 10
    # second episode
    ds.add_episode(make_episode(t=5, seed=3))
    np.testing.assert_array_equal(ds.start_idx, [0, 10])
    np.testing.assert_array_equal(ds.lengths, [10, 5])
    # sharded path layout
    p = ds._get_episode_path(1234)
    assert p.parts[-4:] == ("200", "30", "4", "1234.npz")  # reference dataset.py:122-128

    # state roundtrip
    ds.save_to_default_path()
    ds2 = Dataset(tmp_path / "train", "train_dataset")
    ds2.load_from_default_path()
    assert ds2.num_steps == 15
    np.testing.assert_array_equal(ds2.lengths, ds.lengths)
    seg = ds2[SegmentId(1, 0, 5)]
    np.testing.assert_array_equal(seg.obs, ds.load_episode(1).obs)


def test_batch_sampler_windows_and_weights(tmp_path):
    ds = Dataset(tmp_path / "d", cache_in_ram=True)
    for i in range(8):
        ds.add_episode(make_episode(t=10 + i, seed=i))
    bs = BatchSampler(ds, rank=0, world_size=1, batch_size=64, seq_length=5,
                      sample_weights=[0.1, 0.1, 0.1, 0.7], seed=0)
    ids = bs.sample()
    assert len(ids) == 64
    for sid in ids:
        ep_len = ds.lengths[sid.episode_id]
        assert sid.stop - sid.start == 5
        assert sid.stop <= ep_len  # no right padding when can_sample_beyond_end=False
        assert sid.stop > 0 and sid.start < ep_len
    # recency weighting: last bucket (2 episodes) should dominate
    counts = np.bincount([sid.episode_id for sid in
                          [s for _ in range(50) for s in bs.sample()]], minlength=8)
    assert counts[6:].sum() > counts[:6].sum()

    bs2 = BatchSampler(ds, 0, 1, 64, 5, can_sample_beyond_end=True, seed=0)
    ids2 = bs2.sample()
    assert any(sid.stop > ds.lengths[sid.episode_id] for sid in ids2)  # beyond-end windows

    # DDP partition: rank 1 of 2 only sees odd episodes (reference batch_sampler.py:53-55)
    bs3 = BatchSampler(ds, 1, 2, 32, 5, seed=0)
    assert all(sid.episode_id % 2 == 1 for sid in bs3.sample())


def test_collate_final_obs():
    eps = [make_episode(t=6, seed=i) for i in range(3)]
    segs = [make_segment(eps[i], SegmentId(i, 1, 6)) for i in range(3)]
    batch = collate_segments_to_batch(segs)
    assert batch.obs.shape == (3, 5, 8, 8, 3)
    assert batch.obs.dtype == np.uint8
    assert batch.has_final_obs.all()
    np.testing.assert_array_equal(batch.final_obs[0], eps[0].info["final_observation"])


def test_traverser_chunks(tmp_path):
    ds = Dataset(tmp_path / "d", cache_in_ram=True)
    ds.add_episode(make_episode(t=11, seed=0))  # chunks: 5, 5, 1(dropped)
    ds.add_episode(make_episode(t=7, seed=1))   # chunks: 5, 2
    tr = DatasetTraverser(ds, batch_num_samples=3, chunk_size=5)
    batches = list(tr)
    total = sum(b.obs.shape[0] for b in batches)
    assert total == 4  # size-1 tail dropped (reference data/utils.py:74-75)
    assert len(tr) == len(batches) == 2
    assert batches[-1].obs.shape[1] == 5  # all padded to chunk_size


def test_prefetcher_host_mode(tmp_path):
    ds = Dataset(tmp_path / "d", cache_in_ram=True)
    for i in range(3):
        ds.add_episode(make_episode(t=12, seed=i))
    bs = BatchSampler(ds, 0, 1, batch_size=4, seq_length=6, seed=1)
    batch = sample_batch(ds, bs)
    assert batch.obs.shape == (4, 6, 8, 8, 3)
    pf = BatchPrefetcher(ds, bs, prefetch=2, to_device=False)
    it = iter(pf)
    b1, b2 = next(it), next(it)
    assert b1.obs.shape == (4, 6, 8, 8, 3)
    pf.stop()


def test_prefetcher_synchronous_mode(tmp_path):
    """workers=0 == the reference's num_workers_data_loaders=0: batches are assembled on
    the consumer thread, no producer threads exist (reference src/trainer.py:140-148)."""
    ds = Dataset(tmp_path / "d", cache_in_ram=True)
    for i in range(3):
        ds.add_episode(make_episode(t=12, seed=i))
    bs = BatchSampler(ds, 0, 1, batch_size=4, seq_length=6, seed=1)
    pf = BatchPrefetcher(ds, bs, prefetch=2, to_device=False, workers=0)
    it = iter(pf.start())
    b1 = next(it)
    assert b1.obs.shape == (4, 6, 8, 8, 3)
    assert not pf._threads  # no producer threads in synchronous mode
    pf.stop()


def test_traverser_pad_to_batch(tmp_path):
    ds = Dataset(tmp_path / "d", cache_in_ram=True)
    ds.add_episode(make_episode(t=11, seed=0))
    ds.add_episode(make_episode(t=7, seed=1))
    tr = DatasetTraverser(ds, batch_num_samples=3, chunk_size=5, pad_to_batch=True)
    batches = list(tr)
    assert all(b.obs.shape[0] == 3 for b in batches)  # single jit shape
    # padding segments are fully masked -> contribute nothing
    total_real = sum(b.mask_padding.any(axis=1).sum() for b in batches)
    assert total_real == 4


def test_dataset_legacy_state_dict_loads(tmp_path):
    """Pre-rewrite state dicts carried Counter objects (counter_rew/counter_end) and no
    is_static flag — they must still resume (code-review round 2)."""
    from collections import Counter

    import numpy as np

    from diamond_tpu.data import Dataset

    ds = Dataset(tmp_path / "d", "d")
    ds.load_state_dict({
        "start_idx": np.array([0, 10]),
        "lengths": np.array([10, 7]),
        "counter_rew": Counter({-1: 3, 0: 12, 1: 2}),
        "counter_end": Counter({0: 15, 1: 2}),
    })
    assert ds.num_episodes == 2 and ds.num_steps == 17
    assert ds.counts_rew == [3, 12, 2]
    assert ds.counts_end == [15, 2]
    assert not ds.is_static


def test_get_path_agent_ckpt_legacy_pt_fallback(tmp_path):
    from diamond_tpu.utils import get_path_agent_ckpt

    d = tmp_path / "agent_versions"
    d.mkdir()
    (d / "agent_epoch_00003.pt").write_bytes(b"x")
    assert get_path_agent_ckpt(tmp_path, 3).suffix == ".pt"
    (d / "agent_epoch_00003.npz").write_bytes(b"y")
    assert get_path_agent_ckpt(tmp_path, 3).suffix == ".npz"
