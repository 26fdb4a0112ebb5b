"""DeviceEpisodeStore (data/device_store.py): on-device batch assembly is batch-for-batch
identical to the host make_segment + collate path, including padding, beyond-end windows,
final_observation densification, and episode extension/relocation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diamond_tpu.data import Dataset, DeviceBatch, Episode, SegmentId
from diamond_tpu.data.device_store import DeviceEpisodeStore, StoreBatchIterator
from diamond_tpu.data.prefetch import sample_batch
from diamond_tpu.data.segment import collate_segments_to_batch, make_segment

H = W = 8


def make_ep(rng, t, with_final=True, alive=False):
    info = {}
    if with_final:
        info["final_observation"] = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    end = np.zeros(t, np.uint8)
    if not alive:
        end[-1] = 1
    return Episode(
        obs=rng.integers(0, 255, (t, H, W, 3), dtype=np.uint8),
        act=rng.integers(0, 4, t).astype(np.int32),
        rew=rng.choice([-1.0, 0.0, 1.0], t).astype(np.float32),
        end=end, trunc=np.zeros(t, np.uint8), info=info)


def host_batch(dataset, ids):
    return DeviceBatch.from_batch(
        collate_segments_to_batch([dataset[sid] for sid in ids]))


def assert_batches_equal(a: DeviceBatch, b: DeviceBatch):
    for name in ("obs", "act", "rew", "end", "trunc", "mask_padding", "final_obs",
                 "has_final_obs"):
        np.testing.assert_array_equal(np.asarray(getattr(a, name)),
                                      np.asarray(getattr(b, name)), err_msg=name)


def test_store_matches_host_collate(tmp_path):
    rng = np.random.default_rng(0)
    ds = Dataset(tmp_path / "ds", "ds")
    for t in (20, 13, 31):
        ds.add_episode(make_ep(rng, t, with_final=(t != 13)))

    store = DeviceEpisodeStore(512, (H, W, 3))
    store.sync(ds)

    ids = [
        SegmentId(0, 3, 11),     # interior
        SegmentId(1, -5, 3),     # left-padded
        SegmentId(2, 28, 36),    # beyond end (rew_end windows)
        SegmentId(1, 5, 13),     # touches episode end exactly
    ]
    assert_batches_equal(store.make_batch(ids), host_batch(ds, ids))


def test_store_extension_and_relocation(tmp_path):
    rng = np.random.default_rng(1)
    ds = Dataset(tmp_path / "ds", "ds")
    e0 = make_ep(rng, 10, with_final=False, alive=True)
    ds.add_episode(e0)
    store = DeviceEpisodeStore(512, (H, W, 3))
    store.sync(ds)

    # tail episode grows in place (collector continuation: full longer version swapped in)
    e0 = e0 + make_ep(rng, 6, with_final=True, alive=True)
    ds.add_episode(e0, episode_id=0)
    store.sync(ds)
    ids = [SegmentId(0, 8, 16)]
    assert_batches_equal(store.make_batch(ids), host_batch(ds, ids))

    # add another episode, then grow episode 0 again -> relocation path
    ds.add_episode(make_ep(rng, 12))
    store.sync(ds)
    e0 = e0 + make_ep(rng, 4, with_final=True)
    ds.add_episode(e0, episode_id=0)
    store.sync(ds)
    ids = [SegmentId(0, 12, 20), SegmentId(1, 0, 8)]
    assert_batches_equal(store.make_batch(ids), host_batch(ds, ids))


def test_store_iterator_matches_prefetch_sampling(tmp_path):
    from diamond_tpu.data import BatchSampler

    rng = np.random.default_rng(2)
    ds = Dataset(tmp_path / "ds", "ds")
    for t in (25, 40, 17, 30):
        ds.add_episode(make_ep(rng, t))
    store = DeviceEpisodeStore(512, (H, W, 3))
    store.sync(ds)

    s1 = BatchSampler(ds, 0, 1, 4, 6, [0.1, 0.1, 0.1, 0.7], seed=7)
    s2 = BatchSampler(ds, 0, 1, 4, 6, [0.1, 0.1, 0.1, 0.7], seed=7)
    it = iter(StoreBatchIterator(store, s1))
    for _ in range(3):
        dev = next(it)
        host = host_batch(ds, s2.sample())
        assert_batches_equal(dev, host)


def test_store_ic_gather(tmp_path):
    rng = np.random.default_rng(3)
    ds = Dataset(tmp_path / "ds", "ds")
    for t in (25, 30):
        ds.add_episode(make_ep(rng, t))
    store = DeviceEpisodeStore(128, (H, W, 3))
    store.sync(ds)
    ids = [SegmentId(0, 2, 6), SegmentId(1, 10, 14)]
    obs, act = store.gather_ic(ids)
    assert obs.shape == (2, 4, H, W, 3) and obs.dtype == jnp.uint8
    ep = ds.load_episode(0)
    np.testing.assert_array_equal(np.asarray(obs[0]), np.asarray(ep.obs[2:6]))


def test_store_overflow_raises(tmp_path):
    rng = np.random.default_rng(4)
    ds = Dataset(tmp_path / "ds", "ds")
    ds.add_episode(make_ep(rng, 40))
    store = DeviceEpisodeStore(32, (H, W, 3))
    with pytest.raises(AssertionError, match="overflow"):
        store.sync(ds)


def test_store_compaction_reclaims_orphans(tmp_path):
    """Repeated growth of a non-tail episode orphans its old regions; once the orphaned
    waste would overflow the ring, sync compacts on device and keeps going. The budget
    here (cap 140 vs ~250 steps uploaded across relocations) only fits if compaction
    works, and batches stay value-identical to the host path afterwards."""
    rng = np.random.default_rng(7)
    ds = Dataset(tmp_path / "ds", "ds")
    eps = [make_ep(rng, 30, with_final=False, alive=True),
           make_ep(rng, 20, with_final=False, alive=True)]
    for e in eps:
        ds.add_episode(e)
    store = DeviceEpisodeStore(140, (H, W, 3))
    store.sync(ds)

    for _ in range(2):  # alternating growth: each sync relocates the non-tail episode
        for ep_id in (0, 1):
            eps[ep_id] = eps[ep_id] + make_ep(rng, 10, with_final=False, alive=True)
            ds.add_episode(eps[ep_id], episode_id=ep_id)
            store.sync(ds)

    assert store.compactions >= 1
    assert store.next_free <= store.capacity
    ids = [SegmentId(0, 45, 53), SegmentId(1, 5, 13), SegmentId(0, -3, 5)]
    assert_batches_equal(store.make_batch(ids), host_batch(ds, ids))

    # a genuinely over-capacity dataset still raises after compaction can't help
    ds.add_episode(make_ep(rng, 200))
    with pytest.raises(AssertionError, match="overflow"):
        store.sync(ds)


def test_store_compaction_drops_doomed_region(tmp_path):
    """A non-tail episode growing with ZERO pre-existing waste: its own region is doomed
    (the relocation will orphan it), so the pack must reclaim it in the same gather —
    capacity 20 with ep0(8)+ep1(8) and ep0 growing to 12 only fits that way (code-review
    round 3: previously the pack kept the doomed region and the upload overflowed)."""
    rng = np.random.default_rng(11)
    ds = Dataset(tmp_path / "ds", "ds")
    eps = [make_ep(rng, 8, with_final=False, alive=True),
           make_ep(rng, 8, with_final=False, alive=True)]
    for e in eps:
        ds.add_episode(e)
    store = DeviceEpisodeStore(20, (H, W, 3))
    store.sync(ds)
    assert store.waste_steps == 0

    eps[0] = eps[0] + make_ep(rng, 4, with_final=False, alive=True)
    ds.add_episode(eps[0], episode_id=0)
    store.sync(ds)  # 8+8 live + 12 new would need 28 > 20 without dropping ep0's region

    assert store.compactions == 1
    assert store.next_free == 20 and store.waste_steps == 0
    ids = [SegmentId(0, 2, 10), SegmentId(1, 0, 8), SegmentId(0, 4, 12)]
    assert_batches_equal(store.make_batch(ids), host_batch(ds, ids))


def test_store_grow_top_episode_appends_suffix(tmp_path):
    """The max-offset live episode growing past the free tail is packed LAST (kept, not
    dropped) so the sync appends only the suffix — the H2D-leak-minimizing direction."""
    rng = np.random.default_rng(12)
    ds = Dataset(tmp_path / "ds", "ds")
    eps = [make_ep(rng, 8, with_final=False, alive=True),
           make_ep(rng, 8, with_final=False, alive=True)]
    for e in eps:
        ds.add_episode(e)
    store = DeviceEpisodeStore(24, (H, W, 3))
    store.sync(ds)
    # orphan ep0's region (relocate it): ep0 grows -> dropped+reuploaded at tail
    eps[0] = eps[0] + make_ep(rng, 2, with_final=False, alive=True)
    ds.add_episode(eps[0], episode_id=0)
    store.sync(ds)  # layout now: [ep1(8)][ep0(10)], free 6
    assert int(store.ep_offset[0]) > int(store.ep_offset[1])
    # ep0 is now the TOP episode; growing it by 8 (free tail 6) must compact but keep
    # ep0 (it has nothing reclaimable; waste is 0) -> suffix append after... with zero
    # waste and ep0 on top, compaction is a no-op and the append must still fit: grow by 6
    eps[0] = eps[0] + make_ep(rng, 6, with_final=False, alive=True)
    ds.add_episode(eps[0], episode_id=0)
    before = store.compactions
    store.sync(ds)
    assert store.compactions == before  # no pack needed: suffix fits the free tail
    assert int(store.ep_len[0]) == 16 and store.next_free == 24
    ids = [SegmentId(0, 8, 16), SegmentId(1, 0, 8)]
    assert_batches_equal(store.make_batch(ids), host_batch(ds, ids))


def test_store_on_mesh_shards_batches(tmp_path):
    """With a data-parallel mesh, the ring is replicated and gathered batches come out
    sharded on the batch axis — identical values to the host path."""
    from diamond_tpu.parallel import make_mesh

    rng = np.random.default_rng(5)
    ds = Dataset(tmp_path / "ds", "ds")
    for t in (30, 40):
        ds.add_episode(make_ep(rng, t))
    mesh = make_mesh()
    store = DeviceEpisodeStore(256, (H, W, 3), mesh=mesh)
    store.sync(ds)

    ids = [SegmentId(0, i, i + 6) for i in range(4)] + \
          [SegmentId(1, i - 2, i + 4) for i in range(4)]
    dev = store.make_batch(ids)
    assert_batches_equal(dev, host_batch(ds, ids))
    shard_names = {d for s in dev.obs.sharding.spec for d in (s if isinstance(s, tuple)
                                                             else (s,)) if d}
    assert "data" in shard_names, dev.obs.sharding


def test_traverser_ids_match_batches(tmp_path):
    """iter_batches_ids is the index form of the traverser's __iter__: the store-gathered
    batch equals the host batch on every real entry, with identical masks everywhere
    (pad_to_batch dummies are fully masked and contribute to nothing)."""
    from diamond_tpu.data import DatasetTraverser

    rng = np.random.default_rng(6)
    ds = Dataset(tmp_path / "ds", "ds")
    for t in (23, 9, 31, 2):  # includes a size-1-tail case (31 % 6 == 1)
        ds.add_episode(make_ep(rng, t))
    store = DeviceEpisodeStore(256, (H, W, 3))
    store.sync(ds)

    trav = DatasetTraverser(ds, 3, 6, pad_to_batch=True)
    host_batches = list(iter(trav))
    id_batches = list(trav.iter_batches_ids())
    assert len(host_batches) == len(id_batches) == len(trav)
    for hb, (ids, masked) in zip(host_batches, id_batches):
        dev = store.make_batch(ids, masked)
        hdb = DeviceBatch.from_batch(hb)
        np.testing.assert_array_equal(np.asarray(dev.mask_padding),
                                      np.asarray(hdb.mask_padding))
        real = ~np.asarray(masked)
        for name in ("obs", "act", "rew", "end", "trunc", "final_obs", "has_final_obs"):
            np.testing.assert_array_equal(np.asarray(getattr(dev, name))[real],
                                          np.asarray(getattr(hdb, name))[real],
                                          err_msg=name)


def test_jit_cache_shared_across_stores(tmp_path):
    from diamond_tpu.data.device_store import _jitted_ops

    a = DeviceEpisodeStore(64, (H, W, 3))
    b = DeviceEpisodeStore(64, (H, W, 3))
    assert a._gather is b._gather and a._write is b._write
    assert _jitted_ops(None)[1] is a._gather
