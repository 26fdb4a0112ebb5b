"""Device-resident episode store: batches assembled by on-device gathers.

Why this exists (TPU-native design + a platform necessity): the host episode `Dataset`
(data/dataset.py) remains the durable source of truth, but streaming every training batch
host->device moves 30-45 MB/s through the transfer path. On the tunneled platform this is
also fatal: the PJRT client never frees its host-side transfer staging (~1 MB leaked per
MB transferred — measured 2026-08-17, see VALIDATION.md), so a full run OOMs the host.

Here the frames cross the boundary ONCE, when an episode is added; afterwards every batch
(denoiser/rew-end training, and the imagination IC pool) is built by a jitted gather from
the device-resident ring — the per-step upload is just the (B, T) index/mask arrays
(~10 KB). This is also simply the right TPU shape for the input pipeline: zero host work
and zero meaningful H2D in the training loop.

Semantics reproduce make_segment + collate_segments_to_batch exactly
(data/segment.py:86-139; reference src/data/utils.py:12-41): out-of-range window positions
are zero-filled with mask_padding False, and the per-segment final_observation /
has_final_obs pair matches the densified host collate (tests/test_device_store.py proves
batch-for-batch equality against the host path).
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .dataset import Dataset
from .segment import DeviceBatch, SegmentId

_UPLOAD_CHUNK = 256  # fixed scatter width -> one compiled append fn for any episode length


def _write_chunk(store: jnp.ndarray, vals: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Scatter a fixed-size chunk; out-of-range rows (idx == capacity) are dropped."""
    return store.at[idx].set(vals, mode="drop")


def _permute_ring(obs, act, rew, end, trunc, perm):
    """Compaction gather: ring[i] <- ring[perm[i]] for all five step arrays."""
    return obs[perm], act[perm], rew[perm], end[perm], trunc[perm]


def _gather_batch(obs, act, rew, end, trunc, final_obs, idx, mask, ep_idx, has_final):
    m = mask
    return DeviceBatch(
        obs=jnp.where(m[..., None, None, None], obs[idx], 0),
        act=jnp.where(m, act[idx], 0),
        rew=jnp.where(m, rew[idx], 0.0),
        end=jnp.where(m, end[idx], 0),
        trunc=jnp.where(m, trunc[idx], 0),
        mask_padding=m,
        final_obs=jnp.where(has_final[:, None, None, None], final_obs[ep_idx], 0),
        has_final_obs=has_final,
    )


# jitted write/gather are pure — share compilations across store instances (the per-eval
# test stores would otherwise re-trace every evaluation)
_JIT_CACHE: Dict = {}


def _jitted_ops(mesh):
    key = mesh
    if key not in _JIT_CACHE:
        if mesh is None:
            write = jax.jit(_write_chunk, donate_argnums=(0,))
            gather = jax.jit(_gather_batch)
            permute = jax.jit(_permute_ring, donate_argnums=(0, 1, 2, 3, 4))
        else:
            from ..parallel import batch_sharding, replicated

            out = DeviceBatch(
                *([batch_sharding(mesh)] * len(DeviceBatch.__dataclass_fields__)))
            write = jax.jit(_write_chunk, donate_argnums=(0,),
                            out_shardings=replicated(mesh))
            gather = jax.jit(_gather_batch, out_shardings=out)
            permute = jax.jit(_permute_ring, donate_argnums=(0, 1, 2, 3, 4),
                              out_shardings=replicated(mesh))
        _JIT_CACHE[key] = (write, gather, permute)
    return _JIT_CACHE[key]


class DeviceEpisodeStore:
    """Append-mostly mirror of a host Dataset on the accelerator.

    Layout: flat step ring (obs/act/rew/end/trunc over capacity_steps) + a per-episode
    final-observation frame table; the episode index (offsets/lengths) lives on the host
    in numpy. Extended episodes (collector continuations, dataset.py add_episode with an
    id) append in place when they are the tail of the ring, else relocate to the tail
    (the orphaned region is waste — covered by the capacity margin).
    """

    def __init__(self, capacity_steps: int, img_size: Tuple[int, int, int],
                 max_episodes: int = 4096, mesh=None) -> None:
        h, w, c = img_size
        self.capacity = int(capacity_steps)
        self.max_episodes = int(max_episodes)

        # On a data-parallel mesh the ring is REPLICATED (it fits HBM comfortably at this
        # scale) and the gathered batches come out sharded on their leading axis: each
        # device gathers its own batch shard from its local replica — zero collectives,
        # zero meaningful H2D, same code path as single-device.
        rep = None
        if mesh is not None:
            from ..parallel import replicated

            rep = replicated(mesh)
        place = (lambda x: jax.device_put(x, rep)) if rep is not None else (lambda x: x)
        self.obs = place(jnp.zeros((self.capacity, h, w, c), jnp.uint8))
        self.act = place(jnp.zeros((self.capacity,), jnp.int32))
        self.rew = place(jnp.zeros((self.capacity,), jnp.float32))
        self.end = place(jnp.zeros((self.capacity,), jnp.int32))
        self.trunc = place(jnp.zeros((self.capacity,), jnp.int32))
        self.final_obs = place(jnp.zeros((self.max_episodes, h, w, c), jnp.uint8))

        # host-side index
        self.ep_offset = np.full(self.max_episodes, -1, np.int64)
        self.ep_len = np.zeros(self.max_episodes, np.int64)
        self.ep_has_final = np.zeros(self.max_episodes, bool)
        self.next_free = 0
        self._lock = threading.Lock()  # background pool builds sync concurrently

        self._write, self._gather, self._permute = _jitted_ops(mesh)
        self.waste_steps = 0        # orphaned by relocations since the last compaction
        self.compactions = 0

    # -- append / sync ---------------------------------------------------------

    def _upload_steps(self, offset: int, obs: np.ndarray, act: np.ndarray, rew: np.ndarray,
                      end: np.ndarray, trunc: np.ndarray) -> None:
        n = len(obs)
        assert offset + n <= self.capacity, (
            f"device episode store overflow ({offset + n} > {self.capacity}); raise "
            "tpu.device_dataset_capacity or set tpu.device_dataset=False")
        for i in range(0, n, _UPLOAD_CHUNK):
            j = min(i + _UPLOAD_CHUNK, n)
            pad = _UPLOAD_CHUNK - (j - i)
            idx = np.arange(i, i + _UPLOAD_CHUNK, dtype=np.int32) + offset
            if pad:
                idx[j - i:] = self.capacity  # dropped by scatter mode="drop"

            def padded(x, fill_shape):
                chunk = x[i:j]
                if pad:
                    chunk = np.concatenate(
                        [chunk, np.zeros((pad,) + fill_shape, chunk.dtype)])
                return chunk

            hwc = obs.shape[1:]
            idx_d = jnp.asarray(idx)
            self.obs = self._write(self.obs, jnp.asarray(padded(obs, hwc)), idx_d)
            self.act = self._write(self.act, jnp.asarray(padded(act.astype(np.int32), ())),
                                   idx_d)
            self.rew = self._write(self.rew,
                                   jnp.asarray(padded(rew.astype(np.float32), ())), idx_d)
            self.end = self._write(self.end, jnp.asarray(padded(end.astype(np.int32), ())),
                                   idx_d)
            self.trunc = self._write(self.trunc,
                                     jnp.asarray(padded(trunc.astype(np.int32), ())), idx_d)

    def _ensure_room(self, needed: int, grow_ep: Optional[int] = None) -> None:
        """Compact the ring if the next `needed`-step upload would overflow but orphaned
        regions (episodes relocated by sync) hold enough reclaimable space. Compaction is
        ONE on-device permutation gather — no host->device frame traffic (the platform
        leaks host RAM per H2D byte, VALIDATION.md), just a capacity-sized index upload.

        ``grow_ep``: the episode about to be re-synced. If it cannot become the tail even
        after packing (another live episode sits above it), its whole region is doomed to
        be orphaned by the caller's relocation — so it is dropped DURING the pack (same
        single gather reclaims it, no fresh waste). If it IS the top live episode, it is
        kept and packed last: it becomes the tail and the caller appends only the suffix,
        which minimizes H2D bytes (the leak-critical direction)."""
        if self.next_free + needed <= self.capacity:
            return
        live = sorted((int(self.ep_offset[e]), e) for e in range(self.max_episodes)
                      if self.ep_offset[e] >= 0 and self.ep_len[e] > 0)
        drop_grow = (grow_ep is not None and live and live[-1][1] != grow_ep
                     and int(self.ep_offset[grow_ep]) >= 0
                     and int(self.ep_len[grow_ep]) > 0)
        reclaimable = self.waste_steps + (int(self.ep_len[grow_ep]) if drop_grow else 0)
        if reclaimable == 0:
            return
        if drop_grow:
            live = [(off, e) for off, e in live if e != grow_ep]
        perm = np.arange(self.capacity, dtype=np.int32)  # identity for the free tail
        pos = 0
        new_offsets = []
        for off, e in live:
            n = int(self.ep_len[e])
            perm[pos:pos + n] = np.arange(off, off + n, dtype=np.int32)
            new_offsets.append((e, pos))
            pos += n
        if pos < self.next_free:
            perm_d = jnp.asarray(perm)
            self.obs, self.act, self.rew, self.end, self.trunc = self._permute(
                self.obs, self.act, self.rew, self.end, self.trunc, perm_d)
            for e, off in new_offsets:
                self.ep_offset[e] = off
            if drop_grow:
                self.ep_offset[grow_ep] = -1  # region reclaimed by this pack
                self.ep_len[grow_ep] = 0      # caller re-uploads the whole episode
            self.next_free = pos
            self.waste_steps = 0
            self.compactions += 1

    def sync(self, dataset: Dataset) -> None:
        """Mirror new/extended episodes from the host dataset (idempotent, cheap when
        nothing changed)."""
        with self._lock:
            for ep_id in range(dataset.num_episodes):
                length = int(dataset.lengths[ep_id])
                if ep_id >= self.max_episodes:
                    raise RuntimeError("device episode store: max_episodes exceeded")
                have = int(self.ep_len[ep_id])
                if length == have:
                    continue
                ep = dataset.load_episode(ep_id)
                # worst case is a whole-episode (re)upload; compaction inside
                # _ensure_room can re-pack the ring (possibly dropping THIS episode's
                # doomed region, see grow_ep), so re-read state after
                self._ensure_room(length if self.ep_offset[ep_id] < 0
                                  or self.ep_offset[ep_id] + have != self.next_free
                                  else length - have, grow_ep=ep_id)
                have = int(self.ep_len[ep_id])  # an excluding pack zeroes it
                if self.ep_offset[ep_id] >= 0 and \
                        self.ep_offset[ep_id] + have == self.next_free:
                    # tail episode grew (possibly post-compaction): append the suffix only
                    self._upload_steps(self.next_free, np.asarray(ep.obs[have:]),
                                       np.asarray(ep.act[have:]), np.asarray(ep.rew[have:]),
                                       np.asarray(ep.end[have:]),
                                       np.asarray(ep.trunc[have:]))
                    self.next_free += length - have
                else:  # new episode, or non-tail grew: (re)write whole episode at the tail
                    if self.ep_offset[ep_id] >= 0:
                        self.waste_steps += have  # old region orphaned
                    self.ep_offset[ep_id] = self.next_free
                    self._upload_steps(self.next_free, np.asarray(ep.obs),
                                       np.asarray(ep.act), np.asarray(ep.rew),
                                       np.asarray(ep.end), np.asarray(ep.trunc))
                    self.next_free += length
                self.ep_len[ep_id] = length

                fo = ep.info.get("final_observation")
                if fo is not None and np.asarray(fo).shape == tuple(self.obs.shape[1:]):
                    self.final_obs = self.final_obs.at[ep_id].set(jnp.asarray(fo))
                    self.ep_has_final[ep_id] = True
                else:
                    self.ep_has_final[ep_id] = False

    # -- batch assembly --------------------------------------------------------

    def _index_arrays(self, segment_ids: List[SegmentId],
                      masked_out: Optional[List[bool]] = None):
        b = len(segment_ids)
        t = segment_ids[0].stop - segment_ids[0].start
        idx = np.zeros((b, t), np.int32)
        mask = np.zeros((b, t), bool)
        ep_idx = np.zeros((b,), np.int32)
        has_final = np.zeros((b,), bool)
        for i, sid in enumerate(segment_ids):
            assert sid.stop - sid.start == t, "segments in a batch must share a length"
            length = int(self.ep_len[sid.episode_id])
            off = int(self.ep_offset[sid.episode_id])
            assert off >= 0, f"episode {sid.episode_id} not in device store"
            pos = np.arange(sid.start, sid.stop)
            valid = (pos >= 0) & (pos < length)
            if masked_out is not None and masked_out[i]:
                valid = np.zeros_like(valid)  # pad_to_batch dummy: contributes nothing
            idx[i] = off + np.clip(pos, 0, max(0, length - 1))
            mask[i] = valid
            ep_idx[i] = sid.episode_id
            has_final[i] = self.ep_has_final[sid.episode_id]
        return idx, mask, ep_idx, has_final

    def make_batch(self, segment_ids: List[SegmentId],
                   masked_out: Optional[List[bool]] = None) -> DeviceBatch:
        """Device-resident DeviceBatch for the given segment windows (the on-device
        equivalent of [make_segment...] + collate_segments_to_batch)."""
        with self._lock:
            idx, mask, ep_idx, has_final = self._index_arrays(segment_ids, masked_out)
            return self._gather(self.obs, self.act, self.rew, self.end, self.trunc,
                                self.final_obs, jnp.asarray(idx), jnp.asarray(mask),
                                jnp.asarray(ep_idx), jnp.asarray(has_final))

    def gather_ic(self, segment_ids: List[SegmentId]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(obs (B, T, H, W, C) uint8, act (B, T) int32) for fully-in-range conditioning
        windows (the IC-pool path: no padding expected, mask must be all-True)."""
        db = self.make_batch(segment_ids)
        return db.obs, db.act


class StoreBatchIterator:
    """Drop-in replacement for the BatchPrefetcher iterator: sample segment ids on the
    host, assemble the batch on device. No thread needed — the gather is device work and
    dispatch is asynchronous."""

    def __init__(self, store: DeviceEpisodeStore, sampler) -> None:
        self.store = store
        self.sampler = sampler

    def __iter__(self):
        return self

    def __next__(self) -> DeviceBatch:
        return self.store.make_batch(self.sampler.sample())
