"""Infinite weighted segment sampler.

Reproduces the reference's sampling distribution exactly (reference:
src/data/batch_sampler.py:38-70) — recency-bucket episode weights, data-parallel
partitioning of episodes by id, and left-padded (or beyond-end) windows around a uniform
timestep — but is organized as vectorized numpy stages with an explicit
``np.random.Generator`` (no global RNG): per-episode weights, then the rank's partition,
then window bounds, each its own helper.

Distribution spec, for the golden tests (tests/test_data.py):
  * with fewer episodes than buckets (or no weights), episodes are drawn proportionally to
    their length;
  * otherwise the episode id range splits into ``len(weights)`` equal buckets (remainder to
    the newest bucket) and an episode's weight is its bucket's weight / bucket size;
  * rank r of ws owns episode ids r, r+ws, r+2ws, ...;
  * the window is uniform over windows *containing* the drawn timestep: clipped to end by
    the episode end (padding before the start only), or unclipped when
    ``can_sample_beyond_end`` (the reward/end model trains on post-death padding).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from .dataset import Dataset
from .segment import SegmentId


def _bucket_weights(num_episodes: int, bucket_w: List[float]) -> np.ndarray:
    """Per-episode weight array from recency-bucket weights."""
    assert min(bucket_w) >= 0 and max(bucket_w) <= 1 and abs(sum(bucket_w) - 1) < 1e-9
    n_buckets = len(bucket_w)
    base = num_episodes // n_buckets
    sizes = np.full(n_buckets, base, dtype=np.int64)
    sizes[-1] += num_episodes - base * n_buckets
    return np.repeat(np.asarray(bucket_w) / sizes, sizes)


class BatchSampler:
    def __init__(self, dataset: Dataset, rank: int, world_size: int, batch_size: int,
                 seq_length: int, sample_weights: Optional[List[float]] = None,
                 can_sample_beyond_end: bool = False,
                 seed: Optional[int] = None) -> None:
        self.dataset = dataset
        self.rank = rank
        self.world_size = world_size
        self.sample_weights = sample_weights
        self.batch_size = batch_size
        self.seq_length = seq_length
        self.can_sample_beyond_end = can_sample_beyond_end
        self.rng = np.random.default_rng(seed)

    def __iter__(self):
        while True:
            yield self.sample()

    def _episode_weights(self) -> np.ndarray:
        n = self.dataset.num_episodes
        if self.sample_weights is None or n < len(self.sample_weights):
            return self.dataset.lengths / self.dataset.num_steps
        return _bucket_weights(n, self.sample_weights)

    def _draw_episodes(self) -> np.ndarray:
        """batch_size episode ids from this rank's partition, recency-weighted."""
        mine = np.arange(self.rank, self.dataset.num_episodes, self.world_size)
        w = self._episode_weights()[mine]
        return self.rng.choice(mine, size=self.batch_size, p=w / w.sum())

    def _window_bounds(self, ep_len: np.ndarray):
        """(start, stop) arrays of seq_length windows around a uniform timestep each."""
        t = self.rng.integers(0, ep_len)
        offset = self.rng.integers(0, self.seq_length, size=t.shape)
        if self.can_sample_beyond_end:
            starts = t - offset
            return starts, starts + self.seq_length
        stops = np.minimum(ep_len, t + 1 + offset)
        return stops - self.seq_length, stops

    def sample(self) -> List[SegmentId]:
        assert self.dataset.num_episodes > 0, "Cannot sample from an empty dataset"
        eps = self._draw_episodes()
        starts, stops = self._window_bounds(self.dataset.lengths[eps])
        return [SegmentId(int(e), int(a), int(b)) for e, a, b in zip(eps, starts, stops)]
