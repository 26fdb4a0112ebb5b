"""Infinite weighted segment sampler.

TPU-native counterpart of reference src/data/batch_sampler.py. Same math:
  * recency-bucket weights split the episode index range into len(weights) buckets, the last
    bucket absorbing the remainder (reference batch_sampler.py:41-51),
  * data-parallel sharding by episode id: rank r owns episodes r, r+ws, r+2ws, ...
    (reference batch_sampler.py:53-55),
  * random timestep then a left-padded window ending at or after it, or beyond-end windows
    when training the reward/end model (reference batch_sampler.py:59-68).

Uses an explicit np.random.Generator (the reference relies on global np.random state).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from .dataset import Dataset
from .segment import SegmentId


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

    def sample(self) -> List[SegmentId]:
        num_episodes = self.dataset.num_episodes
        assert num_episodes > 0, "Cannot sample from an empty dataset"

        if (self.sample_weights is None) or num_episodes < len(self.sample_weights):
            weights = self.dataset.lengths / self.dataset.num_steps
        else:
            w = self.sample_weights
            num_w = len(w)
            assert all(0 <= x <= 1 for x in w) and abs(sum(w) - 1) < 1e-9
            # bucket i holds num//num_w episodes; the last also takes the remainder
            sizes = [num_episodes // num_w + (num_episodes % num_w) * (i == num_w - 1)
                     for i in range(num_w)]
            weights = np.array([wi / s for (wi, s) in zip(w, sizes) for _ in range(s)])

        episodes_partition = np.arange(self.rank, num_episodes, self.world_size)
        weights = np.asarray(weights)[self.rank::self.world_size]
        episode_ids = self.rng.choice(episodes_partition, size=self.batch_size, replace=True,
                                      p=weights / weights.sum())
        timesteps = self.rng.integers(low=0, high=self.dataset.lengths[episode_ids])

        if self.can_sample_beyond_end:
            # padding allowed both before start and after end
            starts = timesteps - self.rng.integers(0, self.seq_length, len(timesteps))
            stops = starts + self.seq_length
        else:
            # padding allowed only before start
            stops = np.minimum(self.dataset.lengths[episode_ids],
                               timesteps + 1 + self.rng.integers(0, self.seq_length,
                                                                 len(timesteps)))
            starts = stops - self.seq_length

        return [SegmentId(int(e), int(a), int(b))
                for e, a, b in zip(episode_ids, starts, stops)]
