"""On-disk episode store with resumable counters.

TPU-native counterpart of reference src/data/dataset.py. Episodes live at
``dataset/<d3>/<d2>/<d1>/<id>.npz`` (same 3-level decimal sharding, reference
dataset.py:122-128); the store's counters (num_episodes/num_steps/start_idx/lengths/
counter_rew/counter_end) are its state_dict, persisted to ``info.pt`` for resume
(reference dataset.py:137-143).

No DataLoader workers: batches are assembled by the host sampler thread
(see data/prefetch.py), so no mp.Manager cache is needed (reference dataset.py:41).
"""

from __future__ import annotations

import shutil
from collections import Counter
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

from ..utils import load_pickle, save_with_backup
from .episode import Episode
from .segment import Segment, SegmentId, make_segment

STATE_FIELDS = ("is_static", "num_episodes", "num_steps", "start_idx", "lengths",
                "counter_rew", "counter_end")


class Dataset:
    def __init__(self, directory: Path, name: Optional[str] = None,
                 cache_in_ram: bool = False, save_on_disk: bool = True) -> None:
        self.is_static = False
        self.num_episodes = 0
        self.num_steps = 0
        self.start_idx = np.array([], dtype=np.int64)
        self.lengths = np.array([], dtype=np.int64)
        self.counter_rew: Counter = Counter()
        self.counter_end: Counter = Counter()

        self._directory = Path(directory).expanduser()
        self._name = name if name is not None else self._directory.stem
        self._cache_in_ram = cache_in_ram
        self._save_on_disk = save_on_disk
        self._default_path = self._directory / "info.pt"
        self._cache: Dict[int, Episode] = {}

    def __len__(self) -> int:
        return self.num_steps

    def __getitem__(self, segment_id: SegmentId) -> Segment:
        return make_segment(self.load_episode(segment_id.episode_id), segment_id,
                            should_pad=True)

    def __str__(self) -> str:
        return f"{self.name}: {self.num_episodes} episodes, {self.num_steps} steps."

    @property
    def name(self) -> str:
        return self._name

    @property
    def counts_rew(self) -> List[int]:
        """Counts of sign(reward) in {-1, 0, 1} (reference dataset.py:59-61)."""
        return [self.counter_rew[r] for r in [-1, 0, 1]]

    @property
    def counts_end(self) -> List[int]:
        return [self.counter_end[e] for e in [0, 1]]

    def _reset(self) -> None:
        self.num_episodes = 0
        self.num_steps = 0
        self.start_idx = np.array([], dtype=np.int64)
        self.lengths = np.array([], dtype=np.int64)
        self.counter_rew = Counter()
        self.counter_end = Counter()
        self._cache.clear()

    def clear(self) -> None:
        self.assert_not_static()
        if self._directory.is_dir():
            shutil.rmtree(self._directory)
        self._reset()

    def load_episode(self, episode_id: int) -> Episode:
        if self._cache_in_ram and episode_id in self._cache:
            return self._cache[episode_id]
        episode = Episode.load(self._get_episode_path(episode_id))
        if self._cache_in_ram:
            self._cache[episode_id] = episode
        return episode

    def add_episode(self, episode: Episode, *, episode_id: Optional[int] = None) -> int:
        """Append a new episode, or extend an ongoing one in place with counter fix-up
        (reference dataset.py:90-120)."""
        self.assert_not_static()

        if episode_id is None:
            episode_id = self.num_episodes
            self.start_idx = np.concatenate([self.start_idx, [self.num_steps]])
            self.lengths = np.concatenate([self.lengths, [len(episode)]])
            self.num_steps += len(episode)
            self.num_episodes += 1
        else:
            assert episode_id < self.num_episodes
            old = self.load_episode(episode_id)
            incr = len(episode) - len(old)
            self.lengths[episode_id] = len(episode)
            self.start_idx[episode_id + 1:] += incr
            self.num_steps += incr
            self.counter_rew.subtract(np.sign(old.rew).astype(int).tolist())
            self.counter_end.subtract(old.end.astype(int).tolist())

        self.counter_rew.update(np.sign(episode.rew).astype(int).tolist())
        self.counter_end.update(episode.end.astype(int).tolist())

        if self._save_on_disk:
            episode.save(self._get_episode_path(episode_id))
        if self._cache_in_ram:
            self._cache[episode_id] = episode
        return episode_id

    def _get_episode_path(self, episode_id: int) -> Path:
        """3-level decimal sharding dir layout (reference dataset.py:122-128):
        id 1234 -> 200/30/4/1234.npz (hundreds/tens/units buckets)."""
        n = 3
        powers = np.arange(n)
        sub = np.floor((episode_id % 10 ** (1 + powers)) / 10 ** powers) * 10 ** powers
        sub = [int(x) for x in sub[::-1]]
        parts = "/".join(f"{x:0{n - i}d}" for i, x in enumerate(sub))
        return self._directory / parts / f"{episode_id}.npz"

    def assert_not_static(self) -> None:
        assert not self.is_static, "Trying to modify a static dataset."

    # -- state (resume) ------------------------------------------------------

    def state_dict(self) -> Dict[str, Any]:
        return {k: getattr(self, k) for k in STATE_FIELDS}

    def load_state_dict(self, sd: Dict[str, Any]) -> None:
        for k in STATE_FIELDS:
            setattr(self, k, sd[k])
        self.start_idx = np.asarray(self.start_idx, dtype=np.int64)
        self.lengths = np.asarray(self.lengths, dtype=np.int64)
        self.counter_rew = Counter(self.counter_rew)
        self.counter_end = Counter(self.counter_end)
        self._cache.clear()

    def save_to_default_path(self) -> None:
        self._default_path.parent.mkdir(exist_ok=True, parents=True)
        save_with_backup(self.state_dict(), self._default_path)

    def load_from_default_path(self) -> None:
        if self._default_path.is_file():
            self.load_state_dict(load_pickle(self._default_path))
