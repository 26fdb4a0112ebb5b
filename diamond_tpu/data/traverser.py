"""Deterministic eval iterator: chunk every episode into seq-length windows, drop size-1
tails, batch them (TPU-native counterpart of reference src/data/utils.py:44-82)."""

from __future__ import annotations

import math
from typing import Generator

from .dataset import Dataset
from .segment import Batch, SegmentId, collate_segments_to_batch, make_segment


class DatasetTraverser:
    """pad_to_batch: emit every batch at exactly batch_num_samples by appending fully-masked
    dummy segments to the tail batch — one jit shape for the whole eval (variable tail shapes
    force a recompile per size; losses/confusion matrices are mask-weighted so padding
    contributes nothing)."""

    def __init__(self, dataset: Dataset, batch_num_samples: int, chunk_size: int,
                 pad_to_batch: bool = False) -> None:
        self.dataset = dataset
        self.batch_num_samples = batch_num_samples
        self.chunk_size = chunk_size
        self.pad_to_batch = pad_to_batch

    def __len__(self) -> int:
        return math.ceil(sum(
            math.ceil(self.dataset.lengths[eid] / self.chunk_size)
            - int(self.dataset.lengths[eid] % self.chunk_size == 1)
            for eid in range(self.dataset.num_episodes)
        ) / self.batch_num_samples)

    def __iter__(self) -> Generator[Batch, None, None]:
        chunks = []
        for episode_id in range(self.dataset.num_episodes):
            episode = self.dataset.load_episode(episode_id)
            chunks.extend(
                make_segment(episode,
                             SegmentId(episode_id, i * self.chunk_size,
                                       (i + 1) * self.chunk_size),
                             should_pad=True)
                for i in range(math.ceil(len(episode) / self.chunk_size)))
            # drop size-1 tails (reference data/utils.py:74-75)
            if chunks and chunks[-1].effective_size < 2:
                chunks.pop()
            while len(chunks) >= self.batch_num_samples:
                yield collate_segments_to_batch(chunks[: self.batch_num_samples])
                chunks = chunks[self.batch_num_samples:]
        if chunks:
            if self.pad_to_batch:
                dummy = _masked_out_copy(chunks[-1])
                chunks = chunks + [dummy] * (self.batch_num_samples - len(chunks))
            yield collate_segments_to_batch(chunks)


def _masked_out_copy(seg):
    import copy
    import numpy as np

    dummy = copy.copy(seg)
    dummy.mask_padding = np.zeros_like(seg.mask_padding)
    return dummy
