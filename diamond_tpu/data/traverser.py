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

    def iter_batches_ids(self):
        """Yield (segment_ids, masked_out) per batch — the pure index form of __iter__
        (masked_out marks the pad_to_batch dummy entries, which repeat the last real id
        with a fully-False mask). Lets device-store consumers run the identical traversal
        without materializing host segments."""
        cs = self.chunk_size
        chunks = []  # (SegmentId, masked_out)
        for episode_id in range(self.dataset.num_episodes):
            length = int(self.dataset.lengths[episode_id])
            for i in range(math.ceil(length / cs)):
                chunks.append((SegmentId(episode_id, i * cs, (i + 1) * cs), False))
            # drop size-1 tails (reference data/utils.py:74-75); `length and` guards the
            # zero-length-episode case, where chunks[-1] would be a PREVIOUS episode's
            # still-unflushed chunk evaluated against the wrong length
            if length and chunks and min(length, chunks[-1][0].stop) - chunks[-1][0].start < 2:
                chunks.pop()
            while len(chunks) >= self.batch_num_samples:
                head = chunks[: self.batch_num_samples]
                chunks = chunks[self.batch_num_samples:]
                yield [c[0] for c in head], [c[1] for c in head]
        if chunks:
            if self.pad_to_batch:
                chunks = chunks + [(chunks[-1][0], True)] * (self.batch_num_samples
                                                             - len(chunks))
            yield [c[0] for c in chunks], [c[1] for c in chunks]

    def __iter__(self) -> Generator[Batch, None, None]:
        for ids, masked in self.iter_batches_ids():
            segments = []
            for sid, is_dummy in zip(ids, masked):
                seg = make_segment(self.dataset.load_episode(sid.episode_id), sid,
                                   should_pad=True)
                segments.append(_masked_out_copy(seg) if is_dummy else seg)
            yield collate_segments_to_batch(segments)


def _masked_out_copy(seg):
    import copy
    import numpy as np

    dummy = copy.copy(seg)
    dummy.mask_padding = np.zeros_like(seg.mask_padding)
    return dummy
