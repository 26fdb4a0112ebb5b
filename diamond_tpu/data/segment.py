"""Segment addressing + padded windows + device-ready batches.

TPU-native counterpart of reference src/data/segment.py, src/data/batch.py and the
make_segment/collate half of src/data/utils.py:12-41. A Batch is a pytree of numpy arrays
(device_put-able as-is); obs stays uint8 until on-device conversion. The per-segment
``final_observation`` needed by the reward/end loss (reference rew_end_model.py:64-69) is
materialized here as dense arrays so the loss jits with static shapes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List

import numpy as np
from flax import struct

from .episode import Episode


@dataclass(frozen=True)
class SegmentId:
    """reference: src/data/segment.py:8-12. start/stop may exceed the episode range; the
    out-of-range part is zero-padded and masked."""

    episode_id: int
    start: int
    stop: int


@dataclass
class Segment:
    """reference: src/data/segment.py:15-28."""

    obs: np.ndarray  # uint8 (T, H, W, C)
    act: np.ndarray
    rew: np.ndarray
    end: np.ndarray
    trunc: np.ndarray
    mask_padding: np.ndarray  # bool (T,)
    info: Dict[str, Any]
    id: SegmentId

    @property
    def effective_size(self) -> int:
        return int(self.mask_padding.sum())


@dataclass
class Batch:
    """Stacked segments, device-ready (reference: src/data/batch.py:12-25, with
    final_observation lifted out of the info dicts into dense arrays)."""

    obs: np.ndarray            # uint8 (B, T, H, W, C)
    act: np.ndarray            # int32 (B, T)
    rew: np.ndarray            # float32 (B, T)
    end: np.ndarray            # int32 (B, T)
    trunc: np.ndarray          # int32 (B, T)
    mask_padding: np.ndarray   # bool (B, T)
    final_obs: np.ndarray      # uint8 (B, H, W, C); zeros when absent
    has_final_obs: np.ndarray  # bool (B,)
    info: List[Dict[str, Any]] = field(default_factory=list)
    segment_ids: List[SegmentId] = field(default_factory=list)


class DeviceBatch(struct.PyTreeNode):
    """The jit-facing view of a Batch: just the dense arrays (host-only info/segment_ids
    stripped). This is what crosses the host->device boundary; obs/final_obs stay uint8."""

    obs: Any            # uint8 (B, T, H, W, C)
    act: Any            # int32 (B, T)
    rew: Any            # float32 (B, T)
    end: Any            # int32 (B, T)
    trunc: Any          # int32 (B, T)
    mask_padding: Any   # bool (B, T)
    final_obs: Any      # uint8 (B, H, W, C)
    has_final_obs: Any  # bool (B,)

    @classmethod
    def from_batch(cls, batch: "Batch") -> "DeviceBatch":
        return cls(obs=batch.obs, act=batch.act, rew=batch.rew, end=batch.end,
                   trunc=batch.trunc, mask_padding=batch.mask_padding,
                   final_obs=batch.final_obs, has_final_obs=batch.has_final_obs)


def make_segment(episode: Episode, segment_id: SegmentId, should_pad: bool = True) -> Segment:
    """Zero-pad the out-of-range part of the window and build mask_padding
    (reference: src/data/utils.py:18-41)."""
    assert segment_id.start < len(episode) and segment_id.stop > 0
    assert segment_id.start < segment_id.stop
    pad_right = max(0, segment_id.stop - len(episode))
    pad_left = max(0, -segment_id.start)
    assert (pad_right == pad_left == 0) or should_pad

    start = max(0, segment_id.start)
    stop = min(len(episode), segment_id.stop)

    def pad(x: np.ndarray) -> np.ndarray:
        widths = [(pad_left, pad_right)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x[start:stop], widths)

    mask = np.concatenate([
        np.zeros(pad_left, bool), np.ones(stop - start, bool), np.zeros(pad_right, bool)])

    return Segment(
        obs=pad(episode.obs),
        act=pad(episode.act),
        rew=pad(episode.rew),
        end=pad(episode.end),
        trunc=pad(episode.trunc),
        mask_padding=mask,
        info=episode.info,
        id=SegmentId(segment_id.episode_id, start, stop),
    )


def collate_segments_to_batch(segments: List[Segment]) -> Batch:
    """reference: src/data/utils.py:12-15, plus final_observation densification."""
    obs = np.stack([s.obs for s in segments])
    h, w, c = obs.shape[2:]
    final_obs = np.zeros((len(segments), h, w, c), np.uint8)
    has_final = np.zeros(len(segments), bool)
    for i, s in enumerate(segments):
        fo = s.info.get("final_observation")
        if fo is not None and np.asarray(fo).shape == (h, w, c):
            final_obs[i] = fo
            has_final[i] = True
    return Batch(
        obs=obs,
        act=np.stack([s.act for s in segments]).astype(np.int32),
        rew=np.stack([s.rew for s in segments]).astype(np.float32),
        end=np.stack([s.end for s in segments]).astype(np.int32),
        trunc=np.stack([s.trunc for s in segments]).astype(np.int32),
        mask_padding=np.stack([s.mask_padding for s in segments]),
        final_obs=final_obs,
        has_final_obs=has_final,
        info=[s.info for s in segments],
        segment_ids=[s.id for s in segments],
    )
