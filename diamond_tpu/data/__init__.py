from .batch_sampler import BatchSampler
from .dataset import Dataset
from .episode import Episode, merge_info, obs_to_float, obs_to_uint8
from .prefetch import BatchPrefetcher, sample_batch, sample_device_batch
from .segment import (Batch, DeviceBatch, Segment, SegmentId, collate_segments_to_batch,
                      make_segment)
from .traverser import DatasetTraverser
