"""Data parallelism over a device mesh.

TPU-native replacement for the reference's DDP/NCCL stack (reference src/main.py:26-44,
src/utils.py:97-106; SURVEY.md section 2.8): one ``data`` mesh axis over all local devices
(ICI), batches sharded on their leading axis, parameters/optimizer state replicated.

The jitted train steps (training.py) are written with *global* semantics — under
jit-over-sharded-inputs, XLA GSPMD partitions the batch dim and inserts the gradient
all-reduces itself (the pmean the reference got from DDP hooks). This keeps the single- and
multi-device code paths literally identical: sharding lives entirely in where the inputs are
placed, not in the step functions. Exactness notes:
  * the loss is the global batch mean (matching single-device math bit-for-bit up to
    reduction order), unlike per-rank DDP means with unequal mask counts;
  * RNG draws have global shapes — the same seeds give the same math at any device count;
  * the IC pool pointer stays a global scalar; the death prefix-sum becomes a (tiny) global
    collective.

Multi-host (DCN) would reuse the same code after jax.distributed.initialize — out of scope
for the reference's single-node surface.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def select_devices(spec: Any = "all") -> list:
    """Resolve ``common.devices`` into a device list (reference src/main.py:47-56).

    The reference narrows CUDA_VISIBLE_DEVICES; here the selection picks the subset of
    ``jax.devices()`` the mesh (and all placement) spans. Accepts ``"all"``/``None``, a
    single index, or a sequence of indices; errors on unknown or duplicate indices.
    """
    devices = jax.devices()
    if spec is None or spec == "all":
        return list(devices)
    idxs = [spec] if isinstance(spec, int) else list(spec)
    if not idxs:
        raise ValueError("common.devices: empty device selection")
    out = []
    seen = set()
    for i in idxs:
        i = int(i)
        if not 0 <= i < len(devices):
            raise ValueError(f"common.devices: index {i} out of range — "
                             f"{len(devices)} device(s) visible: {devices}")
        if i in seen:
            raise ValueError(f"common.devices: duplicate index {i}")
        seen.add(i)
        out.append(devices[i])
    return out


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for per-sample arrays."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Place a pytree fully replicated on the mesh (params, optimizer state, scalars)."""
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def _shard_leading(tree: Any, mesh: Mesh) -> Any:
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def shard_device_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard a DeviceBatch on its batch axis. Batch size must divide the mesh size."""
    return _shard_leading(batch, mesh)


def shard_imag_state(st: Any, mesh: Mesh) -> Any:
    """ImagState: every field is (B, ...) — shard on the env axis."""
    return _shard_leading(st, mesh)


def shard_pool(pool: Any, mesh: Mesh) -> Any:
    """ICPool: entries sharded, the consumption pointer replicated (global scalar)."""
    b = batch_sharding(mesh)
    r = replicated(mesh)
    return pool.replace(
        obs=jax.device_put(pool.obs, b),
        act=jax.device_put(pool.act, b),
        hx=jax.device_put(pool.hx, b),
        cx=jax.device_put(pool.cx, b),
        ptr=jax.device_put(pool.ptr, r),
        feats=None if pool.feats is None else jax.device_put(pool.feats, b),
    )
