"""Multi-host (DCN) data parallelism: initialization + process-local array plumbing.

The jitted train steps are host-count-agnostic BY CONSTRUCTION — they are written with
global semantics and GSPMD partitions them over whatever mesh the inputs live on
(parallel/mesh.py; the reference is single-node DDP, reference src/main.py:26-44, so this
is beyond-reference capability). What multi-host adds is only:

  (a) ``jax.distributed.initialize`` — one coordinator, N processes, after which
      ``jax.devices()`` is the GLOBAL device list (local + remote) and a Mesh over it
      spans hosts (TPU pods: ICI within a slice, DCN across slices — XLA routes
      collectives over the right fabric from the mesh's device coordinates);
  (b) building global arrays from process-local data: ``jax.device_put`` cannot target
      non-addressable (remote) devices, so batch shards and replicated params go through
      ``jax.make_array_from_process_local_data`` instead.

Config surface: ``tpu.distributed.{coordinator, num_processes, process_id}`` (see
configs/trainer.yaml) — single-node runs leave coordinator null and none of this module
runs. The 2-process x 4-virtual-CPU-device dryrun in tests/test_multihost.py proves the
claim end-to-end: the SAME jitted denoiser train step, run from two coordinated
processes over one 8-device global mesh, reproduces the single-process loss.

Run a dryrun worker by hand:
    python -m diamond_tpu.parallel.multihost <process_id> <num_processes> <port> <outdir>
(CPU forced + xla_force_host_platform_device_count set by the caller's environment.)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path
from typing import Any, Optional

import numpy as np

from .mesh import DATA_AXIS, make_mesh


def initialize(coordinator: str, num_processes: int, process_id: int,
               cpu_gloo: bool = False) -> None:
    """``jax.distributed.initialize`` with the framework's conventions. ``cpu_gloo``
    selects the gloo CPU collectives implementation (required for multi-process CPU
    meshes — the test/dryrun fabric; TPU pods use their native fabric and ignore it)."""
    import jax

    if cpu_gloo:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator, num_processes=num_processes,
                               process_id=process_id)


def global_batch_from_local(tree: Any, mesh) -> Any:
    """Per-sample arrays: each process contributes its local rows of the global batch
    (the multi-host replacement for mesh.shard_device_batch's device_put)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    s = NamedSharding(mesh, P(DATA_AXIS))
    n = jax.process_count()

    def build(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            s, x, (x.shape[0] * n,) + x.shape[1:])

    return jax.tree_util.tree_map(build, tree)


def global_replicated_from_full(tree: Any, mesh) -> Any:
    """Replicated placement from a full host-local copy on every process (params,
    optimizer state, RNG keys — the multi-host replacement for mesh.replicate)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    s = NamedSharding(mesh, P())

    def build(x):
        return jax.make_array_from_process_local_data(s, np.asarray(x), None)

    return jax.tree_util.tree_map(build, tree)


def _dryrun_worker(process_id: int, num_processes: int, port: int, outdir: str) -> None:
    """One process of the multi-host dryrun: tiny denoiser, one GSPMD train step over the
    global mesh, write the resulting loss + grad norm for cross-process comparison."""
    import jax
    import jax.numpy as jnp
    import optax

    initialize(f"127.0.0.1:{port}", num_processes, process_id, cpu_gloo=True)
    assert jax.process_count() == num_processes, jax.process_count()

    from ..data.segment import DeviceBatch
    from ..models import (Denoiser, DenoiserConfig, InnerModelConfig,
                          SigmaDistributionConfig)
    from ..training import TrainState, make_denoiser_train_step

    den = Denoiser(DenoiserConfig(
        inner_model=InnerModelConfig(img_channels=3, num_steps_conditioning=2,
                                     cond_channels=16, depths=[1], channels=[8],
                                     attn_depths=[0], num_actions=3),
        sigma_data=0.5, sigma_offset_noise=0.3))
    v = den.init(jax.random.PRNGKey(0), img_size=8)  # same key -> same params everywhere
    tx = optax.adamw(1e-4)
    state = TrainState.create(v["params"], tx)
    constants = v.get("constants", {})

    mesh = make_mesh()  # ALL global devices — this is the host-count-agnosticism claim
    assert len(mesh.devices.ravel()) == num_processes * len(jax.local_devices())
    state = global_replicated_from_full(state, mesh)
    constants = global_replicated_from_full(constants, mesh)

    # deterministic global batch (B=8): this process materializes only its local rows
    rng = np.random.default_rng(42)
    b_global, t = 8, 4
    obs = rng.integers(0, 255, (b_global, t, 8, 8, 3), dtype=np.uint8)
    act = rng.integers(0, 3, (b_global, t)).astype(np.int32)
    per = b_global // num_processes
    sl = slice(process_id * per, (process_id + 1) * per)
    local = DeviceBatch(
        obs=obs[sl], act=act[sl], rew=np.zeros((per, t), np.float32),
        end=np.zeros((per, t), np.int32), trunc=np.zeros((per, t), np.int32),
        mask_padding=np.ones((per, t), bool),
        final_obs=np.zeros((per, 8, 8, 3), np.uint8),
        has_final_obs=np.zeros((per,), bool))
    batch = global_batch_from_local(local, mesh)

    sig = SigmaDistributionConfig(-0.4, 1.2, 2e-3, 20.0)
    step = make_denoiser_train_step(den, tx, sig)
    key = global_replicated_from_full(jax.random.PRNGKey(7), mesh)
    state, metrics = step(state, constants, batch, key)
    state, metrics = step(state, constants, batch, key)  # second step exercises updates

    out = {"process_id": process_id,
           "num_processes": num_processes,
           "global_devices": len(jax.devices()),
           "loss": float(metrics["loss_denoising"]),
           "grad_norm": float(metrics["grad_norm_before_clip"]),
           "step": int(state.step)}

    # -- AC / imagination step: the hardest sharding case (replicated pool pointer +
    # death prefix-sum inside the fused rollout) run across REAL processes --------
    from ..envs.world_model_env import (ICPool, ImaginationEngine, WorldModelEnvConfig,
                                        make_ic_preparer)
    from ..models import (ActorCritic, ActorCriticConfig, ActorCriticLossConfig,
                          DiffusionSamplerConfig, RewEndModel, RewEndModelConfig)
    from ..training import make_ac_train_step

    IMG, C, NC, NA, D = 8, 3, 2, 3, 16
    rew_end = RewEndModel(RewEndModelConfig(lstm_dim=D, img_channels=C, img_size=IMG,
                                            cond_channels=8, depths=[1], channels=[8],
                                            attn_depths=[0], num_actions=NA))
    ac = ActorCritic(ActorCriticConfig(lstm_dim=D, img_channels=C, img_size=IMG,
                                       channels=[8], down=[1], num_actions=NA))
    r_vars = rew_end.init(jax.random.PRNGKey(1))   # same keys -> same params everywhere
    ac_vars = ac.init(jax.random.PRNGKey(2))

    # global IC pool (P=16) from process-local rows: obs/act drawn from a SHARED numpy
    # stream, burn-in LSTM states computed locally per row, then assembled with
    # make_array_from_process_local_data; the consumption pointer is a replicated scalar
    prng = np.random.default_rng(7)
    P_pool, b_g = 16, 8
    pool_obs = prng.integers(0, 255, (P_pool, NC, IMG, IMG, C), dtype=np.uint8)
    pool_act = prng.integers(0, NA, (P_pool, NC)).astype(np.int32)
    per_p = P_pool // num_processes
    psl = slice(process_id * per_p, (process_id + 1) * per_p)
    hx_l, cx_l = make_ic_preparer(rew_end)(r_vars, jnp.asarray(pool_obs[psl]),
                                           jnp.asarray(pool_act[psl]))
    pool = ICPool(
        obs=global_batch_from_local(pool_obs[psl], mesh),
        act=global_batch_from_local(pool_act[psl], mesh),
        hx=global_batch_from_local(np.asarray(hx_l), mesh),
        cx=global_batch_from_local(np.asarray(cx_l), mesh),
        ptr=global_replicated_from_full(np.asarray(0, np.int32), mesh))

    engine = ImaginationEngine(den, rew_end, ac, WorldModelEnvConfig(
        horizon=4, num_batches_to_preload=1,
        diffusion_sampler=DiffusionSamplerConfig(num_steps_denoising=2)))
    # non-addressable arrays require jit even for the reset gather
    st, pool = jax.jit(engine.initial_state, static_argnums=1)(pool, b_g)

    tx_a = optax.adamw(1e-4)
    sa = TrainState.create(ac_vars["params"], tx_a)
    sa = global_replicated_from_full(sa, mesh)
    d_vars_g = global_replicated_from_full(dict(v), mesh)  # full denoiser variables
    r_vars_g = global_replicated_from_full(r_vars, mesh)
    step_a = make_ac_train_step(engine, ac, tx_a,
                                ActorCriticLossConfig(backup_every=4, gamma=0.985,
                                                      lambda_=0.95, weight_value_loss=1.0,
                                                      weight_entropy_loss=0.001))
    key_a = global_replicated_from_full(jax.random.PRNGKey(3), mesh)
    sa, st, pool, ma = step_a(sa, d_vars_g, r_vars_g, st, pool, key_a)

    out.update({"ac_loss": float(ma["loss_total"]),
                "ac_grad_norm": float(ma["grad_norm_before_clip"]),
                "ac_pool_ptr": int(pool.ptr)})
    Path(outdir, f"dryrun_p{process_id}.json").write_text(json.dumps(out))
    print(f"[multihost dryrun] p{process_id}: {out}", flush=True)


if __name__ == "__main__":
    _dryrun_worker(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
