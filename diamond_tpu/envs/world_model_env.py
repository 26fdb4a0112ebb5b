"""Imagination MDP on device: the world model as an environment.

TPU-native counterpart of reference src/envs/world_model_env.py — but re-architected: instead
of a Python object stepped from a coroutine with two torch.compile'd fragments
(reference world_model_env.py:65-105, trainer.py:182-184), the entire rollout
(policy step -> diffusion sampler -> reward/end LSTM -> masked resets) is ONE ``lax.scan``
inside a single jitted function. There is no host round-trip anywhere in the imagination hot
loop (SURVEY.md section 7, design decision 2).

Dead-env resets: the reference refills from a generator that preloads real segments and
burns in the reward/end LSTM (world_model_env.py:107-139). Here those initial conditions are
pre-staged on device as an ``ICPool``; each dying env pulls the next pool entry with a gather
and a ``where``-swap — same semantics, static shapes.

A stateful ``WorldModelEnv`` class with the reference's reset/step env API (for the play app)
lives in envs/wm_env_stateful.py, built on the same transition functions.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..data.episode import obs_to_float, obs_to_uint8_device
from ..models.actor_critic import ActorCritic
from ..models.denoiser import Denoiser
from ..models.diffusion_sampler import DiffusionSampler, DiffusionSamplerConfig
from ..models.rew_end_model import RewEndModel

Variables = Any


@dataclass
class WorldModelEnvConfig:
    """reference: src/envs/world_model_env.py:19-23."""

    horizon: int
    num_batches_to_preload: int
    diffusion_sampler: DiffusionSamplerConfig

    @classmethod
    def from_cfg(cls, cfg: Any) -> "WorldModelEnvConfig":
        return cls(
            horizon=cfg.horizon,
            num_batches_to_preload=cfg.num_batches_to_preload,
            diffusion_sampler=DiffusionSamplerConfig.from_cfg(cfg.diffusion_sampler),
        )


class ICPool(struct.PyTreeNode):
    """Pre-staged initial conditions: real conditioning segments + burned-in reward/end LSTM
    state (the device-resident equivalent of reference world_model_env.py:107-139).
    obs is uint8 — converted on gather."""

    obs: jnp.ndarray   # (P, n_cond, H, W, C) uint8
    act: jnp.ndarray   # (P, n_cond) int32
    hx: jnp.ndarray    # (P, D) float32
    cx: jnp.ndarray    # (P, D) float32
    ptr: jnp.ndarray   # () int32 — next unconsumed entry
    # Optional (tpu.pool_policy_feats): policy-trunk features of the conditioning frames,
    # (P, n_cond, F), precomputed at pool build. Saves the per-step batched context encode
    # in the rollout (~0.5 ms/step at full size) at the cost of the reference's exact
    # burn-in semantics: dead-env burn-in features are computed with the policy weights of
    # the pool build (each entry is consumed once, so staleness is at most one pool
    # lifetime) and contribute no encoder gradients. Capability-gated in tests + the
    # fake-env schedule run.
    feats: Optional[jnp.ndarray] = None

    @property
    def size(self) -> int:
        return self.obs.shape[0]


def encode_pool_feats(actor_critic: ActorCritic, ac_vars: Variables,
                      obs_u8: jnp.ndarray) -> jnp.ndarray:
    """Policy-trunk features of a pool's conditioning frames (ICPool.feats,
    tpu.pool_policy_feats): (P, n_cond, H, W, C) uint8 -> (P, n_cond, F).

    The single definition of the production feats layout — PoolManager, bench.py and the
    multichip dryrun all route through this so a change here can't silently fork what the
    bench measures from what the trainer runs. Traceable; callers jit (and chunk the pool
    dim — a full pool at once is hundreds of MB of activations)."""
    p, t = obs_u8.shape[:2]
    flat = obs_to_float(obs_u8.reshape((p * t,) + obs_u8.shape[2:]))
    return actor_critic.encode(ac_vars, flat).reshape(p, t, -1)


class ImagState(struct.PyTreeNode):
    """Per-env imagination state carried across AC train steps (the rolling buffers +
    recurrent carries of reference world_model_env.py:47-53 and env_loop.py:18-19)."""

    obs_buffer: jnp.ndarray  # (B, n_cond, H, W, C) uint8 — LOSSLESS: every frame here is
                             # on the 256-level grid (dataset frames are uint8; world-model
                             # frames are grid-quantized by Denoiser.wrap_model_output and
                             # the sampler's final Euler step returns the denoised output
                             # verbatim). uint8 storage cuts the buffer roll/reset/where
                             # HBM traffic 4x; obs_to_float fuses into each consumer's
                             # first elementwise pass.
    act_buffer: jnp.ndarray  # (B, n_cond) int32
    re_hx: jnp.ndarray       # (B, D) reward/end LSTM
    re_cx: jnp.ndarray
    ac_hx: jnp.ndarray       # (B, D) policy LSTM
    ac_cx: jnp.ndarray
    ep_len: jnp.ndarray      # (B,) int32


def make_ic_preparer(rew_end_model: RewEndModel, chunk: int = 512):
    """Burn in the reward/end LSTM over the conditioning transitions of real segments
    (reference world_model_env.py:117-124). obs_u8: (N, n_cond, H, W, C).

    Chunked host-side: the encoder activations of N*(n_cond-1) frames at once would blow
    HBM for pool-sized N (observed: 18 GB at N=8192); each jitted call sees at most
    ``chunk`` segments."""

    @jax.jit
    def prepare_chunk(r_vars: Variables, obs_u8: jnp.ndarray, act: jnp.ndarray):
        obs = obs_to_float(obs_u8)
        *_, (hx, cx) = rew_end_model.predict_rew_end(
            r_vars, obs[:, :-1], act[:, :-1], obs[:, 1:])
        return hx, cx

    def prepare(r_vars: Variables, obs_u8: jnp.ndarray, act: jnp.ndarray):
        n = obs_u8.shape[0]
        if n <= chunk:
            return prepare_chunk(r_vars, obs_u8, act)
        outs = [prepare_chunk(r_vars, obs_u8[i:i + chunk], act[i:i + chunk])
                for i in range(0, n - n % chunk, chunk)]
        if n % chunk:  # tail reuses the main chunk shape to avoid a recompile
            hx_t, cx_t = prepare_chunk(r_vars, obs_u8[-chunk:], act[-chunk:])
            outs.append((hx_t[-(n % chunk):], cx_t[-(n % chunk):]))
        return (jnp.concatenate([o[0] for o in outs]),
                jnp.concatenate([o[1] for o in outs]))

    return prepare


class ImaginationEngine:
    """Builds the fused scan rollout and the stateful single-step used by WorldModelEnv."""

    def __init__(self, denoiser: Denoiser, rew_end_model: RewEndModel,
                 actor_critic: ActorCritic, cfg: WorldModelEnvConfig) -> None:
        self.denoiser = denoiser
        self.rew_end_model = rew_end_model
        self.actor_critic = actor_critic
        self.cfg = cfg
        self.sampler = DiffusionSampler(denoiser, cfg.diffusion_sampler)

    # -- shared single WM transition (pure) ----------------------------------

    def _wm_transition(self, d_vars: Variables, r_vars: Variables, st: ImagState,
                       act: jnp.ndarray, rng: jax.Array):
        """One world-model step: sample next frame, predict+sample reward/end, roll buffers
        (reference world_model_env.py:65-105 without the reset block). Everything is
        stop_gradient (the reference runs it all under @torch.no_grad)."""
        from ..ops import quant

        k_sample, k_rew, k_end = jax.random.split(rng, 3)
        act_buffer = st.act_buffer.at[:, -1].set(act)

        prev_obs = obs_to_float(st.obs_buffer)
        next_obs, _ = self.sampler.sample(d_vars, k_sample, prev_obs, act_buffer)
        next_obs = jax.lax.stop_gradient(next_obs)

        # rew/end here is stop-gradient inference: with tpu.int8_rollout and calibrated
        # r_vars (RewEndModel.calibrate), its encoder convs take the same static int8 MXU
        # path as the denoiser's (ops/quant.py). Training losses never pass through here.
        r_int8 = "quant" in r_vars  # structural gate, same as DiffusionSampler.sample
        with quant.int8_rollout_scope(r_int8):
            logits_rew, logits_end, (re_hx, re_cx) = self.rew_end_model.predict_rew_end(
                r_vars, prev_obs[:, -1:], act_buffer[:, -1:], next_obs[:, None],
                (st.re_hx, st.re_cx))
        logits_rew = jax.lax.stop_gradient(logits_rew[:, 0])
        logits_end = jax.lax.stop_gradient(logits_end[:, 0])
        rew = jax.random.categorical(k_rew, logits_rew).astype(jnp.float32) - 1.0
        end = jax.random.categorical(k_end, logits_end).astype(jnp.int32)

        ep_len = st.ep_len + 1
        trunc = (ep_len >= self.cfg.horizon).astype(jnp.int32)

        obs_buffer = jnp.concatenate(
            [st.obs_buffer[:, 1:], obs_to_uint8_device(next_obs)[:, None]], axis=1)
        act_buffer = jnp.concatenate([act_buffer[:, 1:], act_buffer[:, -1:]], axis=1)

        st = st.replace(obs_buffer=obs_buffer, act_buffer=act_buffer,
                        re_hx=jax.lax.stop_gradient(re_hx),
                        re_cx=jax.lax.stop_gradient(re_cx), ep_len=ep_len)
        return st, next_obs, rew, end, trunc

    def _reset_dead(self, st: ImagState, pool: ICPool, dead: jnp.ndarray
                    ) -> Tuple[ImagState, ICPool, jnp.ndarray]:
        """Masked pool pull for dead envs (reference world_model_env.py:56-62).
        Also returns the per-env pool indices (0 where alive) so callers can gather
        auxiliary pool columns (e.g. precomputed policy features)."""
        dead_i = dead.astype(jnp.int32)
        before = jnp.cumsum(dead_i) - dead_i  # exclusive prefix count of deaths
        idx = jnp.where(dead, (pool.ptr + before) % pool.size, 0)

        new_obs = jnp.take(pool.obs, idx, axis=0)  # uint8, same as the buffer
        new_act = jnp.take(pool.act, idx, axis=0)
        new_hx = jnp.take(pool.hx, idx, axis=0)
        new_cx = jnp.take(pool.cx, idx, axis=0)

        m4 = dead[:, None, None, None, None]
        m2 = dead[:, None]
        st = st.replace(
            obs_buffer=jnp.where(m4, new_obs, st.obs_buffer),
            act_buffer=jnp.where(m2, new_act, st.act_buffer),
            re_hx=jnp.where(m2, new_hx, st.re_hx),
            re_cx=jnp.where(m2, new_cx, st.re_cx),
            ep_len=jnp.where(dead, 0, st.ep_len),
        )
        pool = pool.replace(ptr=pool.ptr + dead_i.sum())
        return st, pool, idx

    # -- fused rollout for AC training ---------------------------------------

    def rollout(self, ac_vars: Variables, d_vars: Variables, r_vars: Variables,
                st: ImagState, pool: ICPool, rng: jax.Array, num_steps: int):
        """Roll ``num_steps`` of imagination with the policy in the loop; gradients flow to
        ``ac_vars`` only (reference call stack SURVEY.md section 3.4).

        Returns (trajectory dict of (B, T) arrays, new state, new pool).
        """
        ac = self.actor_critic

        # Rematerialize the policy conv trunk: without this, the scan saves the encoder
        # activations of all T steps as backward residuals — ~27 GB at full size (4x
        # inflated by TPU layout padding), which OOMs a 16 GB chip. Recomputing them in
        # the backward costs ~4% of the step (the policy is tiny next to 3 U-Net fwd).
        enc = jax.checkpoint(lambda v, obs: ac.encode(v, obs))
        head = ac.head

        # The policy trunk is evaluated in two batched calls per step instead of five
        # small ones (main / final-obs / 3x burn-in): the current frame's features are
        # CARRIED between steps (the main eval's input equals the previous step's
        # final obs, or the IC's last frame on reset — encode commutes with the per-env
        # where-select, so carrying features is value- and gradient-exact), and the
        # post-reset context frames are encoded time-folded-into-batch. Burn-in then
        # replays only the (cheap) LSTM steps (reference env_loop.py:50-56).
        n_cond = st.act_buffer.shape[1]

        def encode_context(obs_buffer):
            bb = obs_buffer.shape[0]
            flat = obs_to_float(obs_buffer.reshape((bb * n_cond,) + obs_buffer.shape[2:]))
            return enc(ac_vars, flat).reshape(bb, n_cond, -1)

        feat0 = enc(ac_vars, obs_to_float(st.obs_buffer[:, -1]))

        # Only the pool POINTER is carried through the scan; the pool arrays are
        # loop-invariant closures. Threading the full pool (hundreds of MB) through the
        # carry makes XLA double-buffer-copy it every step (~0.5 ms/step measured).
        def scan_step(carry, step_rng):
            st, ptr, feat_cur = carry
            pool_t = pool.replace(ptr=ptr)
            k_act, k_wm = jax.random.split(step_rng)

            # policy step WITH grad (reference env_loop.py:31-32)
            out = head(ac_vars, feat_cur, (st.ac_hx, st.ac_cx))
            act = jax.random.categorical(k_act, out.logits_act, axis=-1)

            # world-model step (no grad)
            st2, next_obs, rew, end, trunc, = self._wm_transition(d_vars, r_vars, st, act,
                                                                  k_wm)
            dead = (end + trunc) > 0

            # value of the final obs with the PRE-reset policy carry, no grad
            # (reference env_loop.py:46-48). The features feed next step's main eval
            # with grad; only the value head output is gradient-blocked, which matches
            # the reference (the duplicate encoder eval it replaces was all-no-grad and
            # contributed nothing).
            feat_next = enc(ac_vars, next_obs)
            val_final = jax.lax.stop_gradient(head(ac_vars, feat_next, out.carry).val)

            st2 = st2.replace(ac_hx=out.carry[0], ac_cx=out.carry[1])
            st2, pool_t, ic_idx = self._reset_dead(st2, pool_t, dead)

            # policy-LSTM reset + burn-in on the new context frames, WITH grad
            # (reference env_loop.py:50-56): one batched encode of the post-reset buffer,
            # LSTM replay over the first n_cond-1 frames from a zero state; computed for
            # all envs, applied to dead ones. With tpu.pool_policy_feats the features
            # were precomputed at pool build (see ICPool.feats) — a cheap gather replaces
            # the batched encode.
            if pool.feats is not None:
                feats_ic = jnp.take(pool.feats, ic_idx, axis=0)  # (B, n_cond, F)
            else:
                feats_ic = encode_context(st2.obs_buffer)  # (B, n_cond, F)

            def burn(carry, f_t):
                o = head(ac_vars, f_t, carry)
                return o.carry, None

            zeros = (jnp.zeros_like(st2.ac_hx), jnp.zeros_like(st2.ac_cx))
            (b_hx, b_cx), _ = jax.lax.scan(
                burn, zeros, jnp.moveaxis(feats_ic[:, :-1], 0, 1))
            m2 = dead[:, None]
            st2 = st2.replace(ac_hx=jnp.where(m2, b_hx, st2.ac_hx),
                              ac_cx=jnp.where(m2, b_cx, st2.ac_cx))
            feat_carry = jnp.where(m2, feats_ic[:, -1], feat_next)

            ys = dict(act=act, rew=rew, end=end, trunc=trunc, logits_act=out.logits_act,
                      val=out.val, val_final=val_final, dead=dead)
            return (st2, pool_t.ptr, feat_carry), ys

        step_rngs = jax.random.split(rng, num_steps)
        (st, ptr, feat_last), traj = jax.lax.scan(scan_step, (st, pool.ptr, feat0),
                                                  step_rngs)
        pool = pool.replace(ptr=ptr)
        # scan stacks along axis 0 (time); transpose to (B, T)
        traj = jax.tree_util.tree_map(lambda x: jnp.swapaxes(x, 0, 1), traj)

        # bootstrap values: next step's value, except the final-obs value where the env died
        # (reference env_loop.py:39-43, 64-70)
        val_extra = jax.lax.stop_gradient(
            head(ac_vars, feat_last, (st.ac_hx, st.ac_cx)).val)
        val_next = jnp.concatenate(
            [jax.lax.stop_gradient(traj["val"][:, 1:]), val_extra[:, None]], axis=1)
        traj["val_bootstrap"] = jnp.where(traj["dead"], traj["val_final"], val_next)
        return traj, st, pool

    # -- initial state --------------------------------------------------------

    def initial_state(self, pool: ICPool, batch_size: int) -> Tuple[ImagState, ICPool]:
        """Fill all envs from the pool (reference world_model_env.py:45-53: env.reset) with
        zero policy LSTM state (reference env_loop.py:18-19: no initial burn-in)."""
        d = self.actor_critic.cfg.lstm_dim
        idx = (pool.ptr + jnp.arange(batch_size)) % pool.size
        st = ImagState(
            obs_buffer=jnp.take(pool.obs, idx, axis=0),  # uint8 end-to-end
            act_buffer=jnp.take(pool.act, idx, axis=0),
            re_hx=jnp.take(pool.hx, idx, axis=0),
            re_cx=jnp.take(pool.cx, idx, axis=0),
            ac_hx=jnp.zeros((batch_size, d), jnp.float32),
            ac_cx=jnp.zeros((batch_size, d), jnp.float32),
            ep_len=jnp.zeros((batch_size,), jnp.int32),
        )
        return st, pool.replace(ptr=pool.ptr + batch_size)


class PoolManager:
    """Host-side refill of the device IC pool from the episode dataset (replaces the
    reference's generator_init DataLoader preloading, world_model_env.py:107-139).

    Double-buffered: after handing out a pool, a daemon thread immediately starts
    assembling the NEXT one (disk sampling + stacking + chunked device burn-in), so by
    the time the current pool is consumed the swap is free — the reference amortizes the
    same cost with its preloading generator. ``last_refill_wait_s`` records any residual
    synchronous wait (0 when the background build won the race)."""

    def __init__(self, engine: ImaginationEngine, dataset, sampler, pool_size: int,
                 chunk: int = 1024, background: bool = True, store=None,
                 policy_feats: bool = False) -> None:
        self.engine = engine
        self.dataset = dataset
        self.sampler = sampler  # BatchSampler with batch_size == chunk, seq_length == n_cond
        self.pool_size = pool_size
        self.chunk = chunk
        self.background = background
        self.store = store  # DeviceEpisodeStore: device-side gather instead of host staging
        self.policy_feats = policy_feats  # precompute ICPool.feats (tpu.pool_policy_feats)
        self.last_refill_wait_s = 0.0
        self._prepare = make_ic_preparer(engine.rew_end_model)
        self._encode_feats = jax.jit(self._feats_fn)
        self._pending: Optional[threading.Thread] = None
        self._next_pool: Optional[ICPool] = None
        self._pending_error: Optional[BaseException] = None

    def _feats_fn(self, ac_vars: Variables, obs_u8: jnp.ndarray) -> jnp.ndarray:
        return encode_pool_feats(self.engine.actor_critic, ac_vars, obs_u8)

    def build_pool(self, r_vars: Variables, ac_vars: Optional[Variables] = None) -> ICPool:
        """Synchronous full build (burn-in uses the given reward/end weights; with
        policy_feats also the given policy weights — captured at build time, exactly like
        the reference's preloading generator captures its models)."""
        obs_list, act_list, hx_list, cx_list, f_list = [], [], [], [], []
        remaining = self.pool_size
        while remaining > 0:
            n = min(self.chunk, remaining)
            ids = self.sampler.sample()[:n]
            if self.store is not None:
                obs, act = self.store.gather_ic(ids)  # device gather, no H2D staging
            else:
                segs = [self.dataset[sid] for sid in ids]
                obs = jnp.asarray(np.stack([s.obs for s in segs]))
                act = jnp.asarray(np.stack([s.act for s in segs]).astype(np.int32))
            hx, cx = self._prepare(r_vars, obs, act)
            obs_list.append(obs)
            act_list.append(act)
            hx_list.append(hx)
            cx_list.append(cx)
            if self.policy_feats:
                assert ac_vars is not None, "policy_feats build needs actor-critic weights"
                f_list.append(self._encode_feats(ac_vars, obs))
            remaining -= n
        return ICPool(
            obs=jnp.concatenate(obs_list),
            act=jnp.concatenate(act_list),
            hx=jnp.concatenate(hx_list),
            cx=jnp.concatenate(cx_list),
            ptr=jnp.asarray(0, jnp.int32),
            feats=jnp.concatenate(f_list) if f_list else None,
        )

    def _kick(self, r_vars: Variables, ac_vars: Optional[Variables] = None) -> None:
        """Start building the next pool in the background (weights captured now, exactly
        like the reference preloading at reset time)."""
        if not self.background:
            return

        # SNAPSHOT the weights (device-side copy) before handing them to the thread: the
        # caller's very next dispatch is a train step that DONATES these exact param
        # buffers (training.py donate_argnums), and a background dispatch against a
        # donated array is a use-after-free — "Array has been deleted" on strict
        # backends, or a poisoned read over the tunnel PJRT (the INVALID_ARGUMENT crash
        # at an AC pool-refill boundary in /root/runs_r3/seed1). The synchronous
        # build_pool path needs no copy: its dispatches all precede the donating call.
        r_vars = jax.tree_util.tree_map(jnp.copy, r_vars)
        if ac_vars is not None:
            ac_vars = jax.tree_util.tree_map(jnp.copy, ac_vars)

        def work() -> None:
            try:
                self._next_pool = self.build_pool(r_vars, ac_vars)
            except BaseException as e:  # surfaced on the next ensure(); never swallowed
                self._pending_error = e

        self._pending = threading.Thread(target=work, daemon=True,
                                         name="diamond-pool-builder")
        self._pending.start()

    def wait_pending(self) -> None:
        """Block until any background build finishes — call before mutating the dataset
        the sampler reads (episode appends during collection race the build thread)."""
        if self._pending is not None:
            self._pending.join()
            if self._pending_error is not None:
                e, self._pending_error = self._pending_error, None
                self._pending, self._next_pool = None, None
                raise RuntimeError("background IC-pool build failed") from e

    def ensure(self, pool: Optional[ICPool], r_vars: Variables, max_consumption: int,
               ac_vars: Optional[Variables] = None) -> Tuple[Optional[ICPool], bool]:
        """Return (pool, swapped): a pool with enough unconsumed entries for one step."""
        if pool is None:
            pool = self.build_pool(r_vars, ac_vars)
            self._kick(r_vars, ac_vars)
            return pool, True
        if not self.needs_refill(pool, max_consumption):
            return pool, False
        t0 = time.perf_counter()
        if self._pending is not None:
            self.wait_pending()
            pool = self._next_pool
            self._pending, self._next_pool = None, None
            if pool is None:  # no background mode or a cleared failure: rebuild inline
                pool = self.build_pool(r_vars, ac_vars)
        else:
            pool = self.build_pool(r_vars, ac_vars)
        self.last_refill_wait_s = time.perf_counter() - t0
        self._kick(r_vars, ac_vars)
        return pool, True

    def needs_refill(self, pool: ICPool, max_consumption: int) -> bool:
        return int(pool.ptr) + max_consumption > pool.size
