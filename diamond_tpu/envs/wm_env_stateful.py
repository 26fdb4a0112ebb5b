"""Stateful world-model env with the reference's reset/step API, for the play app and
model-based evaluation (reference src/envs/world_model_env.py:25-105).

Built on the same jitted transition as the fused training rollout
(envs/world_model_env.py); the host only orchestrates resets and the IC queue. Frames cross
the boundary as uint8 (the denoiser output is exactly on the uint8 grid).

Matched semantics:
  * rolling buffers of the last n_cond frames/actions; reward/end sampled from the predicted
    categorical logits (reference world_model_env.py:96-105),
  * horizon truncation (world_model_env.py:71-72),
  * on death: refill from preloaded real initial conditions with burned-in reward/end LSTM
    state, reporting ``final_observation`` and ``burnin_obs`` (world_model_env.py:84-87),
  * optional ``denoising_trajectory`` in info (world_model_env.py:79-81).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.episode import obs_to_float, obs_to_uint8
from .world_model_env import ICPool, ImagState, ImaginationEngine

ICProvider = Callable[[int], Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]


class WorldModelEnv:
    """num_envs fixed at construction; obs in/out are uint8 numpy (B, H, W, C).

    Two-stage mode (``upsampler`` set): the dynamics run at low resolution
    (dataset resolution / upsampling_factor) and every displayed frame is super-resolved by
    the upsampler's EDM sampling loop (csgo-branch capability; models/diffusion_sampler.py
    TwoStageSampler). IC frames arrive at dataset (full) resolution and are area-downsampled
    into the low-res buffers; the full-res originals are kept for display."""

    def __init__(self, engine: ImaginationEngine, d_vars_getter: Callable[[], Any],
                 r_vars_getter: Callable[[], Any], ic_provider: ICProvider, num_envs: int,
                 seed: int = 0, return_denoising_trajectory: bool = False,
                 upsampler: Optional[Any] = None,
                 u_vars_getter: Optional[Callable[[], Any]] = None,
                 upsampler_sampler_cfg: Optional[Any] = None) -> None:
        self.engine = engine
        self.num_envs = num_envs
        self.horizon = engine.cfg.horizon
        self._d_vars = d_vars_getter
        self._r_vars = r_vars_getter
        self._ic_provider = ic_provider
        self._rng = jax.random.PRNGKey(seed)
        self._return_traj = return_denoising_trajectory
        self._st: Optional[ImagState] = None

        self._factor = 1
        if upsampler is not None:
            from ..models.diffusion_sampler import TwoStageSampler

            cascade = TwoStageSampler(engine.sampler, upsampler,
                                      upsampler_sampler_cfg or engine.sampler.cfg)
            self._factor = cascade.factor
            self._u_vars = u_vars_getter
            self._upsample = jax.jit(cascade.upsample)
            self._display_obs: Optional[np.ndarray] = None  # (B, H, W, C) uint8 full-res

        def step_fn(d_vars, r_vars, st: ImagState, act, rng):
            st2, next_obs, rew, end, trunc = engine._wm_transition(d_vars, r_vars, st, act,
                                                                   rng)
            out = dict(next_obs=next_obs, rew=rew, end=end, trunc=trunc)
            return st2, out

        def step_fn_traj(d_vars, r_vars, st: ImagState, act, rng):
            # re-run the sampler with the SAME key as the transition to capture the
            # denoising latents (XLA CSEs the duplicate work)
            k_sample = jax.random.split(rng, 3)[0]
            act_buffer = st.act_buffer.at[:, -1].set(act)
            _, traj = engine.sampler.sample(d_vars, k_sample, obs_to_float(st.obs_buffer),
                                            act_buffer, return_trajectory=True)
            st2, out = step_fn(d_vars, r_vars, st, act, rng)
            out["denoising_trajectory"] = jnp.stack(traj, axis=1)
            return st2, out

        self._step = jax.jit(step_fn_traj if return_denoising_trajectory else step_fn)

    @property
    def num_actions(self) -> int:
        return self.engine.actor_critic.cfg.num_actions if \
            self.engine.actor_critic is not None else 0

    def _next_key(self) -> jax.Array:
        self._rng, k = jax.random.split(self._rng)
        return k

    def _fetch_ics(self, n: int):
        obs_u8, act, hx, cx = self._ic_provider(n)
        return (jnp.asarray(obs_u8), jnp.asarray(act, jnp.int32), jnp.asarray(hx),
                jnp.asarray(cx))

    def _to_buffer_res(self, obs_float: jnp.ndarray) -> jnp.ndarray:
        """Dataset-resolution frames -> dynamics-model resolution (two-stage mode)."""
        if self._factor == 1:
            return obs_float
        from ..models.denoiser import downsample_avg, quantize_to_uint8_grid

        return quantize_to_uint8_grid(downsample_avg(obs_float, self._factor))

    def _ics_to_buffer(self, obs_u8: jnp.ndarray) -> jnp.ndarray:
        """uint8 IC frames -> the uint8 imagination buffer (downsampled in two-stage
        mode; the grid quantization makes the uint8 round-trip lossless). Stays on
        device: a host round-trip here would leak host staging per H2D byte on the
        tunneled platform (CLAUDE.md)."""
        if self._factor == 1:
            return obs_u8
        from ..data.episode import obs_to_uint8_device

        return obs_to_uint8_device(self._to_buffer_res(obs_to_float(obs_u8)))

    def reset(self, seed: Optional[Any] = None, **kwargs) -> Tuple[np.ndarray, Dict]:
        if seed is not None:
            s = int(np.sum(seed)) if isinstance(seed, (list, tuple, np.ndarray)) else int(seed)
            self._rng = jax.random.PRNGKey(s)
        obs, act, hx, cx = self._fetch_ics(self.num_envs)
        b, d = self.num_envs, hx.shape[-1]
        self._st = ImagState(
            obs_buffer=self._ics_to_buffer(obs), act_buffer=act, re_hx=hx,
            re_cx=cx, ac_hx=jnp.zeros((b, d)), ac_cx=jnp.zeros((b, d)),
            ep_len=jnp.zeros((b,), jnp.int32))
        if self._factor > 1:  # display the full-res originals of the ICs
            self._display_obs = np.asarray(obs[:, -1]).copy()
            return self._display_obs.copy(), {}
        return np.asarray(self._st.obs_buffer[:, -1]), {}

    def step(self, act: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray,
                                             Dict[str, Any]]:
        assert self._st is not None, "reset() first"
        act = jnp.asarray(act, jnp.int32)
        self._st, out = self._step(self._d_vars(), self._r_vars(), self._st, act,
                                   self._next_key())

        # dispatch the upsampler on the DEVICE-resident low-res frame before any host
        # materialization: both device computations queue back-to-back and the fetches
        # below overlap with the upsampler's execution — on tunneled platforms the old
        # fetch->dispatch->fetch order serialized an extra ~25 ms round trip per frame
        # (key order unchanged: step key, then upsample key)
        high_dev = (self._upsample(self._u_vars(), self._next_key(), out["next_obs"])
                    if self._factor > 1 else None)

        next_obs = np.asarray(out["next_obs"])
        rew = np.asarray(out["rew"], np.float32)
        end = np.asarray(out["end"]).astype(bool)
        trunc = np.asarray(out["trunc"]).astype(bool)
        dead = end | trunc

        info: Dict[str, Any] = {}
        if self._return_traj:
            info["denoising_trajectory"] = np.asarray(out["denoising_trajectory"])

        if self._factor > 1:  # super-resolve the new low-res frame for display
            high = obs_to_uint8(np.asarray(high_dev))
            self._display_obs = high.copy()
            info["low_res_obs"] = obs_to_uint8(next_obs)
            final_obs_pool = high
        else:
            final_obs_pool = obs_to_uint8(next_obs)

        if dead.any():
            info["final_observation"] = final_obs_pool[dead]
            n = int(dead.sum())
            obs_ic, act_ic, hx_ic, cx_ic = self._fetch_ics(n)
            idx = jnp.asarray(np.nonzero(dead)[0])
            self._st = self._st.replace(
                obs_buffer=self._st.obs_buffer.at[idx].set(self._ics_to_buffer(obs_ic)),
                act_buffer=self._st.act_buffer.at[idx].set(act_ic),
                re_hx=self._st.re_hx.at[idx].set(hx_ic),
                re_cx=self._st.re_cx.at[idx].set(cx_ic),
                ep_len=self._st.ep_len.at[idx].set(0))
            info["burnin_obs"] = np.asarray(self._st.obs_buffer)[dead][:, :-1]
            if self._factor > 1:  # display the full-res originals of the fresh ICs
                self._display_obs[dead] = np.asarray(obs_ic)[:, -1]

        if self._factor > 1:
            return self._display_obs.copy(), rew, end, trunc, info
        obs = np.asarray(self._st.obs_buffer[:, -1])
        return obs, rew, end, trunc, info


def make_dataset_ic_provider(dataset, sampler, rew_end_model, r_vars_getter,
                             downsample_factor: int = 1) -> ICProvider:
    """IC provider backed by real episodes: sample conditioning segments + burn in the
    reward/end LSTM (the play-mode analogue of reference world_model_env.py:107-139).

    ``downsample_factor`` > 1 (two-stage mode): the reward/end model lives at the dynamics
    model's low resolution, so burn-in runs on the area-downsampled frames; the returned
    obs stay at dataset (full) resolution — the env downsamples its own buffers and keeps
    the originals for display."""
    from .world_model_env import make_ic_preparer

    prepare = make_ic_preparer(rew_end_model)

    @jax.jit
    def to_low(obs_u8):
        from ..models.denoiser import downsample_avg, quantize_to_uint8_grid

        # same floor-grid convention as _to_buffer_res / the sampled WM outputs, so the
        # burn-in sees exactly the pixels the env buffers will carry
        low = quantize_to_uint8_grid(downsample_avg(obs_to_float(obs_u8),
                                                    downsample_factor))
        return ((low + 1.0) * 127.5).round().astype(jnp.uint8)

    def provider(n: int):
        ids = []
        while len(ids) < n:
            ids.extend(sampler.sample())
        segs = [dataset[sid] for sid in ids[:n]]
        obs = np.stack([s.obs for s in segs])
        act = np.stack([s.act for s in segs]).astype(np.int32)
        burn_obs = jnp.asarray(obs) if downsample_factor == 1 else to_low(jnp.asarray(obs))
        hx, cx = prepare(r_vars_getter(), burn_obs, jnp.asarray(act))
        return obs, act, np.asarray(hx), np.asarray(cx)

    return provider
