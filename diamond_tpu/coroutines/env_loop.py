"""Single rollout loop over a host-side env, driving a jitted policy step.

TPU-native counterpart of reference src/coroutines/env_loop.py (used for real-env collection
and model-free training; imagination training uses the fused on-device scan in
envs/world_model_env.py instead).

Matched semantics (reference env_loop.py:24-74):
  * LSTM state carried across sends (functionally detached: it re-enters jit as data),
  * epsilon-greedy mixing (whole-batch flip by default, matching the reference
    env_loop.py:34-35; per-env mixing via ``epsilon_per_env=True``),
  * on death: value of ``final_observation`` computed with the PRE-reset LSTM state and
    patched into the previous step's bootstrap (env_loop.py:39-43, 64-70), state zeroed via a
    reset gate (env_loop.py:50-52), and re-burned-in on ``burnin_obs`` for world-model resets
    (env_loop.py:53-56),
  * a final no-state-update value call provides the last bootstrap (env_loop.py:64-66).

Device work per step is exactly two jitted calls (policy step + optional final-obs value);
frames cross the boundary as uint8.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.episode import obs_to_float
from ..models.actor_critic import ActorCritic


class EnvLoop:
    def __init__(self, env: Any, actor_critic: ActorCritic,
                 get_variables: Callable[[], Any], epsilon: float = 0.0,
                 seed: Optional[int] = None, epsilon_per_env: bool = False) -> None:
        self.env = env
        self.ac = actor_critic
        self.get_variables = get_variables
        self.epsilon = float(epsilon)
        self.epsilon_per_env = bool(epsilon_per_env)
        self._rng = np.random.default_rng(seed)
        self._base_key = jax.random.PRNGKey(
            seed if seed is not None else int(self._rng.integers(0, 2 ** 31 - 1)))
        self._step_count = 0                       # host mirror (debug/inspection only)
        self._step_dev = jnp.asarray(0, jnp.int32)  # device-carried: no per-step upload
        self._epsilon_dev = jnp.asarray(self.epsilon, jnp.float32)  # staged once
        self._state: Optional[Tuple] = None

        num_actions = env.num_actions

        def _policy_core(variables, obs_u8, hx, cx, reset_mask, key, step, epsilon):
            # zero LSTM state of envs that died last step (reference env_loop.py:50-52)
            gate = 1.0 - reset_mask.astype(jnp.float32)[:, None]
            hx, cx = hx * gate, cx * gate
            out = self.ac.predict_act_value(variables, obs_to_float(obs_u8), (hx, cx))
            k1, k2, k3 = jax.random.split(jax.random.fold_in(key, step), 3)
            act = jax.random.categorical(k1, out.logits_act, axis=-1)
            rand_act = jax.random.randint(k2, act.shape, 0, num_actions)
            # epsilon-greedy: the reference flips the WHOLE batch with one draw
            # (reference env_loop.py:34-35); per-env mixing is available as an opt-in
            explore_shape = act.shape if self.epsilon_per_env else ()
            explore = jax.random.uniform(k3, explore_shape) < epsilon
            act = jnp.where(explore, rand_act, act)
            return act, out.logits_act, out.val, out.carry[0], out.carry[1]

        policy_step = jax.jit(_policy_core)

        @jax.jit
        def policy_step_packed(variables, packed, hx, cx, key, step, epsilon):
            # Tunnel-RPC-lean variant used by ``send``: every host→device transfer is a
            # full round trip (~25 ms) on tunneled platforms, so the fresh env obs and the
            # per-env reset mask cross in ONE packed uint8 upload, and the step counter /
            # epsilon live on device (carried / staged) instead of re-uploading python
            # scalars each call. Math identical to ``_policy_core``.
            b = packed.shape[0]
            obs_u8 = packed[:, :-1].reshape((b,) + self._obs_shape)
            reset_mask = packed[:, -1].astype(bool)
            outs = _policy_core(variables, obs_u8, hx, cx, reset_mask, key, step, epsilon)
            return outs + (step + 1,)

        @jax.jit
        def value_only(variables, obs_u8, hx, cx):
            # value estimate WITHOUT updating the state (reference env_loop.py:41,64-66)
            out = self.ac.predict_act_value(variables, obs_to_float(obs_u8), (hx, cx))
            return out.val

        @jax.jit
        def burnin_steps(variables, burnin_obs_u8, hx, cx):
            # replay the conditioning frames through the policy net (reference
            # env_loop.py:53-56); burnin_obs (B, K, H, W, C)
            def step(carry, obs):
                out = self.ac.predict_act_value(variables, obs_to_float(obs), carry)
                return out.carry, None

            (hx, cx), _ = jax.lax.scan(step, (hx, cx),
                                       jnp.moveaxis(burnin_obs_u8, 0, 1))
            return hx, cx

        self._policy_step = policy_step
        self._policy_step_packed = policy_step_packed
        self._value_only = value_only
        self._burnin_steps = burnin_steps
        self._obs_shape: Optional[Tuple[int, ...]] = None

    def reset(self) -> None:
        """(Re)start the loop: env reset with per-env seeds, zero LSTM state
        (reference env_loop.py:18-22)."""
        b = self.env.num_envs
        d = self.ac.cfg.lstm_dim
        seed = int(self._rng.integers(0, 2 ** 31 - 1))
        obs, _ = self.env.reset(seed=[seed + i for i in range(b)])
        hx = jnp.zeros((b, d), jnp.float32)
        cx = jnp.zeros((b, d), jnp.float32)
        self._obs_shape = tuple(obs.shape[1:])
        self._state = (obs, hx, cx, np.zeros(b, bool))

    def send(self, num_steps: int, need_values: bool = True) -> Tuple:
        """Step the env ``num_steps`` times; returns stacked (B, T, ...) numpy arrays
        (obs, act, rew, end, trunc, logits_act, val, val_bootstrap) + list of infos.

        ``need_values=False`` skips everything only a TRAINER consumes — the
        ``value_only`` bootstrap calls and the logits/value stacking+materialization
        (each a full round trip on tunneled platforms) — and returns ``None`` for the
        logits/val/bootstrap slots. Collection discards those slots (the reference
        collector equally ignores them, src/coroutines/collector.py:54-77), and with
        ``send(1)`` per collect step the tail calls dominate: measured on the v5e
        tunnel, collection is ~250 ms/step with values vs ~3 dispatch round trips
        without (VALIDATION.md round 4)."""
        if self._state is None:
            self.reset()
        variables = self.get_variables()
        obs, hx, cx, prev_dead = self._state

        steps: List[List[Any]] = []
        infos: List[Dict[str, Any]] = []
        # extras for gradient-replay training (model-free path): initial LSTM state and the
        # per-step reset gates, enough to recompute the policy forward bit-for-bit.
        # hx/cx stay DEVICE arrays (consumers jnp.asarray them anyway) — np.asarray here
        # was two blocking ~25 ms D2H fetches on every send(1) on tunneled platforms,
        # paid even by collection, which never reads extras (round-5 profile).
        extras = {"hx0": hx, "cx0": cx, "reset_mask": []}

        # Per-step device outputs (logits/values) stay ON DEVICE until the end of the send:
        # only the action must cross the boundary each step (every extra fetch is a full
        # round trip on tunneled platforms). Bootstraps are assembled from the stacked
        # device arrays in one pass.
        b = self.env.num_envs
        zeros_b = jnp.zeros((b,), jnp.float32)
        steps_host: List[List[Any]] = []     # obs, act, rew, end, trunc (host)
        dev_logits: List[Any] = []
        dev_vals: List[Any] = []
        dev_val_finals: List[Any] = []       # value of final obs (or zeros when no death)
        dead_masks: List[np.ndarray] = []

        for _ in range(num_steps):
            extras["reset_mask"].append(np.asarray(prev_dead))
            if isinstance(obs, np.ndarray) and obs.dtype == np.uint8:
                # host env: one fused uint8 upload (obs + reset mask), device-carried
                # step counter, staged epsilon — 1 H2D RPC/step instead of 4
                packed = np.concatenate(
                    [obs.reshape(b, -1), np.asarray(prev_dead, np.uint8)[:, None]],
                    axis=1)
                act, logits, val, hx, cx, self._step_dev = self._policy_step_packed(
                    variables, packed, hx, cx, self._base_key, self._step_dev,
                    self._epsilon_dev)
            else:
                # device-resident obs (EnvLoop over a WorldModelEnv): no upload to fuse;
                # an EnvLoop's obs type is fixed by its env, so the two step counters
                # never interleave within one loop
                act, logits, val, hx, cx = self._policy_step(
                    variables, obs, hx, cx, jnp.asarray(prev_dead), self._base_key,
                    self._step_count, self.epsilon)
            self._step_count += 1
            act_np = np.asarray(act)  # the one mandatory device fetch per step

            next_obs, rew, end, trunc, info = self.env.step(act_np)
            dead = np.asarray(end) | np.asarray(trunc)

            val_final = zeros_b
            if dead.any():
                if need_values:
                    # value of the true final obs with the PRE-reset state
                    # (reference env_loop.py:46-48)
                    final_full = np.array(next_obs, copy=True)
                    final_full[dead] = info["final_observation"]
                    val_final = self._value_only(variables, final_full, hx, cx)
                if "burnin_obs" in info:
                    # world-model resets: re-burn-in the policy LSTM on the new context
                    gate = jnp.asarray(~dead, jnp.float32)[:, None]
                    bh, bc = self._burnin_steps(variables, jnp.asarray(info["burnin_obs"]),
                                                hx * gate, cx * gate)
                    mask = jnp.asarray(dead)[:, None]
                    hx = jnp.where(mask, bh, hx)
                    cx = jnp.where(mask, bc, cx)

            steps_host.append([obs, act_np, np.asarray(rew), np.asarray(end, np.uint8),
                               np.asarray(trunc, np.uint8)])
            if need_values:  # collection (need_values=False) never reads these buffers
                dev_logits.append(logits)
                dev_vals.append(val)
                dev_val_finals.append(val_final)
            dead_masks.append(dead)
            infos.append(info)
            obs = next_obs
            prev_dead = dead

        if need_values:
            # bootstraps: next step's value, except the final-obs value where the env died
            # (reference env_loop.py:39-43, 64-70); last step uses a no-state-update value
            # call
            val_extra = self._value_only(variables, obs, hx, cx)
            vals_j = jnp.stack(dev_vals, axis=1)                 # (B, T)
            val_next = jnp.concatenate([vals_j[:, 1:], val_extra[:, None]], axis=1)
            finals_j = jnp.stack(dev_val_finals, axis=1)
            dead_j = jnp.asarray(np.stack(dead_masks, axis=1))
            boot_j = jnp.where(dead_j, finals_j, val_next)
            logits_j = jnp.stack(dev_logits, axis=1)             # (B, T, A)

            # one materialization pass for everything device-side
            val_np, boot_np, logits_np = (np.asarray(x)
                                          for x in (vals_j, boot_j, logits_j))
        else:
            val_np = boot_np = logits_np = None

        self._state = (obs, hx, cx, prev_dead)
        extras["reset_mask"] = np.stack(extras["reset_mask"], axis=1)  # (B, T)
        self.last_extras = extras
        obs_s, act_s, rew_s, end_s, trunc_s = (np.stack(x, axis=1)
                                               for x in zip(*steps_host))
        return (obs_s, act_s, rew_s, end_s, trunc_s, logits_np, val_np, boot_np, infos)
