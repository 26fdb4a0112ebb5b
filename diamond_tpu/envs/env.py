"""Real-env construction + the host-side vector-env contract.

TPU-native counterpart of reference src/envs/env.py. The reference's TorchEnv converts frames
to float device tensors per step (env.py:66-93); here the env boundary stays numpy uint8 —
the jitted policy step consumes uint8 and normalizes on device, so each env step ships 4x
fewer bytes across the host/device boundary.

Vector-env contract (shared by FakeEnv / NumpyEnv):
  reset(seed)        -> obs uint8 (B, H, W, C), info
  step(actions (B,)) -> obs, rew float32 (B,), end bool (B,), trunc bool (B,), info
  info['final_observation'] is a uint8 (num_dead, H, W, C) stack when any env died; obs for
  dead envs is already the autoreset frame (same-step autoreset, matching the reference's
  gymnasium 0.29 semantics).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from .fake_env import FakeEnv


def make_env(id: str, num_envs: int, done_on_life_loss: bool, size: int,
             max_episode_steps: Optional[int]):
    """Dispatch on env id: 'Fake-v0' -> synthetic env, else ALE Atari
    (reference only supports Atari, src/envs/env.py:14-48)."""
    if id == "Fake-v0":
        return FakeEnv(num_envs, size=size, max_episode_steps=max_episode_steps)
    return make_atari_env(id=id, num_envs=num_envs, done_on_life_loss=done_on_life_loss,
                          size=size, max_episode_steps=max_episode_steps)


def make_atari_env(id: str, num_envs: int, done_on_life_loss: bool, size: int,
                   max_episode_steps: Optional[int]) -> "NumpyEnv":
    """reference: src/envs/env.py:14-48. Real ALE ids require ale-py (not bundled in this
    image); 'FakeALE*' ids run the identical stack against the scripted ALE double
    (envs/fake_ale.py)."""
    try:
        import gymnasium
        from gymnasium.vector import AsyncVectorEnv, AutoresetMode
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "Atari environments need gymnasium; use env id 'Fake-v0' for the synthetic "
            "env.") from e

    is_fake_ale = id.startswith("FakeALE")
    if not is_fake_ale:
        try:
            import ale_py  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "Real Atari environments need ale-py; use env id 'Fake-v0' (synthetic) or "
                "'FakeALENoFrameskip-v4' (scripted ALE double).") from e

    from .atari_preprocessing import AtariPreprocessing

    def env_fn():
        if is_fake_ale:  # (re-)register in this process — env_fn may run in a worker
            from .fake_ale import register_fake_ale
            register_fake_ale()
        env = gymnasium.make(id, full_action_space=False, frameskip=1,
                             render_mode="rgb_array", max_episode_steps=max_episode_steps)
        return AtariPreprocessing(env=env, noop_max=30, frame_skip=4, screen_size=size)

    # SAME_STEP autoreset restores the reference's gymnasium-0.29 semantics
    # (final observation surfaced in info, reset obs returned in the same step).
    env = AsyncVectorEnv([env_fn for _ in range(num_envs)],
                         autoreset_mode=AutoresetMode.SAME_STEP)
    return NumpyEnv(env, done_on_life_loss=done_on_life_loss)


class NumpyEnv:
    """Adapter from a gymnasium vector env to the numpy contract above, including the
    life-loss-as-done conversion applied *after* vectorization so autoreset doesn't hide
    later lives (reference src/envs/env.py:40-63)."""

    def __init__(self, venv: Any, done_on_life_loss: bool = False) -> None:
        self._venv = venv
        self._done_on_life_loss = done_on_life_loss
        self.num_envs = venv.observation_space.shape[0]
        self.num_actions = int(venv.unwrapped.single_action_space.n)

    def reset(self, seed: Optional[Any] = None) -> Tuple[np.ndarray, Dict[str, Any]]:
        obs, info = self._venv.reset(seed=seed)
        return np.asarray(obs, np.uint8), info

    def step(self, actions: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                                 np.ndarray, Dict[str, Any]]:
        obs, rew, end, trunc, info = self._venv.step(np.asarray(actions))
        obs = np.asarray(obs, np.uint8)
        rew = np.asarray(rew, np.float32)
        end = np.asarray(end, bool)
        trunc = np.asarray(trunc, bool)

        final_key = "final_obs" if "final_obs" in info else "final_observation"
        if self._done_on_life_loss:
            life_loss = np.asarray(info.get("life_loss", np.zeros(self.num_envs, bool)))
            if life_loss.any():
                # life loss becomes end=True; the current obs is the final one
                # (reference env.py:51-63)
                end = end | life_loss
                info.setdefault(final_key, np.array([None] * self.num_envs, dtype=object))
                finals = np.asarray(info[final_key], dtype=object)
                for i in np.nonzero(life_loss)[0]:
                    if finals[i] is None:
                        finals[i] = obs[i]
                info[final_key] = finals

        out_info: Dict[str, Any] = {k: v for k, v in info.items()
                                    if k not in (final_key, "final_info", "_final_obs")}
        dead = end | trunc
        if dead.any():
            finals = np.asarray(info[final_key], dtype=object)[dead]
            out_info["final_observation"] = np.stack(
                [np.asarray(f, np.uint8) for f in finals])
        return obs, rew, end, trunc, out_info
