"""Mode-switching facade over [world-model, real-test, real-train] envs for the play app.

TPU-native counterpart of reference src/game/play_env.py: human vs policy control ('m'),
world-model horizon +/- (up/down), env cycling (left/right page keys), header info, and a
recording mode that writes played episodes into ``dataset/rec_<env>_<H|P>`` datasets
(reference play_env.py:98-165).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data import Dataset, Episode
from ..data.episode import obs_to_float
from .keymap import get_keymap_and_action_names


class NamedEnv:
    def __init__(self, name: str, env: Any) -> None:
        self.name, self.env = name, env


class PlayEnv:
    def __init__(self, agent: Any, envs: List[NamedEnv], keymap_name: str, fps: int,
                 record_mode: bool = False, record_dir: Optional[Path] = None,
                 seed: int = 0) -> None:
        self.agent = agent
        self.envs = envs
        self.env_idx = 0
        self.keymap_name = keymap_name
        self.fps = fps
        self.human = True
        self.record_mode = record_mode
        self.record_dir = Path(record_dir) if record_dir else Path("dataset")
        self._rec_buffer: List[Tuple] = []
        self._rec_datasets: Dict[str, Dataset] = {}
        self._rng = jax.random.PRNGKey(seed)
        self._carry = None
        self._last_info: Dict[str, Any] = {}
        self._episode_return = 0.0
        self._episode_len = 0

        ac = agent.actor_critic
        # two-stage agents: the policy lives at the dynamics (low) resolution while the
        # displayed frames are full-res — downsample its input accordingly
        factor = agent.cfg.upsampler.upsampling_factor \
            if getattr(agent, "upsampler", None) is not None else 1

        @jax.jit
        def policy_step(variables, obs_u8, carry, key):
            obs = obs_to_float(jnp.asarray(obs_u8))
            if factor > 1:
                from ..models.denoiser import downsample_avg, quantize_to_uint8_grid

                obs = quantize_to_uint8_grid(downsample_avg(obs, factor))
            out = ac.predict_act_value(variables, obs, carry)
            act = jax.random.categorical(key, out.logits_act, axis=-1)
            return act, out.carry

        self._policy_step = policy_step

    # -- facade API used by Game ----------------------------------------------

    @property
    def env(self) -> Any:
        return self.envs[self.env_idx].env

    @property
    def env_name(self) -> str:
        return self.envs[self.env_idx].name

    def keymap_and_names(self):
        return get_keymap_and_action_names(self.keymap_name)

    def reset(self):
        obs, info = self.env.reset()
        self._carry = self.agent.actor_critic.initial_carry(1)
        self._episode_return, self._episode_len = 0.0, 0
        self._rec_buffer = []
        self._obs = obs
        return obs[0], info

    def step(self, human_act: int):
        if self.human:
            act = np.asarray([human_act])
        else:
            self._rng, k = jax.random.split(self._rng)
            a, self._carry = self._policy_step(self.agent.variables["actor_critic"],
                                               self._obs, self._carry, k)
            act = np.asarray(a)

        next_obs, rew, end, trunc, info = self.env.step(act)
        self._episode_return += float(np.asarray(rew)[0])
        self._episode_len += 1
        self._last_info = info

        if self.record_mode:
            self._rec_buffer.append((self._obs[0], int(act[0]), float(np.asarray(rew)[0]),
                                     int(np.asarray(end)[0]), int(np.asarray(trunc)[0])))

        dead = bool(np.asarray(end)[0] or np.asarray(trunc)[0])
        if dead:
            if self.record_mode and self._rec_buffer:
                self._save_recording(info)
            print(f"[{self.env_name}] return={self._episode_return:.1f} "
                  f"length={self._episode_len}")
            self._episode_return, self._episode_len = 0.0, 0
            self._carry = self.agent.actor_critic.initial_carry(1)
            self._rec_buffer = []

        self._obs = next_obs
        return next_obs[0], float(np.asarray(rew)[0]), bool(np.asarray(end)[0]), \
            bool(np.asarray(trunc)[0]), info

    def key_handler(self, key: int) -> None:
        import pygame

        if key == pygame.K_m:
            self.human = not self.human
        elif key == pygame.K_UP and hasattr(self.env, "horizon"):
            self.env.horizon += 1
        elif key == pygame.K_DOWN and hasattr(self.env, "horizon"):
            self.env.horizon = max(1, self.env.horizon - 1)
        elif key in (pygame.K_PAGEUP, pygame.K_RIGHTBRACKET):
            self.env_idx = (self.env_idx + 1) % len(self.envs)
            self.reset()
        elif key in (pygame.K_PAGEDOWN, pygame.K_LEFTBRACKET):
            self.env_idx = (self.env_idx - 1) % len(self.envs)
            self.reset()

    def header_lines(self) -> List[str]:
        lines = [
            f"env: {self.env_name}   control: {'human' if self.human else 'policy'} (m)",
            f"return: {self._episode_return:.1f}   length: {self._episode_len}",
        ]
        if hasattr(self.env, "horizon"):
            lines.append(f"horizon: {self.env.horizon} (up/down)")
        lines.append("[ ] cycle env | Return reset | . pause | e step | Esc quit")
        return lines

    def render_frame(self, obs: np.ndarray) -> np.ndarray:
        return obs

    # -- recording ------------------------------------------------------------

    def _save_recording(self, info: Dict[str, Any]) -> None:
        name = f"rec_{self.env_name}_{'H' if self.human else 'P'}"
        if name not in self._rec_datasets:
            self._rec_datasets[name] = Dataset(self.record_dir / name, name)
            self._rec_datasets[name].load_from_default_path()
        obs, act, rew, end, trunc = (np.stack(x) for x in zip(*self._rec_buffer))
        ep_info = {}
        if "final_observation" in info:
            ep_info["final_observation"] = np.asarray(info["final_observation"])[0]
        ep = Episode(obs=obs.astype(np.uint8), act=act.astype(np.int32),
                     rew=rew.astype(np.float32), end=end.astype(np.uint8),
                     trunc=trunc.astype(np.uint8), info=ep_info)
        ds = self._rec_datasets[name]
        ds.add_episode(ep)
        ds.save_to_default_path()
        print(f"saved episode to {name} ({ds.num_episodes} episodes)")
