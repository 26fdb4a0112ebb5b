"""A gymnasium-contract ALE double, for exercising the REAL Atari code path without ale-py.

``FakeALE`` mimics exactly what ``envs/atari_preprocessing.py`` and ``envs/env.py`` consume
from a `gymnasium.make`d NoFrameskip ALE env (reference: src/envs/env.py:14-48,
src/envs/atari_preprocessing.py):

  * ``env.unwrapped.ale`` exposing ``lives()`` and ``getScreenRGB(buffer)``,
  * a 210x160x3 uint8 observation space and a small Discrete action space,
  * a spec id containing "NoFrameskip" with per-frame stepping (frameskip handled by the
    wrapper),
  * lives that decrement on a deterministic schedule, termination when they run out.

The screen is scripted: a constant image whose value is the env-frame counter (mod 251),
so the wrapper's maxpool-of-last-two and INTER_AREA resize are verifiable in closed form,
plus an action-dependent stripe so policies see the action.

Register with gymnasium once via :func:`register_fake_ale` (idempotent); the entry point is
a module path so AsyncVectorEnv subprocess workers can construct it.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import gymnasium
import numpy as np

FAKE_ALE_ID = "FakeALENoFrameskip-v4"

_SCREEN_SHAPE = (210, 160, 3)


class _ALEShim:
    """The two methods AtariPreprocessing uses from the real ALE interface."""

    def __init__(self, env: "FakeALE") -> None:
        self._env = env

    def lives(self) -> int:
        return self._env._lives

    def getScreenRGB(self, buffer: np.ndarray) -> None:
        buffer[:] = self._env._screen()


class FakeALE(gymnasium.Env):
    """Deterministic scripted 'Atari' game.

    Dynamics (per raw frame): frame counter increments; reward +1 every
    ``reward_every`` frames; a life is lost every ``life_every`` frames; at 0 lives the
    episode terminates. Action 1 earns an extra reward every ``bonus_every`` frames.
    """

    metadata = {"render_modes": ["rgb_array"]}

    def __init__(self, render_mode: Optional[str] = None, lives: int = 3,
                 life_every: int = 25, reward_every: int = 10, bonus_every: int = 7,
                 **kwargs: Any) -> None:
        super().__init__()
        self.observation_space = gymnasium.spaces.Box(0, 255, _SCREEN_SHAPE, np.uint8)
        self.action_space = gymnasium.spaces.Discrete(4)
        self.render_mode = render_mode
        self.ale = _ALEShim(self)
        self._start_lives = lives
        self._life_every = life_every
        self._reward_every = reward_every
        self._bonus_every = bonus_every
        self._frame = 0
        self._lives = lives
        self._last_action = 0

    # -- scripted screen -------------------------------------------------------

    def _screen(self) -> np.ndarray:
        img = np.full(_SCREEN_SHAPE, self._frame % 251, np.uint8)
        img[:8, :, self._last_action % 3] = 255  # action-dependent stripe
        return img

    def get_action_meanings(self):
        return ["NOOP", "FIRE", "RIGHT", "LEFT"]

    # -- gymnasium API -----------------------------------------------------------

    def reset(self, *, seed: Optional[int] = None, options: Optional[Dict] = None):
        super().reset(seed=seed)
        self._frame = 0
        self._lives = self._start_lives
        self._last_action = 0
        return self._screen(), {"frame_number": 0}

    def step(self, action: int):
        self._frame += 1
        self._last_action = int(action)
        rew = float(self._frame % self._reward_every == 0)
        if int(action) == 1 and self._frame % self._bonus_every == 0:
            rew += 1.0
        if self._frame % self._life_every == 0:
            self._lives -= 1
        terminated = self._lives <= 0
        return self._screen(), rew, terminated, False, {"frame_number": self._frame}


def register_fake_ale(**kwargs: Any) -> str:
    """Idempotently register FakeALE with gymnasium; returns the env id."""
    if FAKE_ALE_ID not in gymnasium.registry:
        gymnasium.register(id=FAKE_ALE_ID, entry_point="diamond_tpu.envs.fake_ale:FakeALE",
                           kwargs=kwargs)
    return FAKE_ALE_ID
