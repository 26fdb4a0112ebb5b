"""Keyboard chord -> action maps for the play app.

TPU-native counterpart of reference src/game/keymap.py: Atari action names + pygame
key-chord maps; the per-game keymap is derived from the env's action meanings when ale-py is
available (reference keymap.py:21-28), with a static fallback table for the games whose
meanings are fixed, plus a keymap for the synthetic Fake env.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

try:
    import pygame
except ImportError:  # pragma: no cover
    pygame = None

ATARI_ACTION_NAMES = [
    "NOOP", "FIRE", "UP", "RIGHT", "LEFT", "DOWN", "UPRIGHT", "UPLEFT", "DOWNRIGHT",
    "DOWNLEFT", "UPFIRE", "RIGHTFIRE", "LEFTFIRE", "DOWNFIRE", "UPRIGHTFIRE", "UPLEFTFIRE",
    "DOWNRIGHTFIRE", "DOWNLEFTFIRE",
]


def _atari_chords() -> Dict[str, Tuple[int, ...]]:
    k = pygame.key.key_code
    base = {
        "NOOP": (),
        "FIRE": (k("space"),),
        "UP": (k("up"),),
        "RIGHT": (k("right"),),
        "LEFT": (k("left"),),
        "DOWN": (k("down"),),
        "UPRIGHT": (k("up"), k("right")),
        "UPLEFT": (k("up"), k("left")),
        "DOWNRIGHT": (k("down"), k("right")),
        "DOWNLEFT": (k("down"), k("left")),
        "UPFIRE": (k("up"), k("space")),
        "RIGHTFIRE": (k("right"), k("space")),
        "LEFTFIRE": (k("left"), k("space")),
        "DOWNFIRE": (k("down"), k("space")),
        "UPRIGHTFIRE": (k("up"), k("right"), k("space")),
        "UPLEFTFIRE": (k("up"), k("left"), k("space")),
        "DOWNRIGHTFIRE": (k("down"), k("right"), k("space")),
        "DOWNLEFTFIRE": (k("down"), k("left"), k("space")),
    }
    return base


# Minimal-action-set meanings for common Atari-100k games (ALE reduced action spaces),
# used when the env itself cannot be queried (ale-py not importable).
STATIC_ACTION_MEANINGS: Dict[str, List[str]] = {
    "BreakoutNoFrameskip-v4": ["NOOP", "FIRE", "RIGHT", "LEFT"],
    "PongNoFrameskip-v4": ["NOOP", "FIRE", "RIGHT", "LEFT", "RIGHTFIRE", "LEFTFIRE"],
    "BoxingNoFrameskip-v4": ATARI_ACTION_NAMES,
    "FreewayNoFrameskip-v4": ["NOOP", "UP", "DOWN"],
}


def get_action_meanings(env_id: str) -> List[str]:
    """Per-game action meanings, derived from the live env when possible (reference
    src/game/keymap.py:21-28), else the static fallback table for common games.

    Works for any gymnasium-registered env exposing ``get_action_meanings()`` — incl. the
    scripted ALE double (envs/fake_ale.py), which registers on demand, so the derivation
    path is testable without ale-py."""
    try:
        import gymnasium
        kwargs = {}
        if env_id.startswith("FakeALE"):
            from ..envs.fake_ale import register_fake_ale
            register_fake_ale()
        else:
            import ale_py  # noqa: F401  (registers ALE ids with gymnasium)
            kwargs = dict(full_action_space=False, frameskip=1)
        env = gymnasium.make(env_id, **kwargs)
        try:
            meanings = list(env.unwrapped.get_action_meanings())
        finally:
            env.close()
        return meanings
    except Exception:
        if env_id in STATIC_ACTION_MEANINGS:
            return STATIC_ACTION_MEANINGS[env_id]
        raise ValueError(f"Unknown action meanings for {env_id} (ale-py unavailable)")


def get_keymap_and_action_names(keymap_name: str):
    """keymap_name: 'fake' or 'atari/<env-id>' (reference keymap.py + config env.keymap).

    Returns (keymap: dict chord-tuple -> action index, action_names: list)."""
    assert pygame is not None, "pygame required for the play app"
    if keymap_name == "fake":
        k = pygame.key.key_code
        names = ["NOOP", "LEFT", "RIGHT"]
        keymap = {(): 0, (k("left"),): 1, (k("right"),): 2}
        return keymap, names

    assert keymap_name.startswith("atari/")
    env_id = keymap_name.split("/", 1)[1]
    names = get_action_meanings(env_id)
    chords = _atari_chords()
    keymap = {tuple(sorted(chords[name])): i for i, name in enumerate(names)}
    return keymap, names
