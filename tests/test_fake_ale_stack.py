"""Exercise the REAL Atari code path (make_atari_env -> AsyncVectorEnv(SAME_STEP) ->
AtariPreprocessing -> NumpyEnv) against the scripted ALE double (envs/fake_ale.py), since
ale-py is absent from this image. Covers the round-1 gaps: envs/env.py life-loss/final-obs
handling and envs/atari_preprocessing.py noop-reset/frameskip/maxpool/resize
(reference: src/envs/env.py:38-63, src/envs/atari_preprocessing.py)."""

import numpy as np
import pytest

from diamond_tpu.envs.env import make_atari_env
from diamond_tpu.envs.fake_ale import FAKE_ALE_ID, FakeALE, register_fake_ale


def make(num_envs=2, done_on_life_loss=True, size=64, max_episode_steps=None):
    register_fake_ale()
    return make_atari_env(FAKE_ALE_ID, num_envs=num_envs,
                          done_on_life_loss=done_on_life_loss, size=size,
                          max_episode_steps=max_episode_steps)


def center_value(obs_i):
    """The scripted screen is constant == raw frame counter (mod 251) away from the
    action stripe; INTER_AREA resize of a constant region is exact."""
    vals = obs_i[20:50, :, :]
    assert vals.min() == vals.max()
    return int(vals[0, 0, 0])


def test_reset_shapes_and_noop_frames():
    env = make(num_envs=2)
    try:
        assert env.num_actions == 4
        obs, info = env.reset(seed=11)
        assert obs.shape == (2, 64, 64, 3) and obs.dtype == np.uint8
        # noop reset advanced the raw env 1..30 frames; the screen encodes the counter
        frames = info["frame_number"]
        for i in range(2):
            assert 1 <= frames[i] <= 30
            assert center_value(obs[i]) == frames[i] % 251
        # reproducibility of the noop draw
        obs2, info2 = env.reset(seed=11)
        np.testing.assert_array_equal(info2["frame_number"], frames)
    finally:
        env._venv.close()


def test_frameskip_and_maxpool():
    env = make(num_envs=1)
    try:
        obs, info = env.reset(seed=3)
        f0 = int(info["frame_number"][0])
        obs, rew, end, trunc, info = env.step(np.array([0]))
        # frame-skip 4: the raw env advanced exactly 4 frames
        assert int(info["frame_number"][0]) == f0 + 4
        # maxpool of the last two raw frames of a monotone counter == the last frame
        assert center_value(obs[0]) == (f0 + 4) % 251
    finally:
        env._venv.close()


def test_life_loss_becomes_end_without_reset():
    env = make(num_envs=1, done_on_life_loss=True)
    try:
        obs, info = env.reset(seed=5)
        saw_life_end = False
        prev_frame = int(info["frame_number"][0])
        for _ in range(20):
            obs, rew, end, trunc, info = env.step(np.array([0]))
            frame = int(info["frame_number"][0])
            assert frame == prev_frame + 4  # never resets inside this window
            if end[0]:
                # life lost (not game over: frames keep counting up afterwards)
                assert "final_observation" in info
                np.testing.assert_array_equal(info["final_observation"][0], obs[0])
                saw_life_end = True
                break
            prev_frame = frame
        assert saw_life_end  # lives drop at raw frame 25 -> within 20 wrapper steps
        # the episode continues: next step advances the same raw counter
        frame_at_end = int(info["frame_number"][0])
        obs, rew, end, trunc, info = env.step(np.array([0]))
        assert int(info["frame_number"][0]) == frame_at_end + 4
    finally:
        env._venv.close()


def test_game_over_autoresets_same_step():
    env = make(num_envs=1, done_on_life_loss=False)
    try:
        obs, info = env.reset(seed=7)
        for _ in range(40):
            prev = int(info["frame_number"][0])
            obs, rew, end, trunc, info = env.step(np.array([0]))
            if end[0]:
                # SAME_STEP autoreset: obs is already the new episode's first frame
                # (raw counter restarted at the new noop count <= 30), final obs surfaced
                assert "final_observation" in info
                assert info["final_observation"].shape == (1, 64, 64, 3)
                assert center_value(obs[0]) <= 30
                assert center_value(info["final_observation"][0]) >= 70  # ~3 lives * 25
                return
        pytest.fail("game over never reached")
    finally:
        env._venv.close()


def test_life_loss_flag_any_decrease_including_final_life():
    # unwrapped protocol check: ANY lives decrease flags life_loss, INCLUDING the last
    # life's loss on the terminal step (reference src/envs/atari_preprocessing.py:75-77 —
    # the reference has no new_lives > 0 guard; DoneOnLifeLoss makes the terminal-step
    # flag a harmless double signal)
    from diamond_tpu.envs.atari_preprocessing import AtariPreprocessing
    import gymnasium
    register_fake_ale()
    env = AtariPreprocessing(gymnasium.make(FAKE_ALE_ID), noop_max=0, frame_skip=4,
                             screen_size=64)
    obs, info = env.reset(seed=0)
    life_loss_steps, end_step = [], None
    for t in range(30):
        obs, rew, terminated, truncated, info = env.step(0)
        if info["life_loss"]:
            life_loss_steps.append(t)
        if terminated:
            end_step = t
            break
    # lives: 3 -> 2 at raw frame 25 (step 6), 2 -> 1 at 50 (step 12), 1 -> 0 at 75 (step 18)
    assert life_loss_steps == [6, 12, 18]
    assert end_step == 18
    assert info["life_loss"]  # terminal step: life loss AND termination, like the reference
    env.close()


def test_collector_over_fake_ale(tmp_path):
    """Episode assembly across life-loss ends through the real-env stack."""
    import jax

    from diamond_tpu.coroutines.collector import Collector, NumToCollect
    from diamond_tpu.data.dataset import Dataset
    from diamond_tpu.models.actor_critic import ActorCritic, ActorCriticConfig

    env = make(num_envs=1, done_on_life_loss=True)
    try:
        ds = Dataset(tmp_path / "ds")
        ac = ActorCritic(ActorCriticConfig(lstm_dim=16, img_channels=3, img_size=64,
                                           channels=[4, 4], down=[1, 1], num_actions=4))
        variables = ac.init(jax.random.PRNGKey(0))
        col = Collector(env, ac, lambda: variables, ds, epsilon=0.0, seed=0, verbose=False)
        col.send(NumToCollect(steps=16))
        assert ds.num_steps == 16
        assert ds.num_episodes >= 2  # life losses split episodes
        # every finalized episode (all but the ongoing last one) ends with end=1
        for eid in range(ds.num_episodes - 1):
            ep = ds.load_episode(eid)
            assert ep.end[-1] == 1
            assert "final_observation" in ep.info
    finally:
        env._venv.close()


def test_keymap_derived_from_live_env_action_meanings():
    """Per-game keymap derivation (reference src/game/keymap.py:21-28): meanings come from
    the live env's get_action_meanings(), not the static table — FakeALE is not in the
    table, so this only passes via the derivation path."""
    pygame = pytest.importorskip("pygame")
    from diamond_tpu.game.keymap import (STATIC_ACTION_MEANINGS, get_action_meanings,
                                         get_keymap_and_action_names)

    assert FAKE_ALE_ID not in STATIC_ACTION_MEANINGS
    meanings = get_action_meanings(FAKE_ALE_ID)
    assert meanings == ["NOOP", "FIRE", "RIGHT", "LEFT"]  # FakeALE.get_action_meanings

    keymap, names = get_keymap_and_action_names(f"atari/{FAKE_ALE_ID}")
    assert names == meanings
    k = pygame.key.key_code
    assert keymap[()] == 0                     # NOOP
    assert keymap[(k("space"),)] == 1          # FIRE
    assert keymap[(k("right"),)] == 2
    assert keymap[(k("left"),)] == 3


def test_keymap_static_fallback_for_real_ale_ids():
    """Real ALE ids cannot be constructed in this image (no ale-py) -> static table."""
    pytest.importorskip("pygame")
    from diamond_tpu.game.keymap import get_action_meanings

    assert get_action_meanings("FreewayNoFrameskip-v4") == ["NOOP", "UP", "DOWN"]
    with pytest.raises(ValueError, match="Unknown action meanings"):
        get_action_meanings("NotAGameNoFrameskip-v4")
