from diamond_tpu.config import load_config


def test_compose_and_interpolate():
    cfg = load_config("trainer")
    # group composition (reference config/trainer.yaml:1-4)
    assert cfg.env.train.id == "BreakoutNoFrameskip-v4"
    assert cfg.agent.denoiser.inner_model.num_steps_conditioning == 4
    # relative interpolation (reference config/env/atari.yaml)
    assert cfg.env.test.id == cfg.env.train.id
    assert cfg.env.test.size == 64
    assert cfg.env.keymap == "atari/BreakoutNoFrameskip-v4"
    # cross-group interpolation (reference config/agent/default.yaml)
    assert cfg.agent.rew_end_model.img_size == 64
    assert cfg.agent.actor_critic.img_channels == 3
    # eval resolver (reference config/trainer.yaml:108)
    assert cfg.rew_end_model.training.seq_length == 15 + 4
    assert cfg.world_model_env.diffusion_sampler.s_tmax == float("inf")
    # list interpolation
    assert cfg.rew_end_model.training.sample_weights == [0.1, 0.1, 0.1, 0.7]


def test_overrides():
    cfg = load_config("trainer", overrides=[
        "env=fake",
        "denoiser.training.batch_size=4",
        "world_model_env.horizon=7",
        "common.seed=123",
    ])
    assert cfg.env.train.id == "Fake-v0"
    assert cfg.denoiser.training.batch_size == 4
    # interpolations see overridden values
    assert cfg.rew_end_model.training.seq_length == 7 + 4
    assert cfg.common.seed == 123


def test_env_group_override_before_resolution():
    cfg = load_config("trainer", overrides=["env.train.id=PongNoFrameskip-v4"])
    assert cfg.env.test.id == "PongNoFrameskip-v4"
    assert cfg.env.keymap == "atari/PongNoFrameskip-v4"


def test_override_strictness():
    import pytest
    # typo'd key rejected
    with pytest.raises(KeyError, match="unknown config key"):
        load_config("trainer", overrides=["denoiser.trainng.batch_size=4"])
    # +key adds a new key
    cfg = load_config("trainer", overrides=["+denoiser.training.extra_knob=5"])
    assert cfg.denoiser.training.extra_knob == 5
    # unknown group option gets a clear error listing alternatives
    with pytest.raises(ValueError, match="available"):
        load_config("trainer", overrides=["env=doesnotexist"])
