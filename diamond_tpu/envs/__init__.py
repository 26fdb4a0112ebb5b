from .env import NumpyEnv, make_atari_env, make_env
from .fake_env import FakeEnv
