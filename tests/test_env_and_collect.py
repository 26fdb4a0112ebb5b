"""Fake-env integration tests: env contract, env-loop death handling, collector/dataset
round-trips across collect boundaries (SURVEY.md section 4, item 4)."""

import pytest

import numpy as np
import jax

from diamond_tpu.coroutines import Collector, EnvLoop, NumToCollect
from diamond_tpu.data import Dataset
from diamond_tpu.envs import FakeEnv, make_env
from diamond_tpu.models import ActorCritic, ActorCriticConfig

SIZE = 32


def small_ac(num_actions=3):
    cfg = ActorCriticConfig(lstm_dim=32, img_channels=3, img_size=SIZE, channels=[8, 8],
                            down=[1, 1], num_actions=num_actions)
    ac = ActorCritic(cfg)
    variables = ac.init(jax.random.PRNGKey(0))
    return ac, variables


def test_fake_env_contract():
    env = make_env("Fake-v0", num_envs=4, done_on_life_loss=False, size=SIZE,
                   max_episode_steps=20)
    obs, _ = env.reset(seed=[1, 2, 3, 4])
    assert obs.shape == (4, SIZE, SIZE, 3) and obs.dtype == np.uint8
    deaths = 0
    for t in range(40):
        obs, rew, end, trunc, info = env.step(np.zeros(4, np.int64))
        assert obs.shape == (4, SIZE, SIZE, 3)
        dead = end | trunc
        if dead.any():
            deaths += int(dead.sum())
            assert info["final_observation"].shape == (int(dead.sum()), SIZE, SIZE, 3)
    assert deaths > 0  # with noop policy, balls get missed / truncation triggers

    # determinism under the same seeds
    env2 = make_env("Fake-v0", num_envs=4, done_on_life_loss=False, size=SIZE,
                    max_episode_steps=20)
    o1, _ = env.reset(seed=[9, 9, 9, 9])
    o2, _ = env2.reset(seed=[9, 9, 9, 9])
    np.testing.assert_array_equal(o1, o2)
    s1 = env.step(np.ones(4, np.int64))[0]
    s2 = env2.step(np.ones(4, np.int64))[0]
    np.testing.assert_array_equal(s1, s2)


@pytest.mark.slow
def test_env_loop_shapes_and_bootstrap():
    env = FakeEnv(num_envs=3, size=SIZE, max_episode_steps=8)
    ac, variables = small_ac()
    loop = EnvLoop(env, ac, lambda: variables, epsilon=0.1, seed=0)
    obs, act, rew, end, trunc, logits, val, val_boot, infos = loop.send(12)
    assert obs.shape == (3, 12, SIZE, SIZE, 3)
    assert act.shape == rew.shape == end.shape == trunc.shape == val.shape == (3, 12)
    assert logits.shape == (3, 12, 3)
    assert val_boot.shape == (3, 12)
    assert len(infos) == 12
    # with max_episode_steps=8, every env truncated at least once in 12 steps
    assert (end + trunc).sum() >= 3
    # zero-init heads -> all values zero, so bootstraps are zero too
    np.testing.assert_allclose(val_boot, 0, atol=1e-6)
    # state persists across sends
    loop.send(3)


def test_env_loop_need_values_false_same_transitions():
    # the collector's fast path (need_values=False) must step the env identically —
    # same actions, same deaths — and only skip the trainer-facing value outputs
    ac, variables = small_ac()
    outs = []
    for need in (True, False):
        env = FakeEnv(num_envs=2, size=SIZE, max_episode_steps=6)
        loop = EnvLoop(env, ac, lambda: variables, epsilon=0.1, seed=7)
        outs.append(loop.send(10, need_values=need))
    (obs1, act1, rew1, end1, tr1, lg1, v1, b1, _), \
        (obs2, act2, rew2, end2, tr2, lg2, v2, b2, _) = outs
    np.testing.assert_array_equal(obs1, obs2)
    np.testing.assert_array_equal(act1, act2)
    np.testing.assert_array_equal(rew1, rew2)
    np.testing.assert_array_equal(end1, end2)
    np.testing.assert_array_equal(tr1, tr2)
    assert lg1 is not None and v1 is not None and b1 is not None
    assert lg2 is None and v2 is None and b2 is None


def test_packed_policy_step_matches_unpacked():
    # send()'s RPC-lean fused-upload path (one packed uint8 H2D + device-carried step
    # counter + staged epsilon) must be bit-identical to the plain per-argument call
    import jax.numpy as jnp

    ac, variables = small_ac()
    env = FakeEnv(num_envs=3, size=SIZE, max_episode_steps=8)
    loop = EnvLoop(env, ac, lambda: variables, epsilon=0.3, seed=11)
    loop.reset()
    obs, hx, cx, _ = loop._state
    prev_dead = np.array([False, True, False])
    for step in (0, 5):
        packed = np.concatenate(
            [obs.reshape(3, -1), prev_dead.astype(np.uint8)[:, None]], axis=1)
        ref = loop._policy_step(variables, obs, hx, cx, jnp.asarray(prev_dead),
                                loop._base_key, step, loop.epsilon)
        got = loop._policy_step_packed(variables, packed, hx, cx, loop._base_key,
                                       jnp.asarray(step, jnp.int32), loop._epsilon_dev)
        assert int(got[-1]) == step + 1  # device-carried counter advanced
        for r, g in zip(ref, got[:-1]):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


def test_collector_roundtrip(tmp_path):
    env = FakeEnv(num_envs=2, size=SIZE, max_episode_steps=10)
    ac, variables = small_ac()
    ds = Dataset(tmp_path / "train", "train_dataset", cache_in_ram=True)
    col = Collector(env, ac, lambda: variables, ds, epsilon=0.0, seed=0, verbose=False)

    logs = col.send(NumToCollect(steps=25))
    # steps are counted across envs (reference collector.py:57); incomplete episodes are
    # stored in train mode, so every collected transition lands in the dataset
    total = sum(ds.lengths)
    assert ds.num_steps == total >= 25
    assert any(f"{ds.name}/num_steps" in d for d in logs)

    # ongoing episodes extended across collect boundaries without duplication
    col.send(NumToCollect(steps=10))
    assert ds.num_steps >= total + 10
    # episodes with end=1 have final_observation in info
    for eid in range(ds.num_episodes):
        ep = ds.load_episode(eid)
        if ep.end.sum() > 0:
            assert "final_observation" in ep.info
            assert ep.info["final_observation"].shape == (SIZE, SIZE, 3)
        # monotone structure: dead only at the last step
        assert ep.dead[:-1].sum() == 0

    # episode-count mode with reset_every_collect (test collection)
    ds2 = Dataset(tmp_path / "test", "test_dataset", cache_in_ram=True)
    col2 = Collector(env, ac, lambda: variables, ds2, reset_every_collect=True, seed=1,
                     verbose=False)
    col2.send(NumToCollect(episodes=3))
    assert ds2.num_episodes >= 3
    # all stored episodes are complete (dead at the end)
    for eid in range(ds2.num_episodes):
        assert ds2.load_episode(eid).dead[-1] == 1


def test_collector_boundary_no_duplication(tmp_path):
    """An episode still running at a collect boundary must be EXTENDED, not re-added:
    the reference resets its transition buffer at every collect call
    (reference collector.py:30-38 setup_new_collect), so the already-stored prefix is
    never concatenated twice. Regression test for the round-4 capability-run failure:
    split collects duplicated the prefix, splicing a time-jump (no end flag) into the
    episode — with multi-env collection nearly every stored episode was corrupted."""

    def collect(schedule, seed=7):
        env = FakeEnv(num_envs=2, size=SIZE, max_episode_steps=10)
        ac, variables = small_ac()
        ds = Dataset(tmp_path / f"ds_{len(schedule)}_{schedule[0]}", "train_dataset",
                     cache_in_ram=True, save_on_disk=False)
        col = Collector(env, ac, lambda: variables, ds, epsilon=0.0, seed=seed,
                        verbose=False)
        for n in schedule:
            col.send(NumToCollect(steps=n))
        return ds

    # 25 steps over 2 envs -> 13 iterations -> both envs are 3 steps into their second
    # episode at the first boundary (episodes truncate at 10)
    ds_split = collect([25, 10, 5])   # 13 + 5 + 3 = 21 iterations
    ds_once = collect([42])           # 21 iterations in one call

    # exact step accounting: every env transition stored exactly once
    for ds in (ds_split, ds_once):
        assert ds.num_steps == 2 * 21, (ds.num_steps, 2 * 21)
        for eid in range(ds.num_episodes):
            assert len(ds.load_episode(eid)) <= 10  # never beyond max_episode_steps

    # the split schedule must produce the IDENTICAL dataset (same seeds, same policy)
    assert ds_split.num_episodes == ds_once.num_episodes
    for eid in range(ds_split.num_episodes):
        a, b = ds_split.load_episode(eid), ds_once.load_episode(eid)
        np.testing.assert_array_equal(np.asarray(a.obs), np.asarray(b.obs))
        np.testing.assert_array_equal(np.asarray(a.act), np.asarray(b.act))
        np.testing.assert_array_equal(np.asarray(a.rew), np.asarray(b.rew))
        np.testing.assert_array_equal(np.asarray(a.end), np.asarray(b.end))
        np.testing.assert_array_equal(np.asarray(a.trunc), np.asarray(b.trunc))


def test_epsilon_greedy_whole_batch_vs_per_env():
    """Reference parity: one exploration coin per STEP for the whole batch
    (reference env_loop.py:34-35); per-env mixing only with epsilon_per_env=True.
    With a policy pinned to action 0, whole-batch steps are bimodal in the number of
    non-zero actions (0 when exploiting, ~3/4 of the batch when exploring), while
    per-env steps frequently land in between."""
    env = FakeEnv(num_envs=16, size=SIZE, max_episode_steps=1000)
    ac, variables = small_ac()
    # pin the policy: actor bias strongly favors action 0
    bias = variables["params"]["actor_linear"]["bias"]
    variables["params"]["actor_linear"]["bias"] = bias.at[0].set(25.0)

    def nonzero_fracs(epsilon_per_env):
        loop = EnvLoop(env, ac, lambda: variables, epsilon=0.5, seed=4,
                       epsilon_per_env=epsilon_per_env)
        _, act, *_ = loop.send(64)
        return (act != 0).mean(axis=0)  # per-step fraction of explored-looking actions

    f_batch = nonzero_fracs(False)
    f_perenv = nonzero_fracs(True)
    # whole-batch: each step all-exploit (frac exactly 0) or all-explore (frac binomial
    # around 2/3 for 3 actions; P(<0.3) ~ 1e-3); nothing in the dead zone (0, 0.3)
    assert ((f_batch == 0) | (f_batch >= 0.3)).all()
    assert (f_batch == 0).any() and (f_batch >= 0.3).any()
    # per-env: explored-action fraction ~ Binomial(16, 1/3)/16 -> the (0, 0.3) dead zone
    # is hit often
    assert ((f_perenv > 0) & (f_perenv < 0.3)).mean() > 0.15
