"""Training orchestration: collect -> train world model -> train policy in imagination ->
eval -> checkpoint, per epoch.

TPU-native counterpart of reference src/trainer.py. Single-process: all local devices are
driven from one Python program (data parallelism via mesh, parallel/mesh.py), so the
reference's rank-0-collects + broadcast_object_list choreography (trainer.py:219-237,
utils.py:97-102) disappears.

Matched orchestration semantics:
  * dynamic initial collect until the minority-reward count reaches the threshold
    (reference trainer.py:269-300),
  * per-epoch: collect steps_per_epoch -> train denoiser/rew_end/actor_critic for
    steps_first_epoch on epoch 1 else steps_per_epoch (reference trainer.py:326-337, 349-389),
  * eval every `evaluation.every` epochs: collect test episodes + test losses over the
    DatasetTraverser (reference trainer.py:243-251, 391-406),
  * final collect of num_final_episodes -> final_return_mean/std (reference trainer.py:302-324),
  * checkpointing: full train state + rotated weights-only agent copies + dataset info
    (reference trainer.py:408-417, utils.py:209-230).
"""

from __future__ import annotations

import random
import shutil
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import Cfg, save_config
from .coroutines import Collector, NumToCollect
from .data import BatchPrefetcher, BatchSampler, Dataset, DatasetTraverser, DeviceBatch
from .envs import make_env
from .envs.world_model_env import (ImaginationEngine, PoolManager, WorldModelEnvConfig)
from .models import (ActorCriticLossConfig, Agent, AgentConfig, SigmaDistributionConfig)
from .models.agent import MODEL_NAMES
from .training import (OptimizerSpec, TrainState, make_ac_train_step, make_denoiser_eval_step,
                       make_denoiser_train_step, make_rew_end_eval_step,
                       make_rew_end_train_step)
from .utils import (Logs, MetricsLogger, count_parameters, keep_agent_copies_every,
                    load_pickle,
                    process_confusion_matrices_if_any_and_compute_classification_metrics,
                    save_info_for_import_script, save_with_backup, set_seed)


def final_protocol_metrics(to_log: Logs, episodes: int) -> Dict[str, Any]:
    """Final-evaluation headline numbers, protocol-exact vs the reference.

    The reference averages over exactly ``num_final_episodes`` (reference
    trainer.py:302-324, collected with a single test env). Batched test envs can finish
    extra episodes in the last vector step; the headline mean/std therefore truncates to
    the first ``episodes`` in completion order so numbers are 1:1 comparable, and the
    all-episodes mean is kept as a secondary metric."""
    returns = [d["return"] for d in to_log if "return" in d]
    protocol = returns[:episodes]
    return {"final_return_mean": float(np.mean(protocol)),
            "final_return_std": float(np.std(protocol)),
            "final_num_episodes": len(protocol),
            "final_return_mean_all_collected": float(np.mean(returns)),
            "final_num_episodes_all_collected": len(returns)}


class Trainer:
    def __init__(self, cfg: Cfg, root_dir: Path, run_dir: Optional[Path] = None) -> None:
        self._cfg = cfg
        self._root_dir = Path(root_dir)
        self._run_dir = Path(run_dir) if run_dir is not None else Path.cwd()

        seed = cfg.common.seed if cfg.common.seed is not None else random.randint(0, 10 ** 9)
        set_seed(seed)
        self._rng_key = jax.random.PRNGKey(seed)
        self._np_rng = np.random.default_rng(seed)

        self._is_static_dataset = cfg.static_dataset.path is not None
        self._is_model_free = cfg.training.model_free
        # wm_only: train the world model only (denoiser + optional upsampler) — the
        # csgo-branch operating mode (static dataset, no RL agent)
        self._wm_only = bool(cfg.training.get("wm_only", False))
        self._has_upsampler = cfg.agent.get("upsampler", None) is not None
        self._model_names = list(MODEL_NAMES) + (["upsampler"] if self._has_upsampler
                                                 else [])
        self._ds_factor = int(cfg.agent.upsampler.upsampling_factor) \
            if self._has_upsampler else 1
        dtype_name = cfg.get("tpu", {}).get("compute_dtype", "float32")
        self._compute_dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
        self._int8_rollout = bool(cfg.get("tpu", {}).get("int8_rollout", False))
        from .ops import quant as _quant
        self._int8_sites = _quant.parse_sites(
            cfg.get("tpu", {}).get("int8_sites", "all"))  # fail fast on a bad spec
        self._quant_coll = None   # calibrated "quant" collection (static act scales)
        self._quant_step = -1     # denoiser train-state step it was calibrated at
        self._r_quant_coll = None  # rew/end twin of the above
        self._r_quant_step = -1
        if self._int8_rollout:
            # structural opt-in: _wm_infer_variables/_rew_end_infer_variables inject the
            # calibrated "quant" collection, which is what enables int8 (ops/quant.py)
            print("int8 rollout inference enabled (tpu.int8_rollout)")

        # Data parallelism: a `data` mesh axis over the devices selected by common.devices
        # (parallel/mesh.py; reference src/main.py:47-56 narrows CUDA_VISIBLE_DEVICES the
        # same way). Replaces the reference's mp.spawn + DDP/NCCL (reference main.py:26-44).
        # Falls back to single-device placement when batch sizes don't divide the selection.
        from .parallel import make_mesh, select_devices

        if jax.process_count() > 1:
            # The jitted train steps are host-count-agnostic (GSPMD over a global mesh —
            # proven by the 2-process dryrun, parallel/multihost.py), but THIS single-
            # controller orchestration layer is not: its placements use jax.device_put
            # (cannot target remote devices), and collection/eval/checkpointing assume one
            # process owns the run dir. Fail fast instead of crashing later in placement.
            raise NotImplementedError(
                "Trainer is single-host: run it without tpu.distributed. Multi-host "
                "(DCN) data parallelism is supported at the train-step layer — build a "
                "global mesh and feed it via parallel.multihost.global_batch_from_local/"
                "global_replicated_from_full (see tests/test_multihost.py).")

        self._devices = select_devices(cfg.common.get("devices", "all"))
        self._mesh = None
        n = len(self._devices)
        if cfg.get("tpu", {}).get("data_parallel", False) and n > 1:
            batch_sizes = [cfg[m].training.batch_size for m in self._model_names]
            if all(b % n == 0 for b in batch_sizes):
                self._mesh = make_mesh(self._devices)
                print(f"data-parallel mesh over {n} of {len(jax.devices())} devices")
            else:
                print(f"tpu.data_parallel requested but batch sizes {batch_sizes} do not "
                      f"divide {n} devices — running replicated on one device")
        if self._mesh is None and n > 1:
            # Multi-device selection without a usable data-parallel mesh: training is
            # single-device, so the extra selected devices would sit idle. Say so loudly
            # rather than silently dropping devices the user explicitly asked for.
            print(f"WARNING: common.devices selected {n} devices but only "
                  f"{self._devices[0]} will be used "
                  f"(unused: {self._devices[1:]}); set tpu.data_parallel=True with batch "
                  f"sizes divisible by {n} to use all of them")
        if self._mesh is None and self._devices[0] != jax.devices()[0]:
            # A specific non-default device was selected: a 1-device mesh routes every
            # placement (replicate/shard_* below) onto it with unchanged semantics.
            self._mesh = make_mesh(self._devices[:1])
            print(f"running on selected device {self._devices[0]}")

        # Logging
        self.logger = MetricsLogger(self._run_dir / "metrics.jsonl", cfg.wandb)

        # Checkpointing
        self._path_ckpt_dir = self._run_dir / "checkpoints"
        self._path_state_ckpt = self._path_ckpt_dir / "state.pt"

        # First time: init run-dir hierarchy (reference trainer.py:83-88)
        if not cfg.common.resume:
            self._path_ckpt_dir.mkdir(exist_ok=False, parents=True)
            save_config(cfg, self._run_dir / "config" / "trainer.yaml")
            src_copy = self._run_dir / "src"
            if not src_copy.exists() and (self._root_dir / "diamond_tpu").is_dir() \
                    and src_copy.resolve() != (self._root_dir / "diamond_tpu").resolve():
                shutil.copytree(self._root_dir / "diamond_tpu", src_copy)

        # Datasets
        p = Path(cfg.static_dataset.path) if self._is_static_dataset \
            else self._run_dir / "dataset"
        self.train_dataset = Dataset(p / "train", "train_dataset",
                                     cache_in_ram=cfg.training.cache_in_ram)
        self.test_dataset = Dataset(p / "test", "test_dataset", cache_in_ram=True)
        self.train_dataset.load_from_default_path()
        self.test_dataset.load_from_default_path()
        if self._is_static_dataset:
            self.train_dataset.is_static = True

        if self._has_upsampler and not self._is_static_dataset:
            raise ValueError(
                "two-stage (agent.upsampler) training collects nothing itself — the "
                "policy/reward nets live at the dynamics (low) resolution and cannot act "
                "on full-res env frames; set static_dataset.path (the csgo operating "
                "mode, with training.wm_only=True)")

        # Envs (host side)
        train_env = make_env(num_envs=cfg.collection.train.num_envs, **cfg.env.train)
        test_env = make_env(num_envs=cfg.collection.test.num_envs, **cfg.env.test)
        num_actions = int(test_env.num_actions)
        self._train_env, self._test_env = train_env, test_env

        # Agent
        agent_cfg = AgentConfig.from_cfg(cfg.agent, num_actions)
        self.agent = Agent(agent_cfg, compute_dtype=self._compute_dtype)
        self._rng_key, init_key = jax.random.split(self._rng_key)
        self.agent.init(init_key, img_size=cfg.env.train.size)

        if cfg.initialization.path_to_ckpt is not None:
            self.agent.load(Path(cfg.initialization.path_to_ckpt),
                            load_denoiser=cfg.initialization.load_denoiser,
                            load_rew_end_model=cfg.initialization.load_rew_end_model,
                            load_actor_critic=cfg.initialization.load_actor_critic)

        # Collectors (reference trainer.py:115-123)
        if not self._is_static_dataset:
            self._train_collector = Collector(
                train_env, self.agent.actor_critic, self._ac_variables, self.train_dataset,
                epsilon=cfg.collection.train.epsilon, seed=seed)
            self._test_collector = Collector(
                test_env, self.agent.actor_critic, self._ac_variables, self.test_dataset,
                epsilon=cfg.collection.test.epsilon, reset_every_collect=True, seed=seed + 1)

        # Optimizers + train steps
        self._opt_specs = {name: OptimizerSpec.from_cfg(cfg[name].optimizer,
                                                        cfg[name].training)
                           for name in self._model_names}

        def build_tx(name: str):
            # grad accumulation: mean of micro-batch grads applied every k micro-steps by
            # default (LR means the same thing at any grad_acc_steps). The reference sums
            # micro-grads without rescaling (reference trainer.py:368-379); set
            # tpu.grad_acc_sum=True for exact parity in grad-acc runs.
            import optax
            tx = self._opt_specs[name].build()
            k = int(cfg[name].training.grad_acc_steps)
            if k <= 1:
                return tx
            if bool(cfg.tpu.grad_acc_sum):
                tx = optax.chain(optax.scale(float(k)), tx)  # mean * k == unscaled sum
            return optax.MultiSteps(tx, every_k_schedule=k)

        self._tx = {name: build_tx(name) for name in self._model_names}
        sigma_cfg = SigmaDistributionConfig(**cfg.denoiser.sigma_distribution)
        self._sigma_cfg = sigma_cfg
        loss_cfg = ActorCriticLossConfig.from_cfg(cfg.actor_critic.actor_critic_loss)
        self._loss_cfg = loss_cfg

        wm_env_cfg = WorldModelEnvConfig.from_cfg(cfg.world_model_env)
        self.engine = ImaginationEngine(self.agent.denoiser, self.agent.rew_end_model,
                                        self.agent.actor_critic, wm_env_cfg)
        self._wm_env_cfg = wm_env_cfg

        self._denoiser_step = make_denoiser_train_step(self.agent.denoiser,
                                                       self._tx["denoiser"], sigma_cfg,
                                                       downsample_factor=self._ds_factor)
        if self._has_upsampler:
            from .training import make_upsampler_eval_step, make_upsampler_train_step

            up_sigma_cfg = SigmaDistributionConfig(**cfg.upsampler.sigma_distribution)
            self._upsampler_step = make_upsampler_train_step(
                self.agent.upsampler, self._tx["upsampler"], up_sigma_cfg)
            self._upsampler_eval = make_upsampler_eval_step(self.agent.upsampler,
                                                            up_sigma_cfg)
        self._rew_end_step = make_rew_end_train_step(self.agent.rew_end_model,
                                                     self._tx["rew_end_model"])
        self._ac_step = make_ac_train_step(self.engine, self.agent.actor_critic,
                                           self._tx["actor_critic"], loss_cfg)
        if self._is_model_free:
            # RL env is a vectorized REAL env (reference trainer.py:171-172)
            from .coroutines.env_loop import EnvLoop
            from .training import make_model_free_ac_train_step

            rl_env = make_env(num_envs=cfg.actor_critic.training.batch_size,
                              **cfg.env.train)
            self._rl_env_loop = EnvLoop(rl_env, self.agent.actor_critic,
                                        self._ac_variables, epsilon=0.0, seed=seed + 2)
            self._mf_ac_step = make_model_free_ac_train_step(
                self.agent.actor_critic, self._tx["actor_critic"], loss_cfg)
        self._denoiser_eval = make_denoiser_eval_step(self.agent.denoiser, sigma_cfg,
                                                      downsample_factor=self._ds_factor)
        self._rew_end_eval = make_rew_end_eval_step(self.agent.rew_end_model)

        # Train states (replicated over the mesh when data-parallel)
        self.train_states: Dict[str, TrainState] = {
            name: TrainState.create(self.agent.variables[name]["params"], self._tx[name])
            for name in self._model_names
        }
        self._denoiser_constants = self.agent.variables["denoiser"].get("constants", {})
        self._upsampler_constants = self.agent.variables["upsampler"].get("constants", {}) \
            if self._has_upsampler else {}
        if self._mesh is not None:
            from .parallel import replicate

            self.train_states = {k: replicate(v, self._mesh)
                                 for k, v in self.train_states.items()}
            self._denoiser_constants = replicate(self._denoiser_constants, self._mesh)
            self._upsampler_constants = replicate(self._upsampler_constants, self._mesh)

        # Data pipelines (reference trainer.py:139-167)
        c = cfg.denoiser.training
        self._seq_len_denoiser = (cfg.agent.denoiser.inner_model.num_steps_conditioning
                                  + 1 + c.num_autoregressive_steps)
        self._samplers = {}
        self._prefetchers: Dict[str, Any] = {}

        # Device-resident episode store: train batches + IC pools assembled by on-device
        # gathers — frames cross the host boundary once per episode (data/device_store.py;
        # on the tunneled platform this is also required: the client leaks host staging
        # per H2D transfer, which OOM-killed a full-schedule run).
        self._device_store = None
        if bool(cfg.get("tpu", {}).get("device_dataset", False)) and not self._is_model_free:
            from .data.device_store import DeviceEpisodeStore

            cap = cfg.tpu.get("device_dataset_capacity")
            if cap is None:
                budget = int(cfg.collection.train.num_steps_total)
                if self._is_static_dataset:
                    budget = max(budget, self.train_dataset.num_steps)
                cap = int(1.25 * budget) + 2048
            size = cfg.env.train.size
            self._device_store = DeviceEpisodeStore(int(cap), (size, size, 3),
                                                    mesh=self._mesh)
            if self.train_dataset.num_episodes:
                self._device_store.sync(self.train_dataset)

        # Imagination state (lazy: needs a non-empty dataset)
        self._imag_state = None
        self._pool = None
        self._pool_manager: Optional[PoolManager] = None

        # Counters (reference trainer.py:191-201)
        self.epoch = 0
        self.num_epochs_collect: Optional[int] = None
        self.num_episodes_test = 0
        self.num_batch_train = {name: 0 for name in self._model_names}
        self.num_batch_test = {name: 0 for name in self._model_names}

        if cfg.common.resume:
            self.load_state_checkpoint()
        else:
            self.save_checkpoint()

        for name in self._model_names:
            n = count_parameters(self.agent.variables[name]["params"])
            print(f"{n} parameters in {name}")
        print(self.train_dataset)
        print(self.test_dataset)

    # -- helpers --------------------------------------------------------------

    def _ac_variables(self) -> Any:
        return {"params": self.train_states["actor_critic"].params}

    def _d_variables(self) -> Any:
        v = {"params": self.train_states["denoiser"].params}
        if self._denoiser_constants:
            v["constants"] = self._denoiser_constants
        return v

    def _r_variables(self) -> Any:
        return {"params": self.train_states["rew_end_model"].params}

    def _wm_infer_variables(self) -> Any:
        """Denoiser variables for stop-gradient imagination inference. With
        tpu.int8_rollout, augmented with the "quant" collection of static activation
        scales — recalibrated (one eager observe pass, models/diffusion_sampler.py
        calibrate) whenever the denoiser has trained since the last calibration, using
        the live imagination buffers as representative conditioning."""
        d_vars = self._d_variables()
        if not self._int8_rollout:
            return d_vars
        step = int(self.train_states["denoiser"].step)
        if step != self._quant_step:
            st = self._imag_state
            t0 = time.perf_counter()
            from .data.episode import obs_to_float
            cal = self.engine.sampler.calibrate(d_vars, self._next_key(),
                                                obs_to_float(st.obs_buffer),
                                                st.act_buffer, sites=self._int8_sites)
            # None when the site selection matched nothing in this model (e.g.
            # tpu.int8_sites=lstm on the denoiser): run bf16, don't crash
            self._quant_coll, self._quant_step = cal.get("quant"), step
            print(f"int8 recalibrated at denoiser step {step} "
                  f"({time.perf_counter() - t0:.1f}s)")
        return dict(d_vars, quant=self._quant_coll) if self._quant_coll else d_vars

    def _rew_end_infer_variables(self) -> Any:
        """Rew/end variables for stop-gradient imagination inference — the rew/end twin of
        _wm_infer_variables (RewEndModel.calibrate; recalibrated when the rew/end model has
        trained since the last calibration, on an adjacent pair of live buffer frames)."""
        r_vars = self._r_variables()
        if not self._int8_rollout:
            return r_vars
        step = int(self.train_states["rew_end_model"].step)
        if step != self._r_quant_step:
            st = self._imag_state
            t0 = time.perf_counter()
            from .data.episode import obs_to_float
            obs_f = obs_to_float(st.obs_buffer)
            cal = self.agent.rew_end_model.calibrate(
                r_vars, obs_f[:, -2:-1], st.act_buffer[:, -2:-1], obs_f[:, -1:],
                sites=self._int8_sites)
            self._r_quant_coll, self._r_quant_step = cal.get("quant"), step
            print(f"int8 rew/end recalibrated at step {step} "
                  f"({time.perf_counter() - t0:.1f}s)")
        return dict(r_vars, quant=self._r_quant_coll) if self._r_quant_coll else r_vars

    def _u_variables(self) -> Any:
        v = {"params": self.train_states["upsampler"].params}
        if self._upsampler_constants:
            v["constants"] = self._upsampler_constants
        return v

    def _sync_agent_variables(self) -> None:
        """Reflect the train states' params back into the Agent container (for collectors,
        checkpoints, play interop)."""
        self.agent.variables["denoiser"] = self._d_variables()
        self.agent.variables["rew_end_model"] = self._r_variables()
        self.agent.variables["actor_critic"] = self._ac_variables()
        if self._has_upsampler:
            self.agent.variables["upsampler"] = self._u_variables()

    def _next_key(self) -> jax.Array:
        self._rng_key, k = jax.random.split(self._rng_key)
        return k

    def _get_prefetcher(self, name: str) -> Any:
        if name not in self._prefetchers:
            cfg = self._cfg
            c = cfg[name].training
            seq_length = self._seq_len_denoiser if name == "denoiser" else c.seq_length
            weights = None if (self._is_static_dataset
                               and cfg.static_dataset.ignore_sample_weights) \
                else list(c.sample_weights)
            sampler = BatchSampler(self.train_dataset, 0, 1, c.batch_size, seq_length,
                                   weights, can_sample_beyond_end=(name == "rew_end_model"),
                                   seed=int(self._np_rng.integers(0, 2 ** 31 - 1)))
            if self._device_store is not None:
                from .data.device_store import StoreBatchIterator

                self._prefetchers[name] = StoreBatchIterator(self._device_store, sampler)
            else:
                sharding = None
                if self._mesh is not None:
                    from .parallel import batch_sharding

                    sharding = batch_sharding(self._mesh)
                workers = int(cfg.training.get("num_workers_data_loaders", 2))
                self._prefetchers[name] = BatchPrefetcher(self.train_dataset, sampler,
                                                          sharding=sharding,
                                                          workers=workers).start()
        return self._prefetchers[name]

    def _ensure_imagination(self) -> None:
        cfg = self._cfg
        c = cfg.actor_critic.training
        if self._has_upsampler:
            raise ValueError(
                "imagination RL with a two-stage world model needs a low-res IC pool — "
                "not supported; set training.wm_only=True (or training.model_free=True)")
        if self._pool_manager is None:
            weights = None if (self._is_static_dataset
                               and cfg.static_dataset.ignore_sample_weights) \
                else list(c.sample_weights)
            n_cond = cfg.agent.denoiser.inner_model.num_steps_conditioning
            chunk = 512
            sampler = BatchSampler(self.train_dataset, 0, 1, chunk, n_cond, weights,
                                   seed=int(self._np_rng.integers(0, 2 ** 31 - 1)))
            pool_size = self._wm_env_cfg.num_batches_to_preload * c.batch_size
            self._pool_manager = PoolManager(
                self.engine, self.train_dataset, sampler, pool_size, chunk=chunk,
                store=self._device_store,
                policy_feats=bool(cfg.get("tpu", {}).get("pool_policy_feats", False)))
        max_consumption = self._loss_cfg.backup_every * c.batch_size + c.batch_size
        self._pool, swapped = self._pool_manager.ensure(self._pool, self._r_variables(),
                                                        max_consumption,
                                                        ac_vars=self._ac_variables())
        if swapped and self._mesh is not None:
            from .parallel import shard_pool

            self._pool = shard_pool(self._pool, self._mesh)
        if self._imag_state is None:
            self._imag_state, self._pool = self.engine.initial_state(self._pool,
                                                                     c.batch_size)
            if self._mesh is not None:
                from .parallel import shard_imag_state

                self._imag_state = shard_imag_state(self._imag_state, self._mesh)

    # -- main loop ------------------------------------------------------------

    def run(self) -> None:
        cfg = self._cfg
        to_log: Logs = []

        if self.epoch == 0:
            if self._is_model_free or self._is_static_dataset:
                self.num_epochs_collect = 0
            else:
                self.num_epochs_collect, logs = self.collect_initial_dataset()
                to_log += logs

        num_epochs = self.num_epochs_collect + cfg.training.num_final_epochs

        profile_dir = cfg.get("tpu", {}).get("profile_dir")

        while self.epoch < num_epochs:
            self.epoch += 1
            start_time = time.time()
            print(f"\nEpoch {self.epoch} / {num_epochs}\n")

            profiling = profile_dir and self.epoch == 1
            if profiling:  # per-phase device trace (the reference has none; SURVEY.md §5)
                jax.profiler.start_trace(str(profile_dir))

            should_collect_train = (not self._is_model_free and not self._is_static_dataset
                                    and self.epoch <= self.num_epochs_collect)
            if should_collect_train:
                if self._pool_manager is not None:
                    # the background IC-pool builder samples the train dataset; quiesce it
                    # before episode appends mutate the index under it
                    self._pool_manager.wait_pending()
                to_log += self._train_collector.send(
                    NumToCollect(steps=cfg.collection.train.steps_per_epoch))

            if cfg.training.should:
                to_log += self.train_agent()

            should_test = cfg.evaluation.should and (self.epoch % cfg.evaluation.every == 0)
            if should_test and not self._is_static_dataset:
                to_log += self.collect_test()
            if should_test and not self._is_model_free:
                to_log += self.test_agent()

            if profiling:
                jax.profiler.stop_trace()

            from .utils import RESTART_EXIT_CODE, host_rss_gb, resolve_rss_limit_gb

            to_log.append({"duration": (time.time() - start_time) / 3600,
                           "host_rss_gb": round(host_rss_gb(), 3)})
            self.logger.log(to_log, self.epoch)
            to_log = []
            self.save_checkpoint()

            # Elastic restart guard: the tunneled platform leaks host memory per H2D
            # transfer (see data/device_store.py); if a residual path still grows RSS past
            # the limit, exit checkpointed-and-restartable instead of getting OOM-killed
            # mid-epoch. scripts/resume.sh loops on this exit code.

            limit = resolve_rss_limit_gb(cfg.get("tpu", {}).get("max_host_rss_gb"))
            if limit is not None and host_rss_gb() > limit:
                print(f"host RSS {host_rss_gb():.1f} GB > tpu.max_host_rss_gb={limit}; "
                      f"checkpoint saved — exiting {RESTART_EXIT_CODE} for restart "
                      "(scripts/resume.sh resumes automatically)")
                raise SystemExit(RESTART_EXIT_CODE)

        if not self._is_static_dataset:
            self.logger.log(self.collect_test(final=True), self.epoch)

    # -- collection -----------------------------------------------------------

    def collect_initial_dataset(self):
        """Dynamic initial collect until >= threshold minority-reward samples
        (reference trainer.py:269-300)."""
        print("\nInitial collect\n")
        to_log: Logs = []
        c = self._cfg.collection.train
        min_steps, steps_per_epoch = c.first_epoch.min, c.steps_per_epoch
        max_steps, threshold_rew = c.first_epoch.max, c.first_epoch.threshold_rew
        assert min_steps % steps_per_epoch == 0

        steps = min_steps
        while True:
            to_log += self._train_collector.send(NumToCollect(steps=steps))
            num_steps = self.train_dataset.num_steps
            total_minority_rew = sum(sorted(self.train_dataset.counts_rew)[:-1])
            if total_minority_rew >= threshold_rew:
                break
            if max_steps is not None and num_steps >= max_steps:
                print("Reached the specified maximum for initial collect")
                break
            print(f"Minority reward: {total_minority_rew}/{threshold_rew} "
                  "-> Keep collecting\n")
            steps = steps_per_epoch

        print("\nSummary of initial collect:")
        print(f"Num steps: {num_steps} / {c.num_steps_total}")

        remaining = c.num_steps_total - num_steps
        assert remaining % steps_per_epoch == 0
        return remaining // steps_per_epoch, to_log

    def collect_test(self, final: bool = False) -> Logs:
        """reference trainer.py:302-324."""
        c = self._cfg.collection.test
        episodes = c.num_final_episodes if final else c.num_episodes
        td = self.test_dataset
        td.clear()
        to_log = self._test_collector.send(NumToCollect(episodes=episodes))
        key_ep_id = f"{td.name}/episode_id"
        to_log = [{k: v + self.num_episodes_test if k == key_ep_id else v
                   for k, v in d.items()} for d in to_log]

        print(f"\nSummary of {'final' if final else 'test'} collect: "
              f"{td.num_episodes} episodes ({td.num_steps} steps)")
        self.num_episodes_test += episodes

        if final:
            to_log.append(final_protocol_metrics(to_log, episodes))
            print(to_log[-1])
        return to_log

    # -- training -------------------------------------------------------------

    def train_agent(self) -> Logs:
        to_log: Logs = []
        if self._device_store is not None:  # mirror episodes collected since last epoch
            self._device_store.sync(self.train_dataset)
        if self._is_model_free:
            model_names = ["actor_critic"]
        elif self._wm_only:
            model_names = [n for n in self._model_names if n in ("denoiser", "upsampler")]
        else:
            model_names = list(self._model_names)
        for name in model_names:
            c = self._cfg[name].training
            if self.epoch > c.start_after_epochs:
                steps = c.steps_first_epoch if self.epoch == 1 else c.steps_per_epoch
                to_log += self.train_component(name, steps)
        self._sync_agent_variables()
        return to_log

    def train_component(self, name: str, steps: int) -> Logs:
        c = self._cfg[name].training
        num_steps = c.grad_acc_steps * steps  # micro-steps (reference trainer.py:361)
        to_log: Logs = []
        state = self.train_states[name]
        spec = self._opt_specs[name]

        from tqdm import trange
        steps_iter = trange(num_steps, desc=f"Training {name}", leave=False)
        if name == "denoiser":
            it = iter(self._get_prefetcher(name))
            for _ in steps_iter:
                state, metrics = self._denoiser_step(state, self._denoiser_constants,
                                                     next(it), self._next_key())
                self._finish_step_metrics(name, metrics, to_log, spec, state)
        elif name == "upsampler":
            it = iter(self._get_prefetcher(name))
            for _ in steps_iter:
                state, metrics = self._upsampler_step(state, self._upsampler_constants,
                                                      next(it), self._next_key())
                self._finish_step_metrics(name, metrics, to_log, spec, state)
        elif name == "rew_end_model":
            it = iter(self._get_prefetcher(name))
            for _ in steps_iter:
                state, metrics = self._rew_end_step(state, next(it))
                self._finish_step_metrics(name, metrics, to_log, spec, state)
        elif self._is_model_free:  # actor_critic on the real env
            T = self._loss_cfg.backup_every
            for _ in steps_iter:
                _obs, act, rew, end, trunc, _logits, _val, val_boot, _ = \
                    self._rl_env_loop.send(T)
                ex = self._rl_env_loop.last_extras
                state, metrics = self._mf_ac_step(
                    state, jnp.asarray(_obs), jnp.asarray(act),
                    jnp.asarray(rew, jnp.float32), jnp.asarray(end), jnp.asarray(trunc),
                    jnp.asarray(ex["reset_mask"]), jnp.asarray(ex["hx0"]),
                    jnp.asarray(ex["cx0"]), jnp.asarray(val_boot))
                self.train_states[name] = state  # env loop polls params via _ac_variables
                self._finish_step_metrics(name, metrics, to_log, spec, state)
        else:  # actor_critic in imagination
            self.train_states[name] = state
            for _ in steps_iter:
                self._ensure_imagination()
                state = self.train_states[name]
                state, self._imag_state, self._pool, metrics = self._ac_step(
                    state, self._wm_infer_variables(), self._rew_end_infer_variables(),
                    self._imag_state, self._pool, self._next_key())
                self.train_states[name] = state
                metrics = dict(metrics,
                               pool_refill_wait_s=self._pool_manager.last_refill_wait_s)
                self._pool_manager.last_refill_wait_s = 0.0
                self._finish_step_metrics(name, metrics, to_log, spec, state)

        self.train_states[name] = state
        out = [d for d in self._materialize_logs(to_log)]
        process_confusion_matrices_if_any_and_compute_classification_metrics(out)
        return [{f"{name}/train/{k}": v for k, v in d.items()} for d in out]

    def _finish_step_metrics(self, name: str, metrics: Dict, to_log: Logs,
                             spec: OptimizerSpec, state: TrainState) -> None:
        metrics = dict(metrics)
        metrics[f"num_batch_train_{name}"] = self.num_batch_train[name]
        self.num_batch_train[name] += 1
        metrics["lr"] = spec.lr_at(self.num_batch_train[name] - 1)
        to_log.append(metrics)

    @staticmethod
    def _materialize_logs(to_log: Logs) -> Logs:
        """Convert device arrays to host values in one deferred pass. Scalars of the same
        key are stacked ON DEVICE and fetched with a single transfer per key — per-scalar
        fetches cost a full round trip each on tunneled platforms (~25 ms x hundreds of
        steps x keys would dominate the epoch)."""
        is_dev = lambda v: hasattr(v, "shape") and not isinstance(v, np.ndarray)
        # gather device values per key (scalars and fixed-shape arrays alike)
        per_key: Dict[Any, list] = {}
        for d in to_log:
            for k, v in d.items():
                if isinstance(v, dict):
                    for kk, vv in v.items():
                        if is_dev(vv):
                            per_key.setdefault((k, kk), []).append(vv)
                elif is_dev(v):
                    per_key.setdefault(k, []).append(v)
        fetched = {k: np.asarray(jnp.stack(vs)) for k, vs in per_key.items()}
        counters = {k: 0 for k in fetched}

        def take(key):
            i = counters[key]
            counters[key] += 1
            return fetched[key][i]

        out = []
        for d in to_log:
            row = {}
            for k, v in d.items():
                if isinstance(v, dict):
                    row[k] = {kk: (take((k, kk)) if is_dev(vv) else np.asarray(vv))
                              for kk, vv in v.items()}
                elif is_dev(v):
                    val = take(k)
                    row[k] = float(val) if val.ndim == 0 else val
                else:
                    row[k] = v
            out.append(row)
        return out

    def test_agent(self) -> Logs:
        """Per-component test losses over the held-out episodes (reference
        trainer.py:339-347, 391-406)."""
        to_log: Logs = []
        names = ["denoiser", "rew_end_model"]
        if self._has_upsampler:
            names.append("upsampler")
        if self._wm_only:
            names = [n for n in names if n != "rew_end_model"]

        # Route eval batches through a (per-eval) device store as well — the test dataset
        # is rebuilt every eval, so mirror it fresh; closes the last bulk H2D path of the
        # training loop on the leaking platform (data/device_store.py).
        test_store = None
        if self._device_store is not None and self.test_dataset.num_episodes:
            from .data.device_store import DeviceEpisodeStore

            size = self._cfg.env.train.size
            test_store = DeviceEpisodeStore(self.test_dataset.num_steps + 8,
                                            (size, size, 3), mesh=self._mesh)
            test_store.sync(self.test_dataset)

        for name in names:
            c = self._cfg[name].training
            if self.epoch <= c.start_after_epochs:
                continue
            seq_length = self._seq_len_denoiser if name == "denoiser" else c.seq_length
            traverser = DatasetTraverser(self.test_dataset, c.batch_size, seq_length,
                                         pad_to_batch=True)
            logs: Logs = []
            batches = (test_store.make_batch(ids, masked)
                       for ids, masked in traverser.iter_batches_ids()) \
                if test_store is not None else \
                (DeviceBatch.from_batch(b) for b in traverser)
            for db in batches:
                if name == "denoiser":
                    metrics = self._denoiser_eval(self._d_variables(), db, self._next_key())
                elif name == "upsampler":
                    metrics = self._upsampler_eval(self._u_variables(), db,
                                                   self._next_key())
                else:
                    metrics = self._rew_end_eval(self._r_variables(), db)
                metrics = dict(metrics)
                metrics[f"num_batch_test_{name}"] = self.num_batch_test[name]
                self.num_batch_test[name] += 1
                logs.append(metrics)
            logs = self._materialize_logs(logs)
            process_confusion_matrices_if_any_and_compute_classification_metrics(logs)
            to_log += [{f"{name}/test/{k}": v for k, v in d.items()} for d in logs]
        return to_log

    # -- checkpointing ---------------------------------------------------------

    def state_dict(self) -> Dict[str, Any]:
        self._sync_agent_variables()
        get = jax.device_get
        return {
            "agent": self.agent.state_dict(),
            "train_states": {name: {"params": get(ts.params),
                                    "opt_state": get(ts.opt_state),
                                    "step": int(ts.step)}
                             for name, ts in self.train_states.items()},
            "epoch": self.epoch,
            "num_epochs_collect": self.num_epochs_collect,
            "num_episodes_test": self.num_episodes_test,
            "num_batch_train": dict(self.num_batch_train),
            "num_batch_test": dict(self.num_batch_test),
            "train_dataset": self.train_dataset.state_dict(),
            "test_dataset": self.test_dataset.state_dict(),
        }

    def load_state_dict(self, sd: Dict[str, Any]) -> None:
        self.agent.load_state_dict(sd["agent"])
        for name in self._model_names:
            tss = sd["train_states"][name]
            ts = self.train_states[name]
            self.train_states[name] = ts.replace(
                params=jax.tree_util.tree_map(jnp.asarray, tss["params"]),
                opt_state=jax.tree_util.tree_map(
                    lambda x: jnp.asarray(x) if isinstance(x, (np.ndarray, jnp.ndarray,
                                                               np.generic)) else x,
                    tss["opt_state"]),
                step=jnp.asarray(tss["step"], jnp.int32))
        if "constants" in sd["agent"]["denoiser"]:
            self._denoiser_constants = jax.tree_util.tree_map(
                jnp.asarray, sd["agent"]["denoiser"]["constants"])
        if self._has_upsampler and "constants" in sd["agent"].get("upsampler", {}):
            self._upsampler_constants = jax.tree_util.tree_map(
                jnp.asarray, sd["agent"]["upsampler"]["constants"])
        if self._mesh is not None:
            from .parallel import replicate

            self.train_states = {k: replicate(v, self._mesh)
                                 for k, v in self.train_states.items()}
            self._denoiser_constants = replicate(self._denoiser_constants, self._mesh)
            self._upsampler_constants = replicate(self._upsampler_constants, self._mesh)
        self.epoch = sd["epoch"]
        self.num_epochs_collect = sd["num_epochs_collect"]
        self.num_episodes_test = sd["num_episodes_test"]
        self.num_batch_train = dict(sd["num_batch_train"])
        self.num_batch_test = dict(sd["num_batch_test"])
        self.train_dataset.load_state_dict(sd["train_dataset"])
        self.test_dataset.load_state_dict(sd["test_dataset"])

    def load_state_checkpoint(self) -> None:
        self.load_state_dict(load_pickle(self._path_state_ckpt))

    def save_checkpoint(self) -> None:
        save_with_backup(self.state_dict(), self._path_state_ckpt)
        self.train_dataset.save_to_default_path()
        self.test_dataset.save_to_default_path()
        keep_agent_copies_every(self.agent.state_dict(), self.epoch, self._path_ckpt_dir,
                                every=self._cfg.checkpointing.save_agent_every,
                                num_to_keep=self._cfg.checkpointing.num_to_keep)
        save_info_for_import_script(self.epoch, self._cfg.wandb.name, self._path_ckpt_dir)
