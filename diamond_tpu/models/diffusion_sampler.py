"""Karras-schedule diffusion sampler (Euler / Heun, optional churn).

TPU-native counterpart of reference src/models/diffusion/diffusion_sampler.py. The sigma
schedule is computed once in numpy at construction (static), so the sampling loop unrolls at
trace time (default 3 steps) — the whole sampler is a single jittable pure function, nested
inside the imagination-rollout scan.

Exact-behavior note: the initial latent is a *standard normal* draw, NOT scaled by sigma_max
(reference diffusion_sampler.py:36 ``x = torch.randn(b, c, h, w)``), and the per-step gamma
uses static python comparisons on the schedule values (reference diffusion_sampler.py:39-40).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .denoiser import Denoiser

Variables = Any


@dataclass
class DiffusionSamplerConfig:
    """reference: src/models/diffusion/diffusion_sampler.py:10-20."""

    num_steps_denoising: int
    sigma_min: float = 2e-3
    sigma_max: float = 5.0
    rho: int = 7
    order: int = 1
    s_churn: float = 0.0
    s_tmin: float = 0.0
    s_tmax: float = float("inf")
    s_noise: float = 1.0

    @classmethod
    def from_cfg(cls, cfg: Any) -> "DiffusionSamplerConfig":
        return cls(
            num_steps_denoising=cfg.num_steps_denoising,
            sigma_min=float(cfg.sigma_min),
            sigma_max=float(cfg.sigma_max),
            rho=int(cfg.rho),
            order=int(cfg.order),
            s_churn=float(cfg.s_churn),
            s_tmin=float(cfg.s_tmin),
            s_tmax=float(cfg.s_tmax),
            s_noise=float(cfg.s_noise),
        )


def build_sigmas(num_steps: int, sigma_min: float, sigma_max: float, rho: int) -> np.ndarray:
    """Karras rho-schedule + trailing zero (reference diffusion_sampler.py:61-67)."""
    min_inv_rho = sigma_min ** (1 / rho)
    max_inv_rho = sigma_max ** (1 / rho)
    l = np.linspace(0, 1, num_steps)
    sigmas = (max_inv_rho + l * (min_inv_rho - max_inv_rho)) ** rho
    return np.concatenate([sigmas, np.zeros(1)])


class DiffusionSampler:
    """reference: src/models/diffusion/diffusion_sampler.py:23-58."""

    def __init__(self, denoiser: Denoiser, cfg: DiffusionSamplerConfig) -> None:
        self.denoiser = denoiser
        self.cfg = cfg
        self.sigmas = build_sigmas(cfg.num_steps_denoising, cfg.sigma_min, cfg.sigma_max,
                                   cfg.rho)
        self._calibrate_jit = {}  # site-selection -> jitted observe pass (calibrate())

    def sample(self, variables: Variables, rng: jax.Array, prev_obs: jnp.ndarray,
               prev_act: Optional[jnp.ndarray], return_trajectory: bool = False,
               x_init: Optional[jnp.ndarray] = None
               ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        """Sample the next frame given conditioning frames/actions.

        prev_obs: (B, T, H, W, C) float [-1,1]; prev_act: (B, T) int, or None for
        action-free denoisers (the two-stage upsampler stage). ``x_init`` overrides the
        initial standard-normal latent (reproducibility / fixed-noise parity testing).
        Returns (x, trajectory). Pure function of (variables, rng); loop unrolled (static
        schedule, default 3 steps). Callers wanting no-grad semantics wrap in stop_gradient.
        """
        from ..ops import quant

        cfg = self.cfg
        b, t, h, w, c = prev_obs.shape
        prev_obs = jnp.moveaxis(prev_obs, 1, 3).reshape(b, h, w, t * c)
        # STRUCTURAL int8 gate: quantize iff the variables carry calibrated static
        # activation scales (the "quant" collection, see calibrate()). The presence of
        # the collection changes the variables' pytree structure, so it IS part of the
        # jit cache key — unlike a process global, which an already-compiled rollout
        # would bake in. Uncalibrated variables run the bf16 path. During a calibration
        # pass the scope stays active so the convs observe (ops/quant.py calibrating()).
        enabled = quant.calibrating() or "quant" in variables
        with quant.int8_rollout_scope(enabled):
            return self._sample_inner(variables, rng, prev_obs, prev_act,
                                      return_trajectory, x_init, b, h, w, c)

    def _sample_inner(self, variables, rng, prev_obs, prev_act, return_trajectory,
                      x_init, b, h, w, c):
        """Body of sample(); traced inside the int8 scope so the denoiser's convs take the
        quantized MXU path when tpu.int8_rollout is on (sampling is stop-gradient
        inference — training losses never enter this scope)."""
        cfg = self.cfg
        # conv_in's conditioning contribution is sigma-independent: compute once, share
        # across every denoise of the loop (saves ~12/15 of conv_in per extra sigma step)
        obs_features = self.denoiser.compute_obs_features(variables, prev_obs)

        rng, rng_init = jax.random.split(rng)
        gamma_ = min(cfg.s_churn / (len(self.sigmas) - 1), 2 ** 0.5 - 1)
        x = jax.random.normal(rng_init, (b, h, w, c)) if x_init is None else x_init
        trajectory = [x] if return_trajectory else []

        for sigma, next_sigma in zip(self.sigmas[:-1], self.sigmas[1:]):
            sigma, next_sigma = float(sigma), float(next_sigma)
            gamma = gamma_ if cfg.s_tmin <= sigma <= cfg.s_tmax else 0.0
            sigma_hat = sigma * (gamma + 1)
            if gamma > 0:
                rng, rng_eps = jax.random.split(rng)
                eps = jax.random.normal(rng_eps, x.shape) * cfg.s_noise
                x = x + eps * (sigma_hat ** 2 - sigma ** 2) ** 0.5
            # NB the reference denoises with sigma, not sigma_hat, even with churn
            # (reference diffusion_sampler.py:44).
            denoised = self.denoiser.denoise(variables, x, sigma, prev_obs, prev_act,
                                             obs_features)
            d = (x - denoised) / sigma_hat
            dt = next_sigma - sigma_hat
            if cfg.order == 1 or next_sigma == 0:
                x = x + d * dt  # Euler
            else:
                x_2 = x + d * dt  # Heun
                denoised_2 = self.denoiser.denoise(variables, x_2, next_sigma, prev_obs,
                                                   prev_act, obs_features)
                d_2 = (x_2 - denoised_2) / next_sigma
                x = x + (d + d_2) / 2 * dt
            if return_trajectory:
                trajectory.append(x)
        return x, trajectory

    def calibrate(self, variables: Variables, rng: jax.Array, prev_obs: jnp.ndarray,
                  prev_act: Optional[jnp.ndarray], sites=None) -> Variables:
        """Observe per-site activation ranges for the static int8 rollout path and return
        ``variables`` augmented with the "quant" collection (ops/quant.py).

        Runs ONE full sampling pass under jit: each quantizable site (Conv3x3, Conv1x1,
        Dense) records its per-input-channel |x| maxima into a trace-scoped registry
        which the jitted function returns as the nested "quant" collection (the sampler's
        sigma loop and the U-Net are fully unrolled — no lax control flow wraps the
        sites, so the recorded tracers legally escape to the jit output). The scales are
        regular step-time inputs — recalibration never retraces the jitted rollout, and
        the observe pass itself compiles once and replays in milliseconds (the eager
        version cost minutes per epoch over the tunneled platform). Call with
        representative conditioning frames (e.g. a pool batch).

        ``sites``: which site kinds to quantize (quant.parse_sites spec; config
        tpu.int8_sites) — unselected kinds keep the bf16 path structurally (their
        modules find no calibrated leaf)."""
        from ..ops import quant

        sites = quant.parse_sites(sites)
        if sites not in self._calibrate_jit:
            def _observe(variables, rng, prev_obs, prev_act):
                registry: dict = {}
                with quant.calibration_scope(registry):
                    self.sample(variables, rng, prev_obs, prev_act)
                assert registry, "calibration saw no quantizable sites"
                return quant.registry_to_collection(registry, sites)

            self._calibrate_jit[sites] = jax.jit(_observe)
        # strip any stale "quant" collection so recalibration hits the same jit cache
        # entry as the first call (and the observe trace never reads it anyway)
        base = {k: v for k, v in variables.items() if k != "quant"}
        coll = self._calibrate_jit[sites](base, rng, prev_obs, prev_act)
        if not coll:  # site selection matched nothing: leave the variables unquantized
            return base
        return dict(base, quant=coll)


class TwoStageSampler:
    """Cascaded sampler for the two-stage world model (csgo-branch capability; the branch
    is not in the reference snapshot — own design, SR3-style cascade).

    The base sampler draws the next LOW-RES frame from the dynamics denoiser (autoregressive
    in low-res space); the upsampler stage then super-resolves it with a second EDM sampling
    loop conditioned on the bilinearly-upsampled low-res frame. The upsampler is memoryless
    (per-frame): temporal consistency is carried entirely by the low-res dynamics model, so
    high-res generation stays embarrassingly batchable."""

    def __init__(self, low_sampler: DiffusionSampler, upsampler: Denoiser,
                 up_cfg: DiffusionSamplerConfig) -> None:
        assert upsampler.cfg.upsampling_factor is not None
        self.low_sampler = low_sampler
        self.up_sampler = DiffusionSampler(upsampler, up_cfg)
        self.factor = int(upsampler.cfg.upsampling_factor)

    def sample(self, d_vars: Variables, u_vars: Variables, rng: jax.Array,
               prev_obs_low: jnp.ndarray, prev_act: jnp.ndarray
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """prev_obs_low: (B, T, h, w, C) low-res conditioning frames; prev_act: (B, T).
        Returns (next_low (B, h, w, C), next_high (B, h*f, w*f, C))."""
        from .denoiser import upsample_frame

        k_low, k_up = jax.random.split(rng)
        low, _ = self.low_sampler.sample(d_vars, k_low, prev_obs_low, prev_act)
        high = self.upsample(u_vars, k_up, low)
        return low, high

    def upsample(self, u_vars: Variables, rng: jax.Array, low: jnp.ndarray) -> jnp.ndarray:
        """Super-resolve a batch of low-res frames (B, h, w, C) -> (B, h*f, w*f, C)."""
        from .denoiser import upsample_frame

        cond = upsample_frame(low, self.factor)
        high, _ = self.up_sampler.sample(u_vars, rng, cond[:, None], None)
        return high
