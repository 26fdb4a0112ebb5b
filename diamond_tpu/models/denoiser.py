"""EDM (Karras et al.) preconditioning wrapper + training loss.

TPU-native counterpart of reference src/models/diffusion/denoiser.py. The module is purely
functional: every method takes the flax ``variables`` pytree and explicit RNG keys, so the
training loss jits cleanly and the autoregressive training window (default 2 target frames,
reference src/models/diffusion/denoiser.py:93-122) unrolls at trace time.

Exact-behavior notes (SURVEY.md section 7 "hard parts" item 5):
  * the offset-noise sigma is folded into the conditioners (reference denoiser.py:66-67),
  * the model output is quantized to the 256-level [-1, 1] grid inside wrap_model_output,
    including during the training rollout (reference denoiser.py:80-84, 118-119),
  * sigma ~ LogNormal(loc, scale) clipped to [sigma_min, sigma_max] (reference denoiser.py:52-59),
  * the loss is a masked MSE in F-space (reference denoiser.py:115-116).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .inner_model import InnerModel, InnerModelConfig

Variables = Any


class Conditioners(NamedTuple):
    """reference: src/models/diffusion/denoiser.py:18-23. Shapes broadcast over (B, H, W, C)
    for c_in/c_out/c_skip and (B,) for c_noise."""

    c_in: jnp.ndarray
    c_out: jnp.ndarray
    c_skip: jnp.ndarray
    c_noise: jnp.ndarray


@dataclass
class SigmaDistributionConfig:
    """reference: src/models/diffusion/denoiser.py:26-31."""

    loc: float
    scale: float
    sigma_min: float
    sigma_max: float


@dataclass
class DenoiserConfig:
    """reference: src/models/diffusion/denoiser.py:34-38.

    ``upsampling_factor`` switches the model into the two-stage world model's upsampler
    stage (csgo-branch capability; the branch is not in the reference snapshot — this is
    an own cascaded-diffusion design): an action-free EDM denoiser at full resolution whose
    conditioning is the bilinearly-upsampled low-res frame, trained per-frame (see
    ``Denoiser.loss_upsampler``)."""

    inner_model: InnerModelConfig
    sigma_data: float
    sigma_offset_noise: float
    upsampling_factor: Optional[int] = None

    def __post_init__(self) -> None:
        if self.upsampling_factor is not None:
            assert self.upsampling_factor > 1
            self.inner_model.is_upsampler = True

    @classmethod
    def from_cfg(cls, cfg: Any, num_actions: Optional[int] = None) -> "DenoiserConfig":
        return cls(
            inner_model=InnerModelConfig.from_cfg(cfg.inner_model, num_actions),
            sigma_data=cfg.sigma_data,
            sigma_offset_noise=cfg.sigma_offset_noise,
            upsampling_factor=cfg.get("upsampling_factor", None),
        )


def quantize_to_uint8_grid(x: jnp.ndarray) -> jnp.ndarray:
    """Clamp to [-1,1] and snap to the 256-level grid the uint8 dataset lives on
    (reference: src/models/diffusion/denoiser.py:82-84; .byte() truncates -> floor here)."""
    x = jnp.clip(x, -1.0, 1.0)
    return jnp.floor((x + 1) / 2 * 255) / 255 * 2 - 1


def downsample_avg(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Exact area downsample by an integer factor over the (H, W) axes of (..., H, W, C)."""
    if factor == 1:
        return x
    *lead, h, w, c = x.shape
    assert h % factor == 0 and w % factor == 0, (h, w, factor)
    x = x.reshape(*lead, h // factor, factor, w // factor, factor, c)
    return x.mean(axis=(-4, -2))


def upsample_frame(x: jnp.ndarray, factor: int, method: str = "bilinear") -> jnp.ndarray:
    """Upsample the (H, W) axes of (..., H, W, C) by an integer factor."""
    if factor == 1:
        return x
    *lead, h, w, c = x.shape
    return jax.image.resize(x, (*lead, h * factor, w * factor, c), method=method)


class Denoiser:
    """Functional EDM wrapper around InnerModel."""

    def __init__(self, cfg: DenoiserConfig, dtype: Any = jnp.float32) -> None:
        self.cfg = cfg
        self.inner_model = InnerModel(cfg.inner_model, dtype=dtype)

    # -- setup ---------------------------------------------------------------

    def init(self, rng: jax.Array, img_size: int = 64, batch: int = 1) -> Variables:
        c = self.cfg.inner_model
        noisy = jnp.zeros((batch, img_size, img_size, c.img_channels), jnp.float32)
        obs = jnp.zeros((batch, img_size, img_size,
                         c.num_steps_conditioning * c.img_channels), jnp.float32)
        act = None if c.is_upsampler else jnp.zeros((batch, c.num_steps_conditioning),
                                                    jnp.int32)
        c_noise = jnp.zeros((batch,), jnp.float32)
        return self.inner_model.init(rng, noisy, c_noise, obs, act)

    # -- pure pieces ---------------------------------------------------------

    def sample_sigma_training(self, rng: jax.Array, n: int,
                              cfg: SigmaDistributionConfig) -> jnp.ndarray:
        """sigma ~ exp(N(loc, scale)) clipped (reference denoiser.py:52-59)."""
        s = jax.random.normal(rng, (n,)) * cfg.scale + cfg.loc
        return jnp.clip(jnp.exp(s), cfg.sigma_min, cfg.sigma_max)

    def apply_noise(self, rng: jax.Array, x: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
        """Per-channel offset noise + iid noise (reference denoiser.py:61-64). x is NHWC."""
        rng_off, rng_iid = jax.random.split(rng)
        b, _, _, c = x.shape
        offset = self.cfg.sigma_offset_noise * jax.random.normal(rng_off, (b, 1, 1, c))
        return x + offset + jax.random.normal(rng_iid, x.shape) * sigma[:, None, None, None]

    def compute_conditioners(self, sigma: jnp.ndarray) -> Conditioners:
        """EDM conditioners with the offset-noise sigma folded in
        (reference denoiser.py:66-72)."""
        sigma = jnp.sqrt(sigma ** 2 + self.cfg.sigma_offset_noise ** 2)
        sd2 = self.cfg.sigma_data ** 2
        c_in = 1.0 / jnp.sqrt(sigma ** 2 + sd2)
        c_skip = sd2 / (sigma ** 2 + sd2)
        c_out = sigma * jnp.sqrt(c_skip)
        c_noise = jnp.log(sigma) / 4
        expand = lambda v: v.reshape(v.shape + (1,) * (4 - v.ndim))
        return Conditioners(expand(c_in), expand(c_out), expand(c_skip), c_noise)

    def compute_model_output(self, variables: Variables, noisy_next_obs: jnp.ndarray,
                             obs: jnp.ndarray, act: jnp.ndarray, cs: Conditioners,
                             obs_features: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """reference denoiser.py:74-78. obs is (B,H,W,T*C) frame-major."""
        rescaled_obs = obs / self.cfg.sigma_data
        rescaled_noise = noisy_next_obs * cs.c_in
        return self.inner_model.apply(variables, rescaled_noise, cs.c_noise, rescaled_obs,
                                      act, obs_features)

    def compute_obs_features(self, variables: Variables, obs: jnp.ndarray) -> jnp.ndarray:
        """Precompute conv_in's conditioning contribution once per frame: the conditioning
        channels are constant across a sampler's sigma steps (the obs rescale 1/sigma_data
        is sigma-independent), so samplers share this across their denoise calls."""
        return self.inner_model.apply(variables, obs / self.cfg.sigma_data,
                                      method="compute_obs_features")

    def wrap_model_output(self, noisy_next_obs: jnp.ndarray, model_output: jnp.ndarray,
                          cs: Conditioners) -> jnp.ndarray:
        """c_skip*x + c_out*F, then quantize (reference denoiser.py:80-84). Callers are
        responsible for stop_gradient (the reference marks this @no_grad)."""
        d = cs.c_skip * noisy_next_obs + cs.c_out * model_output
        return quantize_to_uint8_grid(d)

    def denoise(self, variables: Variables, noisy_next_obs: jnp.ndarray, sigma: jnp.ndarray,
                obs: jnp.ndarray, act: jnp.ndarray,
                obs_features: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Single denoising evaluation (reference denoiser.py:86-91)."""
        sigma = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (noisy_next_obs.shape[0],))
        cs = self.compute_conditioners(sigma)
        model_output = self.compute_model_output(variables, noisy_next_obs, obs, act, cs,
                                                 obs_features)
        return self.wrap_model_output(noisy_next_obs, model_output, cs)

    # -- training ------------------------------------------------------------

    def loss(self, variables: Variables, batch_obs: jnp.ndarray, batch_act: jnp.ndarray,
             batch_mask: jnp.ndarray, rng: jax.Array,
             sigma_cfg: SigmaDistributionConfig) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Autoregressive training loss (reference denoiser.py:93-122).

        batch_obs: (B, T, H, W, C) float [-1,1]; batch_act: (B, T) int; batch_mask: (B, T) bool.
        Trains over ``T - num_steps_conditioning`` sliding windows, feeding its own quantized
        prediction back into the conditioning buffer.
        """
        n = self.cfg.inner_model.num_steps_conditioning
        b, t_total, h, w, c = batch_obs.shape
        seq_length = t_total - n

        all_obs = batch_obs
        loss = 0.0
        for i in range(seq_length):  # static, unrolled at trace time (default 2 iterations)
            rng, rng_sigma, rng_noise = jax.random.split(rng, 3)
            obs = all_obs[:, i: n + i]  # (B, n, H, W, C)
            next_obs = all_obs[:, n + i]
            act = batch_act[:, i: n + i]
            mask = batch_mask[:, n + i]

            obs = jnp.moveaxis(obs, 1, 3).reshape(b, h, w, n * c)  # frame-major channel stack

            sigma = self.sample_sigma_training(rng_sigma, b, sigma_cfg)
            noisy_next_obs = self.apply_noise(rng_noise, next_obs, sigma)

            cs = self.compute_conditioners(sigma)
            # remat the U-Net forward: TPU layout padding inflates the saved conv
            # activations ~4x; recomputing them in the backward is cheaper than the HBM
            # traffic (same trade as the imagination rollout, world_model_env.py)
            model_output = jax.checkpoint(self.compute_model_output)(
                variables, noisy_next_obs, obs, act, cs)

            target = (next_obs - cs.c_skip * noisy_next_obs) / cs.c_out
            se = (model_output - target) ** 2
            m = mask.astype(jnp.float32)
            denom = jnp.maximum(m.sum() * (h * w * c), 1.0)
            loss += (se.sum(axis=(1, 2, 3)) * m).sum() / denom

            denoised = jax.lax.stop_gradient(
                self.wrap_model_output(noisy_next_obs, model_output, cs))
            all_obs = all_obs.at[:, n + i].set(denoised)

        loss = loss / seq_length
        return loss, {"loss_denoising": jax.lax.stop_gradient(loss)}

    def loss_upsampler(self, variables: Variables, batch_obs: jnp.ndarray,
                       batch_mask: jnp.ndarray, rng: jax.Array,
                       sigma_cfg: SigmaDistributionConfig
                       ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Per-frame super-resolution training loss (two-stage world model, upsampler stage).

        batch_obs: (B, T, H, W, C) float [-1,1] FULL-RES frames; batch_mask: (B, T) bool.
        Every frame is an independent denoising problem — conditioning is the frame's own
        low-res rendition (area downsample by ``upsampling_factor``, snapped to the uint8
        grid exactly like the low-res dynamics model's sampled outputs, then bilinearly
        upsampled back) — so time folds into batch: one large MXU-friendly batch per step,
        no autoregressive unroll."""
        f = self.cfg.upsampling_factor
        assert f is not None, "loss_upsampler requires upsampling_factor"
        b, t, h, w, c = batch_obs.shape
        x = batch_obs.reshape(b * t, h, w, c)
        mask = batch_mask.reshape(b * t)

        low = quantize_to_uint8_grid(downsample_avg(x, f))
        cond = upsample_frame(low, f)

        rng_sigma, rng_noise = jax.random.split(rng)
        sigma = self.sample_sigma_training(rng_sigma, b * t, sigma_cfg)
        noisy = self.apply_noise(rng_noise, x, sigma)
        cs = self.compute_conditioners(sigma)
        model_output = jax.checkpoint(self.compute_model_output)(
            variables, noisy, cond, None, cs)

        target = (x - cs.c_skip * noisy) / cs.c_out
        se = (model_output - target) ** 2
        m = mask.astype(jnp.float32)
        denom = jnp.maximum(m.sum() * (h * w * c), 1.0)
        loss = (se.sum(axis=(1, 2, 3)) * m).sum() / denom
        return loss, {"loss_denoising": jax.lax.stop_gradient(loss)}
