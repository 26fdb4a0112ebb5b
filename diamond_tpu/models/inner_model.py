"""Raw diffusion network: UNet conditioned on noise level + past actions.

TPU-native counterpart of reference src/models/diffusion/inner_model.py:12-49. Frames are
NHWC; the 4 conditioning frames and the noisy next frame are concatenated channelwise in
frame-major order, matching the torch ``reshape(b, t*c, h, w)`` ordering so the conv_in
weights of reference checkpoints convert by transposition alone.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Optional

import jax.numpy as jnp
from flax import linen as nn

from .blocks import Conv3x3, FourierFeatures, GroupNorm, UNet, torch_linear_kernel_init, \
    fan_in_bias_init

Dtype = Any


@dataclass
class InnerModelConfig:
    """reference: src/models/diffusion/inner_model.py:12-20.

    ``is_upsampler``: action-free variant for the two-stage world model's upsampler stage
    (cascaded-diffusion conditioning: the network sees only the noise level and the
    channel-concatenated low-res conditioning frames — dynamics lives in the low-res
    model, so action conditioning is unnecessary)."""

    img_channels: int
    num_steps_conditioning: int
    cond_channels: int
    depths: List[int]
    channels: List[int]
    attn_depths: List[int]
    num_actions: Optional[int] = None
    is_upsampler: bool = False

    @classmethod
    def from_cfg(cls, cfg: Any, num_actions: Optional[int] = None) -> "InnerModelConfig":
        return cls(
            img_channels=cfg.img_channels,
            num_steps_conditioning=cfg.num_steps_conditioning,
            cond_channels=cfg.cond_channels,
            depths=list(cfg.depths),
            channels=list(cfg.channels),
            attn_depths=list(cfg.attn_depths),
            num_actions=num_actions,
            is_upsampler=bool(cfg.get("is_upsampler", False)),
        )


class InnerModel(nn.Module):
    """reference: src/models/diffusion/inner_model.py:23-49.

    Inputs:
      noisy_next_obs (B, H, W, C), c_noise (B,), obs (B, H, W, T*C) frame-major, act (B, T).
    Output: (B, H, W, C) F-space prediction.
    """

    cfg: InnerModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, noisy_next_obs: jnp.ndarray, c_noise: jnp.ndarray, obs: jnp.ndarray,
                 act: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        cfg = self.cfg
        t = cfg.num_steps_conditioning

        noise_emb = FourierFeatures(cfg.cond_channels, dtype=self.dtype, name="noise_emb")(
            c_noise)
        if cfg.is_upsampler:
            cond = noise_emb  # action-free: the low-res conditioning frames carry dynamics
        else:
            act_e = nn.Embed(cfg.num_actions, cfg.cond_channels // t, dtype=self.dtype,
                             embedding_init=nn.initializers.normal(1.0), name="act_emb")(act)
            act_e = act_e.reshape(act.shape[0], -1)  # b t e -> b (t e)
            cond = noise_emb + act_e
        cond = nn.Dense(cfg.cond_channels, dtype=self.dtype,
                        kernel_init=torch_linear_kernel_init,
                        bias_init=fan_in_bias_init(cfg.cond_channels),
                        name="cond_proj_0")(cond)
        cond = nn.Dense(cfg.cond_channels, dtype=self.dtype,
                        kernel_init=torch_linear_kernel_init,
                        bias_init=fan_in_bias_init(cfg.cond_channels),
                        name="cond_proj_2")(nn.silu(cond))

        x = jnp.concatenate([obs, noisy_next_obs], axis=-1).astype(self.dtype)
        x = Conv3x3(cfg.channels[0], self.dtype, name="conv_in")(x)
        x = UNet(cfg.depths, cfg.channels, cfg.attn_depths, dtype=self.dtype, name="unet")(
            x, cond)
        x = GroupNorm(dtype=self.dtype, fuse_silu=True, name="norm_out")(x)
        x = Conv3x3(cfg.img_channels, self.dtype, kernel_init=nn.initializers.zeros,
                    name="conv_out")(x)
        return x.astype(jnp.float32)
