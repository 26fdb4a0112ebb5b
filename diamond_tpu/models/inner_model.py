"""Raw diffusion network: UNet conditioned on noise level + past actions.

TPU-native counterpart of reference src/models/diffusion/inner_model.py:12-49. Frames are
NHWC; the 4 conditioning frames and the noisy next frame are concatenated channelwise in
frame-major order, matching the torch ``reshape(b, t*c, h, w)`` ordering so the conv_in
weights of reference checkpoints convert by transposition alone.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import Conv3x3, FourierFeatures, GroupNorm, QDense, UNet, \
    torch_linear_kernel_init, fan_in_bias_init

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

    ``obs_features``: optional precomputed conv_in contribution of the conditioning
    channels (``apply(..., method="compute_obs_features")``). The conditioning frames are
    constant across a sampler's sigma steps while only the noisy frame changes, so the
    sampler computes their conv_in part once per frame (conv is linear in its input
    channels: conv(concat(a, b), K) = conv(a, K[..a..]) + conv(b, K[..b..]) + bias).
    When None the original fused concat conv runs (bit-identical default path).
    """

    cfg: InnerModelConfig
    dtype: Dtype = jnp.float32

    def setup(self) -> None:
        cfg = self.cfg
        t = cfg.num_steps_conditioning
        self.noise_emb = FourierFeatures(cfg.cond_channels, dtype=self.dtype)
        if not cfg.is_upsampler:
            self.act_emb = nn.Embed(cfg.num_actions, cfg.cond_channels // t,
                                    dtype=self.dtype,
                                    embedding_init=nn.initializers.normal(1.0))
        self.cond_proj_0 = QDense(cfg.cond_channels, dtype=self.dtype,
                                  kernel_init=torch_linear_kernel_init,
                                  bias_init=fan_in_bias_init(cfg.cond_channels))
        self.cond_proj_2 = QDense(cfg.cond_channels, dtype=self.dtype,
                                  kernel_init=torch_linear_kernel_init,
                                  bias_init=fan_in_bias_init(cfg.cond_channels))
        self.conv_in = Conv3x3(cfg.channels[0], self.dtype)
        self.unet = UNet(cfg.depths, cfg.channels, cfg.attn_depths, dtype=self.dtype)
        self.norm_out = GroupNorm(dtype=self.dtype, fuse_silu=True)
        self.conv_out = Conv3x3(cfg.img_channels, self.dtype,
                                kernel_init=nn.initializers.zeros)

    def compute_obs_features(self, obs: jnp.ndarray) -> jnp.ndarray:
        """conv_in contribution of the conditioning channels (no bias)."""
        k = self.conv_in.variables["params"]["kernel"].astype(self.dtype)
        return jax.lax.conv_general_dilated(
            obs.astype(self.dtype), k[:, :, :obs.shape[-1], :], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def __call__(self, noisy_next_obs: jnp.ndarray, c_noise: jnp.ndarray, obs: jnp.ndarray,
                 act: Optional[jnp.ndarray] = None,
                 obs_features: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        cfg = self.cfg

        noise_e = self.noise_emb(c_noise)
        if cfg.is_upsampler:
            cond = noise_e  # action-free: the low-res conditioning frames carry dynamics
        else:
            act_e = self.act_emb(act)
            act_e = act_e.reshape(act.shape[0], -1)  # b t e -> b (t e)
            cond = noise_e + act_e
        cond = self.cond_proj_2(nn.silu(self.cond_proj_0(cond)))

        if obs_features is None:
            x = jnp.concatenate([obs, noisy_next_obs], axis=-1).astype(self.dtype)
            x = self.conv_in(x)
        else:
            p = self.conv_in.variables["params"]
            k = p["kernel"].astype(self.dtype)
            split = k.shape[2] - noisy_next_obs.shape[-1]
            x = jax.lax.conv_general_dilated(
                noisy_next_obs.astype(self.dtype), k[:, :, split:, :], (1, 1),
                ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = x + obs_features.astype(self.dtype) + p["bias"].astype(self.dtype)
        x = self.unet(x, cond)
        x = self.norm_out(x)
        x = self.conv_out(x)
        return x.astype(jnp.float32)
