"""Golden-value tests: EDM conditioners, Karras sigma schedule, output quantization —
checked against the reference formulas re-derived in numpy
(reference: src/models/diffusion/denoiser.py:66-84, diffusion_sampler.py:61-67)."""

import numpy as np
import jax.numpy as jnp
import jax

from diamond_tpu.models import (Denoiser, DenoiserConfig, InnerModelConfig,
                                SigmaDistributionConfig, build_sigmas, quantize_to_uint8_grid)


def small_denoiser(sigma_data=0.5, sigma_offset_noise=0.3):
    cfg = DenoiserConfig(
        inner_model=InnerModelConfig(img_channels=3, num_steps_conditioning=4,
                                     cond_channels=16, depths=[1, 1], channels=[8, 8],
                                     attn_depths=[0, 0], num_actions=5),
        sigma_data=sigma_data,
        sigma_offset_noise=sigma_offset_noise,
    )
    return Denoiser(cfg)


def test_conditioners_match_edm_formulas():
    d = small_denoiser()
    sigma = jnp.array([0.002, 0.1, 1.0, 5.0, 20.0])
    cs = d.compute_conditioners(sigma)

    s = np.sqrt(np.asarray(sigma) ** 2 + 0.3 ** 2)  # offset noise folded in
    sd2 = 0.5 ** 2
    np.testing.assert_allclose(np.asarray(cs.c_in).ravel(), 1 / np.sqrt(s ** 2 + sd2),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(cs.c_skip).ravel(), sd2 / (s ** 2 + sd2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(cs.c_out).ravel(),
                               s * np.sqrt(sd2 / (s ** 2 + sd2)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(cs.c_noise), np.log(s) / 4, rtol=1e-4)
    assert cs.c_in.shape == (5, 1, 1, 1)
    assert cs.c_noise.shape == (5,)


def test_build_sigmas_karras_schedule():
    sigmas = build_sigmas(3, 2e-3, 5.0, 7)
    # Endpoints + trailing zero (reference diffusion_sampler.py:61-67).
    assert sigmas.shape == (4,)
    np.testing.assert_allclose(sigmas[0], 5.0, rtol=1e-6)
    np.testing.assert_allclose(sigmas[2], 2e-3, rtol=1e-6)
    assert sigmas[3] == 0.0
    # Middle point: ((max^(1/7) + 0.5*(min^(1/7)-max^(1/7)))^7
    mid = (5.0 ** (1 / 7) + 0.5 * (2e-3 ** (1 / 7) - 5.0 ** (1 / 7))) ** 7
    np.testing.assert_allclose(sigmas[1], mid, rtol=1e-6)
    assert np.all(np.diff(sigmas) < 0)


def test_quantization_matches_uint8_roundtrip():
    x = jnp.asarray(np.linspace(-1.5, 1.5, 1001, dtype=np.float32))
    q = np.asarray(quantize_to_uint8_grid(x))
    # reference denoiser.py:83: clamp(-1,1).add(1).div(2).mul(255).byte().div(255).mul(2).sub(1)
    # Compute the reference pipeline in float32, matching torch's precision.
    ref = np.clip(np.asarray(x, np.float32), np.float32(-1), np.float32(1))
    ref = ((ref + np.float32(1)) / np.float32(2) * np.float32(255)).astype(np.uint8)
    ref = ref.astype(np.float32) / np.float32(255) * np.float32(2) - np.float32(1)
    np.testing.assert_allclose(q, ref, atol=1e-6)
    # Re-quantizing drifts at most one grid level (floor on f32 is not exactly idempotent;
    # the torch reference byte() pipeline has the same property).
    q2 = np.asarray(quantize_to_uint8_grid(jnp.asarray(q)))
    assert np.abs(q2 - q).max() <= 2 / 255 + 1e-6


def test_sigma_training_distribution():
    d = small_denoiser()
    cfg = SigmaDistributionConfig(loc=-0.4, scale=1.2, sigma_min=2e-3, sigma_max=20)
    s = np.asarray(d.sample_sigma_training(jax.random.PRNGKey(0), 20000, cfg))
    assert s.min() >= 2e-3 and s.max() <= 20
    # log-sigma (unclipped mass) should center near loc
    inner = s[(s > 2.5e-3) & (s < 19)]
    assert abs(np.log(inner).mean() - (-0.4)) < 0.05


def test_apply_noise_statistics():
    d = small_denoiser()
    x = jnp.zeros((512, 4, 4, 3))
    sigma = jnp.full((512,), 2.0)
    noisy = np.asarray(d.apply_noise(jax.random.PRNGKey(1), x, sigma))
    # total variance = sigma^2 + sigma_offset_noise^2
    assert abs(noisy.var() - (4.0 + 0.09)) < 0.15
