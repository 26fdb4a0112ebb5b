"""Layer-level numerical equivalence between torch modules and our flax blocks under the
converter's weight transforms — this is where conversion bugs hide (transposes, gate order,
flatten permutations)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from diamond_tpu.interop.torch_ckpt import (_chw_to_hwc_perm, _t_conv, _t_lin)
from diamond_tpu.models.blocks import GroupNorm
from diamond_tpu.models.lstm import LSTMCell


def test_conv2d_equivalence():
    torch.manual_seed(0)
    m = torch.nn.Conv2d(6, 8, 3, padding=1)
    x = torch.randn(2, 6, 10, 12)
    with torch.no_grad():
        y_t = m(x).numpy()

    from flax import linen as nn
    conv = nn.Conv(8, (3, 3), padding=((1, 1), (1, 1)))
    params = {"params": {"kernel": jnp.asarray(_t_conv(m.weight.detach().numpy())),
                         "bias": jnp.asarray(m.bias.detach().numpy())}}
    x_j = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))  # NCHW -> NHWC
    y_j = conv.apply(params, x_j)
    np.testing.assert_allclose(np.transpose(np.asarray(y_j), (0, 3, 1, 2)), y_t,
                               rtol=1e-4, atol=1e-5)


def test_strided_conv_equivalence():
    """Downsample conv: torch stride-2 pad-1 vs our flax padding convention."""
    torch.manual_seed(1)
    m = torch.nn.Conv2d(4, 4, 3, stride=2, padding=1)
    x = torch.randn(1, 4, 16, 16)
    with torch.no_grad():
        y_t = m(x).numpy()
    from flax import linen as nn
    conv = nn.Conv(4, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    params = {"params": {"kernel": jnp.asarray(_t_conv(m.weight.detach().numpy())),
                         "bias": jnp.asarray(m.bias.detach().numpy())}}
    y_j = conv.apply(params, jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1))))
    np.testing.assert_allclose(np.transpose(np.asarray(y_j), (0, 3, 1, 2)), y_t,
                               rtol=1e-4, atol=1e-5)


def test_groupnorm_equivalence():
    torch.manual_seed(2)
    m = torch.nn.GroupNorm(2, 64, eps=1e-5)
    with torch.no_grad():
        m.weight.mul_(1.7).add_(0.1)
        m.bias.add_(0.3)
    x = torch.randn(3, 64, 8, 8)
    with torch.no_grad():
        y_t = m(x).numpy()
    gn = GroupNorm()
    params = {"params": {"scale": jnp.asarray(m.weight.detach().numpy()),
                         "bias": jnp.asarray(m.bias.detach().numpy())}}
    y_j = gn.apply(params, jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1))))
    np.testing.assert_allclose(np.transpose(np.asarray(y_j), (0, 3, 1, 2)), y_t,
                               rtol=1e-4, atol=1e-5)


def test_lstm_cell_equivalence_with_chw_permutation():
    """Torch LSTMCell fed with CHW-flattened features == our cell fed HWC-flattened,
    after the converter's input permutation."""
    torch.manual_seed(3)
    C, H, W, D = 4, 3, 5, 16
    m = torch.nn.LSTMCell(C * H * W, D)
    feats = torch.randn(2, C, H, W)
    hx = torch.randn(2, D)
    cx = torch.randn(2, D)
    with torch.no_grad():
        h_t, c_t = m(feats.flatten(1), (hx, cx))

    perm = _chw_to_hwc_perm(C, H, W)
    w_ih = _t_lin(m.weight_ih.detach().numpy())[perm]
    params = {"params": {
        "weight_ih": jnp.asarray(w_ih),
        "weight_hh": jnp.asarray(_t_lin(m.weight_hh.detach().numpy())),
        "bias_ih": jnp.asarray(m.bias_ih.detach().numpy()),
        "bias_hh": jnp.asarray(m.bias_hh.detach().numpy()),
    }}
    cell = LSTMCell(D)
    x_hwc = jnp.asarray(np.transpose(feats.numpy(), (0, 2, 3, 1)).reshape(2, -1))
    (h_j, c_j), _ = cell.apply(params, (jnp.asarray(hx.numpy()), jnp.asarray(cx.numpy())),
                               x_hwc)
    np.testing.assert_allclose(np.asarray(h_j), h_t.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_j), c_t.numpy(), rtol=1e-4, atol=1e-5)


def test_lstm_sequence_equivalence():
    torch.manual_seed(4)
    In, D, B, T = 12, 8, 2, 6
    m = torch.nn.LSTM(In, D, batch_first=True)
    x = torch.randn(B, T, In)
    with torch.no_grad():
        y_t, (h_t, c_t) = m(x)

    from diamond_tpu.models.lstm import LSTM
    params = {"params": {"cell": {
        "weight_ih": jnp.asarray(_t_lin(m.weight_ih_l0.detach().numpy())),
        "weight_hh": jnp.asarray(_t_lin(m.weight_hh_l0.detach().numpy())),
        "bias_ih": jnp.asarray(m.bias_ih_l0.detach().numpy()),
        "bias_hh": jnp.asarray(m.bias_hh_l0.detach().numpy()),
    }}}
    lstm = LSTM(D)
    hs, (h_j, c_j) = lstm.apply(params, jnp.asarray(x.numpy()),
                                (jnp.zeros((B, D)), jnp.zeros((B, D))))
    np.testing.assert_allclose(np.asarray(hs), y_t.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_j), h_t[0].numpy(), rtol=1e-4, atol=1e-5)


def test_full_actor_critic_conversion_structure():
    """Synthetic reference-style AC state dict converts into a tree our model applies."""
    from diamond_tpu.interop.torch_ckpt import convert_actor_critic
    from diamond_tpu.models import ActorCritic, ActorCriticConfig

    IMG, NA, D = 16, 3, 32
    channels, down = [8, 8], [1, 1]
    rng = np.random.default_rng(0)

    sd = {}
    sd["encoder.encoder.0.weight"] = rng.normal(size=(8, 3, 3, 3)).astype(np.float32)
    sd["encoder.encoder.0.bias"] = np.zeros(8, np.float32)
    idx = 1
    for i, ch in enumerate(channels):
        cin = channels[max(0, i - 1)]
        sd[f"encoder.encoder.{idx}.f.0.norm.weight"] = np.ones(cin, np.float32)
        sd[f"encoder.encoder.{idx}.f.0.norm.bias"] = np.zeros(cin, np.float32)
        sd[f"encoder.encoder.{idx}.f.2.weight"] = rng.normal(
            size=(ch, cin, 3, 3)).astype(np.float32)
        sd[f"encoder.encoder.{idx}.f.2.bias"] = np.zeros(ch, np.float32)
        idx += 1 + down[i]
    feat_dim = channels[-1] * (IMG // 2 ** sum(down)) ** 2
    sd["lstm.weight_ih"] = rng.normal(size=(4 * D, feat_dim)).astype(np.float32)
    sd["lstm.weight_hh"] = rng.normal(size=(4 * D, D)).astype(np.float32)
    sd["lstm.bias_ih"] = np.zeros(4 * D, np.float32)
    sd["lstm.bias_hh"] = np.zeros(4 * D, np.float32)
    sd["actor_linear.weight"] = np.zeros((NA, D), np.float32)
    sd["actor_linear.bias"] = np.zeros(NA, np.float32)
    sd["critic_linear.weight"] = np.zeros((1, D), np.float32)
    sd["critic_linear.bias"] = np.zeros(1, np.float32)

    variables = convert_actor_critic(sd, IMG, down)
    ac = ActorCritic(ActorCriticConfig(lstm_dim=D, img_channels=3, img_size=IMG,
                                       channels=channels, down=down, num_actions=NA))
    ref = ac.init(jax.random.PRNGKey(0))
    # structure matches what the model expects
    s1 = jax.tree_util.tree_structure(ref["params"])
    s2 = jax.tree_util.tree_structure(
        jax.tree_util.tree_map(jnp.asarray, variables["params"]))
    assert s1 == s2
    # and it applies
    out = ac.predict_act_value(
        {"params": jax.tree_util.tree_map(jnp.asarray, variables["params"])},
        jnp.zeros((2, IMG, IMG, 3)), ac.initial_carry(2))
    assert out.logits_act.shape == (2, NA)
