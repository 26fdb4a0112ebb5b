"""A compact torch implementation of the reference denoiser ARCHITECTURE, used only to
produce reference-format state dicts and reference outputs for converter tests. Written from
the architecture description in SURVEY.md section 2.1 (not copied); state-dict keys follow
the reference's module naming so the converter sees the real layout."""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

GN_EPS = 1e-5


def gn_groups(c):
    return max(1, c // 32)


class TGroupNorm(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = nn.GroupNorm(gn_groups(c), c, eps=GN_EPS)

    def forward(self, x):
        return self.norm(x)


class TAdaGN(nn.Module):
    def __init__(self, c, cond_c):
        super().__init__()
        self.c = c
        self.linear = nn.Linear(cond_c, 2 * c)

    def forward(self, x, cond):
        x = F.group_norm(x, gn_groups(self.c), eps=GN_EPS)
        scale, shift = self.linear(cond)[:, :, None, None].chunk(2, dim=1)
        return x * (1 + scale) + shift


class TAttn(nn.Module):
    def __init__(self, c, head_dim=8):
        super().__init__()
        self.nh = max(1, c // head_dim)
        self.norm = TGroupNorm(c)
        self.qkv_proj = nn.Conv2d(c, 3 * c, 1)
        self.out_proj = nn.Conv2d(c, c, 1)

    def forward(self, x):
        n, c, h, w = x.shape
        x = self.norm(x)
        qkv = self.qkv_proj(x).view(n, self.nh * 3, c // self.nh, h * w).transpose(2, 3)
        q, k, v = qkv.chunk(3, dim=1)
        att = F.softmax(q @ k.transpose(-2, -1) / math.sqrt(c // self.nh), dim=-1)
        y = (att @ v).transpose(2, 3).reshape(n, c, h, w)
        return x + self.out_proj(y)


class TResBlock(nn.Module):
    def __init__(self, cin, cout, cond_c, attn):
        super().__init__()
        self.proj = nn.Conv2d(cin, cout, 1) if cin != cout else nn.Identity()
        self.norm1 = TAdaGN(cin, cond_c)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = TAdaGN(cout, cond_c)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.attn = TAttn(cout) if attn else nn.Identity()

    def forward(self, x, cond):
        r = self.proj(x)
        x = self.conv1(F.silu(self.norm1(x, cond)))
        x = self.conv2(F.silu(self.norm2(x, cond)))
        return self.attn(x + r) if not isinstance(self.attn, nn.Identity) \
            else x + r


class TResBlocks(nn.Module):
    def __init__(self, cins, couts, cond_c, attn):
        super().__init__()
        self.resblocks = nn.ModuleList(
            [TResBlock(ci, co, cond_c, attn) for ci, co in zip(cins, couts)])

    def forward(self, x, cond, to_cat=None):
        outs = []
        for i, rb in enumerate(self.resblocks):
            x = x if to_cat is None else torch.cat((x, to_cat[i]), dim=1)
            x = rb(x, cond)
            outs.append(x)
        return x, outs


class TDown(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class TUp(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class TUNet(nn.Module):
    def __init__(self, cond_c, depths, channels, attn_depths):
        super().__init__()
        self.num_down = len(channels) - 1
        d_blocks, u_blocks = [], []
        for i, n in enumerate(depths):
            c1, c2 = channels[max(0, i - 1)], channels[i]
            d_blocks.append(TResBlocks([c1] + [c2] * (n - 1), [c2] * n, cond_c,
                                       attn_depths[i]))
            u_blocks.append(TResBlocks([2 * c2] * n + [c1 + c2], [c2] * n + [c1], cond_c,
                                       attn_depths[i]))
        self.d_blocks = nn.ModuleList(d_blocks)
        self.u_blocks = nn.ModuleList(reversed(u_blocks))
        self.mid_blocks = TResBlocks([channels[-1]] * 2, [channels[-1]] * 2, cond_c, True)
        self.downsamples = nn.ModuleList([nn.Identity()] + [TDown(c) for c in channels[:-1]])
        self.upsamples = nn.ModuleList(
            [nn.Identity()] + [TUp(c) for c in reversed(channels[:-1])])

    def forward(self, x, cond):
        d_outputs = []
        for block, down in zip(self.d_blocks, self.downsamples):
            x_down = down(x)
            x, outs = block(x_down, cond)
            d_outputs.append((x_down, *outs))
        x, _ = self.mid_blocks(x, cond)
        for block, up, skip in zip(self.u_blocks, self.upsamples, reversed(d_outputs)):
            x_up = up(x)
            x, _ = block(x_up, cond, skip[::-1])
        return x


class TInnerModel(nn.Module):
    def __init__(self, img_c, n_cond, cond_c, depths, channels, attn_depths, num_actions):
        super().__init__()
        self.noise_emb_dim = cond_c
        self.register_buffer("noise_w", torch.randn(1, cond_c // 2))
        self.act_emb = nn.Sequential(nn.Embedding(num_actions, cond_c // n_cond),
                                     nn.Flatten())
        self.cond_proj = nn.Sequential(nn.Linear(cond_c, cond_c), nn.SiLU(),
                                       nn.Linear(cond_c, cond_c))
        self.conv_in = nn.Conv2d((n_cond + 1) * img_c, channels[0], 3, padding=1)
        self.unet = TUNet(cond_c, depths, channels, attn_depths)
        self.norm_out = TGroupNorm(channels[0])
        self.conv_out = nn.Conv2d(channels[0], img_c, 3, padding=1)

    def state_dict_ref_format(self):
        sd = self.state_dict()
        sd["noise_emb.weight"] = sd.pop("noise_w")
        return sd

    def forward(self, noisy, c_noise, obs, act):
        f = 2 * math.pi * c_noise.unsqueeze(1) @ self.noise_w
        noise_emb = torch.cat([f.cos(), f.sin()], dim=-1)
        cond = self.cond_proj(noise_emb + self.act_emb(act))
        x = self.conv_in(torch.cat((obs, noisy), dim=1))
        x = self.unet(x, cond)
        return self.conv_out(F.silu(self.norm_out(x)))


class TRewEndEncoder(nn.Module):
    """Torch twin of the reference RewEndEncoder (SURVEY.md section 2.1: conv_in, per-level
    ResBlocks with Downsample between, final attn ResBlocks pair)."""

    def __init__(self, in_c, cond_c, depths, channels, attn_depths):
        super().__init__()
        self.conv_in = nn.Conv2d(in_c, channels[0], 3, padding=1)
        blocks = []
        for i, n in enumerate(depths):
            c1, c2 = channels[max(0, i - 1)], channels[i]
            blocks.append(TResBlocks([c1] + [c2] * (n - 1), [c2] * n, cond_c,
                                     attn_depths[i]))
        blocks.append(TResBlocks([channels[-1]] * 2, [channels[-1]] * 2, cond_c, True))
        self.blocks = nn.ModuleList(blocks)
        self.downsamples = nn.ModuleList(
            [nn.Identity()] + [TDown(c) for c in channels[:-1]] + [nn.Identity()])

    def forward(self, x, cond):
        x = self.conv_in(x)
        for block, down in zip(self.blocks, self.downsamples):
            x = down(x)
            x, _ = block(x, cond)
        return x


class TRewEndModel(nn.Module):
    def __init__(self, lstm_dim, img_c, img_size, cond_c, depths, channels, attn_depths,
                 num_actions):
        super().__init__()
        self.encoder = TRewEndEncoder(2 * img_c, cond_c, depths, channels, attn_depths)
        self.act_emb = nn.Embedding(num_actions, cond_c)
        feat = img_size // 2 ** (len(depths) - 1)
        self.lstm = nn.LSTM(channels[-1] * feat * feat, lstm_dim, batch_first=True)
        self.head = nn.Sequential(nn.Linear(lstm_dim, lstm_dim), nn.SiLU(),
                                  nn.Linear(lstm_dim, 5, bias=False))

    def forward(self, obs, act, next_obs, hx_cx=None):
        b, t, c, h, w = obs.shape
        x = torch.cat((obs.reshape(b * t, c, h, w), next_obs.reshape(b * t, c, h, w)), dim=1)
        cond = self.act_emb(act.reshape(b * t))
        x = self.encoder(x, cond).reshape(b, t, -1)
        x, hx_cx = self.lstm(x, hx_cx)
        logits = self.head(x)
        return logits[:, :, :-2], logits[:, :, -2:], hx_cx


class TActorCritic(nn.Module):
    """Torch twin of the reference ActorCritic (SURVEY.md section 2.1: conv_in +
    SmallResBlock/MaxPool encoder -> LSTMCell -> linear heads)."""

    def __init__(self, lstm_dim, img_c, img_size, channels, down, num_actions):
        super().__init__()
        layers = [nn.Conv2d(img_c, channels[0], 3, padding=1)]
        for i, ch in enumerate(channels):
            cin = channels[max(0, i - 1)]
            layers.append(TSmallResBlock(cin, ch))
            if down[i]:
                layers.append(nn.MaxPool2d(2))
        # reference nests the Sequential inside an encoder module: keys encoder.encoder.N
        class _Enc(nn.Module):
            def __init__(self, seq):
                super().__init__()
                self.encoder = seq

            def forward(self, x):
                return self.encoder(x)

        self.encoder = _Enc(nn.Sequential(*layers))
        feat = img_size // 2 ** sum(down)
        self.lstm = nn.LSTMCell(channels[-1] * feat * feat, lstm_dim)
        self.actor_linear = nn.Linear(lstm_dim, num_actions)
        self.critic_linear = nn.Linear(lstm_dim, 1)

    def forward(self, obs, hx_cx):
        x = self.encoder(obs).flatten(1)
        hx, cx = self.lstm(x, hx_cx)
        return self.actor_linear(hx), self.critic_linear(hx).squeeze(1), (hx, cx)


class TSmallResBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.f = nn.Sequential(TGroupNorm(cin), nn.SiLU(),
                               nn.Conv2d(cin, cout, 3, padding=1))
        self.skip_projection = nn.Identity() if cin == cout else nn.Conv2d(cin, cout, 1)

    def forward(self, x):
        return self.skip_projection(x) + self.f(x)
