"""Torch oracle: a from-scratch replica of the NeMo Conformer encoder math,
used ONLY as a numerical test oracle for full-stack converter parity
(VERDICT r1 item 3a — the missing end-to-end check above per-module layout
tests).

Functional spec (reference, vendored NeMo):
  * ConvSubsampling 'striding': parts/submodules/subsampling.py:62-380
  * RelPositionalEncoding: parts/submodules/multi_head_attention.py:935-980
  * RelPositionMultiHeadAttention: multi_head_attention.py:157-251
  * ConformerLayer / ConformerConvolution / ConformerFeedForward:
    parts/submodules/conformer_modules.py:36-413
  * encoder assembly (xscale, pre-encode, layers):
    modules/conformer_encoder.py:507-640

Written fresh against the documented behavior, NOT copied; this file is a
test fixture, never imported by the framework.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as Fn


class OracleFeedForward(nn.Module):
    def __init__(self, d_model, d_ff):
        super().__init__()
        self.linear1 = nn.Linear(d_model, d_ff)
        self.linear2 = nn.Linear(d_ff, d_model)

    def forward(self, x):
        return self.linear2(Fn.silu(self.linear1(x)))


class OracleRelPosMHA(nn.Module):
    """Transformer-XL rel-pos attention: scores =
    ((q+u)·kᵀ + rel_shift((q+v)·pᵀ)) / sqrt(d_k)."""

    def __init__(self, d_model, n_heads):
        super().__init__()
        self.h = n_heads
        self.d_k = d_model // n_heads
        self.linear_q = nn.Linear(d_model, d_model)
        self.linear_k = nn.Linear(d_model, d_model)
        self.linear_v = nn.Linear(d_model, d_model)
        self.linear_out = nn.Linear(d_model, d_model)
        self.linear_pos = nn.Linear(d_model, d_model, bias=False)
        self.pos_bias_u = nn.Parameter(torch.zeros(n_heads, self.d_k))
        self.pos_bias_v = nn.Parameter(torch.zeros(n_heads, self.d_k))

    @staticmethod
    def rel_shift(x):
        # [B, H, T, 2T-1]: pad a zero column left, reshape, drop first row
        b, h, t, p = x.shape
        x = Fn.pad(x, (1, 0))
        x = x.view(b, h, p + 1, t)
        return x[:, :, 1:].view(b, h, t, p)

    def forward(self, x, pos_emb):
        B, T, _ = x.shape
        q = self.linear_q(x).view(B, T, self.h, self.d_k)
        k = self.linear_k(x).view(B, T, self.h, self.d_k)
        v = self.linear_v(x).view(B, T, self.h, self.d_k)
        p = self.linear_pos(pos_emb).view(-1, self.h, self.d_k)

        qu = (q + self.pos_bias_u).transpose(1, 2)   # [B, H, T, d]
        qv = (q + self.pos_bias_v).transpose(1, 2)
        kt = k.transpose(1, 2)                        # [B, H, T, d]
        ac = torch.matmul(qu, kt.transpose(-2, -1))   # [B, H, T, T]
        bd = torch.matmul(qv, p.permute(1, 2, 0).unsqueeze(0))  # [B,H,T,2T-1]
        bd = self.rel_shift(bd)[..., :T]
        scores = (ac + bd) / math.sqrt(self.d_k)
        attn = torch.softmax(scores, dim=-1)
        out = torch.matmul(attn, v.transpose(1, 2))   # [B, H, T, d]
        out = out.transpose(1, 2).reshape(B, T, self.h * self.d_k)
        return self.linear_out(out)


class OracleConvModule(nn.Module):
    def __init__(self, d_model, kernel_size):
        super().__init__()
        self.pointwise_conv1 = nn.Conv1d(d_model, 2 * d_model, 1)
        self.depthwise_conv = nn.Conv1d(
            d_model, d_model, kernel_size, padding=(kernel_size - 1) // 2,
            groups=d_model,
        )
        self.batch_norm = nn.BatchNorm1d(d_model)
        self.pointwise_conv2 = nn.Conv1d(d_model, d_model, 1)

    def forward(self, x):
        h = x.transpose(1, 2)              # [B, D, T]
        h = self.pointwise_conv1(h)
        h = Fn.glu(h, dim=1)
        h = self.depthwise_conv(h)
        h = self.batch_norm(h)
        h = Fn.silu(h)
        h = self.pointwise_conv2(h)
        return h.transpose(1, 2)


class OracleConformerLayer(nn.Module):
    def __init__(self, d_model, d_ff, n_heads, kernel_size):
        super().__init__()
        self.norm_feed_forward1 = nn.LayerNorm(d_model)
        self.feed_forward1 = OracleFeedForward(d_model, d_ff)
        self.norm_self_att = nn.LayerNorm(d_model)
        self.self_attn = OracleRelPosMHA(d_model, n_heads)
        self.norm_conv = nn.LayerNorm(d_model)
        self.conv = OracleConvModule(d_model, kernel_size)
        self.norm_feed_forward2 = nn.LayerNorm(d_model)
        self.feed_forward2 = OracleFeedForward(d_model, d_ff)
        self.norm_out = nn.LayerNorm(d_model)

    def forward(self, x, pos_emb):
        x = x + 0.5 * self.feed_forward1(self.norm_feed_forward1(x))
        x = x + self.self_attn(self.norm_self_att(x), pos_emb)
        x = x + self.conv(self.norm_conv(x))
        x = x + 0.5 * self.feed_forward2(self.norm_feed_forward2(x))
        return self.norm_out(x)


class OracleSubsampling(nn.Module):
    """'striding' x4: two Conv2d(k3, s2, p1)+ReLU rounds, channel-major
    flatten, dense to d_model."""

    def __init__(self, channels, feat_in, d_model):
        super().__init__()
        f4 = feat_in
        for _ in range(2):
            f4 = (f4 + 2 - 3) // 2 + 1
        # NeMo nests these in a Sequential with interleaved ReLUs, giving
        # state-dict indices conv.0 / conv.2
        self.conv = nn.ModuleDict()
        self.conv0 = nn.Conv2d(1, channels, 3, stride=2, padding=1)
        self.conv2 = nn.Conv2d(channels, channels, 3, stride=2, padding=1)
        self.out = nn.Linear(channels * f4, d_model)

    def forward(self, x):
        # x: [B, T, F]
        h = torch.relu(self.conv0(x.unsqueeze(1)))
        h = torch.relu(self.conv2(h))               # [B, C, T4, F4]
        B, C, T4, F4 = h.shape
        flat = h.transpose(1, 2).reshape(B, T4, C * F4)  # channel-major
        return self.out(flat)


def rel_pos_emb(T, d_model):
    """pe over positions T-1 .. -(T-1) (RelPositionalEncoding.extend_pe)."""
    positions = torch.arange(
        T - 1, -T, -1, dtype=torch.float32
    ).unsqueeze(1)
    pe = torch.zeros(2 * T - 1, d_model)
    div = torch.exp(
        torch.arange(0, d_model, 2, dtype=torch.float32)
        * -(math.log(10000.0) / d_model)
    )
    pe[:, 0::2] = torch.sin(positions * div)
    pe[:, 1::2] = torch.cos(positions * div)
    return pe


class OracleConformerEncoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.d_model = cfg.d_model
        self.pre_encode = OracleSubsampling(
            cfg.conv_channels, cfg.feat_in, cfg.d_model
        )
        self.layers = nn.ModuleList(
            OracleConformerLayer(
                cfg.d_model, cfg.d_ff, cfg.n_heads, cfg.conv_kernel_size
            )
            for _ in range(cfg.n_layers)
        )

    def forward(self, feats):
        # feats: [B, F, T_mel] (NeMo layout)
        x = self.pre_encode(feats.transpose(1, 2))
        T = x.shape[1]
        x = x * math.sqrt(self.d_model)   # xscale
        pos_emb = rel_pos_emb(T, self.d_model)
        for layer in self.layers:
            x = layer(x, pos_emb)
        return x

    def nemo_state_dict(self):
        """Own weights renamed with NeMo's state-dict keys for the
        converter."""
        sd = {}
        ss = self.pre_encode
        sd["encoder.pre_encode.conv.0.weight"] = ss.conv0.weight.detach()
        sd["encoder.pre_encode.conv.0.bias"] = ss.conv0.bias.detach()
        sd["encoder.pre_encode.conv.2.weight"] = ss.conv2.weight.detach()
        sd["encoder.pre_encode.conv.2.bias"] = ss.conv2.bias.detach()
        sd["encoder.pre_encode.out.weight"] = ss.out.weight.detach()
        sd["encoder.pre_encode.out.bias"] = ss.out.bias.detach()
        for i, layer in enumerate(self.layers):
            p = f"encoder.layers.{i}."
            for ln in ("norm_feed_forward1", "norm_self_att", "norm_conv",
                       "norm_feed_forward2", "norm_out"):
                mod = getattr(layer, ln)
                sd[p + ln + ".weight"] = mod.weight.detach()
                sd[p + ln + ".bias"] = mod.bias.detach()
            for ff in ("feed_forward1", "feed_forward2"):
                mod = getattr(layer, ff)
                for lin in ("linear1", "linear2"):
                    sub = getattr(mod, lin)
                    sd[p + f"{ff}.{lin}.weight"] = sub.weight.detach()
                    sd[p + f"{ff}.{lin}.bias"] = sub.bias.detach()
            att = layer.self_attn
            for lin in ("linear_q", "linear_k", "linear_v", "linear_out"):
                sub = getattr(att, lin)
                sd[p + f"self_attn.{lin}.weight"] = sub.weight.detach()
                sd[p + f"self_attn.{lin}.bias"] = sub.bias.detach()
            sd[p + "self_attn.linear_pos.weight"] = \
                att.linear_pos.weight.detach()
            sd[p + "self_attn.pos_bias_u"] = att.pos_bias_u.detach()
            sd[p + "self_attn.pos_bias_v"] = att.pos_bias_v.detach()
            conv = layer.conv
            sd[p + "conv.pointwise_conv1.weight"] = \
                conv.pointwise_conv1.weight.detach()
            sd[p + "conv.pointwise_conv1.bias"] = \
                conv.pointwise_conv1.bias.detach()
            sd[p + "conv.depthwise_conv.weight"] = \
                conv.depthwise_conv.weight.detach()
            sd[p + "conv.depthwise_conv.bias"] = \
                conv.depthwise_conv.bias.detach()
            sd[p + "conv.batch_norm.weight"] = conv.batch_norm.weight.detach()
            sd[p + "conv.batch_norm.bias"] = conv.batch_norm.bias.detach()
            sd[p + "conv.batch_norm.running_mean"] = \
                conv.batch_norm.running_mean.detach()
            sd[p + "conv.batch_norm.running_var"] = \
                conv.batch_norm.running_var.detach()
            sd[p + "conv.pointwise_conv2.weight"] = \
                conv.pointwise_conv2.weight.detach()
            sd[p + "conv.pointwise_conv2.bias"] = \
                conv.pointwise_conv2.bias.detach()
        return {k: v.numpy() for k, v in sd.items()}
