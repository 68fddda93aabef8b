"""Conformer encoder — TPU-first Flax implementation.

Functional re-design of the reference encoder stack
(reference: NeMo modules/conformer_encoder.py:55 `ConformerEncoder`,
parts/submodules/conformer_modules.py:36-413 `ConformerLayer`/
`ConformerConvolution`/`ConformerFeedForward`,
parts/submodules/multi_head_attention.py:157-251
`RelPositionMultiHeadAttention`, :935-980 `RelPositionalEncoding`,
parts/submodules/subsampling.py:62-380 `ConvSubsampling` 'striding').

Semantics preserved:
  * striding ConvSubsampling: `subsampling_num` rounds of
    Conv2D(k=3, s=2, pad=1) + ReLU over (time, mel) then a dense to d_model;
    output length per round: floor((len + 2 - 3) / 2) + 1
    (subsampling.py:566-576 `calc_length`, ceil_mode=False);
  * Transformer-XL rel-pos attention: scores = (q+u)·kᵀ + rel_shift((q+v)·pᵀ)
    all scaled by 1/sqrt(d_head); sin/cos encodings over positions
    [L-1 .. -(L-1)], input scaled by sqrt(d_model) when xscale;
  * layer order: ½FFN → MHSA → conv(GLU, depthwise k, norm, swish) → ½FFN
    → LayerNorm, residuals throughout;
  * `frozen_till`: layers below the threshold run without gradient flow
    (reference `encoder_frozen_till`, conformer_encoder.py:447,576-578) —
    here a single `stop_gradient` cut after the last frozen layer, which is
    both exact and cheaper (backward never enters the frozen prefix);
  * BatchNorm in the conv module computes batch statistics over the global
    (B, T) view — under GSPMD/pjit this is cross-replica-synced by
    construction, matching `SyncBatchNorm.convert_sync_batchnorm`
    (cl_baseline.py:133) with zero extra code.

TPU-first choices: all shapes static; padding handled by masks; compute
dtype configurable (bfloat16 for MXU throughput) with fp32 params and fp32
softmax/normalization accumulations.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import flax.linen as nn

from .common import FastDropout
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ConformerConfig:
    feat_in: int = 80
    n_layers: int = 17
    d_model: int = 512
    n_heads: int = 8
    ff_expansion_factor: int = 4
    conv_kernel_size: int = 31
    conv_norm_type: str = "batch_norm"  # or "layer_norm" / "group_norm<N>"
    subsampling_factor: int = 4
    subsampling_conv_channels: int = -1  # -1 -> d_model
    dropout: float = 0.1
    dropout_pre_encoder: float = 0.1
    dropout_emb: float = 0.0
    dropout_att: float = 0.1
    xscale: bool = True
    pos_emb_max_len: int = 5000
    frozen_till: int = 0  # layers [0, frozen_till) carry no gradient
    # (left, right) attention context in frames; -1 = unlimited. The
    # reference's `att_context_size` limited/streaming-style option
    # (conformer_encoder.py att_context_size, default [-1, -1]).
    att_context_size: tuple[int, int] = (-1, -1)
    # causal depthwise conv (left-only padding) — required for exact
    # cache-aware streaming (the reference's CausalConv1D option,
    # conformer_modules.py / SURVEY §5.7 streaming notes)
    causal_conv: bool = False
    # scan_layers: run the layer stack as a lax.scan over stacked
    # parameters [L, ...] instead of a Python-unrolled loop. Same math,
    # O(1) program size in depth (one layer body in the HLO instead of L
    # copies) and O(1) compile time — required at flagship depth: the
    # tunneled remote-compile service rejects the 17x-unrolled program
    # (HTTP 413 body-size limit). Param tree changes to
    # encoder/stack/layers/<leaf>[L, ...].
    scan_layers: bool = False
    # Longformer-style local+global attention (reference
    # multi_head_attention.py:253 RelPositionMultiHeadAttentionLongformer):
    # with global_tokens=G > 0, tokens at 0, s, 2s, ... (G-1)s attend
    # to/from every valid position (content-only scores, optionally via
    # separate q/k/v projections); all other tokens see the banded
    # att_context_size window plus the global keys. Positions are STATIC,
    # so no dynamic index gathers are needed on TPU.
    global_tokens: int = 0
    global_tokens_spacing: int = 1
    global_attn_separate: bool = False
    # "xla" (default) or "flash": the fused Pallas rel-pos attention
    # kernel (ops/flash_mhsa.py) — one (batch, head) row per grid step,
    # scores/softmax/dropout entirely in VMEM. Falls back to the XLA path
    # automatically when global_tokens > 0 or T > flash_mhsa.MAX_T.
    attn_impl: str = "xla"
    dtype: Any = jnp.float32  # compute dtype

    @property
    def d_ff(self) -> int:
        return self.d_model * self.ff_expansion_factor

    @property
    def conv_channels(self) -> int:
        return (
            self.d_model
            if self.subsampling_conv_channels == -1
            else self.subsampling_conv_channels
        )

    @property
    def sampling_num(self) -> int:
        return int(math.log2(self.subsampling_factor))


def subsampled_length(lengths, cfg: ConformerConfig):
    """calc_length with kernel 3, stride 2, pad 1+1, floor — per conv round."""
    out = lengths
    for _ in range(cfg.sampling_num):
        out = (out + 2 - 3) // 2 + 1
    return out


def subsampled_feat_dim(cfg: ConformerConfig) -> int:
    f = cfg.feat_in
    for _ in range(cfg.sampling_num):
        f = (f + 2 - 3) // 2 + 1
    return f


class ConvSubsampling(nn.Module):
    """'striding' subsampling: Conv2D(k3, s2, p1)+ReLU per round, then dense."""

    cfg: ConformerConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [B, T, F] -> [B, T/4, d_model]
        cfg = self.cfg
        h = x[..., None].astype(cfg.dtype)  # [B, T, F, C=1]
        for i in range(cfg.sampling_num):
            h = nn.Conv(
                features=cfg.conv_channels,
                kernel_size=(3, 3),
                strides=(2, 2),
                padding=((1, 1), (1, 1)),
                dtype=cfg.dtype,
                name=f"conv_{i}",
            )(h)
            h = nn.relu(h)
        B, T4, F4, C = h.shape
        h = h.reshape(B, T4, F4 * C)
        # NeMo flattens channel-major: (C, F) -> C*F; keep our own layout and
        # permute in the checkpoint converter instead.
        return nn.Dense(cfg.d_model, dtype=cfg.dtype, name="out")(h)


def rel_positional_encoding(length: int, d_model: int) -> np.ndarray:
    """[2L-1, d] sin/cos over positions L-1 .. -(L-1)
    (multi_head_attention.py:894-907, 946-954)."""
    positions = np.arange(length - 1, -length, -1, dtype=np.float64)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64)
        * -(math.log(10000.0) / d_model)
    )
    pe = np.zeros((2 * length - 1, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(positions * div_term)
    pe[:, 1::2] = np.cos(positions * div_term)
    return pe.astype(np.float32)


def rel_positional_encoding_dev(length: int, d_model: int) -> jnp.ndarray:
    """On-device `rel_positional_encoding`: same table built from iotas so
    no [2L-1, d] f32 literal is embedded in the program (host constants
    bloat the serialized HLO past the tunneled remote-compile cap).
    f32 sin/cos vs the NumPy f64 table differs by <1e-4 at |pos|<1e3."""
    positions = (length - 1) - jnp.arange(
        2 * length - 1, dtype=jnp.float32
    )  # L-1 .. -(L-1)
    div_term = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32)
        * (-math.log(10000.0) / d_model)
    )
    ang = positions[:, None] * div_term[None, :]  # [2L-1, d/2]
    # interleave sin/cos into even/odd feature columns
    return jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1).reshape(
        2 * length - 1, d_model
    )


def _rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, T, 2T-1] -> [B, H, T, T]: out[t, j] = in[t, (T-1) + (j - t)]
    via the XL pad/reshape trick (multi_head_attention.py:184-195)."""
    b, h, t, p = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(b, h, p + 1, t)
    x = x[:, :, 1:, :].reshape(b, h, t, p)
    return x[:, :, :, :t]


def _flash_max_t() -> int:
    from ..ops.flash_mhsa import MAX_T

    return MAX_T


class RelPosSelfAttention(nn.Module):
    """Transformer-XL style relative-position MHSA."""

    cfg: ConformerConfig

    @nn.compact
    def __call__(self, x, pos_emb, att_mask, deterministic: bool):
        cfg = self.cfg
        H, D = cfg.n_heads, cfg.d_model // cfg.n_heads
        B, T, _ = x.shape

        q = nn.Dense(cfg.d_model, dtype=cfg.dtype, name="linear_q")(x)
        k = nn.Dense(cfg.d_model, dtype=cfg.dtype, name="linear_k")(x)
        v = nn.Dense(cfg.d_model, dtype=cfg.dtype, name="linear_v")(x)
        p = nn.Dense(
            cfg.d_model, use_bias=False, dtype=cfg.dtype, name="linear_pos"
        )(pos_emb)  # [2T-1, d_model]

        bias_u = self.param("pos_bias_u", nn.initializers.zeros, (H, D))
        bias_v = self.param("pos_bias_v", nn.initializers.zeros, (H, D))

        if (
            cfg.attn_impl == "flash"
            and cfg.global_tokens == 0
            and T <= _flash_max_t()
            # during init the stacked-layer stack vmaps this module to
            # build [L]-stacked params; a vmapped pallas_call mis-tiles,
            # and init only needs shapes (no data-dependent init here),
            # so the XLA path below serves initialization
            and not self.is_initializing()
        ):
            from ..ops.flash_mhsa import flash_relpos_mhsa

            # flat [B, T, H*D] straight from the projections: the kernel
            # slices heads as 64-aligned lane windows, so NO [B,T,H,D] <->
            # [B,H,T,D] layout transpose ever materializes
            # per-row valid length from the mask diagonal (distance 0 is
            # always inside the band, so the diagonal is pure padding info)
            if att_mask is not None:
                t_iota = jnp.arange(T)
                lens = jnp.sum(
                    att_mask[:, t_iota, t_iota].astype(jnp.int32), axis=1
                )
            else:
                lens = jnp.full((B,), T, jnp.int32)
            seed = None
            drop = cfg.dropout_att if not deterministic else 0.0
            if drop > 0.0:
                seed = jax.random.bits(
                    self.make_rng("dropout"), (1,), dtype=jnp.uint32
                ).astype(jnp.int32)
            left, right = cfg.att_context_size
            out = flash_relpos_mhsa(
                q, k, v, p, bias_u, bias_v, lens,
                n_heads=H, left=left, right=right,
                dropout_rate=drop, dropout_seed=seed,
            )
            return nn.Dense(cfg.d_model, dtype=cfg.dtype, name="linear_out")(
                out
            )

        q = q.reshape(B, T, H, D)
        k = k.reshape(B, T, H, D)
        v = v.reshape(B, T, H, D)
        p = p.reshape(-1, H, D)

        # Scores ride in the COMPUTE dtype (bf16 at flagship), with f32
        # einsum accumulation and an f32 softmax (AMP contract, below).
        # The whole T x T/2T-1 scores path — the rel-shift pad/reshape
        # chain and the (ac+bd)+mask assembly — is HBM-bandwidth-bound
        # (op profile: ~8 ms/step at f32); carrying it at bf16 halves the
        # traffic. No-op when cfg.dtype is f32 (tests/parity configs).
        # content score: (q + u) · k^T   [B, H, T, T]
        ac = jnp.einsum(
            "bthd,bshd->bhts", q + bias_u.astype(q.dtype), k,
            preferred_element_type=jnp.float32,
        ).astype(cfg.dtype)
        # position score: rel_shift((q + v) · p^T)   [B, H, T, T]
        bd = jnp.einsum(
            "bthd,phd->bhtp", q + bias_v.astype(q.dtype), p,
            preferred_element_type=jnp.float32,
        ).astype(cfg.dtype)
        bd = _rel_shift(bd)
        scores = (ac + bd) / math.sqrt(D)  # compute dtype

        mask = att_mask[:, None, :, :] if att_mask is not None else None
        if cfg.global_tokens > 0:
            scores, mask, out_override = self._global_token_scores(
                x, q, k, v, scores, att_mask
            )
        else:
            out_override = None

        if mask is not None:
            scores = jnp.where(mask, scores, jnp.asarray(-1e9, scores.dtype))
        # softmax statistics in f32 (the converts fuse into the softmax
        # chain; only the bf16 scores read and bf16 probs write hit HBM)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        if mask is not None:
            # fully-masked (padding) query rows attend to nothing
            attn = jnp.where(mask, attn, 0.0)
        attn = FastDropout(cfg.dropout_att)(
            attn, deterministic=deterministic
        ).astype(cfg.dtype)

        if out_override is not None:
            v, row_sel, gv = out_override
            out_local = jnp.einsum(
                "bhts,bshd->bthd", attn, v,
                preferred_element_type=jnp.float32,
            )
            out_glob = jnp.einsum(
                "bhts,bshd->bthd", attn, gv,
                preferred_element_type=jnp.float32,
            )
            out = jnp.where(
                row_sel[None, :, None, None], out_glob, out_local
            ).astype(cfg.dtype)
        else:
            out = jnp.einsum(
                "bhts,bshd->bthd", attn, v, preferred_element_type=jnp.float32
            ).astype(cfg.dtype)
        out = out.reshape(B, T, cfg.d_model)
        return nn.Dense(cfg.d_model, dtype=cfg.dtype, name="linear_out")(out)

    def _global_token_scores(self, x, q, k, v, scores, att_mask):
        """Longformer global-token pass (static positions).

        Reference semantics (multi_head_attention.py:305-466): every token
        also attends to the G global keys (content-only scores, global
        projections when `global_attn_separate`), and global-token rows
        attend to ALL valid positions with their outputs drawn from the
        global values. One documented difference from the reference: an
        in-band global key contributes a single (global) score column here,
        where NeMo's concatenation double-counts it in the softmax."""
        cfg = self.cfg
        H, D = cfg.n_heads, cfg.d_model // cfg.n_heads
        B, T, _ = x.shape
        g_pos = np.arange(cfg.global_tokens) * cfg.global_tokens_spacing
        g_pos = g_pos[g_pos < T]
        is_g = np.zeros((T,), bool)
        is_g[g_pos] = True
        is_g = jnp.asarray(is_g)

        if cfg.global_attn_separate:
            gq = nn.Dense(cfg.d_model, dtype=cfg.dtype, name="global_q")(x)
            gk = nn.Dense(cfg.d_model, dtype=cfg.dtype, name="global_k")(x)
            gv = nn.Dense(cfg.d_model, dtype=cfg.dtype, name="global_v")(x)
            gq = gq.reshape(B, T, H, D)
            gk = gk.reshape(B, T, H, D)
            gv = gv.reshape(B, T, H, D)
        else:
            gq, gk, gv = q, k, v  # shared projections

        gscore = (
            jnp.einsum(
                "bthd,bshd->bhts", gq, gk,
                preferred_element_type=jnp.float32,
            ).astype(cfg.dtype)
            / math.sqrt(D)
        )

        if att_mask is not None:
            # per-position validity: the band always contains distance 0
            t_iota = jnp.arange(T)
            diag = att_mask[:, t_iota, t_iota]
        else:
            diag = jnp.ones((B, T), bool)
        valid_pair = diag[:, :, None] & diag[:, None, :]
        local = att_mask if att_mask is not None else valid_pair
        g_col = valid_pair & is_g[None, None, :]
        g_row = valid_pair & is_g[None, :, None]
        mask = (local | g_col | g_row)[:, None]
        # scores/gscore are [B, H, T_q, T_k]: global links (row or column
        # is a global token) use the content-only global scores
        use_g = is_g[None, None, :, None] | is_g[None, None, None, :]
        scores = jnp.where(use_g, gscore, scores)
        return scores, mask, (v, is_g, gv)


class ConformerConvModule(nn.Module):
    """pointwise(2d) -> GLU -> mask -> depthwise(k) -> norm -> swish
    -> pointwise(d) (conformer_modules.py:275-383)."""

    cfg: ConformerConfig

    @nn.compact
    def __call__(self, x, pad_mask, train: bool):
        cfg = self.cfg
        h = nn.Dense(2 * cfg.d_model, dtype=cfg.dtype, name="pointwise_conv1")(x)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.sigmoid(b)  # GLU over channel dim
        if pad_mask is not None:
            h = jnp.where(pad_mask[:, :, None], h, 0.0)
        # depthwise conv over time: feature_group_count = channels
        pad = (
            (cfg.conv_kernel_size - 1, 0)
            if cfg.causal_conv
            else (cfg.conv_kernel_size // 2,) * 2
        )
        h = nn.Conv(
            features=cfg.d_model,
            kernel_size=(cfg.conv_kernel_size,),
            padding=(pad,),
            feature_group_count=cfg.d_model,
            dtype=cfg.dtype,
            name="depthwise_conv",
        )(h)
        if cfg.conv_norm_type == "batch_norm":
            h = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=cfg.dtype,
                name="batch_norm",
            )(h)
        elif cfg.conv_norm_type == "layer_norm":
            h = nn.LayerNorm(dtype=cfg.dtype, name="batch_norm")(h)
        elif cfg.conv_norm_type.startswith("group_norm"):
            n_groups = int(cfg.conv_norm_type.replace("group_norm", "") or 1)
            h = nn.GroupNorm(
                num_groups=n_groups, dtype=cfg.dtype, name="batch_norm"
            )(h)
        else:
            raise ValueError(cfg.conv_norm_type)
        h = nn.swish(h)
        return nn.Dense(cfg.d_model, dtype=cfg.dtype, name="pointwise_conv2")(h)


class FeedForward(nn.Module):
    cfg: ConformerConfig

    @nn.compact
    def __call__(self, x, deterministic: bool):
        cfg = self.cfg
        h = nn.Dense(cfg.d_ff, dtype=cfg.dtype, name="linear1")(x)
        h = nn.swish(h)
        h = FastDropout(cfg.dropout)(h, deterministic=deterministic)
        return nn.Dense(cfg.d_model, dtype=cfg.dtype, name="linear2")(h)


class ConformerLayer(nn.Module):
    cfg: ConformerConfig

    @nn.compact
    def __call__(self, x, pos_emb, att_mask, pad_mask, train: bool):
        cfg = self.cfg
        det = not train
        drop = FastDropout(cfg.dropout)

        h = nn.LayerNorm(dtype=cfg.dtype, name="norm_feed_forward1")(x)
        h = FeedForward(cfg, name="feed_forward1")(h, det)
        x = x + 0.5 * drop(h, deterministic=det)

        h = nn.LayerNorm(dtype=cfg.dtype, name="norm_self_att")(x)
        h = RelPosSelfAttention(cfg, name="self_attn")(h, pos_emb, att_mask, det)
        x = x + drop(h, deterministic=det)

        h = nn.LayerNorm(dtype=cfg.dtype, name="norm_conv")(x)
        h = ConformerConvModule(cfg, name="conv")(h, pad_mask, train)
        x = x + drop(h, deterministic=det)

        h = nn.LayerNorm(dtype=cfg.dtype, name="norm_feed_forward2")(x)
        h = FeedForward(cfg, name="feed_forward2")(h, det)
        x = x + 0.5 * drop(h, deterministic=det)

        return nn.LayerNorm(dtype=cfg.dtype, name="norm_out")(x)


class ConformerLayerStack(nn.Module):
    """All ConformerLayers' parameters stacked along a leading [L] axis,
    applied with `jax.lax.scan` — ONE layer body in the compiled program
    regardless of depth (the TPU-idiomatic depth dimension; the reference
    unrolls an nn.ModuleList, conformer_encoder.py:576-640).

    The `frozen_till` gradient cut splits the scan into two static
    segments with a `stop_gradient` between them, so the backward scan
    never enters the frozen prefix — identical cost semantics to the
    unrolled stop-gradient cut. Parameter structure is INDEPENDENT of
    `frozen_till` (one [L] stack), so checkpoints restore across freeze
    settings; the frozen rows' weight-decay is neutralized in the
    optimizer (train/state.py `make_optimizer(stacked_freeze_till=...)`).
    """

    cfg: ConformerConfig

    @nn.compact
    def __call__(self, x, pos_emb, att_mask, pad_mask, train: bool):
        cfg = self.cfg
        L = cfg.n_layers
        layer = ConformerLayer(cfg)
        use_bn = cfg.conv_norm_type == "batch_norm"

        def init_params(rng):
            keys = jax.random.split(rng, L)
            # shapes don't depend on T/pos length: init on a 2-frame slice
            x2 = jnp.zeros((1, 2, cfg.d_model), x.dtype)
            pe2 = jnp.zeros((3, cfg.d_model), pos_emb.dtype)
            return jax.vmap(
                lambda k: layer.init(
                    {"params": k}, x2, pe2, None, None, False
                )["params"]
            )(keys)

        p_stack = self.param("layers", init_params)

        bs_var = None
        if use_bn:
            # nn.BatchNorm stats layout (mean zeros / var ones), stacked
            bs_var = self.variable(
                "batch_stats", "layers",
                lambda: {
                    "conv": {"batch_norm": {
                        "mean": jnp.zeros((L, cfg.d_model), jnp.float32),
                        "var": jnp.ones((L, cfg.d_model), jnp.float32),
                    }}
                },
            )

        update_stats = (
            use_bn and train and self.is_mutable_collection("batch_stats")
        )
        need_rng = train and (
            cfg.dropout > 0 or cfg.dropout_att > 0
        ) and self.has_rng("dropout")
        keys = (
            jax.random.split(self.make_rng("dropout"), L)
            if need_rng else None
        )

        def body(carry, xs):
            p, bs, key = xs
            variables = {"params": p}
            if use_bn:
                variables["batch_stats"] = bs
            rngs = {"dropout": key} if key is not None else None
            if use_bn and train:
                # BatchNorm writes batch statistics in train mode, so the
                # inner apply always takes mutable; the outer collection
                # only persists them when it is itself mutable
                y, mut = layer.apply(
                    variables, carry, pos_emb, att_mask, pad_mask, train,
                    rngs=rngs, mutable=["batch_stats"],
                )
                return y, mut["batch_stats"] if update_stats else None
            y = layer.apply(
                variables, carry, pos_emb, att_mask, pad_mask, train,
                rngs=rngs,
            )
            return y, None

        def segment(x, lo, hi):
            take = lambda t: jax.tree.map(lambda a: a[lo:hi], t)
            xs = (
                take(p_stack),
                take(bs_var.value) if use_bn else None,
                keys[lo:hi] if keys is not None else None,
            )
            return jax.lax.scan(body, x, xs)

        F = min(max(cfg.frozen_till, 0), L)
        new_stats = []
        if F > 0:
            x, s1 = segment(x, 0, F)
            # single gradient cut below the trainable suffix — the
            # backward scan for the frozen segment is never emitted
            x = jax.lax.stop_gradient(x)
            new_stats.append(s1)
        if F < L:
            x, s2 = segment(x, F, L)
            new_stats.append(s2)
        if update_stats:
            bs_var.value = (
                jax.tree.map(
                    lambda *a: jnp.concatenate(a, axis=0), *new_stats
                )
                if len(new_stats) > 1 else new_stats[0]
            )
        return x


def stack_encoder_layers(tree: dict, n_layers: int) -> dict:
    """Unrolled encoder collection subtree ({'layers_<i>': ..., other}) ->
    the scanned layout ({'stack': {'layers': [L, ...]-stacked}, other}).

    Converts params or batch_stats between the two `ConformerEncoder`
    parameter layouts (`scan_layers` False -> True), e.g. for loading an
    unrolled checkpoint into the scanned flagship encoder."""
    out = {k: v for k, v in tree.items() if not k.startswith("layers_")}
    per = [tree[f"layers_{i}"] for i in range(n_layers)]
    out["stack"] = {"layers": jax.tree.map(lambda *a: jnp.stack(a), *per)}
    return out


class ConformerEncoder(nn.Module):
    """[B, F, T_mel] features + [B] mel lengths -> [B, T_enc, d], [B] lens."""

    cfg: ConformerConfig

    @nn.compact
    def __call__(self, feats, feat_lens, train: bool = False):
        cfg = self.cfg
        x = jnp.transpose(feats, (0, 2, 1))  # [B, T, F]
        x = ConvSubsampling(cfg, name="pre_encode")(x)
        out_lens = subsampled_length(feat_lens, cfg).astype(jnp.int32)

        T = x.shape[1]
        if cfg.xscale:
            x = x * math.sqrt(cfg.d_model)
        pos_emb = rel_positional_encoding_dev(T, cfg.d_model).astype(
            cfg.dtype
        )
        x = FastDropout(cfg.dropout_pre_encoder)(x, deterministic=not train)

        pad_mask = (
            jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], T), 1)
            < out_lens[:, None]
        )  # True = valid
        att_mask = pad_mask[:, :, None] & pad_mask[:, None, :]
        left, right = cfg.att_context_size
        if left >= 0 or right >= 0:
            # banded (limited-context) attention — reference
            # conformer_encoder.py's att_context_size semantics
            q_idx = jax.lax.broadcasted_iota(jnp.int32, (1, T, T), 1)
            k_idx = jax.lax.broadcasted_iota(jnp.int32, (1, T, T), 2)
            rel = k_idx - q_idx
            band = jnp.ones((1, T, T), bool)
            if left >= 0:
                band = band & (rel >= -left)
            if right >= 0:
                band = band & (rel <= right)
            att_mask = att_mask & band

        if cfg.scan_layers:
            x = ConformerLayerStack(cfg, name="stack")(
                x, pos_emb, att_mask, pad_mask, train
            )
        else:
            for i in range(cfg.n_layers):
                x = ConformerLayer(cfg, name=f"layers_{i}")(
                    x, pos_emb, att_mask, pad_mask, train
                )
                if cfg.frozen_till > 0 and i == cfg.frozen_till - 1:
                    # single gradient cut below the trainable suffix —
                    # exact equivalent of a no_grad frozen prefix
                    x = jax.lax.stop_gradient(x)

        x = jnp.where(pad_mask[:, :, None], x, 0.0)
        return x, out_lens
