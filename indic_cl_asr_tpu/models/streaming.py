"""Streaming (chunked) inference for the Conformer encoder.

The reference ships available-but-unused streaming machinery
(reference: conformer_encoder.py:449-493 forward_for_export /
streaming_post_process, cache-aware variants; SURVEY.md §5.7). This module
provides the TPU-friendly equivalent: **windowed recomputation** — a rolling
mel window is re-encoded per chunk and only the newly-determined encoder
frames are emitted.

Exactness: with a causal-conv, left-limited-attention config
(ConformerConfig(causal_conv=True, att_context_size=(L, 0))), an emitted
frame's receptive field spans at most n_layers*(L + k - 1) encoder frames
to the left; when the window covers that span plus a chunk, streamed
outputs equal the offline encoder (tested to fp tolerance). Smaller windows
trade exactness for compute. Per-layer KV/conv caching (zero recompute) is
tracked in docs/ROADMAP.md.

Control flow is host-side (chunk counters are python ints), so each window
phase compiles once and the slid steady-state reuses ONE program.
"""

from __future__ import annotations

import dataclasses
import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .conformer import ConformerConfig, FeedForward


@dataclasses.dataclass
class StreamingConfig:
    chunk_mel: int = 64          # new mel frames consumed per step
    window_mel: int = 512        # rolling window re-encoded per step
    # subsampling halo: enc frame i needs mel up to 4i + 3 (two k3 s2 convs)
    right_halo_mel: int = 3

    def __post_init__(self):
        assert self.chunk_mel % 4 == 0 and self.window_mel % 4 == 0, (
            "chunk/window must be multiples of the subsampling factor"
        )
        assert self.window_mel % self.chunk_mel == 0


def receptive_field_enc(cfg: ConformerConfig) -> int:
    """Left receptive field of one emitted frame, in encoder frames."""
    left_att = (
        cfg.att_context_size[0] if cfg.att_context_size[0] >= 0 else 10**9
    )
    return cfg.n_layers * (left_att + cfg.conv_kernel_size - 1)


def _sub_len(n: int) -> int:
    for _ in range(2):
        n = (n - 1) // 2 + 1
    return n


@dataclasses.dataclass
class StreamState:
    mel_window: jnp.ndarray  # [B, n_mels, W]
    consumed_mel: int = 0    # total mel frames fed so far (host int)
    emitted_enc: int = 0     # total encoder frames emitted so far (host int)


class StreamingEncoder:
    """Drives an offline ConformerEncoder chunk by chunk.

    Usage:
        se = StreamingEncoder(model, model_cfg, StreamingConfig())
        state = se.init(batch_size)
        for chunk in mel_chunks:                 # [B, n_mels, chunk_mel]
            enc_window, start, n_new, state = se.step(variables, state, chunk)
        enc_window, start, n_new, state = se.flush(variables, state)
    """

    def __init__(self, model, model_cfg, scfg: StreamingConfig):
        self.model = model
        self.cfg = model_cfg
        self.scfg = scfg
        assert model_cfg.encoder.att_context_size[1] == 0, (
            "streaming assumes ZERO right attention context "
            "(-1 means UNLIMITED right context: the emission schedule's "
            "subsampling-halo-only rule would silently diverge from the "
            "offline encoder)"
        )

        def encode_window(variables, mel_window, mel_valid):
            return model.apply(
                variables, mel_window, mel_valid, False, method="encode"
            )

        self._encode = jax.jit(encode_window)

    def init(self, batch_size: int, n_mels: int | None = None) -> StreamState:
        n_mels = n_mels or self.cfg.encoder.feat_in
        return StreamState(
            mel_window=jnp.zeros(
                (batch_size, n_mels, self.scfg.window_mel), jnp.float32
            ),
        )

    def step(self, variables, state: StreamState, chunk: jnp.ndarray):
        """chunk [B, n_mels, chunk_mel] ->
        (enc_window [B, T_w, d], start_local: int, n_new: int, new state).

        The newly-determined frames are enc_window[:, start:start+n_new].
        """
        C = self.scfg.chunk_mel
        W = self.scfg.window_mel
        assert chunk.shape[-1] == C
        if state.consumed_mel < W:
            # fill phase: window is the utterance prefix, left-aligned
            pos = state.consumed_mel
            window = jax.lax.dynamic_update_slice(
                state.mel_window, chunk.astype(jnp.float32), (0, 0, pos)
            )
        else:
            window = jnp.concatenate(
                [state.mel_window[:, :, C:], chunk.astype(jnp.float32)],
                axis=-1,
            )
        consumed = state.consumed_mel + C
        return self._emit(variables, window, consumed, state.emitted_enc,
                          final=False)

    def flush(self, variables, state: StreamState):
        """Emit the frames that were waiting on right subsampling halo."""
        return self._emit(
            variables, state.mel_window, state.consumed_mel,
            state.emitted_enc, final=True,
        )

    def _emit(self, variables, window, consumed: int, emitted: int,
              final: bool):
        W = self.scfg.window_mel
        B = window.shape[0]
        valid = min(consumed, W)
        f, _ = self._encode(
            variables, window, jnp.full((B,), valid, jnp.int32)
        )
        if final:
            determined = _sub_len(consumed)
        else:
            # without right attention context, enc frame i is final once
            # mel frame 4i + halo exists
            determined = max(
                (consumed - self.scfg.right_halo_mel) // 4 + 1, 0
            )
        n_new = max(determined - emitted, 0)
        win_offset = max(consumed - W, 0) // 4  # absolute enc idx of frame 0
        start_local = emitted - win_offset
        new_state = StreamState(
            mel_window=window, consumed_mel=consumed,
            emitted_enc=emitted + n_new,
        )
        return f, start_local, n_new, new_state


def stream_full_utterance(
    se: StreamingEncoder, variables, mel: jnp.ndarray
) -> np.ndarray:
    """Run a whole [B, n_mels, T] mel through the streamer; returns the
    concatenated emitted frames [B, T_enc, d] (host-side assembly)."""
    B, n_mels, T = mel.shape
    C = se.scfg.chunk_mel
    T_pad = ((T + C - 1) // C) * C
    mel = jnp.pad(mel, ((0, 0), (0, 0), (0, T_pad - T)))
    state = se.init(B, n_mels)
    outs = []
    for c0 in range(0, T_pad, C):
        f, start, n_new, state = se.step(
            variables, state, mel[:, :, c0 : c0 + C]
        )
        if n_new:
            outs.append(np.asarray(f[:, start : start + n_new]))
    f, start, n_new, state = se.flush(variables, state)
    if n_new:
        outs.append(np.asarray(f[:, start : start + n_new]))
    out = np.concatenate(outs, axis=1)
    # trim frames computed over the chunk-alignment zero padding
    return out[:, : _sub_len(T)]


# ---------------------------------------------------------------------------
# cache-aware streaming: per-layer attention/conv caches, O(chunk) per step
# (the reference's cache_last_channel / cache_last_time streaming,
# conformer_encoder.py:449-493 + causal ConvSubsampling/CausalConv1D; ours
# keeps every cache a static-shape jnp array so ONE jitted step program
# serves the whole stream)
# ---------------------------------------------------------------------------


class RelPosSelfAttentionStep(nn.Module):
    """One streaming step of RelPosSelfAttention: queries are the C chunk
    frames only; keys/values span [cache | chunk] (A cached + C new).

    Parameter names match the offline `RelPosSelfAttention` exactly, so the
    offline encoder's params apply directly. The rectangular rel-position
    lookup generalizes the square XL rel-shift: score(t, j) uses the
    embedding of distance (A + t - j)."""

    cfg: ConformerConfig

    @nn.compact
    def __call__(self, h, cache, seen):
        cfg = self.cfg
        H, D = cfg.n_heads, cfg.d_model // cfg.n_heads
        B, C, _ = h.shape
        A = cache.shape[1]
        K = A + C

        kv = jnp.concatenate([cache.astype(h.dtype), h], axis=1)  # [B, K, d]
        q = nn.Dense(cfg.d_model, dtype=cfg.dtype, name="linear_q")(h)
        k = nn.Dense(cfg.d_model, dtype=cfg.dtype, name="linear_k")(kv)
        v = nn.Dense(cfg.d_model, dtype=cfg.dtype, name="linear_v")(kv)

        # distances (q_abs - k_abs) range over A+C-1 .. -(C-1)
        positions = (A + C - 1) - jnp.arange(K + C - 1, dtype=jnp.float32)
        div_term = jnp.exp(
            jnp.arange(0, cfg.d_model, 2, dtype=jnp.float32)
            * (-math.log(10000.0) / cfg.d_model)
        )
        ang = positions[:, None] * div_term[None, :]
        pe = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1).reshape(
            K + C - 1, cfg.d_model
        ).astype(cfg.dtype)
        p = nn.Dense(
            cfg.d_model, use_bias=False, dtype=cfg.dtype, name="linear_pos"
        )(pe).reshape(-1, H, D)

        q = q.reshape(B, C, H, D)
        k = k.reshape(B, K, H, D)
        v = v.reshape(B, K, H, D)
        bias_u = self.param("pos_bias_u", nn.initializers.zeros, (H, D))
        bias_v = self.param("pos_bias_v", nn.initializers.zeros, (H, D))

        ac = jnp.einsum(
            "bthd,bshd->bhts", q + bias_u.astype(q.dtype), k,
            preferred_element_type=jnp.float32,
        )  # [B, H, C, K]
        bd_full = jnp.einsum(
            "bthd,phd->bhtp", q + bias_v.astype(q.dtype), p,
            preferred_element_type=jnp.float32,
        )  # [B, H, C, K+C-1]
        t_i = jax.lax.broadcasted_iota(jnp.int32, (C, K), 0)
        j_i = jax.lax.broadcasted_iota(jnp.int32, (C, K), 1)
        # pe index for distance (A + t - j): (A+C-1) - (A+t-j) = C-1 - t + j
        bd = jnp.take_along_axis(
            bd_full, (j_i - t_i + (C - 1))[None, None], axis=-1
        )
        scores = (ac + bd) / math.sqrt(D)

        # key j: absolute frame seen - A + j. Valid iff it exists
        # (>= 0), is not in the query's future (j <= A + t), and is inside
        # the left attention window of width A (j >= t).
        valid = (
            (j_i >= t_i) & (j_i <= A + t_i) & (j_i - A + seen >= 0)
        )[None, None]
        scores = jnp.where(valid, scores, -1e9)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = jnp.where(valid, attn, 0.0).astype(cfg.dtype)
        out = jnp.einsum(
            "bhts,bshd->bthd", attn, v, preferred_element_type=jnp.float32
        ).astype(cfg.dtype)
        out = out.reshape(B, C, cfg.d_model)
        out = nn.Dense(cfg.d_model, dtype=cfg.dtype, name="linear_out")(out)
        new_cache = jax.lax.stop_gradient(kv[:, -A:] if A > 0 else cache)
        return out, new_cache


class ConvModuleStep(nn.Module):
    """One streaming step of ConformerConvModule (causal): the depthwise
    conv consumes [conv_cache | chunk] with VALID padding. Initial zero
    caches reproduce the offline causal left zero-padding exactly."""

    cfg: ConformerConfig

    @nn.compact
    def __call__(self, x, cache):
        cfg = self.cfg
        k = cfg.conv_kernel_size
        h = nn.Dense(
            2 * cfg.d_model, dtype=cfg.dtype, name="pointwise_conv1"
        )(x)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.sigmoid(b)
        hcat = jnp.concatenate([cache.astype(h.dtype), h], axis=1)
        out = nn.Conv(
            features=cfg.d_model,
            kernel_size=(k,),
            padding="VALID",
            feature_group_count=cfg.d_model,
            dtype=cfg.dtype,
            name="depthwise_conv",
        )(hcat)
        if cfg.conv_norm_type == "batch_norm":
            out = nn.BatchNorm(
                use_running_average=True, momentum=0.9, epsilon=1e-5,
                dtype=cfg.dtype, name="batch_norm",
            )(out)
        elif cfg.conv_norm_type == "layer_norm":
            out = nn.LayerNorm(dtype=cfg.dtype, name="batch_norm")(out)
        else:
            raise ValueError(
                f"cache-aware streaming supports batch_norm/layer_norm, "
                f"got {cfg.conv_norm_type}"
            )
        out = nn.swish(out)
        out = nn.Dense(
            cfg.d_model, dtype=cfg.dtype, name="pointwise_conv2"
        )(out)
        new_cache = jax.lax.stop_gradient(
            hcat[:, -(k - 1):] if k > 1 else cache
        )
        return out, new_cache


class ConformerLayerStep(nn.Module):
    """One causal ConformerLayer over a chunk, with per-layer caches.
    Submodule names match the offline `ConformerLayer` (eval mode)."""

    cfg: ConformerConfig

    @nn.compact
    def __call__(self, x, att_cache, conv_cache, seen):
        cfg = self.cfg
        h = nn.LayerNorm(dtype=cfg.dtype, name="norm_feed_forward1")(x)
        h = FeedForward(cfg, name="feed_forward1")(h, True)
        x = x + 0.5 * h

        hn = nn.LayerNorm(dtype=cfg.dtype, name="norm_self_att")(x)
        h, new_att = RelPosSelfAttentionStep(cfg, name="self_attn")(
            hn, att_cache, seen
        )
        x = x + h

        hc = nn.LayerNorm(dtype=cfg.dtype, name="norm_conv")(x)
        h, new_conv = ConvModuleStep(cfg, name="conv")(hc, conv_cache)
        x = x + h

        h = nn.LayerNorm(dtype=cfg.dtype, name="norm_feed_forward2")(x)
        h = FeedForward(cfg, name="feed_forward2")(h, True)
        x = x + 0.5 * h
        # the ATTENTION cache stores this layer's normed attn input: return
        # value computed above (new_att) -- nothing else to do here
        return nn.LayerNorm(dtype=cfg.dtype, name="norm_out")(x), new_att, new_conv


class ConvSubsamplingStep(nn.Module):
    """Streaming x4 'striding' subsampling over an extended mel slice.

    Input mel_ext [B, T_ext=4C+3, F] covers absolute mel frames
    4*e0-3 .. 4*(e0+C)-1 (the caller left-pads with the 3-frame carry);
    output is enc frames e0 .. e0+C-1, exactly equal to the offline
    `ConvSubsampling` (time-VALID convs on the halo slice; rows that the
    offline path zero-pads are masked via the traced ``e0``)."""

    cfg: ConformerConfig

    @nn.compact
    def __call__(self, mel_ext, e0):
        cfg = self.cfg
        assert cfg.sampling_num == 2, "streaming subsampling assumes x4"
        h = mel_ext[..., None].astype(cfg.dtype)  # [B, T_ext, F, 1]
        # conv_0: time-VALID (halo supplies the context), freq p1 as offline
        h = nn.Conv(
            features=cfg.conv_channels, kernel_size=(3, 3), strides=(2, 2),
            padding=((0, 0), (1, 1)), dtype=cfg.dtype, name="conv_0",
        )(h)
        h = nn.relu(h)
        # row m is conv_0 output at absolute index j = 2*e0 - 1 + m; the
        # offline path zero-pads j < 0 (it is conv_1's zero padding there)
        j_abs = 2 * e0 - 1 + jnp.arange(h.shape[1])
        h = jnp.where((j_abs >= 0)[None, :, None, None], h, 0.0)
        h = nn.Conv(
            features=cfg.conv_channels, kernel_size=(3, 3), strides=(2, 2),
            padding=((0, 0), (1, 1)), dtype=cfg.dtype, name="conv_1",
        )(h)
        h = nn.relu(h)
        B, C, F4, Ch = h.shape
        h = h.reshape(B, C, F4 * Ch)
        return nn.Dense(cfg.d_model, dtype=cfg.dtype, name="out")(h)


class _StackStep(nn.Module):
    """Streaming step over the scanned layer stack: reads the same
    stack/layers [L, ...] params/stats as `ConformerLayerStack` and scans
    `ConformerLayerStep` over them with per-layer caches."""

    cfg: ConformerConfig

    @nn.compact
    def __call__(self, x, att_cache, conv_cache, seen):
        cfg = self.cfg
        layer = ConformerLayerStep(cfg)
        use_bn = cfg.conv_norm_type == "batch_norm"
        # read the stored stack directly (self.param would abstractly
        # re-run an init fn for shape validation; streaming is apply-only)
        p_stack = self.get_variable("params", "layers")
        if p_stack is None:
            raise ValueError(
                "cache-aware streaming applies trained params; "
                "stack/layers not found"
            )
        bs_stack = (
            self.get_variable("batch_stats", "layers") if use_bn else None
        )

        def body(carry, xs):
            p, bs, ac, cc = xs
            variables = {"params": p}
            if use_bn:
                variables["batch_stats"] = bs
            y, nac, ncc = layer.apply(variables, carry, ac, cc, seen)
            return y, (nac, ncc)

        x, (new_att, new_conv) = jax.lax.scan(
            body, x, (p_stack, bs_stack, att_cache, conv_cache)
        )
        return x, new_att, new_conv


class CacheAwareEncoderStep(nn.Module):
    """One full cache-aware encoder step: mel slice -> enc chunk + caches.

    Parameter tree is IDENTICAL to the offline `ConformerEncoder`
    (pre_encode / layers_<i> or stack/layers), so offline-trained or
    converted checkpoints stream without any conversion. Supports both the
    unrolled and the scanned (stacked [L]) layer layouts."""

    cfg: ConformerConfig

    @nn.compact
    def __call__(self, mel_ext, e0, att_cache, conv_cache):
        cfg = self.cfg
        L = cfg.n_layers
        x = jnp.transpose(mel_ext, (0, 2, 1))  # [B, T_ext, F]
        x = ConvSubsamplingStep(cfg, name="pre_encode")(x, e0)
        if cfg.xscale:
            x = x * math.sqrt(cfg.d_model)

        if cfg.scan_layers:
            x, new_att, new_conv = _StackStep(cfg, name="stack")(
                x, att_cache, conv_cache, e0
            )
        else:
            new_att_l, new_conv_l = [], []
            for i in range(L):
                x, na, nc = ConformerLayerStep(cfg, name=f"layers_{i}")(
                    x, att_cache[i], conv_cache[i], e0
                )
                new_att_l.append(na)
                new_conv_l.append(nc)
            new_att = jnp.stack(new_att_l)
            new_conv = jnp.stack(new_conv_l)
        return x, new_att, new_conv


@dataclasses.dataclass
class CacheState:
    mel_carry: jnp.ndarray   # [B, n_mels, 3] last 3 mel frames
    att_cache: jnp.ndarray   # [L, B, A, d]
    conv_cache: jnp.ndarray  # [L, B, k-1, d]
    e0: int = 0              # enc frames emitted so far (host int)


class CacheAwareStreamer:
    """Streams a causal Conformer encoder chunk-by-chunk at O(chunk) cost.

    Requires ``causal_conv=True`` and a finite left attention context
    (``att_context_size=(A, 0)``). Exactly matches the offline encoder for
    mel lengths that are multiples of 4 (the subsampling emits whole
    frames; tested in tests/test_streaming.py).

    Per-chunk cost: subsample O(C) + per layer attn O(C*(A+C)*d) +
    conv O(C*k*d) + FFN O(C*d*d_ff) — vs. the windowed-recompute
    `StreamingEncoder` whose every chunk re-encodes the full W-frame
    window (W >= n_layers*(A + k - 1) for exactness).
    """

    def __init__(self, model_cfg, chunk_mel: int = 64):
        enc = model_cfg.encoder if hasattr(model_cfg, "encoder") else model_cfg
        assert enc.causal_conv, "cache-aware streaming needs causal_conv"
        assert enc.att_context_size[0] >= 0 and enc.att_context_size[1] == 0, (
            "cache-aware streaming needs att_context_size=(A>=0, 0)"
        )
        assert chunk_mel % 4 == 0 and chunk_mel > 0
        self.cfg = enc
        self.chunk_mel = chunk_mel
        self._step = jax.jit(CacheAwareEncoderStep(enc).apply)

    def init(self, batch_size: int) -> CacheState:
        enc = self.cfg
        A = enc.att_context_size[0]
        return CacheState(
            mel_carry=jnp.zeros((batch_size, enc.feat_in, 3), jnp.float32),
            att_cache=jnp.zeros(
                (enc.n_layers, batch_size, A, enc.d_model), jnp.float32
            ),
            conv_cache=jnp.zeros(
                (enc.n_layers, batch_size, enc.conv_kernel_size - 1,
                 enc.d_model),
                jnp.float32,
            ),
        )

    def step(self, enc_variables, state: CacheState, chunk: jnp.ndarray):
        """chunk [B, n_mels, chunk_mel] -> (enc_chunk [B, chunk_mel/4, d],
        new state). ``enc_variables`` is the ENCODER subtree:
        {"params": variables["params"]["encoder"],
         "batch_stats": variables["batch_stats"]["encoder"]}."""
        assert chunk.shape[-1] == self.chunk_mel
        mel_ext = jnp.concatenate(
            [state.mel_carry, chunk.astype(jnp.float32)], axis=-1
        )
        x, new_att, new_conv = self._step(
            enc_variables, mel_ext, jnp.int32(state.e0),
            state.att_cache, state.conv_cache,
        )
        new_state = CacheState(
            mel_carry=chunk[:, :, -3:].astype(jnp.float32),
            att_cache=new_att,
            conv_cache=new_conv,
            e0=state.e0 + self.chunk_mel // 4,
        )
        return x, new_state


def stream_full_utterance_cached(
    streamer: CacheAwareStreamer, enc_variables, mel: jnp.ndarray
) -> np.ndarray:
    """Run a whole [B, n_mels, T] mel (T % 4 == 0) through the cache-aware
    streamer; returns the concatenated enc frames [B, T/4, d]."""
    B, n_mels, T = mel.shape
    C = streamer.chunk_mel
    T_pad = ((T + C - 1) // C) * C
    mel = jnp.pad(mel, ((0, 0), (0, 0), (0, T_pad - T)))
    state = streamer.init(B)
    outs = []
    for c0 in range(0, T_pad, C):
        x, state = streamer.step(enc_variables, state, mel[:, :, c0:c0 + C])
        outs.append(np.asarray(x))
    return np.concatenate(outs, axis=1)[:, : T // 4]


class StreamingASR:
    """End-to-end streaming recognizer: mel chunks in, an incremental
    token stream out, at O(chunk) cost per step.

    Combines `CacheAwareStreamer` (per-layer encoder caches) with the
    streaming continuation of the batched greedy RNNT decoder
    (ops/decoding.py `rnnt_greedy_decode(carry=..., t_offset=...)`), so
    chunked decoding emits EXACTLY the tokens the offline pipeline
    produces on a causal config (parity tested). The reference's streaming
    story stops at encoder caches (`forward_for_export`,
    conformer_encoder.py:449-493); the decoder continuation is ours.

    The mel stream is the input contract: per-feature normalization is an
    utterance-level statistic in the offline front-end, so a live
    deployment must use a causal/streaming normalization variant — feed
    this class whatever mel the serving stack produces.
    """

    def __init__(self, model, model_cfg, variables, *, chunk_mel: int = 64,
                 max_symbols: int = 10, max_out: int = 256):
        from ..ops.decoding import rnnt_greedy_decode

        self.streamer = CacheAwareStreamer(model_cfg, chunk_mel)
        self.variables = variables
        self.blank = model_cfg.blank_local
        self.max_out = max_out
        self._enc_vars = {
            "params": variables["params"]["encoder"],
            "batch_stats": variables["batch_stats"]["encoder"],
        }

        def project(f):
            return model.apply(variables, f, method="joint_project_enc")

        def pred_step(last_label, state):
            return model.apply(
                variables, last_label, state, method="pred_step"
            )

        def joint_step(f_t, g_t, li):
            return model.apply(variables, f_t, g_t, li, method="joint_step")

        def decode_chunk(f_chunk, lang_ids, carry, t_offset, total_frames):
            f_proj = project(f_chunk)
            return rnnt_greedy_decode(
                f_proj, total_frames, lang_ids, pred_step, joint_step,
                None, blank=self.blank, max_symbols=max_symbols,
                max_out=max_out, carry=carry, t_offset=t_offset,
                return_carry=True,
            )

        self._decode = jax.jit(decode_chunk)
        self._pred_step = pred_step

    def init(self, batch_size: int):
        return {
            "enc": self.streamer.init(batch_size),
            "dec": None,
            "frames": 0,
        }

    def step(self, state, mel_chunk: jnp.ndarray, lang_ids: jnp.ndarray,
             valid_mel: jnp.ndarray | None = None):
        """mel_chunk [B, n_mels, chunk_mel] ->
        ((tokens [B, max_out], lens [B]) so far, new state).

        ``valid_mel`` [B] (optional): how many of this chunk's mel frames
        are real audio. A final partial chunk must be zero-padded to
        ``chunk_mel`` columns; without ``valid_mel`` the padding would be
        decoded as real audio and could emit spurious tokens (ADVICE r2).
        Subsampled per-row frame budgets are derived with the encoder's
        ceil(v / factor) length rule."""
        enc_chunk, enc_state = self.streamer.step(
            self._enc_vars, state["enc"], mel_chunk
        )
        C = enc_chunk.shape[1]
        B = mel_chunk.shape[0]
        if valid_mel is None:
            valid = jnp.full((B,), C, jnp.int32)
        else:
            factor = self.streamer.cfg.subsampling_factor
            valid = jnp.minimum(
                jnp.asarray(C, jnp.int32),
                -(-valid_mel.astype(jnp.int32) // factor),
            )
        total = state["frames"] + valid
        out, out_len, carry = self._decode(
            enc_chunk, lang_ids, state["dec"], jnp.int32(state["frames"]),
            total,
        )
        new_state = {
            "enc": enc_state, "dec": carry, "frames": state["frames"] + C,
        }
        return (out, out_len), new_state
