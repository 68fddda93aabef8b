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

import jax
import jax.numpy as jnp
import numpy as np

from .conformer import ConformerConfig


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
        assert model_cfg.encoder.att_context_size[1] in (0, -1), (
            "streaming assumes no right attention context"
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
