"""Front-end parity tests: JAX pipeline vs an independent torch-CPU oracle
built from the documented reference semantics (SURVEY.md §2.2 'Mel front-end';
same role as the reference's numpy-oracle tests, SURVEY.md §4)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from indic_cl_asr_tpu.audio.features import (
    FrontendConfig,
    hann_window,
    log_mel_spectrogram,
    mel_filterbank,
    output_seq_len,
)
from indic_cl_asr_tpu.audio.spec_augment import SpecAugmentConfig, spec_augment

CFG = FrontendConfig(
    sample_rate=16000, win_length=400, hop_length=160, n_fft=512, n_mels=80
)


def torch_oracle(signal: np.ndarray, lengths: np.ndarray, cfg: FrontendConfig):
    """Independent torch implementation of the documented pipeline."""
    x = torch.from_numpy(signal).float()
    seq_len = (
        torch.from_numpy(lengths) + 2 * (cfg.n_fft // 2) - cfg.n_fft
    ) // cfg.hop_length + 1
    # preemphasis
    x = torch.cat([x[:, :1], x[:, 1:] - cfg.preemph * x[:, :-1]], dim=1)
    win = torch.hann_window(cfg.win_length, periodic=False)
    spec = torch.stft(
        x,
        n_fft=cfg.n_fft,
        hop_length=cfg.hop_length,
        win_length=cfg.win_length,
        window=win,
        center=True,
        return_complex=True,
    )
    mag2 = spec.real**2 + spec.imag**2  # [B, n_bins, T]
    fb = torch.from_numpy(
        mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels)
    )
    mel = torch.log(fb @ mag2 + cfg.log_zero_guard)
    # per-feature masked normalize, unbiased std + 1e-5
    out = torch.empty_like(mel)
    for i in range(mel.shape[0]):
        v = mel[i, :, : seq_len[i]]
        mean = v.mean(dim=1, keepdim=True)
        std = v.std(dim=1, keepdim=True) + cfg.std_floor
        out[i] = (mel[i] - mean) / std
    # zero beyond seq_len
    T = out.shape[-1]
    mask = torch.arange(T)[None, :] >= seq_len[:, None]
    out = out.masked_fill(mask[:, None, :], 0.0)
    return out.numpy(), seq_len.numpy()


def test_hann_window_matches_torch():
    np.testing.assert_allclose(
        hann_window(400, periodic=False),
        torch.hann_window(400, periodic=False).numpy(),
        atol=1e-6,
    )


def test_mel_filterbank_properties():
    fb = mel_filterbank(16000, 512, 80)
    assert fb.shape == (80, 257)
    assert (fb >= 0).all()
    # every filter is non-empty and unimodal-triangular-ish
    assert (fb.max(axis=1) > 0).all()
    # slaney norm: wider (higher) filters have smaller peaks
    assert fb.max(axis=1)[0] > fb.max(axis=1)[-1]


def test_log_mel_matches_torch_oracle(rng):
    B, S = 3, 16000
    signal = rng.standard_normal((B, S)).astype(np.float32) * 0.1
    lengths = np.array([16000, 12345, 8000], dtype=np.int32)
    # silence the padding tail like a real batch
    for i, l in enumerate(lengths):
        signal[i, l:] = 0.0

    got, got_len = jax.jit(
        lambda s, l: log_mel_spectrogram(s, l, CFG, training=False)
    )(signal, lengths)
    want, want_len = torch_oracle(signal, lengths, CFG)

    np.testing.assert_array_equal(np.asarray(got_len), want_len)
    T = want.shape[-1]
    got = np.asarray(got)[:, :, :T]  # ours pads T to pad_to multiple
    # features are per-feature normalized (~N(0,1)); fp32 FFT accumulation
    # differs between XLA and torch, so compare with an absolute tolerance
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=0)
    assert np.median(np.abs(got - want)) < 1e-3
    # padding region is exactly pad_value
    assert np.all(np.asarray(got)[1, :, want_len[1] :] == 0.0)


def test_seq_len_formula():
    lens = jnp.array([16000, 159, 160, 161])
    out = output_seq_len(lens, CFG)
    # center=True: floor(len/hop) + 1
    np.testing.assert_array_equal(np.asarray(out), [101, 1, 2, 2])


def test_pad_to_multiple(rng):
    signal = rng.standard_normal((1, 16000)).astype(np.float32)
    mel, _ = log_mel_spectrogram(
        jnp.asarray(signal), jnp.array([16000]), CFG
    )
    assert mel.shape[-1] % CFG.pad_to == 0


def test_dither_only_when_training(rng):
    signal = jnp.asarray(rng.standard_normal((1, 4000)).astype(np.float32))
    lens = jnp.array([4000])
    key = jax.random.PRNGKey(0)
    a, _ = log_mel_spectrogram(signal, lens, CFG, training=False, rng=key)
    b, _ = log_mel_spectrogram(signal, lens, CFG, training=False, rng=key)
    c, _ = log_mel_spectrogram(signal, lens, CFG, training=True, rng=key)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


class TestSpecAugment:
    def test_masks_are_bands_and_respect_config(self, rng):
        B, F, T = 4, 80, 200
        spec = jnp.ones((B, F, T))
        lengths = jnp.array([200, 150, 100, 50])
        cfg = SpecAugmentConfig(freq_masks=2, time_masks=10, freq_width=27,
                                time_width=0.05)
        out = np.asarray(
            jax.jit(lambda s, l, k: spec_augment(s, l, k, cfg))(
                spec, lengths, jax.random.PRNGKey(3)
            )
        )
        assert out.shape == (B, F, T)
        assert set(np.unique(out)).issubset({0.0, 1.0})
        for i in range(B):
            # freq-masked rows are fully zero across time
            zero_rows = (out[i] == 0).all(axis=1)
            zero_cols = (out[i] == 0).all(axis=0)
            # time mask width bounded by ceil(5% of length) * n_masks
            w_max = max(1, int(lengths[i] * 0.05))
            assert zero_cols.sum() <= 10 * w_max
            # freq rows bounded by freq_masks * freq_width
            assert zero_rows.sum() <= 2 * 27

    def test_no_masks_is_identity(self, rng):
        spec = jnp.asarray(rng.standard_normal((2, 80, 50)).astype(np.float32))
        cfg = SpecAugmentConfig(freq_masks=0, time_masks=0)
        out = spec_augment(spec, jnp.array([50, 50]), jax.random.PRNGKey(0), cfg)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(spec))

    def test_mask_distribution_nontrivial(self):
        # over many keys, both some masking and some unmasked output
        spec = jnp.ones((8, 80, 100))
        lengths = jnp.full((8,), 100)
        cfg = SpecAugmentConfig()
        fractions = []
        for seed in range(5):
            out = spec_augment(spec, lengths, jax.random.PRNGKey(seed), cfg)
            fractions.append(float(np.asarray(out).mean()))
        assert 0.3 < np.mean(fractions) < 1.0


def test_matmul_rdft_matches_fft(rng):
    """The TPU matmul-rDFT spectrum path equals jnp.fft.rfft."""
    import dataclasses

    from indic_cl_asr_tpu.audio.features import (
        FrontendConfig,
        log_mel_spectrogram,
    )

    audio = jnp.asarray(
        0.3 * rng.standard_normal((2, 16000)), jnp.float32
    )
    lens = jnp.array([16000, 12000], jnp.int32)
    base = FrontendConfig(dither=0.0)
    mel_fft, l1 = log_mel_spectrogram(
        audio, lens, dataclasses.replace(base, fft_impl="fft")
    )
    mel_mm, l2 = log_mel_spectrogram(
        audio, lens, dataclasses.replace(base, fft_impl="matmul")
    )
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_allclose(
        np.asarray(mel_mm), np.asarray(mel_fft), atol=2e-3, rtol=1e-4
    )
