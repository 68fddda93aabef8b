"""Transcription + evaluation harness.

Replaces the reference's transcription pipeline and eval loop
(reference: hybrid_rnnt_ctc_models.py:262-346 `transcribe` /
:582-675 `_transcribe_forward/_output_processing`; utils.py:120-174
`compute_wer` / `run_eval`) with jitted batched inference:

  wav batch -> log-mel (dither off at eval, _transcribe_on_begin semantics)
  -> Conformer encode -> greedy RNNT (lax.scan/while_loop) or greedy CTC
  -> host detokenization -> aggregate WER.

Metric names match the reference exactly
(`{val|test}/perf_{lang}_{rnnt|ctc}_{wer|noisy_wer|avg_wer}`,
utils.py:163-169) so downstream results analysis transfers unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.features import FrontendConfig, log_mel_spectrogram
from ..data.manifest import ManifestEntry
from ..data.pipeline import BatchPipeline, BucketSpec
from ..models.hybrid import HybridModelConfig, HybridRNNTCTC
from ..ops.decoding import (
    ctc_greedy_decode,
    rnnt_greedy_decode,
    rnnt_greedy_decode_labelsync,
)
from .metrics import wer


@dataclasses.dataclass
class Transcriber:
    """Jit-compiled batched transcription for a fixed model architecture.

    Variables are arguments (not captured), so one Transcriber serves every
    checkpoint/CL task without recompiling.
    """

    model: HybridRNNTCTC
    model_cfg: HybridModelConfig
    tokenizer: object
    languages: Sequence[str]
    frontend: FrontendConfig = FrontendConfig()
    batch_size: int = 16
    bucket_spec: BucketSpec | None = None
    max_symbols: int = 10
    max_out: int = 256
    beam_size: int = 4
    # "auto" (default): "fused" on TPU, "labelsync" elsewhere.
    # "labelsync": label-looping greedy — sequential rounds scale with
    # emitted tokens, not frames (identical output, parity tested);
    # "framesync": one joint+pred round per frame; "fused":
    # single-launch Pallas kernel (ops/decode_fused_pallas.py) for
    # UNIFORM-LANGUAGE batches — a traced lax.cond falls back to
    # labelsync for mixed-language batches, and labelsync is chosen at
    # trace time for over-size shapes / multi-layer LSTMs.
    greedy_impl: str = "auto"
    # "auto": fused single-kernel beam (ops/beam_fused_pallas.py) on TPU,
    # XLA batched beam elsewhere; "xla" forces the XLA beam.
    beam_impl: str = "auto"
    labelsync_window: int = 32
    # SPMD eval: when set (run_sequence passes its mesh through), eval
    # batches are placed REPLICATED on the mesh instead of on the local
    # default device — under multi-process execution a jit over
    # mesh-global variables rejects process-local inputs. Every process
    # assembles the identical batch (deterministic pipeline), so each
    # contributes the full array (make_array_from_process_local_data on
    # a replicated sharding).
    mesh: object | None = None

    def __post_init__(self):
        if self.greedy_impl == "auto":
            self.greedy_impl = ("fused"
                                if jax.default_backend() == "tpu"
                                else "labelsync")
        if self.beam_impl == "auto":
            self.beam_impl = ("fused"
                              if jax.default_backend() == "tpu"
                              else "xla")
        assert self.frontend.n_mels == self.model_cfg.encoder.feat_in, (
            "front-end mel bins must match encoder feat_in"
        )
        model = self.model
        fe = self.frontend
        blank = self.model_cfg.blank_local

        def encode(variables, audio, audio_lens):
            mel, mel_lens = log_mel_spectrogram(
                audio, audio_lens, fe, training=False
            )
            return model.apply(
                variables, mel, mel_lens, False, method="encode"
            )

        def ctc_fn(variables, audio, audio_lens, lang_ids):
            f, enc_lens = encode(variables, audio, audio_lens)
            log_probs = model.apply(
                variables, f, lang_ids, method="ctc_logprobs"
            )
            return ctc_greedy_decode(log_probs, enc_lens, blank)

        def rnnt_fn(variables, audio, audio_lens, lang_ids):
            f, enc_lens = encode(variables, audio, audio_lens)
            f_proj = model.apply(variables, f, method="joint_project_enc")

            def pred_step(last_label, state):
                return model.apply(
                    variables, last_label, state, method="pred_step"
                )

            def joint_step(f_t, g_t, li):
                return model.apply(
                    variables, f_t, g_t, li, method="joint_step"
                )

            def labelsync():
                return rnnt_greedy_decode_labelsync(
                    f_proj, enc_lens, lang_ids, pred_step, joint_step,
                    None, blank=blank, max_symbols=self.max_symbols,
                    max_out=self.max_out, window=self.labelsync_window,
                )

            if self.greedy_impl == "fused":
                from ..ops.decode_fused_pallas import (
                    extract_decode_weights,
                    fits_fused_decode,
                    rnnt_greedy_decode_fused,
                )

                B, T, H = f_proj.shape
                multi_lstm = "lstm_1" in variables["params"]["prediction"]
                # Trace-time fallbacks: the kernel hardcodes the relu
                # joint activation and a single-layer LSTM, and the
                # combined (B, T) VMEM footprint must fit next to the
                # resident weights (fits_fused_decode checks both the
                # per-dim caps and the budget).
                v1 = self.model_cfg.vocab_per_lang + 1
                itemsize = jnp.dtype(self.model_cfg.dtype).itemsize
                if (
                    multi_lstm
                    or self.model_cfg.joint_activation != "relu"
                    or not fits_fused_decode(
                        B, T, H, v1, self.max_out, itemsize
                    )
                ):
                    return labelsync()
                w = extract_decode_weights(
                    variables, lang_ids[0], dtype=self.model_cfg.dtype
                )

                def fused(_):
                    return rnnt_greedy_decode_fused(
                        f_proj, enc_lens, w, blank=blank,
                        max_symbols=self.max_symbols, max_out=self.max_out,
                        interpret=jax.default_backend() != "tpu",
                    )

                uniform = jnp.all(lang_ids == lang_ids[0])
                return jax.lax.cond(
                    uniform, fused, lambda _: labelsync(), None
                )
            if self.greedy_impl == "labelsync":
                return labelsync()
            return rnnt_greedy_decode(
                f_proj, enc_lens, lang_ids, pred_step, joint_step, None,
                blank=blank, max_symbols=self.max_symbols,
                max_out=self.max_out,
            )

        def rnnt_beam_fn(variables, audio, audio_lens, lang_ids):
            from ..ops.beam_search import rnnt_beam_search_batched

            f, enc_lens = encode(variables, audio, audio_lens)
            f_proj = model.apply(variables, f, method="joint_project_enc")

            def pred_step(last_label, state):
                return model.apply(
                    variables, last_label, state, method="pred_step"
                )

            def joint_step(f_t, g_t, li):
                return model.apply(
                    variables, f_t, g_t, li, method="joint_step"
                )

            def xla_beam():
                ids, lens, _ = rnnt_beam_search_batched(
                    f_proj, enc_lens, lang_ids, pred_step, joint_step,
                    None, blank=blank, beam_size=self.beam_size,
                    max_expansions=self.max_symbols, max_out=self.max_out,
                )
                return ids, lens

            # fused single-kernel beam (ops/beam_fused_pallas.py) under
            # the same trace-time gates as the fused greedy path:
            # relu joint, single-layer LSTM, in-size shapes; a traced
            # lax.cond falls back for mixed-language batches
            if self.beam_impl == "fused":
                from ..ops.beam_fused_pallas import (
                    fits_fused_beam,
                    rnnt_beam_search_fused,
                )
                from ..ops.decode_fused_pallas import extract_decode_weights

                B, T, H = f_proj.shape
                multi_lstm = "lstm_1" in variables["params"]["prediction"]
                v1 = self.model_cfg.vocab_per_lang + 1
                itemsize = jnp.dtype(self.model_cfg.dtype).itemsize
                if (
                    multi_lstm
                    or self.model_cfg.joint_activation != "relu"
                    or not fits_fused_beam(
                        B, self.beam_size, T, H, v1, self.max_out, itemsize
                    )
                ):
                    return xla_beam()
                w = extract_decode_weights(
                    variables, lang_ids[0], dtype=self.model_cfg.dtype
                )

                def fused(_):
                    ids, lens, _ = rnnt_beam_search_fused(
                        f_proj, enc_lens, w, blank=blank,
                        beam_size=self.beam_size,
                        max_expansions=self.max_symbols,
                        max_out=self.max_out,
                        interpret=jax.default_backend() != "tpu",
                    )
                    return ids, lens

                uniform = jnp.all(lang_ids == lang_ids[0])
                return jax.lax.cond(
                    uniform, fused, lambda _: xla_beam(), None
                )
            return xla_beam()

        def ctc_logprob_fn(variables, audio, audio_lens, lang_ids):
            f, enc_lens = encode(variables, audio, audio_lens)
            return (
                model.apply(variables, f, lang_ids, method="ctc_logprobs"),
                enc_lens,
            )

        def enc_proj_fn(variables, audio, audio_lens):
            f, enc_lens = encode(variables, audio, audio_lens)
            return (
                model.apply(variables, f, method="joint_project_enc"),
                enc_lens,
            )

        self._ctc_fn = jax.jit(ctc_fn)
        self._rnnt_fn = jax.jit(rnnt_fn)
        self._rnnt_beam_fn = jax.jit(rnnt_beam_fn)
        self._ctc_logprob_fn = jax.jit(ctc_logprob_fn)
        self._enc_proj_fn = jax.jit(enc_proj_fn)

    def _dev(self, x):
        """Eval input placement: local device, or replicated on the mesh
        (see the `mesh` field)."""
        if self.mesh is None:
            return jnp.asarray(x)
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(self.mesh, P())
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, sh)
        return jax.make_array_from_process_local_data(sh, x)

    def transcribe(
        self,
        variables,
        entries: Sequence[ManifestEntry],
        decoder: str = "rnnt",
    ) -> list[str]:
        """Entries -> hypothesis strings (original entry order)."""
        import concurrent.futures as cf

        from ..data.pipeline import _assemble

        assert decoder in (
            "rnnt", "ctc", "rnnt_beam", "rnnt_beam_host", "ctc_beam"
        )
        spec = self.bucket_spec or BucketSpec()
        lang_index = {l: i for i, l in enumerate(self.languages)}
        fn = {
            "rnnt": self._rnnt_fn,
            "ctc": self._ctc_fn,
            # batched frame-synchronous beam, fully under jit — the hot
            # eval-scale beam path (reference beam classes are host loops)
            "rnnt_beam": self._rnnt_beam_fn,
        }.get(decoder)

        by_bucket: dict[int, list[int]] = {}
        for i, e in enumerate(entries):
            by_bucket.setdefault(spec.bucket_of(e.duration), []).append(i)

        hyps: list[str] = [""] * len(entries)
        from ..audio.io import load_audio

        with cf.ThreadPoolExecutor(8) as io_pool:
            for bucket, idxs in by_bucket.items():
                for i0 in range(0, len(idxs), self.batch_size):
                    chunk_idx = idxs[i0 : i0 + self.batch_size]
                    n_real = len(chunk_idx)
                    padded = chunk_idx + [chunk_idx[-1]] * (
                        self.batch_size - n_real
                    )
                    batch = _assemble(
                        [entries[j] for j in padded], n_real, bucket, spec,
                        self.tokenizer, lang_index, 0, load_audio, io_pool,
                    )
                    if decoder in ("rnnt", "ctc", "rnnt_beam"):
                        ids, lens = fn(
                            variables,
                            self._dev(batch.audio),
                            self._dev(batch.audio_len),
                            self._dev(batch.lang_ids),
                        )
                        ids = np.asarray(ids)
                        lens = np.asarray(lens)
                        rows = [
                            ids[r, : lens[r]].tolist() for r in range(n_real)
                        ]
                    elif decoder == "ctc_beam":
                        from ..ops.beam_search import ctc_prefix_beam_search

                        lp, enc_lens = self._ctc_logprob_fn(
                            variables, self._dev(batch.audio),
                            self._dev(batch.audio_len),
                            self._dev(batch.lang_ids),
                        )
                        lp = np.asarray(lp)
                        enc_lens = np.asarray(enc_lens)
                        rows = [
                            ctc_prefix_beam_search(
                                lp[r], int(enc_lens[r]),
                                self.model_cfg.blank_local,
                                beam_size=self.beam_size,
                            )
                            for r in range(n_real)
                        ]
                    else:  # rnnt_beam_host: per-sample Graves beam oracle
                        from ..ops.beam_search import rnnt_beam_search

                        f_proj, enc_lens = self._enc_proj_fn(
                            variables, self._dev(batch.audio),
                            self._dev(batch.audio_len),
                        )
                        f_proj = np.asarray(f_proj)
                        enc_lens = np.asarray(enc_lens)

                        def pred_step(label, state):
                            return self.model.apply(
                                variables, label, state, method="pred_step"
                            )

                        def joint_step(f_t, g_t, li):
                            return self.model.apply(
                                variables, f_t, g_t, li, method="joint_step"
                            )

                        rows = [
                            rnnt_beam_search(
                                f_proj[r], int(enc_lens[r]),
                                int(batch.lang_ids[r]), pred_step, joint_step,
                                blank=self.model_cfg.blank_local,
                                beam_size=self.beam_size,
                                max_expansions=self.max_symbols,
                            )
                            for r in range(n_real)
                        ]
                    for row in range(n_real):
                        hyps[chunk_idx[row]] = self.tokenizer.ids_to_text(
                            rows[row], batch.langs[row]
                        )
        return hyps

    def transcribe_files(
        self,
        variables,
        audio_paths: Sequence[str],
        language: str,
        decoder: str = "rnnt",
    ) -> list[str]:
        """Path-level API mirroring the reference's
        `model.transcribe(audio, batch_size, language_id)`
        (hybrid_rnnt_ctc_models.py:262-346). Durations are read from the
        WAV headers for bucketing."""
        import wave

        entries = []
        for p in audio_paths:
            try:
                with wave.open(p, "rb") as w:
                    dur = w.getnframes() / w.getframerate()
            except Exception:
                dur = 0.0
            entries.append(
                ManifestEntry(
                    audio_filepath=p, duration=dur, text="", lang=language
                )
            )
        return self.transcribe(variables, entries, decoder)

    def compute_wer(
        self,
        variables,
        entries: Sequence[ManifestEntry],
        decoder: str = "rnnt",
    ) -> float:
        hyps = self.transcribe(variables, entries, decoder)
        refs = [e.text for e in entries]
        return wer(refs, hyps)


def run_eval(
    logger,
    type_: str,
    transcriber: Transcriber,
    variables,
    clean_entries: Sequence[ManifestEntry],
    noisy_entries: Sequence[ManifestEntry],
    epoch: int,
    curr_lang_idx: int,
    lang: str,
) -> dict:
    """Per-(split, lang) eval over both decoders — reference
    utils.py:151-174 `run_eval`, identical metric keys."""
    perf = {}
    log_dict = {}
    for mode in ("rnnt", "ctc"):
        val = transcriber.compute_wer(variables, clean_entries, mode)
        noisy = transcriber.compute_wer(variables, noisy_entries, mode)
        perf[f"{mode}_wer"] = val
        perf[f"{mode}_noisy_wer"] = noisy
        perf[f"{mode}_avg_wer"] = (val + noisy) / 2
        log_dict[f"{type_}/perf_{lang}_{mode}_wer"] = val
        log_dict[f"{type_}/perf_{lang}_{mode}_noisy_wer"] = noisy
        log_dict[f"{type_}/perf_{lang}_{mode}_avg_wer"] = perf[f"{mode}_avg_wer"]
    log_dict["epoch"] = epoch
    log_dict["lang"] = curr_lang_idx
    if logger is not None:
        logger.log(log_dict)
    return perf
