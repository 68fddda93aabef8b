"""Simulated-live streaming transcription of a WAV file.

Feeds a recording chunk-by-chunk through the cache-aware streaming stack
(models/streaming.py `StreamingASR`: per-layer encoder caches + the
decoder-state continuation of the batched greedy RNNT decoder) and
prints the incremental hypothesis after every chunk — the user-facing
demo of SURVEY §5.7's long-context/streaming subsystem. The reference's
streaming story stops at encoder cache exports
(conformer_encoder.py:449-493, `forward_for_export`); this drives the
full recognizer at O(chunk) cost per step.

    python scripts/stream_demo.py --run outputs/<run_id> --lang hindi \
        utt.wav [--chunk_mel 64]

Notes: exact offline==streaming parity holds for causal configs
(`--model.causal_conv true`, limited right context — parity tested in
tests/test_streaming.py); on a non-causal model the incremental text is
an approximation that converges to the offline result only to the
extent the attention context is limited. The mel front-end here is the
offline one applied to the full file (per-utterance normalization); a
live microphone deployment must use a causal normalization variant.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("wav", help="WAV file to stream")
    p.add_argument("--run", required=True, help="run dir (see transcribe.py)")
    p.add_argument("--task", default=None, help="idx:lang checkpoint pick")
    p.add_argument("--lang", default=None)
    p.add_argument("--chunk_mel", type=int, default=64,
                   help="mel frames per streaming chunk")
    p.add_argument("--quiet", action="store_true",
                   help="print only the final line")
    ns = p.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from transcribe import load_task_variables, restore_run  # noqa: E402

    from indic_cl_asr_tpu.audio.features import (
        FrontendConfig,
        log_mel_spectrogram,
    )
    from indic_cl_asr_tpu.audio.io import load_audio
    from indic_cl_asr_tpu.models.streaming import StreamingASR

    model, variables, model_cfg, tokenizer, languages, cfg, ckpt = (
        restore_run(ns.run)
    )
    variables = load_task_variables(ns.run, variables, ns.task, ckpt)
    lang = ns.lang or languages[0]
    assert lang in languages, f"--lang must be one of {languages}"
    lang_ids = jnp.asarray([languages.index(lang)], jnp.int32)

    fe = FrontendConfig(n_mels=model_cfg.encoder.feat_in)
    audio = load_audio(ns.wav)
    mel, mel_lens = log_mel_spectrogram(
        jnp.asarray(audio[None, :]),
        jnp.asarray([audio.shape[0]], jnp.int32),
        fe, training=False,
    )
    mel = np.asarray(mel)  # [1, n_mels, T]
    T = int(np.asarray(mel_lens)[0])
    C = ns.chunk_mel

    asr = StreamingASR(model, model_cfg, variables, chunk_mel=C)
    state = asr.init(batch_size=1)
    text = ""
    n_chunks = -(-T // C)
    for i in range(n_chunks):
        lo = i * C
        chunk = mel[:, :, lo : lo + C]
        valid = min(C, T - lo)
        if chunk.shape[2] < C:  # final partial chunk: zero-pad
            pad = np.zeros(
                (1, chunk.shape[1], C - chunk.shape[2]), chunk.dtype
            )
            chunk = np.concatenate([chunk, pad], axis=2)
        (tokens, lens), state = asr.step(
            state, jnp.asarray(chunk), lang_ids,
            valid_mel=jnp.asarray([valid], jnp.int32),
        )
        ids = np.asarray(tokens)[0, : int(np.asarray(lens)[0])].tolist()
        text = tokenizer.ids_to_text(ids, lang)
        if not ns.quiet:
            secs = (lo + valid) * fe.hop_length / fe.sample_rate
            print(f"[{secs:6.2f}s] {text}", flush=True)
    print(json.dumps(
        {"audio_filepath": ns.wav, "lang": lang, "text": text,
         "chunks": n_chunks}, ensure_ascii=False,
    ))
    return text


if __name__ == "__main__":
    main()
