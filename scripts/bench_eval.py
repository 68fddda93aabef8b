"""Decode/eval throughput benchmark (secondary metric; bench.py stays the
driver-facing headline).

Measures batched transcription throughput of the flagship model on
synthetic audio for the RNNT decode strategies:
  * labelsync  — label-looping greedy (rounds ~ U + T/window)
  * framesync  — frame-synchronous greedy (rounds ~ T)
  * fused      — single-kernel Pallas greedy (TPU default)
  * beam       — batched jit beam search (beam_size hypotheses)
  * beam_fused — single-kernel Pallas beam (TPU default for rnnt_beam)

Usage: python scripts/bench_eval.py [--batch 16] [--secs 8] [--iters 20]
       [--decoders labelsync,framesync,beam] [--tiny]
Prints one JSON line per decoder:
  {"metric": "eval_utts_per_sec", "decoder": ..., "value": ...}
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--secs", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument(
        "--decoders", default="labelsync,framesync,fused,beam,beam_fused",
        help="comma list of labelsync|framesync|fused|beam|beam_fused",
    )
    ap.add_argument("--beam_size", type=int, default=4)
    ap.add_argument("--max_expansions", type=int, default=6)
    ap.add_argument(
        "--tiny", action="store_true",
        help="tiny model (CPU smoke); default is the flagship",
    )
    args = ap.parse_args(argv)

    from indic_cl_asr_tpu.audio.features import (
        FrontendConfig,
        log_mel_spectrogram,
    )
    from indic_cl_asr_tpu.models.hybrid import (
        flagship_config,
        init_model,
        tiny_config,
    )
    from indic_cl_asr_tpu.ops.beam_search import rnnt_beam_search_batched
    from indic_cl_asr_tpu.ops.decoding import (
        rnnt_greedy_decode,
        rnnt_greedy_decode_labelsync,
    )

    cfg = tiny_config() if args.tiny else flagship_config()
    fe = FrontendConfig(n_mels=cfg.encoder.feat_in)
    model, variables = init_model(cfg, jax.random.PRNGKey(0))

    B, S = args.batch, 16000 * args.secs
    rng = np.random.default_rng(0)
    audio = jnp.asarray(0.1 * rng.standard_normal((B, S)), jnp.float32)
    lens = jnp.full((B,), S, jnp.int32)
    lang = jnp.zeros((B,), jnp.int32)

    def make(decoder):
        # IMPORTANT: pred/joint closures must capture the jitted fn's
        # `variables` ARGUMENT, not the outer python value — otherwise
        # every parameter is embedded into the program as a constant
        # (lowering alone then takes minutes at flagship size)
        def fn(variables, audio, lens, carry):
            # `carry` chains each timed iteration through the previous
            # one's output (same trick as bench.py): on the tunneled
            # backend, independent dispatches don't serialize observably
            # and a per-iteration host sync adds a full tunnel round trip
            # to every batch — the old per-iter block_until_ready
            # overstated batch time by ~2x at flagship shapes.
            audio = audio + carry
            def pred_step(last_label, state):
                return model.apply(
                    variables, last_label, state, method="pred_step"
                )

            def joint_step(f_t, g_t, li):
                return model.apply(
                    variables, f_t, g_t, li, method="joint_step"
                )

            mel, mel_lens = log_mel_spectrogram(
                audio, lens, fe, training=False
            )
            f, enc_lens = model.apply(
                variables, mel, mel_lens, False, method="encode"
            )
            f_proj = model.apply(variables, f, method="joint_project_enc")
            if decoder == "labelsync":
                ids, out_lens = rnnt_greedy_decode_labelsync(
                    f_proj, enc_lens, lang, pred_step, joint_step, None,
                    blank=cfg.blank_local,
                )
            elif decoder == "framesync":
                ids, out_lens = rnnt_greedy_decode(
                    f_proj, enc_lens, lang, pred_step, joint_step, None,
                    blank=cfg.blank_local,
                )
            elif decoder == "beam":
                ids, out_lens, _ = rnnt_beam_search_batched(
                    f_proj, enc_lens, lang, pred_step, joint_step, None,
                    blank=cfg.blank_local, beam_size=args.beam_size,
                    max_expansions=args.max_expansions,
                )
            elif decoder == "fused":
                from indic_cl_asr_tpu.ops.decode_fused_pallas import (
                    extract_decode_weights,
                    rnnt_greedy_decode_fused,
                )

                w = extract_decode_weights(variables, 0, dtype=cfg.dtype)
                ids, out_lens = rnnt_greedy_decode_fused(
                    f_proj, enc_lens, w, blank=cfg.blank_local,
                    interpret=jax.default_backend() != "tpu",
                )
            elif decoder == "beam_fused":
                from indic_cl_asr_tpu.ops.beam_fused_pallas import (
                    rnnt_beam_search_fused,
                )
                from indic_cl_asr_tpu.ops.decode_fused_pallas import (
                    extract_decode_weights,
                )

                w = extract_decode_weights(variables, 0, dtype=cfg.dtype)
                ids, out_lens, _ = rnnt_beam_search_fused(
                    f_proj, enc_lens, w, blank=cfg.blank_local,
                    beam_size=args.beam_size,
                    max_expansions=args.max_expansions,
                    interpret=jax.default_backend() != "tpu",
                )
            else:
                raise ValueError(decoder)
            new_carry = jnp.sum(out_lens).astype(jnp.float32) * 1e-30
            return ids, out_lens, new_carry

        return jax.jit(fn)

    for decoder in args.decoders.split(","):
        fn = make(decoder)
        carry = jnp.float32(0)
        ids, out_lens, carry = fn(variables, audio, lens, carry)  # compile
        ids, out_lens, carry = fn(variables, audio, lens, carry)  # warm
        float(carry)
        t0 = time.time()
        for _ in range(args.iters):
            # the carry chain forces sequential device execution; ONE
            # host read at the end syncs the whole chain. The sync must
            # be a real host FETCH (float()), not block_until_ready: on
            # the tunneled backend block_until_ready returned without
            # forcing a Pallas-containing chain (measured 0.1 ms/batch
            # for the fused decoder vs 19.4 ms with a fetch).
            ids, out_lens, carry = fn(variables, audio, lens, carry)
        float(carry)
        dt = (time.time() - t0) / args.iters
        print(json.dumps({
            "metric": "eval_utts_per_sec",
            "decoder": decoder,
            "value": round(B / dt, 2),
            "batch_ms": round(dt * 1000, 1),
        }))


if __name__ == "__main__":
    main()
