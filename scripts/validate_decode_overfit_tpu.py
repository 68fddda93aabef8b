"""On-device decode-CORRECTNESS loop (VERDICT r4 weak 7 / item 7).

The r4 on-device CL runs proved the decode paths *run* on hardware but
their WER matrix was ~1.0 everywhere (synthetic random audio + an
untrained model), so on-hardware decode *discrimination* rested entirely
on the r3 validator parity runs. This script closes that cheaply:

  1. build a small-but-kernel-shaped hybrid (4-layer d512 encoder,
     pred/joint 640 — the SAME H/V tile shapes the fused Pallas kernels
     run at flagship scale, so Mosaic legalizes the identical kernels);
  2. overfit ~8 synthetic utterances (fixed tone patterns + fixed token
     targets) with the production train step until RNNT loss is low;
  3. decode those utterances through the FUSED greedy and FUSED beam
     kernels ON THE CHIP and compute token-level WER vs the targets.

Success = WER < 0.2 through both fused paths (typically 0.0), proving
the on-hardware kernels discriminate — they recover trained content,
not just execute. Reference analogue: NeMo's overfit smoke tests
(SURVEY.md §4 test strategy).

Usage: python scripts/validate_decode_overfit_tpu.py [--steps 120]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--secs", type=float, default=2.0)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tokens", type=int, default=6)
    ap.add_argument("--lr", type=float, default=3e-4)
    args = ap.parse_args(argv)

    import dataclasses

    from indic_cl_asr_tpu.audio.features import FrontendConfig
    from indic_cl_asr_tpu.models.hybrid import flagship_config, init_model
    from indic_cl_asr_tpu.ops.beam_fused_pallas import rnnt_beam_search_fused
    from indic_cl_asr_tpu.ops.decode_fused_pallas import (
        extract_decode_weights,
        rnnt_greedy_decode_fused,
    )
    from indic_cl_asr_tpu.train.metrics import wer
    from indic_cl_asr_tpu.train.state import create_train_state, make_optimizer
    from indic_cl_asr_tpu.train.step import StepConfig, make_train_step
    from indic_cl_asr_tpu.audio.features import log_mel_spectrogram

    # tiny warmup program first (per-process tunnel warmup)
    jnp.ones((8, 8)).sum().block_until_ready()

    # 4-layer flagship-width model: same fused-kernel tile shapes
    # (H=640, V1=257), 1/4 the encoder depth for fast overfit
    cfg = flagship_config(n_layers=4)
    cfg = dataclasses.replace(
        cfg, encoder=dataclasses.replace(cfg.encoder, frozen_till=0)
    )
    fe = FrontendConfig(n_mels=cfg.encoder.feat_in)
    model, variables = init_model(cfg, jax.random.PRNGKey(0))

    B, S, U = args.batch, int(16000 * args.secs), args.tokens
    rng = np.random.default_rng(0)
    # distinguishable audio: each utterance is a distinct mixture of
    # tones (stable spectral signatures; random noise would be
    # memorizable too but tones are far easier at few steps)
    t = np.arange(S) / 16000.0
    audio = np.stack([
        sum(
            0.3 * np.sin(2 * np.pi * f0 * (1 + 0.13 * k + 0.41 * b) * t)
            for k, f0 in enumerate((220.0, 550.0, 1310.0))
        )
        for b in range(B)
    ]).astype(np.float32)
    tokens = rng.integers(1, cfg.vocab_per_lang - 1, (B, U)).astype(np.int32)

    batch = {
        "audio": jnp.asarray(audio),
        "audio_len": jnp.full((B,), S, jnp.int32),
        "tokens": jnp.asarray(tokens),
        "token_len": jnp.full((B,), U, jnp.int32),
        "lang_ids": jnp.zeros((B,), jnp.int32),
    }

    step_cfg = StepConfig(
        frontend=fe, use_spec_augment=False, rnnt_chunk_size=32,
        uniform_lang_head=True,
    )
    tx = make_optimizer(lr=args.lr)
    state = create_train_state(variables, tx)
    step = jax.jit(
        make_train_step(model, cfg, step_cfg, tx), donate_argnums=(0,)
    )

    t0 = time.time()
    loss0 = None
    for i in range(args.steps):
        state, aux = step(state, batch, jax.random.PRNGKey(i))
        if i == 0:
            loss0 = float(aux["train_loss"])
            print(f"# step 0 loss {loss0:.2f} "
                  f"(compile {time.time() - t0:.0f}s)", flush=True)
        elif i % 20 == 0 or i == args.steps - 1:
            print(f"# step {i} loss {float(aux['train_loss']):.3f}",
                  flush=True)
    final_loss = float(aux["train_loss"])

    variables = {
        "params": state.params, "batch_stats": state.batch_stats
    }

    @jax.jit
    def encode(variables, audio, alens):
        mel, mel_lens = log_mel_spectrogram(audio, alens, fe, training=False)
        f, enc_lens = model.apply(
            variables, mel, mel_lens, False, method="encode"
        )
        return model.apply(variables, f, method="joint_project_enc"), enc_lens

    f_proj, enc_lens = encode(
        variables, batch["audio"], batch["audio_len"]
    )
    w = extract_decode_weights(variables, 0, dtype=cfg.dtype)
    interp = jax.default_backend() != "tpu"

    @jax.jit
    def greedy(w, f_proj, enc_lens):
        return rnnt_greedy_decode_fused(
            f_proj, enc_lens, w, blank=cfg.blank_local, interpret=interp
        )

    @jax.jit
    def beam(w, f_proj, enc_lens):
        ids, lens, _ = rnnt_beam_search_fused(
            f_proj, enc_lens, w, blank=cfg.blank_local, beam_size=4,
            interpret=interp,
        )
        return ids, lens

    refs = [" ".join(map(str, row)) for row in tokens]
    out = {"loss0": round(loss0, 2), "loss_final": round(final_loss, 3),
           "steps": args.steps}
    for name, fn in (("fused_greedy", greedy), ("fused_beam", beam)):
        ids, lens = fn(w, f_proj, enc_lens)
        ids, lens = np.asarray(ids), np.asarray(lens)
        hyps = [
            " ".join(map(str, ids[b, : lens[b]].tolist())) for b in range(B)
        ]
        out[f"{name}_wer"] = round(wer(refs, hyps), 4)
        out[f"{name}_sample"] = {"ref": refs[0], "hyp": hyps[0]}

    # TRAINED-model beam parity (the bar that matters for production):
    # on a converged model the hypothesis argmax gaps dwarf the one-ULP
    # reduction-order differences between the fused kernel and XLA, so
    # the two beams must agree token-for-token ON HARDWARE (the
    # random-weight validator only bounds score drift — see
    # validate_beam_fused_tpu.py).
    from indic_cl_asr_tpu.ops.beam_search import rnnt_beam_search_batched

    def pred_step(last_label, pstate):
        return model.apply(variables, last_label, pstate, method="pred_step")

    def joint_step(f_t, g_t, li):
        return model.apply(variables, f_t, g_t, li, method="joint_step")

    @jax.jit
    def xla_beam(f_proj, enc_lens):
        ids, lens, _ = rnnt_beam_search_batched(
            f_proj, enc_lens, batch["lang_ids"], pred_step, joint_step,
            None, blank=cfg.blank_local, beam_size=4,
        )
        return ids, lens

    ids_x, lens_x = map(np.asarray, xla_beam(f_proj, enc_lens))
    ids_f, lens_f = map(np.asarray, beam(w, f_proj, enc_lens))
    out["trained_beam_parity"] = bool(
        (lens_x == lens_f).all() and (ids_x == ids_f).all()
    )
    out["pass"] = bool(
        out["fused_greedy_wer"] < 0.2 and out["fused_beam_wer"] < 0.2
        and out["trained_beam_parity"]
    )
    print(json.dumps(out), flush=True)
    sys.exit(0 if out["pass"] else 1)


if __name__ == "__main__":
    main()
