"""On-device validation + timing of the fused beam-search kernel.

Runs the XLA batched beam (ops/beam_search.rnnt_beam_search_batched) and
the fused Pallas beam (ops/beam_fused_pallas.rnnt_beam_search_fused) on
the SAME flagship-shaped inputs on the real TPU, asserts identical
hypotheses, then times both (device-chained iterations, ONE host fetch —
the bench.py methodology; block_until_ready does not force
Pallas-containing chains on the tunneled backend).

Usage: python scripts/validate_beam_fused_tpu.py [--batch 16] [--secs 8]
       [--iters 10] [--beam_size 4] [--tiny]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402

# honor JAX_PLATFORMS explicitly (the axon plugin overrides the env var)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--secs", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--beam_size", type=int, default=4)
    ap.add_argument("--max_expansions", type=int, default=6)
    ap.add_argument("--tiny", action="store_true")
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
    from indic_cl_asr_tpu.ops.beam_fused_pallas import rnnt_beam_search_fused
    from indic_cl_asr_tpu.ops.beam_search import rnnt_beam_search_batched
    from indic_cl_asr_tpu.ops.decode_fused_pallas import (
        extract_decode_weights,
    )

    # tiny warmup program first (per-process tunnel warmup)
    jnp.ones((8, 8)).sum().block_until_ready()

    cfg = tiny_config() if args.tiny else flagship_config()
    fe = FrontendConfig(n_mels=cfg.encoder.feat_in)
    model, variables = init_model(cfg, jax.random.PRNGKey(0))

    B, S = args.batch, 16000 * args.secs
    rng = np.random.default_rng(0)
    audio = jnp.asarray(0.1 * rng.standard_normal((B, S)), jnp.float32)
    alens = jnp.full((B,), S, jnp.int32)
    lang = jnp.zeros((B,), jnp.int32)

    @jax.jit
    def encode(variables, audio, alens):
        mel, mel_lens = log_mel_spectrogram(audio, alens, fe, training=False)
        f, enc_lens = model.apply(
            variables, mel, mel_lens, False, method="encode"
        )
        return model.apply(variables, f, method="joint_project_enc"), enc_lens

    f_proj, enc_lens = encode(variables, audio, alens)
    jax.block_until_ready(f_proj)
    print(f"# f_proj {f_proj.shape} {f_proj.dtype}", flush=True)

    def pred_step(last_label, state):
        return model.apply(variables, last_label, state, method="pred_step")

    def joint_step(f_t, g_t, li):
        return model.apply(variables, f_t, g_t, li, method="joint_step")

    @jax.jit
    def xla_beam(variables, f_proj, enc_lens, carry):
        ids, lens, sc = rnnt_beam_search_batched(
            f_proj + carry, enc_lens, lang, pred_step, joint_step, None,
            blank=cfg.blank_local, beam_size=args.beam_size,
            max_expansions=args.max_expansions,
        )
        return ids, lens, sc, jnp.sum(lens).astype(f_proj.dtype) * 1e-30

    w = extract_decode_weights(variables, 0, dtype=cfg.dtype)
    interp = jax.default_backend() != "tpu"  # no Mosaic off-TPU

    @jax.jit
    def fused_beam(w, f_proj, enc_lens, carry):
        ids, lens, sc = rnnt_beam_search_fused(
            f_proj + carry, enc_lens, w, blank=cfg.blank_local,
            beam_size=args.beam_size, max_expansions=args.max_expansions,
            interpret=interp,
        )
        return ids, lens, sc, jnp.sum(lens).astype(f_proj.dtype) * 1e-30

    zero = jnp.zeros((), f_proj.dtype)
    ids_x, lens_x, sc_x, _ = xla_beam(variables, f_proj, enc_lens, zero)
    jax.block_until_ready(lens_x)
    print("# xla beam compiled", flush=True)
    ids_f, lens_f, sc_f, _ = fused_beam(w, f_proj, enc_lens, zero)
    jax.block_until_ready(lens_f)
    print("# fused beam compiled", flush=True)

    ids_x, lens_x, sc_x = map(np.asarray, (ids_x, lens_x, sc_x))
    ids_f, lens_f, sc_f = map(np.asarray, (ids_f, lens_f, sc_f))
    lens_eq = bool((lens_x == lens_f).all())
    ids_eq = bool((ids_x == ids_f).all())
    rows_eq = int(
        ((lens_x == lens_f) & (ids_x == ids_f).all(axis=1)).sum()
    )
    # determinism probe: a second fused run must reproduce itself exactly
    ids_f2, lens_f2, sc_f2, _ = fused_beam(w, f_proj, enc_lens, zero)
    det = bool(
        (np.asarray(ids_f2) == ids_f).all()
        and (np.asarray(lens_f2) == lens_f).all()
    )
    print(json.dumps({
        "parity": {
            "lens_equal": lens_eq, "ids_equal": ids_eq,
            "rows_equal": rows_eq, "batch": int(lens_x.shape[0]),
            "total_tokens": int(lens_x.sum()),
            "lens_xla": lens_x.tolist(), "lens_fused": lens_f.tolist(),
            "score_xla": [round(float(s), 3) for s in sc_x],
            "score_fused": [round(float(s), 3) for s in sc_f],
            "max_abs_score_diff": round(
                float(np.abs(sc_x - sc_f).max()), 4
            ),
            "fused_deterministic": det,
        },
    }), flush=True)

    def time_fn(fn, *fixed):
        # end-of-chain sync is a HOST FETCH (see module docstring)
        carry = zero
        for _ in range(2):  # warm
            ids, lens, sc, carry = fn(*fixed, carry)
        float(carry)
        t0 = time.time()
        for _ in range(args.iters):
            ids, lens, sc, carry = fn(*fixed, carry)
        float(carry)
        return (time.time() - t0) / args.iters * 1000

    ms_x = time_fn(xla_beam, variables, f_proj, enc_lens)
    ms_f = time_fn(fused_beam, w, f_proj, enc_lens)
    print(json.dumps({
        "beam_only_ms": {"xla_batched": round(ms_x, 2),
                         "fused_pallas": round(ms_f, 2),
                         "speedup": round(ms_x / ms_f, 2)},
    }), flush=True)
    # Pass criterion. ids_equal is NOT required here: this harness runs
    # an UNTRAINED model on noise — the maximally tie-dense case, where
    # the unfixable one-ULP reduction-order differences between Mosaic
    # and XLA flip near-tied candidate picks. What must hold on hardware:
    # identical emission behavior (lens), score agreement to ~1e-3
    # relative, and determinism. Hypothesis-EXACT hardware parity is
    # asserted on a trained model by validate_decode_overfit_tpu.py
    # (where argmax gaps dwarf ULP noise), and exact parity at f32
    # semantics by tests/test_beam_fused.py (interpret mode).
    rel = float(np.abs(sc_x - sc_f).max() / np.abs(sc_x).max())
    ok = lens_eq and det and rel < 1e-3
    print(json.dumps({
        "pass": bool(ok), "rel_score_diff": round(rel, 6),
        "ids_exact": ids_eq,
    }), flush=True)
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
