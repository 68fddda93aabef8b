"""Benchmark: flagship hybrid-model training throughput on one chip.

Measures the north-star metric (BASELINE.md): train utterances/sec/chip on
the ~120M-param 17-layer Conformer hybrid RNNT+CTC at the reference's
working point — batch 16, 8s utterances, encoder frozen below layer 12,
SpecAugment on, fused RNNT + CTC loss, AdamW (reference: config.yaml,
sbatch.sh 1x GPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput number and ships no
timing logs (SURVEY.md §6; /root/reference/results has only PDFs), and no
GPU exists in this environment to measure it, so the anchor is a DERIVED
estimate, deliberately taken at the reference-favorable END of its range:

  reference working point (config.yaml + sbatch.sh): 1x A100, batch 16,
  bf16 AMP, fused_batch_size 4. Its training_step
  (vendored hybrid_rnnt_ctc_models.py:860-915) per batch does:
    * fwd+bwd: ~91 GFLOPs/utt at this config (analytic MAC count:
      17-layer d=512 conformer ~23 GMAC fwd + subsample 2.9 + joint 1.6 +
      heads; backward only over the 5 unfrozen layers + heads) ->
      ~1.5 TFLOP/batch; even at a GENEROUS 25% of A100 bf16 peak
      (312 TFLOPs) that is >= 19 ms/batch;
    * batched greedy RNNT decode EVERY batch (compute_wer=True,
      fused joint): ~T_enc=204 sequential pred-net+joint rounds, each a
      handful of small kernel launches -> >= 200 ms/batch;
    * per-batch CTC WER update/compute/reset, 8x gc.collect() +
      torch.cuda.empty_cache() calls and 2 .item() syncs
      (hybrid_rnnt_ctc_models.py:862-905) -> >= 100 ms/batch.
  Total >= ~0.35 s/batch -> <= ~45 utts/s; 4x fused-batch serialization
  of the joint pushes it lower. We anchor at 40 utts/s (the fast end).

Replace with a measured number when the reference stack can be run on a
GPU; the derivation is recorded here so the ratio is auditable.
"""

import json
import os
import sys
import time

REFERENCE_A100_UTTS_PER_SEC_ESTIMATE = 40.0

# NOTE: do NOT enable the persistent compilation cache here — cached
# artifacts compiled through the tunnel have faulted on reload
# (UNAVAILABLE "kernel fault"); cold compiles are safer.

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    # Pre-warm the tunneled worker with a trivial program FIRST: the
    # per-process warmup (queueing/plugin bring-up, up to ~7 min observed)
    # is a one-time cost, and the tunnel kills workers whose first program
    # takes >~10 min total — paying warmup on a 1-op program keeps the big
    # step's own compile window safely under that budget.
    t_warm = time.time()
    jax.block_until_ready(
        jax.jit(lambda a: a @ a)(jnp.ones((128, 128), jnp.bfloat16))
    )
    print(f"# worker warm in {time.time() - t_warm:.0f}s", file=sys.stderr)

    from indic_cl_asr_tpu.models.hybrid import flagship_config, init_model
    from indic_cl_asr_tpu.train.state import create_train_state, make_optimizer
    from indic_cl_asr_tpu.train.step import StepConfig, make_train_step
    from indic_cl_asr_tpu.utils.pytree import conformer_freeze_mask

    import dataclasses

    cfg = flagship_config()
    # reference working point freezes encoder layers [0, 12): the scanned
    # encoder takes the stop-gradient cut inside the layer stack (backward
    # never enters the frozen prefix) + zeroed optimizer rows
    cfg = dataclasses.replace(
        cfg, encoder=dataclasses.replace(cfg.encoder, frozen_till=12)
    )
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    mask = conformer_freeze_mask(variables["params"], 12)
    tx = make_optimizer(lr=1e-4, trainable_mask=mask, stacked_freeze_till=12)
    state = create_train_state(variables, tx)
    # rnnt_chunk_size 32, not the training default 64: the current
    # tunnel/libtpu version MISCOMPILES (kernel-faults) the composed
    # encoder+joint program at Tc=64 tile shapes, while 16/32 run clean
    # and the loss is exactly chunk-size-invariant (tested). Bisected
    # 2026-08-17; see docs/ROADMAP.md infra notes.
    step_cfg = StepConfig(
        rnnt_chunk_size=int(os.environ.get("BENCH_RNNT_CHUNK", "32"))
    )
    # BENCH_NO_DONATE=1: skip buffer donation — diagnostic fallback for
    # the tunneled backend (donation is suspected in the 2026-08-17
    # full-step faults; costs one extra state copy of HBM if used)
    donate = () if os.environ.get("BENCH_NO_DONATE") == "1" else (0,)
    step = jax.jit(
        make_train_step(model, cfg, step_cfg, tx), donate_argnums=donate
    )

    B, SECS, U = 16, 8, 48
    S = 16000 * SECS
    rng = np.random.default_rng(0)
    batch = {
        "audio": jnp.asarray(0.1 * rng.standard_normal((B, S)), jnp.float32),
        "audio_len": jnp.full((B,), S, jnp.int32),
        "tokens": jnp.asarray(
            rng.integers(1, cfg.vocab_per_lang, (B, U)), jnp.int32
        ),
        "token_len": jnp.full((B,), U, jnp.int32),
        "lang_ids": jnp.zeros((B,), jnp.int32),
    }

    # warmup (first program in a fresh TPU process can take minutes on the
    # tunneled backend) + compile
    state, aux = step(state, batch, jax.random.PRNGKey(0))
    jax.block_until_ready(aux)
    state, aux = step(state, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(aux)

    # Timing notes: steps CHAIN through the donated state, so a block's
    # final loss value cannot materialize until every step in it has
    # executed; syncing via an actual host read of that value (not
    # block_until_ready, whose semantics we don't fully trust on the
    # experimental tunneled backend) makes the measurement robust. Reads
    # are double-buffered one block behind: the dispatch queue stays
    # bounded at <= 2 blocks (deep async chains have faulted the tunnel),
    # the host round-trip overlaps the next block's device execution, and
    # only the final read (~70 ms / 100 steps) lands in the window.
    n_blocks, k = 10, 10
    t0 = time.time()
    i = 0
    pending = None
    for _ in range(n_blocks):
        for _ in range(k):
            state, aux = step(state, batch, jax.random.PRNGKey(2 + i))
            i += 1
        if pending is not None:
            float(pending)
        pending = aux["train_loss"]
    final_loss = float(pending)
    dt = (time.time() - t0) / (n_blocks * k)

    utts_per_sec = B / dt
    result = {
        "metric": "train_utts_per_sec_per_chip",
        "value": round(utts_per_sec, 2),
        "unit": "utts/s (B=16, 8s utts, 124.6M-param hybrid)",
        "vs_baseline": round(
            utts_per_sec / REFERENCE_A100_UTTS_PER_SEC_ESTIMATE, 2
        ),
    }
    # the tunneled chip is intermittently shared/throttled (observed
    # minute-to-minute step-time swings 70 -> 315 ms on identical
    # programs); keep the best clean measurement and surface it when the
    # current window is clearly degraded, so both numbers are visible
    best_path = os.path.join(os.path.dirname(__file__), "BENCH_BEST.json")
    best = None
    try:
        if os.path.exists(best_path):
            with open(best_path) as f:
                best = json.load(f)
        if best is None or utts_per_sec > best["value"]:
            best = {
                "value": round(utts_per_sec, 2),
                "step_ms": round(dt * 1000, 1),
                "when": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime()),
            }
            with open(best_path, "w") as f:
                json.dump(best, f)
    except OSError:
        pass
    if best is not None and utts_per_sec < 0.5 * best["value"]:
        result["unit"] += (
            f" [degraded/shared chip this run; best clean measurement "
            f"{best['value']} utts/s ({best['when']})]"
        )
        result["vs_baseline"] = round(
            utts_per_sec / REFERENCE_A100_UTTS_PER_SEC_ESTIMATE, 2
        )
    print(json.dumps(result))
    try:
        with open(
            os.path.join(os.path.dirname(__file__), "BENCH_LAST.json"), "w"
        ) as f:
            json.dump(result, f)
    except OSError:
        pass
    print(
        f"# step {dt * 1000:.1f} ms | audio-sec/sec "
        f"{B * SECS / dt:.0f} | loss {final_loss:.2f} | "
        f"backend {jax.default_backend()}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    # the tunneled TPU backend can fault transiently (UNAVAILABLE/ABORTED,
    # esp. during first-program warmup); retry in a fresh process state
    import subprocess
    import traceback

    attempts = int(os.environ.get("BENCH_ATTEMPTS", "3"))
    if os.environ.get("BENCH_CHILD") == "1":
        main()
        sys.exit(0)
    for i in range(attempts):
        r = subprocess.run(
            [sys.executable, __file__],
            env={**os.environ, "BENCH_CHILD": "1"},
            capture_output=True, text=True, timeout=3600,
        )
        out = r.stdout.strip()
        if r.returncode == 0 and '"metric"' in out:
            print(out.splitlines()[-1] if "\n" in out else out)
            print(r.stderr.strip()[-500:], file=sys.stderr)
            break
        print(
            f"# bench attempt {i + 1}/{attempts} failed "
            f"(rc={r.returncode}): {r.stderr.strip()[-300:]}",
            file=sys.stderr,
        )
        time.sleep(45)
    else:
        # all attempts faulted (the tunneled TPU backend has multi-hour
        # outages) — fall back to the last successful measurement, clearly
        # marked as cached
        last = os.path.join(os.path.dirname(__file__), "BENCH_LAST.json")
        if os.path.exists(last):
            with open(last) as f:
                cached = json.load(f)
            cached["unit"] += " [CACHED: TPU backend faulted this run]"
            print(json.dumps(cached))
            sys.exit(0)
        traceback.print_exc()
        sys.exit(1)
