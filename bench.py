"""Benchmark: flagship hybrid-model training throughput on one chip.

Measures the north-star metric (BASELINE.md): train utterances/sec/chip on
the ~120M-param 17-layer Conformer hybrid RNNT+CTC at the reference's
working point — batch 16, 8s utterances, encoder frozen below layer 12,
SpecAugment on, fused RNNT + CTC loss, AdamW (reference: config.yaml,
sbatch.sh 1x GPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput number (SURVEY.md §6).
We anchor against an ESTIMATED 20 utts/sec for the reference stack on one
A100 (NeMo conformer-large hybrid, fused_batch_size 4, per-batch greedy
WER inside training_step — the always-on decode alone caps it well below
raw fwd/bwd speed). Replace with a measured number when the reference can
be run; the estimate is recorded here so the ratio is auditable.
"""

import json
import os
import sys
import time

REFERENCE_A100_UTTS_PER_SEC_ESTIMATE = 20.0

# NOTE: do NOT enable the persistent compilation cache here — cached
# artifacts compiled through the tunnel have faulted on reload
# (UNAVAILABLE "kernel fault"); cold compiles are safer.

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
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
    step_cfg = StepConfig()
    step = jax.jit(
        make_train_step(model, cfg, step_cfg, tx), donate_argnums=0
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

    # Timing notes: steps CHAIN through the donated state, so the final
    # loss value cannot materialize until every step has executed; syncing
    # via an actual host read of that value (not block_until_ready, whose
    # semantics we don't fully trust on the experimental tunneled backend)
    # makes the measurement robust. n_iters amortizes the one host
    # round-trip (~70 ms through the tunnel) to <1 ms/step.
    n_iters = 100
    t0 = time.time()
    for i in range(n_iters):
        state, aux = step(state, batch, jax.random.PRNGKey(2 + i))
    final_loss = float(aux["train_loss"])
    dt = (time.time() - t0) / n_iters

    utts_per_sec = B / dt
    result = {
        "metric": "train_utts_per_sec_per_chip",
        "value": round(utts_per_sec, 2),
        "unit": "utts/s (B=16, 8s utts, 124.6M-param hybrid)",
        "vs_baseline": round(
            utts_per_sec / REFERENCE_A100_UTTS_PER_SEC_ESTIMATE, 2
        ),
    }
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
