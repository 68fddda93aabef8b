"""Benchmark: flagship hybrid-model training throughput on one chip.

Measures the north-star metric (BASELINE.md): train utterances/sec/chip on
the ~120M-param 17-layer Conformer hybrid RNNT+CTC at the reference's
working point — batch 16, 8s utterances, encoder frozen below layer 12,
SpecAugment on, fused RNNT + CTC loss, AdamW (reference: config.yaml,
sbatch.sh 1x GPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Extra audit fields (VERDICT r2 item 2): "step_ms", "mfu", "components"
(telescoped per-stage times that must sum to ~ the step time),
"verified" (true only when the component split reconciles with the
headline), and "tc64_ok" (the Tc=64 miscompile canary, VERDICT r2 item 6).

Run layout: the parent spawns one child process per program class —
"step" (the headline timing), "components" (encode-fwd / loss-fwd /
fwd+bwd / full-step telescoping), "canary" (Tc=32 vs Tc=64 loss equality
at flagship tile shapes) — because the tunneled backend is most reliable
with one heavy program per process (docs/ROADMAP.md infra notes).

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
import signal
import sys
import time

REFERENCE_A100_UTTS_PER_SEC_ESTIMATE = 40.0
# Analytic fwd+bwd FLOPs per batch at the working point (see module
# docstring derivation; 2 FLOPs/MAC): used for the MFU line. v5e bf16
# peak is 197 TFLOP/s/chip. Audited against XLA's own cost model
# (scripts/flops_audit.py, unrolled stack so scan bodies count x17):
# XLA counts 1.845 TFLOP for the full step — the +23% over the analytic
# figure is rematerialized compute from the chunk+remat joint, which the
# MFU convention excludes (model FLOPs, not executed FLOPs).
ANALYTIC_STEP_TFLOPS = 1.5
XLA_COUNTED_STEP_TFLOPS = 1.845  # scripts/flops_audit.py, 2026-08-17
V5E_BF16_PEAK_TFLOPS = 197.0

# NOTE: do NOT enable the persistent compilation cache here — cached
# artifacts compiled through the tunnel have faulted on reload
# (UNAVAILABLE "kernel fault"); cold compiles are safer.

_REPO = os.path.dirname(os.path.abspath(__file__))


def _warm():
    """Pre-warm the tunneled worker with a trivial program FIRST: the
    per-process warmup (queueing/plugin bring-up, up to ~7 min observed)
    is a one-time cost, and the tunnel kills workers whose first program
    takes >~10 min total — paying warmup on a 1-op program keeps the big
    step's own compile window safely under that budget."""
    import jax
    import jax.numpy as jnp

    t = time.time()
    jax.block_until_ready(
        jax.jit(lambda a: a @ a)(jnp.ones((128, 128), jnp.bfloat16))
    )
    print(f"# worker warm in {time.time() - t:.0f}s", file=sys.stderr)


def _platform_version():
    import jax

    try:
        return jax.devices()[0].client.platform_version
    except Exception:
        return "unknown"


def _setup(rnnt_chunk: int):
    """Build the flagship model, optimizer state, step config and batch at
    the reference working point."""
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp

    from indic_cl_asr_tpu.models.hybrid import flagship_config, init_model
    from indic_cl_asr_tpu.train.state import create_train_state, make_optimizer
    from indic_cl_asr_tpu.train.step import StepConfig
    from indic_cl_asr_tpu.utils.pytree import conformer_freeze_mask

    # the fused Pallas rel-pos attention (ops/flash_mhsa.py) is the
    # flagship default since its hardware A/B win (full step 40.9 ->
    # 36.9 ms, 2026-08-18); BENCH_ATTN_IMPL=xla measures the fallback
    cfg = flagship_config(
        attn_impl=os.environ.get("BENCH_ATTN_IMPL", "flash")
    )
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
    # uniform_lang_head: the bench batch is single-language (all
    # lang_ids 0) exactly like every CL-driver task batch; the drivers
    # run with the same flag (scripts/_common.py), so this measures the
    # production step. BENCH_UNIFORM_HEAD=0 times the per-sample path.
    step_cfg = StepConfig(
        rnnt_chunk_size=rnnt_chunk,
        uniform_lang_head=os.environ.get("BENCH_UNIFORM_HEAD", "1") == "1",
        # Chunk-remat policy (ops/rnnt_loss_fused.py). "none" is the
        # production default at the flagship working point (matches
        # scripts/config.yaml): hardware A/B 2026-08-20 on a clean window
        # (encode_fwd canary 11.04/11.05 ms vs 10.95 on the 2026-08-19
        # verified record) measured full_step none=29.02 / save_logits=
        # 29.44 vs full=29.88 — skipping the per-chunk joint recompute
        # buys ~0.9 ms/step for ~500 MB extra residency at T=204.
        rnnt_remat=os.environ.get("BENCH_RNNT_REMAT", "none"),
    )

    # BENCH_BATCH: batch-scaling studies only (docs/PERF.md). The
    # headline metric stays B=16 — the reference's working point
    # (config.yaml batch_size) and the series anchor across rounds.
    B = int(os.environ.get("BENCH_BATCH", "16"))
    SECS, U = 8, 48
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
    return model, cfg, tx, state, step_cfg, batch, (B, SECS, U)


def _default_chunk() -> int:
    # 64 — the training default, and the fastest measured (48.11 ms/step
    # vs 48.87 at Tc=32, verified 2026-08-17). History: an earlier
    # tunnel/libtpu build kernel-faulted the composed encoder+joint
    # program at Tc=64 tile shapes; that miscompile was tied to the
    # threefry dropout-mask chains and died with the rbg-key switch
    # (utils/rng.py). The "canary" mode re-checks Tc=32 vs Tc=64 every
    # bench run (loss equality + no fault), so a regression is caught and
    # recorded against the libtpu version string.
    return int(os.environ.get("BENCH_RNNT_CHUNK", "64"))


def mode_step():
    """Headline: steady-state full-train-step throughput."""
    import jax

    _warm()
    model, cfg, tx, state, step_cfg, batch, (B, SECS, U) = _setup(
        _default_chunk()
    )
    from indic_cl_asr_tpu.train.step import make_train_step

    # BENCH_NO_DONATE=1: skip buffer donation — diagnostic fallback for
    # the tunneled backend (costs one extra state copy of HBM if used)
    donate = () if os.environ.get("BENCH_NO_DONATE") == "1" else (0,)
    step = jax.jit(
        make_train_step(model, cfg, step_cfg, tx), donate_argnums=donate
    )

    # warmup + compile; skip the second (steady-state) warmup step when
    # the window is clearly degraded — it would cost minutes for nothing
    tw = time.time()
    state, aux = step(state, batch, jax.random.PRNGKey(0))
    jax.block_until_ready(aux)
    if time.time() - tw < 60.0:
        state, aux = step(state, batch, jax.random.PRNGKey(1))
        jax.block_until_ready(aux)

    # Timing: steps CHAIN through the donated state, so a block's final
    # loss value cannot materialize until every step in it has executed;
    # syncing via an actual host read of that value (not
    # block_until_ready, whose semantics we don't fully trust on the
    # experimental tunneled backend) makes the measurement robust. Reads
    # are double-buffered one block behind: the dispatch queue stays
    # bounded at <= 2 blocks, the host round-trip overlaps the next
    # block's device execution, and only the final read lands in the
    # window.
    #
    # Keys are PRE-SPLIT once (like mode_components): jax.random.PRNGKey
    # inside the timed loop is a tiny device program per iteration, and
    # on the tunneled backend per-dispatch latency swings made the
    # headline child read 39-41 ms on windows where the components child
    # simultaneously measured the same full step at 28.9 ms (3/3 bench
    # runs 2026-08-20).
    keys = jax.random.split(jax.random.PRNGKey(7), 128)
    # 2 blocks x 50: ~100 measured steps, 2 read boundaries. With a
    # genuine 100-step measurement the headline reads ~26.4 ms — BELOW
    # the undonated components full_step (28.9) because this loop
    # donates the state (avoids the ~1.3 GB trainable-state copy). The
    # earlier "headline reads 1.5-2.5 ms above components" captures
    # (30.8-31.2, 2026-08-20 afternoon) were 6-step measurements —
    # the probe misread the windows' one-step warmup transient as
    # "degraded" (see the tail re-classification below); short reads
    # carry ~2-4 ms/step of fixed fetch overhead. The donated-state
    # chain keeps the dispatch queue bounded by construction.
    n_blocks, k = 2, 50
    # probe block first: on a contended window (step >= 0.5 s) a precise
    # 100-step measurement wastes ~10 min of chip time quantifying a
    # number we will not keep — 2 short blocks suffice to annotate it.
    # The probe itself is staged: one step first, and only if that is
    # fast (< 2 s) the full 10-step probe — on a badly degraded window
    # (observed 17 s/step) even a 10-step probe is 3 min of chip time.
    tp = time.time()
    state, aux = step(state, batch, keys[0])
    float(aux["train_loss"])  # host sync
    first_dt = time.time() - tp
    if first_dt > 30.0:
        # ~1000x-degraded windows exist (observed 50-150 s/step); every
        # extra step is a minute of chip time spent quantifying garbage.
        # But one-step WARMUP transients have measured up to 29.7 s on
        # otherwise-clean windows: up to 60 s, spend ONE tail step (k=2)
        # to let the tail re-classification below rescue the window.
        k = 2 if first_dt <= 60.0 else 1
        print(f"# severely degraded window (first step {first_dt:.0f} s):"
              f" minimal measurement", file=sys.stderr)
    elif first_dt > 2.0:
        k = 3
        print(f"# degraded window (first step {first_dt * 1000:.0f} ms):"
              f" minimal probe/measurement", file=sys.stderr)
    if k > 1:
        tp = time.time()
        for i in range(1, k):
            state, aux = step(state, batch, keys[i])
        probe_loss = float(aux["train_loss"])
        tail_dt = (time.time() - tp) / (k - 1)  # excludes the first step
        n_timed = k - 1 if k > 3 else k  # full probe loop runs k-1 steps
        probe_dt = (
            (time.time() - tp) + (first_dt if k == 3 else 0.0)
        ) / n_timed
        if k in (2, 3) and tail_dt < 0.1:
            # 2026-08-20 evening: every window showed a ONE-STEP warmup
            # transient (first step 4.5-29.7 s, steady state ~30 ms)
            # that the first_dt-based classifier read as "degraded",
            # shrinking the measurement to 6 steps. The steady-state
            # tail is the window truth: when it is clean, restore the
            # full measurement and classify on the tail.
            print(
                f"# transient first step ({first_dt:.1f} s), clean tail"
                f" ({tail_dt * 1000:.0f} ms/step): full measurement",
                file=sys.stderr,
            )
            k = 50
            probe_dt = tail_dt
    else:
        probe_dt = first_dt
    if probe_dt > 0.5:
        n_blocks = 2
        print(f"# contended window (probe {probe_dt * 1000:.0f} ms/step):"
              f" short measurement", file=sys.stderr)
    t0 = time.time()
    i = k
    pending = None
    for _ in range(n_blocks):
        for _ in range(k):
            state, aux = step(state, batch, keys[i % 128])
            i += 1
        if pending is not None:
            float(pending)
        pending = aux["train_loss"]
    final_loss = float(pending)
    dt = (time.time() - t0) / (n_blocks * k)

    out = {
        "mode": "step",
        "step_ms": round(dt * 1000, 2),
        "utts_per_sec": round(B / dt, 2),
        "audio_sec_per_sec": round(B * SECS / dt, 1),
        "mfu": round(
            ANALYTIC_STEP_TFLOPS / dt / V5E_BF16_PEAK_TFLOPS, 4
        ),
        "loss": round(final_loss, 3),
        "platform_version": _platform_version(),
    }
    print(json.dumps(out))


def mode_components():
    """Telescoped component split of the SAME program family (VERDICT r2
    item 2): encode-fwd, full fwd+bwd, full step (plus full-loss-fwd when
    BENCH_COMP_FULL=1 — a 4th big compile regularly blows the child's
    window on the tunneled backend). Each is an independent steady-state
    measurement; differences give loss+backward and optimizer costs, and
    the largest (full step) must reconcile with the headline."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    _warm()
    model, cfg, tx, state, step_cfg, batch, (B, SECS, U) = _setup(
        _default_chunk()
    )
    from indic_cl_asr_tpu.audio.features import log_mel_spectrogram
    from indic_cl_asr_tpu.train.step import (
        hybrid_forward_loss,
        make_train_step,
    )

    mel, mel_lens = log_mel_spectrogram(
        batch["audio"], batch["audio_len"], step_cfg.frontend
    )
    mel = jax.block_until_ready(mel)

    variables = state.variables

    # EVERY timed program must CHAIN through its predecessor's output:
    # independent identical dispatches on the tunneled backend do not
    # serialize observably (blocking on the last of 20 independent
    # dispatches measured 0.08 ms/encode — physically impossible), so each
    # iteration folds the previous scalar result into the next input,
    # forcing true sequential device execution exactly like the step
    # loop's donated-state chain.

    def encode_fwd(variables, mel, mel_lens, carry):
        f, enc_lens = model.apply(
            variables, mel + carry, mel_lens, False, method="encode"
        )
        return jnp.sum(f.astype(jnp.float32)) * 1e-30

    def loss_fwd(params, batch_stats, batch, rng, carry):
        loss, _ = hybrid_forward_loss(
            model, cfg, step_cfg, params, batch_stats,
            batch["audio"] + carry, batch["audio_len"], batch["tokens"],
            batch["token_len"], batch["lang_ids"], rng, train=True,
        )
        return loss

    def fwd_bwd(params, batch_stats, batch, rng, carry):
        loss, grads = jax.value_and_grad(loss_fwd)(
            params, batch_stats, batch, rng, carry
        )
        gnorm = jax.tree_util.tree_reduce(
            lambda a, g: a + jnp.sum(jnp.square(g.astype(jnp.float32))),
            grads, jnp.float32(0),
        )
        return (loss + gnorm) * 1e-30

    step = jax.jit(make_train_step(model, cfg, step_cfg, tx))
    keys = jax.random.split(jax.random.PRNGKey(0), 64)

    def time_chained(name, fn, args_for, n=20):
        # args_for(i, carry) -> argument tuple; fn returns a tiny scalar
        # folded into the next call's input
        carry = jnp.float32(0)
        carry = fn(*args_for(0, carry))  # compile
        carry = fn(*args_for(1, carry))  # steady-state warmup
        float(carry)  # host sync
        t0 = time.time()
        for i in range(n):
            carry = fn(*args_for(2 + i, carry))
        float(carry)  # host read: the chain forces all n executions
        ms = (time.time() - t0) / n * 1000
        print(f"# {name}: {ms:.2f} ms", file=sys.stderr)
        return round(ms, 2)

    comp = {}
    jenc = jax.jit(encode_fwd)
    comp["encode_fwd_ms"] = time_chained(
        "encode_fwd", jenc, lambda i, c: (variables, mel, mel_lens, c)
    )
    if os.environ.get("BENCH_COMP_FULL") == "1":
        jloss = jax.jit(loss_fwd)
        comp["loss_fwd_ms"] = time_chained(
            "loss_fwd", jloss,
            lambda i, c: (variables["params"], variables["batch_stats"],
                          batch, keys[i % 64], c * 1e-30),
        )
    jgrad = jax.jit(fwd_bwd)
    comp["fwd_bwd_ms"] = time_chained(
        "fwd_bwd", jgrad,
        lambda i, c: (variables["params"], variables["batch_stats"],
                      batch, keys[i % 64], c),
    )

    # full step chains naturally through the returned TrainState
    def run_step(state, batch, key):
        return step(state, batch, key)

    s = state
    s, aux = run_step(s, batch, keys[0])  # compile
    s, aux = run_step(s, batch, keys[1])
    float(aux["train_loss"])
    t0 = time.time()
    n = 20
    for i in range(n):
        s, aux = run_step(s, batch, keys[(2 + i) % 64])
    float(aux["train_loss"])
    comp["full_step_ms"] = round((time.time() - t0) / n * 1000, 2)
    print(f"# full_step: {comp['full_step_ms']} ms", file=sys.stderr)

    comp["derived"] = {
        "loss_and_backward_ms": round(
            comp["fwd_bwd_ms"] - comp["encode_fwd_ms"], 2
        ),
        "optimizer_ms": round(
            comp["full_step_ms"] - comp["fwd_bwd_ms"], 2
        ),
    }
    if "loss_fwd_ms" in comp:
        comp["derived"]["joint_lattice_fwd_ms"] = round(
            comp["loss_fwd_ms"] - comp["encode_fwd_ms"], 2
        )
        comp["derived"]["backward_ms"] = round(
            comp["fwd_bwd_ms"] - comp["loss_fwd_ms"], 2
        )
    print(json.dumps({"mode": "components", "components": comp}))


def mode_components_bwd():
    """Backward-split audit child (VERDICT r3 item 4): two more chained
    steady-state measurements of the same program family —

      * enc_fwd_bwd: frontend + SpecAugment + encoder forward AND backward
        (grad of a scalar over the encoder output wrt params, train-mode
        dropout/BN exactly like the step) — minus components' encode_fwd
        this localizes the ENCODER backward;
      * loss_fwd: the full hybrid loss forward (joint + RNNT lattice +
        CTC, no backward) — minus encode_fwd this localizes the
        joint/lattice/CTC forward.

    The parent merges these with the components child's numbers so
    fwd_bwd_ms telescopes into encode_fwd / encoder_bwd /
    joint_lattice_ctc_fwd / joint_lattice_ctc_bwd named stages. Kept as a
    SEPARATE child because a 4th big compile in one process regularly
    blows the window on the tunneled backend."""
    import jax
    import jax.numpy as jnp

    _warm()
    model, cfg, tx, state, step_cfg, batch, (B, SECS, U) = _setup(
        _default_chunk()
    )
    from indic_cl_asr_tpu.audio.features import log_mel_spectrogram
    from indic_cl_asr_tpu.audio.spec_augment import spec_augment
    from indic_cl_asr_tpu.train.step import hybrid_forward_loss
    from indic_cl_asr_tpu.utils.rng import fast_dropout_key

    variables = state.variables

    def enc_loss(params, batch_stats, audio, audio_lens, rng, carry):
        # mirrors hybrid_forward_loss's encoder-side path exactly
        # (train-mode dither, SpecAugment, dropout keys, BN mutation)
        k_dither, k_spec, k_drop, _ = jax.random.split(rng, 4)
        if step_cfg.fast_dropout_rng:
            k_drop = fast_dropout_key(k_drop)
        mel, mel_lens = log_mel_spectrogram(
            audio + carry, audio_lens, step_cfg.frontend,
            training=True, rng=k_dither,
        )
        mel = spec_augment(mel, mel_lens, k_spec, step_cfg.spec_augment)
        (f, _), _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            mel, mel_lens, True, method="encode",
            rngs={"dropout": k_drop}, mutable=["batch_stats"],
        )
        return jnp.sum(f.astype(jnp.float32)) * 1e-6

    def enc_fwd_bwd(params, batch_stats, batch, rng, carry):
        loss, grads = jax.value_and_grad(enc_loss)(
            params, batch_stats, batch["audio"], batch["audio_len"],
            rng, carry,
        )
        gnorm = jax.tree_util.tree_reduce(
            lambda a, g: a + jnp.sum(jnp.square(g.astype(jnp.float32))),
            grads, jnp.float32(0),
        )
        return (loss + gnorm) * 1e-30

    def loss_fwd(params, batch_stats, batch, rng, carry):
        loss, _ = hybrid_forward_loss(
            model, cfg, step_cfg, params, batch_stats,
            batch["audio"] + carry, batch["audio_len"], batch["tokens"],
            batch["token_len"], batch["lang_ids"], rng, train=True,
        )
        return loss * 1e-30

    keys = jax.random.split(jax.random.PRNGKey(0), 64)

    def time_chained(name, fn, n=20):
        carry = jnp.float32(0)
        jfn = jax.jit(fn)
        carry = jfn(variables["params"], variables["batch_stats"],
                    batch, keys[0], carry)  # compile
        carry = jfn(variables["params"], variables["batch_stats"],
                    batch, keys[1], carry)  # steady state
        float(carry)  # host sync
        t0 = time.time()
        for i in range(n):
            carry = jfn(variables["params"], variables["batch_stats"],
                        batch, keys[(2 + i) % 64], carry)
        float(carry)  # host read: the chain forces all n executions
        ms = (time.time() - t0) / n * 1000
        print(f"# {name}: {ms:.2f} ms", file=sys.stderr)
        return round(ms, 2)

    comp = {
        "enc_fwd_bwd_ms": time_chained("enc_fwd_bwd", enc_fwd_bwd),
        "loss_fwd_ms": time_chained("loss_fwd", loss_fwd),
    }
    print(json.dumps({"mode": "components_bwd", "components": comp}))


def mode_canary():
    """Tc=64 miscompile canary (VERDICT r2 item 6): one step at Tc=32 and
    one at Tc=64 at flagship tile shapes; assert loss equality and no
    fault, and record the libtpu/platform version the result is keyed to.
    The known-bad tunnel faults the Tc=64 program — a fault here is
    reported as tc64_ok=false, not an error."""
    import jax

    _warm()
    ver = _platform_version()
    losses = {}
    fault = None
    for tc in (32, 64):
        model, cfg, tx, state, step_cfg, batch, _ = _setup(tc)
        from indic_cl_asr_tpu.train.step import make_train_step

        step = jax.jit(make_train_step(model, cfg, step_cfg, tx))
        try:
            state, aux = step(state, batch, jax.random.PRNGKey(0))
            losses[tc] = float(aux["train_loss"])
            print(f"# canary Tc={tc}: loss={losses[tc]:.6f}",
                  file=sys.stderr)
        except Exception as e:  # the known-bad tunnel FAULTS Tc=64
            losses[tc] = None
            fault = f"Tc={tc}: {type(e).__name__}: {str(e)[:200]}"
            print(f"# canary {fault}", file=sys.stderr)
            break  # a worker fault poisons the rest of this process
    ok = (
        losses.get(32) is not None and losses.get(64) is not None
        and abs(losses[32] - losses[64])
        <= 1e-3 * max(1.0, abs(losses[32]))
    )
    print(json.dumps({
        "mode": "canary", "tc64_ok": bool(ok),
        "loss_tc32": losses.get(32), "loss_tc64": losses.get(64),
        "fault": fault, "platform_version": ver,
    }))


# --- unkillable-capture machinery (VERDICT r3 item 1) -------------------
# The driver wraps `python bench.py` in a `timeout`; three rounds in a row
# the captured record was unusable (cached relic / degraded / rc=124 with
# no JSON line).  The contract is now: this process emits at least one
# parseable record on EVERY exit path —
#   * an insurance line (the best cached verified record, clearly tagged)
#     is printed FIRST, before any chip work, so even SIGKILL leaves a
#     valid artifact;
#   * a SIGTERM handler (what `timeout` sends at rc=124) emits the best
#     record known at that instant and exits 0;
#   * all chip work runs under a hard wall-clock deadline
#     (BENCH_DEADLINE_S), and every child timeout is derived from the
#     REMAINING deadline instead of a fixed constant, so the parent always
#     reaches its own final print.
# The driver (and _run_child itself) parse the LAST JSON line, so the
# final record supersedes the insurance line.

_current_child = None   # in-flight child Popen, killed by the handler
_final_record = None    # best full record known right now
_finished = False


def _set_final(record):
    global _final_record
    _final_record = record


def _finish():
    """Print the best-known record exactly once (the process's LAST JSON
    line), persist it to BENCH_LAST.json, and update BENCH_BEST.json —
    on EVERY exit path, including the SIGTERM handler (VERDICT r4 weak
    2: the r04 524.8 record was emitted by the signal handler but BEST
    bookkeeping lived only after the sampling loop, so the verified
    record never superseded)."""
    global _finished
    if _finished:
        return
    _finished = True
    if _final_record is not None:
        _final_record.setdefault(
            "measured_at",
            time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime()),
        )
        print(json.dumps(_final_record), flush=True)
        _write_json(os.path.join(_REPO, "BENCH_LAST.json"), _final_record)
        if not _final_record.get("cached"):
            _update_best(_final_record)


def _update_best(record):
    """Best-measurement bookkeeping: a verified measurement SUPERSEDES any
    unverified one regardless of value (VERDICT r2: a single bogus
    high-water mark must not be enshrined forever); among equally-verified
    measurements the higher value wins. Fresh (non-cached) records only —
    callers gate on record["cached"]. Stores the component telescope with
    the best record so BENCH_BEST.json carries its own audit trail.
    Returns the (possibly updated) best record."""
    best_path = os.path.join(_REPO, "BENCH_BEST.json")
    best = _load_json(best_path)
    cur = {
        "value": record["value"],
        "step_ms": record.get("step_ms"),
        "mfu": record.get("mfu"),
        "verified": record.get("verified", False),
        "when": record.get(
            "measured_at",
            time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime()),
        ),
        "platform_version": record.get("platform_version", "unknown"),
    }
    if "components" in record:
        cur["components"] = record["components"]
    if best is not None:
        best.setdefault("verified", False)
    supersede = (
        best is None
        or (cur["verified"] and not best["verified"])
        or (cur["verified"] == best["verified"]
            and cur["value"] > best["value"])
    )
    if supersede:
        best = cur
        _write_json(best_path, best)
    return best


def _on_sigterm(signum, frame):
    print(f"# signal {signum}: emitting best-known record and exiting",
          file=sys.stderr, flush=True)
    child = _current_child
    if child is not None:
        try:
            child.kill()
        except OSError:
            pass
    _finish()
    os._exit(0)


def _run_child(mode: str, timeout: float, attempts: int = 1,
               retry_sleep: float = 45.0):
    """Run one bench mode in a fresh process; return its parsed JSON line
    or None. One heavy program family per process (tunnel reliability)."""
    import subprocess

    global _current_child
    for i in range(attempts):
        p = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            env={**os.environ, "BENCH_CHILD": mode},
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        _current_child = p
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            p.communicate()
            _current_child = None
            print(f"# {mode} child timed out ({timeout:.0f}s)",
                  file=sys.stderr)
            continue
        finally:
            _current_child = None
        for line in reversed(out.strip().splitlines()):
            try:
                d = json.loads(line)
                if d.get("mode") == mode:
                    print(err.strip()[-600:], file=sys.stderr)
                    return d
            except json.JSONDecodeError:
                continue
        print(
            f"# {mode} child attempt {i + 1}/{attempts} failed "
            f"(rc={p.returncode}): {err.strip()[-300:]}",
            file=sys.stderr,
        )
        time.sleep(retry_sleep)
    return None


def _load_json(path):
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


_BASE_UNIT = "utts/s (B=16, 8s utts, 124.6M-param hybrid)"


def _record_from_cached(cached: dict, tag: str) -> dict:
    """Full driver-parseable record built from a BENCH_BEST/LAST-style
    cached measurement, clearly tagged as cached."""
    utts = cached["value"]
    return {
        "metric": "train_utts_per_sec_per_chip",
        "value": utts,
        "unit": f"{_BASE_UNIT} [{tag}]",
        "vs_baseline": round(utts / REFERENCE_A100_UTTS_PER_SEC_ESTIMATE, 2),
        "step_ms": cached.get("step_ms"),
        "mfu": cached.get("mfu"),
        "verified": cached.get("verified", False),
        "cached": True,
        "measured_at": cached.get("when"),
        "platform_version": cached.get("platform_version", "unknown"),
    }


def _write_json(path, obj):
    try:
        with open(path, "w") as f:
            json.dump(obj, f)
    except OSError:
        pass


def main():
    attempts = int(os.environ.get("BENCH_ATTEMPTS", "2"))
    # Hard wall-clock deadline for the WHOLE invocation (VERDICT r3 item
    # 1): the driver wraps bench.py in its own `timeout`, so every child
    # timeout below is derived from the remaining deadline — the parent
    # must always reach its own final print before the driver kills it.
    deadline_s = float(os.environ.get("BENCH_DEADLINE_S", "2400"))
    t_start = time.time()
    deadline = t_start + deadline_s

    def remaining():
        return deadline - time.time()

    # Insurance record FIRST (before any chip work): the best cached
    # verified measurement, clearly tagged. Superseded by any later line.
    cached = _load_json(os.path.join(_REPO, "BENCH_BEST.json")) or \
        _load_json(os.path.join(_REPO, "BENCH_LAST.json"))
    if cached is not None and "value" in cached:
        tag = (
            "CACHED-VERIFIED: pre-run insurance record, superseded by any"
            " later line" if cached.get("verified")
            else "CACHED: pre-run insurance record, superseded by any"
            " later line"
        )
        insurance = _record_from_cached(cached, tag)
        print(json.dumps(insurance), flush=True)
        _set_final(_record_from_cached(
            cached,
            ("CACHED-VERIFIED" if cached.get("verified") else "CACHED")
            + ": window unusable this run",
        ))
    signal.signal(signal.SIGTERM, _on_sigterm)
    signal.signal(signal.SIGINT, _on_sigterm)

    # Window sampling: the tunneled chip is intermittently shared/throttled
    # (observed 3-360x step-time swings on identical programs, for hours at
    # a stretch). One bench invocation therefore SAMPLES windows: if the
    # measured step is slower than the audit threshold, sleep and resample
    # until either a clean window is caught or the deadline nears —
    # a single unlucky window must not become the round's record (that is
    # exactly what happened in rounds 1-2). Degraded samples are cheap
    # (~1-2 min: staged probe + short measurement in mode_step).
    sleep_s = float(os.environ.get("BENCH_WINDOW_SLEEP_S", "300"))
    min_clean = float(os.environ.get("BENCH_MIN_UTTS_FOR_AUDIT", "20"))
    step = None
    while remaining() > 240:
        child_budget = min(1800.0, remaining() - 120)
        s = _run_child("step", timeout=child_budget, attempts=attempts)
        if s is not None and (
            step is None or s["utts_per_sec"] > step["utts_per_sec"]
        ):
            step = s
            # upgrade the standing record as soon as we have ANY fresh
            # measurement — a kill from here on reports it
            utts = step["utts_per_sec"]
            fresh = {
                "metric": "train_utts_per_sec_per_chip",
                "value": utts,
                "unit": _BASE_UNIT + (
                    "" if utts >= min_clean
                    else " [degraded/contended window]"
                ),
                "vs_baseline": round(
                    utts / REFERENCE_A100_UTTS_PER_SEC_ESTIMATE, 2
                ),
                "step_ms": step["step_ms"],
                "mfu": step["mfu"],
                "verified": False,
                "measured_at": time.strftime(
                    "%Y-%m-%d %H:%M UTC", time.gmtime()
                ),
                "platform_version": step.get(
                    "platform_version", "unknown"
                ),
            }
            _set_final(fresh)
        if s is not None and s["utts_per_sec"] >= min_clean:
            break
        if remaining() < sleep_s + 300:
            break
        print(
            "# sample "
            + ("faulted" if s is None else f"{s['utts_per_sec']} utts/s"
               " (contended)")
            + f"; resampling in {sleep_s:.0f}s"
            f" ({remaining():.0f}s of deadline left)",
            file=sys.stderr,
        )
        time.sleep(sleep_s)
    if step is None:
        # all attempts faulted (the tunneled TPU backend has multi-hour
        # outages) — the standing record is the cached one, tagged
        print("# no fresh measurement; emitting cached record",
              file=sys.stderr)
        _finish()
        return 0

    utts = step["utts_per_sec"]
    result = {
        "metric": "train_utts_per_sec_per_chip",
        "value": utts,
        "unit": _BASE_UNIT,
        "vs_baseline": round(utts / REFERENCE_A100_UTTS_PER_SEC_ESTIMATE, 2),
        "step_ms": step["step_ms"],
        "mfu": step["mfu"],
        "measured_at": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime()),
        "platform_version": step.get("platform_version", "unknown"),
    }

    _write_json(os.path.join(_REPO, "BENCH_PARTS.json"), {"step": step})

    # The audit children (components + canary) cost more big compiles on
    # the chip; don't burn them proving a window that is obviously
    # contended (the chip intermittently degrades >10x; observed 3-157
    # utts/s on identical programs). Threshold: half the baseline anchor.
    min_audit = float(os.environ.get("BENCH_MIN_UTTS_FOR_AUDIT", "20"))
    audit = utts >= min_audit

    # Component split (audit trail): headline is "verified" only when the
    # independently-measured full step reconciles with it within 25%.
    result["verified"] = False
    if (os.environ.get("BENCH_COMPONENTS", "1") == "1" and audit
            and remaining() > 420):
        comp = _run_child(
            "components", timeout=min(1800.0, remaining() - 90)
        )
        if comp is not None:
            result["components"] = comp["components"]
            full = comp["components"]["full_step_ms"]
            result["verified"] = bool(
                abs(full - step["step_ms"]) <= 0.25 * step["step_ms"]
            )
            _set_final(dict(result))
            # Backward split (VERDICT r3 item 4): a second child measures
            # encoder fwd+bwd and full-loss fwd, localizing the former
            # fwd_bwd - encode_fwd bucket into named stages.
            if remaining() > 420:
                bwd = _run_child(
                    "components_bwd", timeout=min(1500.0, remaining() - 90)
                )
                if bwd is not None:
                    c = result["components"]
                    b = bwd["components"]
                    c.update(b)
                    d = c.setdefault("derived", {})
                    d["encoder_bwd_ms"] = round(
                        b["enc_fwd_bwd_ms"] - c["encode_fwd_ms"], 2
                    )
                    d["joint_lattice_ctc_fwd_ms"] = round(
                        b["loss_fwd_ms"] - c["encode_fwd_ms"], 2
                    )
                    d["joint_lattice_ctc_bwd_ms"] = round(
                        c["fwd_bwd_ms"] - b["enc_fwd_bwd_ms"]
                        - d["joint_lattice_ctc_fwd_ms"], 2
                    )
                    _set_final(dict(result))
    elif not audit:
        result["audit_skipped"] = (
            f"step {utts} utts/s < {min_audit}: contended window"
        )

    # Tc=64 miscompile canary, keyed to the platform version string.
    if (os.environ.get("BENCH_CANARY", "1") == "1" and audit
            and remaining() > 300):
        can = _run_child("canary", timeout=min(1200.0, remaining() - 60))
        result["tc64_ok"] = None if can is None else can["tc64_ok"]

    # Best-measurement bookkeeping (also re-run by _finish for the
    # kill-path record; _update_best is idempotent).
    best = _update_best(result)
    # the tunneled chip is intermittently shared/throttled (observed
    # minute-to-minute step-time swings 70 -> 315 ms on identical
    # programs); surface the best clean measurement when the current
    # window is clearly degraded, so both numbers are visible
    if best is not None and utts < 0.5 * best["value"]:
        result["unit"] += (
            f" [degraded/shared chip this run; best "
            f"{'verified' if best['verified'] else 'unverified'} "
            f"measurement {best['value']} utts/s ({best['when']})]"
        )
        result["vs_baseline_best"] = round(
            best["value"] / REFERENCE_A100_UTTS_PER_SEC_ESTIMATE, 2
        )

    _set_final(result)
    _finish()
    return 0


if __name__ == "__main__":
    mode = os.environ.get("BENCH_CHILD", "")
    if mode in ("1", "step"):
        mode_step()
    elif mode == "components":
        mode_components()
    elif mode == "components_bwd":
        mode_components_bwd()
    elif mode == "canary":
        mode_canary()
    else:
        try:
            rc = main()
        except BaseException:
            # even an unexpected parent crash must leave a parseable
            # record (the insurance line is already out; _finish emits
            # the best-known one as the final line)
            _finish()
            raise
        sys.exit(rc)
