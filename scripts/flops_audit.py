"""Audit the bench MFU denominator against XLA's own cost model.

bench.py's MFU line divides an ANALYTIC FLOP count (1.5 TFLOP/step at the
reference working point, derivation in bench.py's docstring) by the
measured step time. This script compiles the SAME programs bench.py times
(flagship config, B=16, 8 s utterances, frozen_till=12) and prints what
XLA's cost analysis counts for them, so the denominator is auditable:

    python scripts/flops_audit.py            # CPU is fine: FLOP counts
                                             # are platform-independent

Prints one JSON line: {"encode_fwd_tflops", "fwd_bwd_tflops",
"full_step_tflops", "bench_analytic_tflops"}.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# FLOP counting needs no accelerator; stay off any tunneled TPU
jax.config.update("jax_platforms", "cpu")


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench

    model, cfg, tx, state, step_cfg, batch, _ = bench._setup(32)

    if os.environ.get("FLOPS_UNROLL", "1") == "1":
        # XLA's HloCostAnalysis counts a while/scan BODY once, not x trip
        # count, so the scanned 17-layer stack would be counted as ~1
        # layer. Unroll the stack (numerically identical, layout-converted
        # params) for an honest count.
        import dataclasses

        import jax.numpy as jnp

        from indic_cl_asr_tpu.models.hybrid import init_model
        from indic_cl_asr_tpu.utils.checkpoint import _unstack_named

        cfg = dataclasses.replace(
            cfg, encoder=dataclasses.replace(cfg.encoder, scan_layers=False)
        )
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
        from indic_cl_asr_tpu.train.state import (
            create_train_state,
            make_optimizer,
        )
        from indic_cl_asr_tpu.utils.pytree import conformer_freeze_mask

        # rebuild the optimizer for the UNROLLED param layout (bench built
        # it against the scanned 'stack' tree)
        mask = conformer_freeze_mask(variables["params"], 12)
        tx = make_optimizer(lr=1e-4, trainable_mask=mask)
        state = create_train_state(variables, tx)

    from indic_cl_asr_tpu.train.step import (
        hybrid_forward_loss,
        make_train_step,
    )

    def fwd(params, batch_stats):
        loss, _ = hybrid_forward_loss(
            model, cfg, step_cfg, params, batch_stats,
            batch["audio"], batch["audio_len"], batch["tokens"],
            batch["token_len"], batch["lang_ids"], jax.random.PRNGKey(0),
            train=True,
        )
        return loss

    def fwd_bwd(params, batch_stats):
        return jax.value_and_grad(fwd)(params, batch_stats)

    step = make_train_step(model, cfg, step_cfg, tx)

    def tflops(fn, *args) -> float:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0]
        return round(float(cost.get("flops", 0.0)) / 1e12, 3)

    out = {
        "loss_fwd_tflops": tflops(
            fwd, state.params, state.batch_stats
        ),
        "fwd_bwd_tflops": tflops(
            fwd_bwd, state.params, state.batch_stats
        ),
        "full_step_tflops": tflops(
            step, state, batch, jax.random.PRNGKey(0)
        ),
        "bench_analytic_tflops": bench.ANALYTIC_STEP_TFLOPS,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
