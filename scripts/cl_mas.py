"""MAS over the language sequence (reference: cl_baseline_mas.py).

Importance = |grad| of the output-energy surrogate, accumulated in the +1
epoch; quadratic penalty added to the loss during training epochs.
"""

from _common import build_all, setup

from indic_cl_asr_tpu.cl.mas import MASConfig
from indic_cl_asr_tpu.cl.methods import MASMethod
from indic_cl_asr_tpu.train.driver import run_sequence


def main(argv=None):
    cfg, ns = setup(argv, notes_default="mas")
    ctx = build_all(cfg, ns)
    method = MASMethod(
        cfg=MASConfig(
            mas_lambda=cfg.cl_config.mas_lambda, mas_ctx=cfg.cl_config.mas_ctx
        ),
        model=ctx["model"],
        model_cfg=ctx["model_cfg"],
        step_cfg=ctx["step_cfg"],
        trainable_mask=ctx["mask"],
    )
    results = run_sequence(
        cfg=ctx["driver_cfg"], model=ctx["model"],
        model_cfg=ctx["model_cfg"], step_cfg=ctx["step_cfg"],
        state=ctx["state"], method=method,
        base_step_builder=ctx["base_step_builder"],
        task_data=ctx["task_data"], tokenizer=ctx["tokenizer"],
        logger=ctx["logger"], trainable_mask=ctx["mask"],
        checkpointer=ctx["checkpointer"], languages=ctx["languages"],
        mesh=ctx["mesh"],
    )
    ctx["logger"].close()
    return results


if __name__ == "__main__":
    main()
