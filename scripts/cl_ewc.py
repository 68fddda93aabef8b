"""EWC over the language sequence (reference: cl_baseline_ewc.py).

Fisher accumulation runs as a jitted grad^2 pass in the +1 importance
epoch; the quadratic penalty enters as gradients during training epochs.
"""

from _common import build_all, setup

from indic_cl_asr_tpu.cl.ewc import EWCConfig
from indic_cl_asr_tpu.cl.methods import EWCMethod
from indic_cl_asr_tpu.train.driver import run_sequence


def main(argv=None):
    cfg, ns = setup(argv, notes_default="ewc")
    ctx = build_all(cfg, ns)
    method = EWCMethod(
        cfg=EWCConfig(
            e_lambda=cfg.cl_config.e_lambda, e_gamma=cfg.cl_config.e_gamma
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
