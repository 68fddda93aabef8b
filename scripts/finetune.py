"""Non-CL control: naive fine-tune over a short language sequence with
periodic eval (reference: finetune.py:68-248 — hindi -> tamil, evaluating
every N epochs)."""

import os

from _common import build_all, setup

from indic_cl_asr_tpu.cl.methods import NaiveMethod
from indic_cl_asr_tpu.train.driver import run_sequence

CONFIG = os.path.join(os.path.dirname(__file__), "finetune_config.yaml")


def main(argv=None):
    cfg, ns = setup(argv, config_path=CONFIG, notes_default="finetune")
    ctx = build_all(cfg, ns)
    results = run_sequence(
        cfg=ctx["driver_cfg"], model=ctx["model"],
        model_cfg=ctx["model_cfg"], step_cfg=ctx["step_cfg"],
        state=ctx["state"], method=NaiveMethod(),
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
