"""Two-process DRIVER-LEVEL worker (VERDICT r4 item 5).

Where tests/distributed_worker.py proves ONE DP train step composes
across 2 real processes, this worker runs the FULL `run_sequence` driver
— per-task synthetic data, bucketed pipeline, jitted SPMD train steps on
a data=2 mesh spanning both processes, the eval matrix (replicated eval
batches via Transcriber.mesh), BWT, partial saves, orbax sequence
checkpoints, and a resume relaunch — i.e. the exact composition
`scripts/launch_tpu.sh` promises for multihost pods but had never
executed (reference: cl_baseline.py:33-48 NCCL PG bring-up +
sbatch.sh:50-59 torchrun rendezvous).

Launched by tests/test_att_context_and_dist.py as either
  ``python distributed_driver_worker.py single <out_dir>``
    (1 process, 2 virtual CPU devices, --mesh.data 2 — the reference run)
  ``python distributed_driver_worker.py <port> <pid> 2 <out_dir>``
    (2 processes x 1 CPU device each; multihost bring-up rides the
    INDIC_ASR_MULTIHOST env contract through scripts/_common.setup)

Prints ONE JSON line: {"val": ..., "resumed_val": ...}.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# tiny-driver flag set shared with the script e2e tests
from tests.test_scripts import DRIVER_ARGS  # noqa: E402


def main():
    if sys.argv[1] == "single":
        out_dir = sys.argv[2]
    else:
        # multihost env contract (scripts/launch_tpu.sh): _common.setup
        # reads these and calls setup_distributed before anything else
        port, pid, nprocs, out_dir = sys.argv[1:5]
        os.environ["INDIC_ASR_MULTIHOST"] = "1"
        os.environ["INDIC_ASR_COORDINATOR"] = f"127.0.0.1:{port}"
        os.environ["INDIC_ASR_NUM_PROCESSES"] = nprocs
        os.environ["INDIC_ASR_PROCESS_ID"] = pid

    import time

    def mark(phase):
        print(f"# [{time.strftime('%H:%M:%S')}] {phase}",
              file=sys.stderr, flush=True)

    import cl_baseline

    args = DRIVER_ARGS + [
        "--output_dir", out_dir, "--notes", "dist-driver",
        "--mesh.data", "2",
    ]
    mark("start main")
    res = cl_baseline.main(args)
    mark("main done")

    # resume relaunch: the sequence dir now holds both task checkpoints;
    # a re-run with --resume_dir must restore (orbax restore across the
    # same process set) and skip every completed task
    seq_dirs = []
    for root, dirs, files in os.walk(out_dir):
        if "sequence.json" in files:
            seq_dirs.append(root)
    assert len(seq_dirs) == 1, seq_dirs
    res2 = cl_baseline.main(args + [
        "--output_dir", os.path.join(out_dir, "resumed"),
        "--resume_dir", seq_dirs[0],
    ])
    mark("resume done")

    print(json.dumps({
        "val": res["val"],
        "resumed_val": res2["val"],
    }), flush=True)
    # align process exits: without this, a faster worker hits the
    # interpreter-exit jax.distributed shutdown barrier minutes before
    # the slower one and the coordination service kills the run
    from indic_cl_asr_tpu.parallel.distributed import barrier

    barrier("pre-exit")
    mark("exit")


if __name__ == "__main__":
    main()
