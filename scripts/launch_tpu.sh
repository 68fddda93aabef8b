#!/bin/bash
# TPU-pod launcher for the CL drivers — the TPU-native analogue of the
# reference's Slurm/torchrun launcher (reference: sbatch.sh — node
# discovery, head-node rendezvous, torchrun c10d; see SURVEY.md §2.3).
#
# On Cloud TPU there is no rendezvous endpoint to wire up: every TPU-VM
# worker runs the SAME command, and `jax.distributed.initialize()` (called
# by the driver when INDIC_ASR_MULTIHOST=1) discovers the coordinator from
# the TPU metadata. GSPMD then treats all chips across hosts as one mesh —
# no NCCL env vars, no rdzv backend, no elastic agent.
#
# Single host (1 TPU VM, 1-8 chips):
#   scripts/launch_tpu.sh cl_baseline --notes "CL-baseline-naive"
#
# Pod slice (all workers at once, from your workstation):
#   gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" --worker=all \
#     --command "cd ~/indic-cl-asr-tpu && scripts/launch_tpu.sh cl_baseline \
#                --notes CL-baseline-naive"
#
# Env knobs (all optional):
#   INDIC_ASR_MULTIHOST=1   force jax.distributed.initialize() (pod slices;
#                           auto-detected TPU metadata supplies the rest)
#   WANDB_API_KEY / WANDB_MODE  forwarded as-is (Logger falls back to
#                           text/JSONL when wandb is unreachable)
set -euo pipefail

DRIVER="${1:?usage: launch_tpu.sh <cl_baseline|cl_ewc|cl_mas|cl_lwf|finetune> [driver args...]}"
shift

SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"

# Diagnostics (the reference prints torch/cuda + nvidia-smi; sbatch.sh:36-38)
python - <<'EOF'
import os

import jax

if os.environ.get("JAX_PLATFORMS"):  # some PJRT plugins override the env var
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
print("jax", jax.__version__, "backend", jax.default_backend())
print("process", jax.process_index(), "of", jax.process_count(),
      "local devices", jax.local_device_count(),
      "global devices", jax.device_count())
EOF

exec python "${SCRIPT_DIR}/${DRIVER}.py" "$@"
