#!/usr/bin/env bash
# Multi-host launch example — the role of the reference's SLURM + mpirun
# Horovod launcher (dlmodels/color-information/run.sh), TPU-natively.
#
# There is no external communication library to wire up (no NCCL homes, no
# OpenMPI process maps): every host runs the SAME command; jax.distributed
# + the TPU runtime form the mesh. On Cloud TPU VMs the coordinator and
# process ids are discovered automatically and --coordinator can be omitted.
#
# Usage (generic N-host setup, run per host with its rank):
#   COORDINATOR=host0:8476 NUM_HOSTS=2 HOST_ID=0 ./scripts/launch_multihost.sh
#   COORDINATOR=host0:8476 NUM_HOSTS=2 HOST_ID=1 ./scripts/launch_multihost.sh
#
# Usage (Cloud TPU pod slice; runs the same command on all workers):
#   gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all \
#     --command="cd $REPO && python scripts/train_flow.py --steps 10000 ..."
set -euo pipefail

: "${COORDINATOR:=}"
: "${NUM_HOSTS:=1}"
: "${HOST_ID:=0}"
: "${STEPS:=1000}"

ARGS=(--steps "$STEPS")
if [[ -n "$COORDINATOR" && "$NUM_HOSTS" -gt 1 ]]; then
  ARGS+=(--coordinator "$COORDINATOR" --num-processes "$NUM_HOSTS"
         --process-id "$HOST_ID")
fi

exec python "$(dirname "$0")/train_flow.py" "${ARGS[@]}" "$@"
