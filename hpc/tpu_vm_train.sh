#!/bin/bash
# Launch training on a Cloud TPU VM (all hosts of a pod slice).
# Usage: ./hpc/tpu_vm_train.sh <tpu-name> <zone> [train args...]
set -euo pipefail
TPU_NAME=$1; ZONE=$2; shift 2

gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" --worker=all \
  --command "cd ~/maunet-tpu && python -m maunet_tpu.cli train $*"
