#!/usr/bin/env bash
# Launch a (preemptible) Cloud TPU VM training job — the submit-side
# counterpart of the reference's `condor_submit condor/condor.a100.submit_file`.
#
# Creates a queued resource (spot by default, like condor's preemptible
# slots), ships the repo, and starts deploy/preemptible_train.sh under
# nohup on every host so multi-host slices all join the mesh
# (jax.distributed.initialize in the CLI handles process coordination).
#
# Usage:
#   TPU_NAME=upgpt-train ZONE=us-west4-a ACCEL=v5litepod-8 \
#     deploy/launch_tpu_vm.sh configs/deepfashion/interp_256.yaml
set -eu

CONFIG="${1:?usage: launch_tpu_vm.sh <config.yaml> [cli args...]}"
shift || true
TPU_NAME="${TPU_NAME:-upgpt-train}"
ZONE="${ZONE:-us-west4-a}"
ACCEL="${ACCEL:-v5litepod-8}"
RUNTIME="${RUNTIME:-v2-alpha-tpuv5-lite}"
SPOT_FLAG="${SPOT:+--spot}"          # SPOT=1 -> preemptible capacity
REPO_DIR="$(cd "$(dirname "$0")/.." && pwd)"

if ! gcloud compute tpus tpu-vm describe "$TPU_NAME" --zone "$ZONE" >/dev/null 2>&1; then
  echo "[deploy] creating TPU VM $TPU_NAME ($ACCEL, ${SPOT_FLAG:-on-demand})" >&2
  gcloud compute tpus tpu-vm create "$TPU_NAME" \
    --zone "$ZONE" --accelerator-type "$ACCEL" \
    --version "$RUNTIME" $SPOT_FLAG
fi

echo "[deploy] syncing repo" >&2
gcloud compute tpus tpu-vm scp --recurse --worker=all --zone "$ZONE" \
  "$REPO_DIR" "$TPU_NAME":~/upgpt_tpu_repo

echo "[deploy] starting training on all hosts" >&2
gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" --worker=all \
  --command "cd ~/upgpt_tpu_repo && nohup bash deploy/preemptible_train.sh '$CONFIG' --multihost $* > train.log 2>&1 & echo started"

echo "[deploy] tail logs with:" >&2
echo "  gcloud compute tpus tpu-vm ssh $TPU_NAME --zone $ZONE --command 'tail -f ~/upgpt_tpu_repo/train.log'" >&2
