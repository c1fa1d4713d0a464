#!/usr/bin/env bash
# Preemptible training wrapper — the `+CanCheckpoint = true` equivalent of
# the reference's HTCondor submit files (condor/condor.a100.submit_file:14,52).
#
# Runs the trainer under a supervisor that:
#   * forwards SIGTERM (the Cloud TPU / GKE preemption signal) to the
#     trainer as SIGUSR1 -> "Summoning checkpoint" immediate save
#     (upgpt_tpu/training/trainer.py, mirroring reference main.py:771-782),
#     then waits for the save to land before exiting;
#   * relaunches with --resume after any non-zero exit, backing off, up to
#     MAX_RESTARTS times (condor's resubmit-with-logdir pattern).
#
# Usage:
#   deploy/preemptible_train.sh configs/deepfashion/interp_256.yaml [extra cli args...]
set -u

CONFIG="${1:?usage: preemptible_train.sh <config.yaml> [cli args...]}"
shift
MAX_RESTARTS="${MAX_RESTARTS:-100}"
GRACE_SECONDS="${GRACE_SECONDS:-60}"

child=0
on_term() {
  if [ "$child" -ne 0 ]; then
    echo "[deploy] preemption signal -> SIGUSR1 (checkpoint) to $child" >&2
    kill -USR1 "$child" 2>/dev/null
    # give the async checkpoint time to commit, then stop the trainer
    sleep "$GRACE_SECONDS"
    kill -TERM "$child" 2>/dev/null
  fi
}
trap on_term TERM INT

attempt=0
resume_flag=""
while [ "$attempt" -le "$MAX_RESTARTS" ]; do
  echo "[deploy] attempt $attempt: python -m upgpt_tpu.cli train --base $CONFIG $resume_flag $*" >&2
  python -m upgpt_tpu.cli train --base "$CONFIG" $resume_flag "$@" &
  child=$!
  wait "$child"
  rc=$?
  child=0
  if [ "$rc" -eq 0 ]; then
    echo "[deploy] training finished cleanly" >&2
    exit 0
  fi
  echo "[deploy] trainer exited rc=$rc; restarting with --resume" >&2
  resume_flag="--resume"
  attempt=$((attempt + 1))
  sleep $((5 * attempt > 60 ? 60 : 5 * attempt))
done
echo "[deploy] giving up after $MAX_RESTARTS restarts" >&2
exit 1
