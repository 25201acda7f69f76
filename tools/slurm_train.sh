#!/usr/bin/env bash
# SLURM launcher (counterpart of the reference's slurm_train.sh).
PARTITION=$1; JOB_NAME=$2; CONFIG=$3; NODES=${NODES:-1}; shift 3
srun -p "$PARTITION" --job-name="$JOB_NAME" --nodes="$NODES" --ntasks-per-node=1 \
  python tools/train.py "$CONFIG" "$@"
