#!/usr/bin/env bash
PARTITION=$1; JOB_NAME=$2; CONFIG=$3; CKPT=$4; shift 4
srun -p "$PARTITION" --job-name="$JOB_NAME" --ntasks=1 \
  python tools/test.py "$CONFIG" "$CKPT" "$@"
