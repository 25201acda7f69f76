#!/usr/bin/env bash
# Multi-host launcher (replaces torch.distributed.launch): one process per
# host; JAX forms the global mesh via jax.distributed.
CONFIG=$1; NPROC=$2; shift 2
for ((i=0;i<NPROC;i++)); do
  python tools/train.py "$CONFIG" --coordinator "${COORD:-localhost:12355}" \
      --num-processes "$NPROC" --process-id "$i" "$@" &
done
wait
