#!/usr/bin/env bash
# Sharded test: N ranks each take a whole-video shard, rank 0 merges.
CONFIG=$1; CKPT=$2; N=$3; shift 3
for ((i=N-1;i>=0;i--)); do
  python tools/test.py "$CONFIG" "$CKPT" --world-size "$N" --rank "$i" "$@" &
done
wait
