#!/usr/bin/env bash
CONFIG=$1; CKPT=$2; N=$3; shift 3
for ((i=N-1;i>=0;i--)); do
  python tools/hnl_test.py "$CONFIG" "$CKPT" --world-size "$N" --rank "$i" "$@" &
done
wait
