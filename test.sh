#!/usr/bin/env bash
# Example SELSA inference + eval run (counterpart of the reference's test.sh).
python tools/test.py configs/faster_rcnn_r101_selsa_c5.py "$1" --out results.pkl --eval
