#!/usr/bin/env bash
# Example SELSA training run (counterpart of the reference's 4-GPU train.sh);
# all local TPU chips form the data mesh automatically.
python tools/train.py configs/faster_rcnn_r101_selsa_c5.py --work-dir work_dirs/selsa_c5 "$@"
