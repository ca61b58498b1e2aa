#!/usr/bin/env bash
# Counterpart of the reference's tools/dist_train.sh (torch.distributed.launch
# + one process per GPU). Under JAX/pjit a SINGLE process drives every local
# TPU chip through the compiled mesh program, so "distributed launch" is just
# running train.py — the GPUS argument is accepted for CLI compatibility and
# validated against the visible device count.
CONFIG=$1
CHIPS=$2
shift 2
PYTHONPATH="$(dirname $0)/..":$PYTHONPATH \
python3 "$(dirname "$0")/train.py" "$CONFIG" --expect-devices "${CHIPS:-0}" "$@"
