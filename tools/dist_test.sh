#!/usr/bin/env bash
# Counterpart of the reference's tools/dist_test.sh — see dist_train.sh for
# why a single process is the whole "distributed" launch on TPU.
CONFIG=$1
CKPT=$2
CHIPS=$3
shift 3
PYTHONPATH="$(dirname $0)/..":$PYTHONPATH \
python3 "$(dirname "$0")/test.py" "$CONFIG" "$CKPT" "$@"
