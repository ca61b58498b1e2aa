#!/usr/bin/env bash
# Counterpart of the reference's tools/dist_train.sh (torch.distributed.launch
# + one process per GPU, multi-node via NNODES/NODE_RANK/MASTER_ADDR env —
# reference tools/dist_train.sh:8).
#
# Under JAX/pjit a SINGLE process drives every local TPU chip through the
# compiled mesh program, so single-host "distributed launch" is just running
# train.py — the GPUS argument is accepted for CLI compatibility and
# validated against the visible device count.
#
# Multi-node: launch this script once per host with the same env the torch
# launcher uses; it wires jax.distributed.initialize via train.py flags:
#   NNODES=4 NODE_RANK=$i MASTER_ADDR=host0 MASTER_PORT=29500 \
#     tools/dist_train.sh cfg.py 8
CONFIG=$1
CHIPS=$2
shift 2

NNODES=${NNODES:-1}
NODE_RANK=${NODE_RANK:-0}
MASTER_ADDR=${MASTER_ADDR:-127.0.0.1}
MASTER_PORT=${MASTER_PORT:-29500}
DIST_ARGS=()
if [ "$NNODES" -gt 1 ]; then
  DIST_ARGS=(--coordinator "$MASTER_ADDR:$MASTER_PORT"
             --num-processes "$NNODES" --process-id "$NODE_RANK")
fi

PYTHONPATH="$(dirname $0)/..":$PYTHONPATH \
python3 "$(dirname "$0")/train.py" "$CONFIG" --expect-devices "${CHIPS:-0}" \
  "${DIST_ARGS[@]}" "$@"
