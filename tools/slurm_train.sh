#!/usr/bin/env bash
# Counterpart of the reference's tools/slurm_train.sh (srun + one process per
# GPU). Under JAX a SINGLE process per HOST drives all local TPU chips
# through pjit, so the slurm job asks for one task per node; multi-host
# meshes come up automatically when jax sees the slurm environment
# (jax.distributed.initialize reads SLURM_* vars).
#
# Usage: GPUS_PER_NODE=4 tools/slurm_train.sh <partition> <job> <config> <workdir> [extra train.py args]
set -x

PARTITION=$1
JOB_NAME=$2
CONFIG=$3
WORK_DIR=$4
NODES=${NODES:-1}
CHIPS_PER_NODE=${GPUS_PER_NODE:-${CHIPS_PER_NODE:-8}}
CPUS_PER_TASK=${CPUS_PER_TASK:-5}
SRUN_ARGS=${SRUN_ARGS:-""}
PY_ARGS=${@:5}

PYTHONPATH="$(dirname $0)/..":$PYTHONPATH \
srun -p ${PARTITION} \
    --job-name=${JOB_NAME} \
    --nodes=${NODES} \
    --ntasks=${NODES} \
    --ntasks-per-node=1 \
    --cpus-per-task=${CPUS_PER_TASK} \
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    python -u "$(dirname "$0")/train.py" ${CONFIG} --work-dir=${WORK_DIR} \
        --expect-devices $((NODES * CHIPS_PER_NODE)) ${PY_ARGS}
