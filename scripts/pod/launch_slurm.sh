#!/usr/bin/env bash
# Multi-host pod launcher (SLURM): one train_cli process per host over
# a global device mesh. The reference is single-process/single-GPU
# (train.py:122-125); this is the DCN-scale path SURVEY §2.4 mandates.
#
# Usage (from the repo root, on a cluster with a shared filesystem):
#
#   sbatch scripts/pod/launch_slurm.sh \
#       --data-dir data/fbank40 --offset-dir data --target-dir data \
#       -n lstm -l 4 -u 1024 --timedelay 5 -d 0.2 --tri \
#       -e 5 20 -o adam momentumsgd -b 512 128 --lr 0 1e-3 \
#       --mesh data=8,fold=2 --out results/pod_run
#
# Everything after the script name is passed through to train_cli.
# `--distributed` is added automatically: jax.distributed.initialize()
# auto-detects the SLURM topology (coordinator = first node, process id
# = SLURM_PROCID), so the same script works on TPU pods and CPU
# clusters unmodified. Mesh axis sizes refer to GLOBAL device counts;
# put DCN-friendly axes (fold/data) outermost so tensor-parallel
# collectives stay on ICI within a host.
#
#SBATCH --job-name=nnam-train
#SBATCH --nodes=2
#SBATCH --ntasks-per-node=1
#SBATCH --cpus-per-task=8
#SBATCH --time=12:00:00
#SBATCH --output=slurm-%j.out

set -euo pipefail

: "${PYTHON:=python}"
export PYTHONUNBUFFERED=1

srun --kill-on-bad-exit=1 "$PYTHON" -m \
    nnacousticmodeling_tpu.pipeline.train_cli --distributed "$@"
