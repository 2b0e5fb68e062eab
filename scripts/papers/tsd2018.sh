#!/usr/bin/env bash
# TSD 2018 architecture survey grid (reference: scripts/papers/tsd2018/run.sh)
# 10 seeds x {FF layers 6-9 x units 512-2048, TDNN ksize grids, LSTM
# layers 2-6 x units 256-1024}.
source "$(dirname "$0")/../common.sh"
OUT=results/tsd2018
for i in $(seq 0 9); do
    for l in 6 7 8 9; do for u in 512 1024 2048; do
        $MASTER "${TIMIT_ARGS[@]}" --output-dir $OUT --output-id ff_${l}_${u}_$i --seed $i \
            "--network-spec=-n ff -l $l -u $u -a relu --splice 5 -d 0.2" \
            -o momentumsgd -b 256 512 1024 2048 --lr 1e-2 4e-3 1e-3 1e-4
    done; done
    for k in "5 5 5 5" "5 5 9 9" "9 9 9 9"; do for u in 256 512 1024; do
        kid=$(echo $k | tr ' ' '-')
        $MASTER "${TIMIT_ARGS[@]}" --output-dir $OUT --output-id tdnn_${kid}_${u}_$i --seed $i \
            "--network-spec=-n tdnn --tdnn-ksize $k -u $u $u $u $u -a relu -d 0.2" \
            -o adam momentumsgd -b 256 512 1024 2048 --lr 1e-2 1e-3 1e-4 1e-5
    done; done
    for l in 2 3 4 5 6; do for u in 256 512 1024; do
        $MASTER "${TIMIT_ARGS[@]}" --output-dir $OUT --output-id lstm_${l}_${u}_$i --seed $i \
            "--network-spec=-n lstm -l $l -u $u --timedelay 5 -d 0.2" \
            -o adam momentumsgd -b 512 128 --lr 1e-2 1e-3 1e-4 1e-5
    done; done
done
