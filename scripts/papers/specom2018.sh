#!/usr/bin/env bash
# SPECOM 2018 recurrent-ensemble grid (reference: scripts/papers/specom2018/run.sh)
# 5-fold ensembles of ff/lstm/gru/zoneoutlstm, 10 seeds.
source "$(dirname "$0")/../common.sh"
OUT=results/specom2018
$MASTER "${TIMIT_ARGS[@]}" --output-dir $OUT --num-folds 5 --gen-folds \
    --no-train-master --no-train-folds --no-predict --no-train-rpl --no-eval
for i in $(seq 0 9); do
    $MASTER "${TIMIT_ARGS[@]}" --output-dir $OUT --output-id ff_$i --seed $i --num-folds 5 \
        "--network-spec=-n ff -l 8 -u 2048 -a relu --splice 5 -d 0.2" \
        -o momentumsgd -b 256 1024 2048 --lr 1e-2 4e-3 1e-4
    $MASTER "${TIMIT_ARGS[@]}" --output-dir $OUT --output-id lstm_$i --seed $i --num-folds 5 \
        "--network-spec=-n lstm -l 4 -u 1024 --timedelay 5 -d 0.2" \
        -o adam momentumsgd -b 512 128 --lr 1e-2 1e-3 1e-4 1e-5
    $MASTER "${TIMIT_ARGS[@]}" --output-dir $OUT --output-id gru_$i --seed $i --num-folds 5 \
        "--network-spec=-n gru -l 4 -u 1024 --timedelay 5 -d 0.2" \
        -o adam momentumsgd -b 512 128 --lr 1e-2 1e-3 1e-4 1e-5
    $MASTER "${TIMIT_ARGS[@]}" --output-dir $OUT --output-id zoneoutlstm_$i --seed $i --num-folds 5 \
        "--network-spec=-n zoneoutlstm -l 4 -u 1024 --timedelay 5 -d 0.2" \
        -o adam momentumsgd -b 512 128 --lr 1e-2 1e-3 1e-4 1e-5
done
