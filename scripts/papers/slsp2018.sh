#!/usr/bin/env bash
# SLSP 2018 adaptation grid (reference: scripts/papers/slsp2018/run.sh)
# 10 seeds x {ff, lstm, gru, mgrurelu, mgrurelur} x 4 feature kinds x
# 6 i-vector train/test combos, master network only.
MASTER="python -m nnacousticmodeling_tpu.pipeline.master"
OUT=results/slsp2018

run_exp() {
    local i=$1 network=$2 data=$3 ivt=$4 ive=$5
    local ivec_arg=()
    [[ -n "$ivt" ]] && ivec_arg=(--ivector-dir data/ivectors/$ivt data/ivectors/$ive)
    if [[ "$network" == "ff" ]]; then
        local spec="-n ff -l 8 -u 2048 -a relu --splice 5 --timedelay 0 -d 0.2"
        local opt=(momentumsgd) batch=(256 1024 2048) lr=(1e-2 4e-3 1e-4)
    else
        local spec="-n $network -l 4 -u 1024 -a relu --splice 0 --timedelay 5 -d 0.2"
        local opt=(adam momentumsgd) batch=(256 128) lr=(1e-2 1e-3 1e-4 1e-5)
    fi
    $MASTER --data-dir data/$data --offset-dir data --target-dir data/targets \
        --utt-list-dir data --recog-dir recog --ft final.feature_transform --tri \
        --output-dir $OUT --output-id "${network}_${data}_${ivt}_${ive}_$i" --seed $i \
        "--network-spec=$spec" -o "${opt[@]}" -b "${batch[@]}" --lr "${lr[@]}" \
        --no-train-folds --no-predict --no-train-rpl --eval-only-master "${ivec_arg[@]}"
}

for i in $(seq 0 9); do
    for network in ff lstm gru mgrurelu mgrurelur; do
        for data in fmllr mfcc mfcc_cmn_spk mfcc_cmn_utt; do
            run_exp $i $network $data "" ""
            run_exp $i $network $data online online
            run_exp $i $network $data online offline_perspk
            run_exp $i $network $data online offline_perutt
            run_exp $i $network $data offline_perspk offline_perspk
            run_exp $i $network $data offline_perutt offline_perutt
        done
    done
done
