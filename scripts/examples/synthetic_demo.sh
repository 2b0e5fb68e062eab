#!/usr/bin/env bash
# End-to-end demo WITHOUT the TIMIT bundle: generates a synthetic
# corpus with the real regenerated 1909-pdf decoding graph and runs the
# full fold/RPL pipeline on it.
set -e
python -m nnacousticmodeling_tpu.pipeline.synth_data --root synth_demo \
    --timit-graph --num-train 64 --num-dev 16 --num-test 12
python -m nnacousticmodeling_tpu.pipeline.master \
    --data-dir synth_demo/data --offset-dir synth_demo/data \
    --target-dir synth_demo/data --utt-list-dir synth_demo/data \
    --recog-dir synth_demo/recog --output-dir synth_demo/results \
    --num-classes 1909 --num-folds 2 --gen-folds \
    --output-id demo "--network-spec=-n lstm -l 2 -u 256 --timedelay 5 -d 0.2" \
    -e 3 -o adam -b 64 --early-stopping false --eval-data test
