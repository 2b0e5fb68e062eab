# Shared invocation for the TIMIT dataset layout the reference uses
# (README.md:19-44): features under data/<kind>, targets under
# data/targets, Kaldi transform per feature dir, recognizer artifacts
# under recog/. Run from the repository root after placing the dataset.
MASTER="python -m nnacousticmodeling_tpu.pipeline.master"
TIMIT_ARGS=(--data-dir data/fmllr --offset-dir data --target-dir data/targets
            --utt-list-dir data --recog-dir recog --ft final.feature_transform
            --tri)
