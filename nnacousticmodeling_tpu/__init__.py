"""TPU-native neural acoustic modeling framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
OrcusCZ/NNAcousticModeling (Chainer + CUDA + C++ PhoneRecog): hybrid
HMM-DNN acoustic model training on TIMIT-style precomputed features,
k-fold ensembles with RPL calibration, and an in-graph batched triphone
Viterbi decoder producing phone error rates.

Subpackages
-----------
io        artifact I/O: .npy corpora, .lab binary matrices, MLF, Kaldi files
ops       jittable feature-space ops: splice, transforms, time delay
models    acoustic model zoo (MLP/TDNN/LSTM/GRU/MGRU/...), RPL heads, ensembles
train     staged training engine with multi-stream TBPTT and early stopping
infer     batched posterior inference, fold averaging
decoder   HMM image I/O + generation, batched Viterbi, PER scoring
parallel  device-mesh and sharding helpers
pipeline  orchestration: folds, predict, evaluate, master script
"""

__version__ = "0.1.0"

# Honor JAX_PLATFORMS even when a sitecustomize imported jax before this
# process's environment was applied (this container pre-imports jax with
# the TPU-tunnel platform pinned, so plain env edits are silently lost).
import os as _os

if "JAX_PLATFORMS" in _os.environ:
    try:
        import jax as _jax

        if _jax.config.jax_platforms != _os.environ["JAX_PLATFORMS"]:
            _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # jax missing or backends already initialized
        pass
