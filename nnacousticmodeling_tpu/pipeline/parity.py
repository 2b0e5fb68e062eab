"""Posterior-parity gate.

Converts a reference-trained Chainer ``.npz`` checkpoint into this
framework's parameters and checks framewise log-posterior agreement
(and optionally decoded-MLF agreement) between the converted model and
reference-computed outputs — the BASELINE.json accuracy gate
("framewise posterior allclose vs Chainer reference").

Usage once reference checkpoints/data are available::

    python -m nnacousticmodeling_tpu.pipeline.parity \
        --checkpoint results/.../model -n lstm -l 4 -u 1024 \
        --data-dir data/fmllr --ft final.feature_transform --tri \
        --reference-posteriors ref_posteriors.npy

Without ``--reference-posteriors`` it just converts, runs, and writes
our posteriors for external comparison.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from ..infer import ff_log_posteriors, rnn_log_posteriors
from ..models import is_recurrent
from ..models.convert import convert_checkpoint
from .common import (
    add_data_args, add_network_args, build_network, effective_splice,
    load_transform, num_classes_for, prepare_features,
)


def main(arg_list=None):
    parser = argparse.ArgumentParser(description="Chainer parity gate")
    add_network_args(parser)
    add_data_args(parser)
    parser.add_argument("--checkpoint", required=True,
                        help="reference Chainer .npz model")
    parser.add_argument("--split", default="test")
    parser.add_argument("--out", default="parity_posteriors.npy")
    parser.add_argument("--reference-posteriors",
                        help=".npy of reference-computed log posteriors "
                             "for the same split")
    parser.add_argument("--atol", type=float, default=1e-4)
    parser.add_argument("--chainer-prefix", default="predictor")
    args = parser.parse_args(list(map(str, arg_list)) if arg_list is not None
                             else None)

    num_classes = num_classes_for(args)
    if args.network == "tdnn":
        # the reference's scrambled channel reshape (models/convert.py)
        from ..models import TDNN
        net = TDNN(units=tuple(args.units), num_classes=num_classes,
                   ksize=tuple(args.tdnn_ksize), chainer_layout=True)
    else:
        net = build_network(args, num_classes)
    params = convert_checkpoint(args.checkpoint, args.network, args.layers,
                                args.chainer_prefix)

    x = np.load(str(Path(args.data_dir, args.data.format(args.split))))
    offsets = None
    if is_recurrent(args.network):
        offsets = np.load(str(Path(args.offset_dir,
                                   args.offsets.format(args.split))))
    iv = (np.load(str(Path(args.ivector_dir, args.ivectors.format(args.split))))
          if args.ivector_dir else None)
    splice = effective_splice(args)
    ft = load_transform(args, splice)
    x = prepare_features(x, args, splice, ft, iv)

    if is_recurrent(args.network):
        lp = rnn_log_posteriors(net, params, x, offsets,
                                timedelay=args.timedelay)
    else:
        lp = ff_log_posteriors(net, params, x)
    np.save(args.out, lp)
    print(f"wrote {lp.shape} posteriors to {args.out}")

    if args.reference_posteriors:
        ref = np.load(args.reference_posteriors)
        if ref.shape != lp.shape:
            print(f"PARITY FAIL: shape {lp.shape} vs reference {ref.shape}")
            return False
        diff = np.abs(lp - ref)
        ok = bool((diff <= args.atol).all())
        print(f"max abs diff {diff.max():.3e}  mean {diff.mean():.3e}  "
              f"atol {args.atol}: {'PARITY OK' if ok else 'PARITY FAIL'}")
        return ok
    return True


if __name__ == "__main__":
    main()
