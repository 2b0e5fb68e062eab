"""Fold prediction — behavioral twin of scripts/common/predict_folds.py:
per-fold networks produce log-softmax posteriors over their held-out
fold data (fold mode) or their average over the dev set (dev mode),
saved as .npy for RPL training.

TPU re-design: the reference's per-timestep shrinking-batch loop
(predict_folds.py:49-64) becomes bucketed masked scans; the dev-mode
K-model average runs as one vmapped forward over stacked fold params.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import numpy as np

from ..infer import ff_log_posteriors, rnn_log_posteriors
from ..models import is_recurrent, stack_fold_params
from ..ops.numerics import ref_logsum
from ..train import load_pytree
from .common import (
    add_data_args, add_network_args, build_network, effective_splice,
    load_transform, num_classes_for, prepare_features,
)


def build_parser():
    parser = argparse.ArgumentParser(description="Predict fold outputs")
    add_network_args(parser)
    add_data_args(parser)
    parser.add_argument("--fold-data-dir")
    parser.add_argument("--fold-output-dir", required=True)
    parser.add_argument("--fold-model-dir", required=True)
    parser.add_argument("--fold-output-dev",
                        help="dev mode: average all folds over the dev set")
    parser.add_argument("--fold-data-pattern", default="data_{}.npy")
    parser.add_argument("--fold-offset-pattern", default="offsets_{}.npy")
    parser.add_argument("--fold-ivector-pattern", default="ivectors_{}.npy")
    parser.add_argument("--fold-output-pattern", default="data_{}.npy")
    parser.add_argument("--fold-network-pattern", default="fold_{}.npz")
    parser.add_argument("--no-progress", action="store_true")
    return parser


def _predict(net, params, x, offsets, args):
    if is_recurrent(args.network):
        return rnn_log_posteriors(net, params, x, offsets,
                                  timedelay=args.timedelay)
    return ff_log_posteriors(net, params, x)


def _load_fold_params(args, net, in_dim):
    params_list = []
    fold = 0
    template = net.init(jax.random.PRNGKey(0), in_dim)
    while True:
        f = Path(args.fold_model_dir, args.fold_network_pattern.format(fold))
        if not f.is_file():
            break
        params_list.append(load_pytree(str(f), template))
        fold += 1
    if not params_list:
        raise FileNotFoundError("No fold networks found")
    return params_list


def main(arg_list=None):
    parser = build_parser()
    args = parser.parse_args(list(map(str, arg_list)) if arg_list is not None
                             else None)
    num_classes = num_classes_for(args)
    net = build_network(args, num_classes)
    splice = effective_splice(args)
    ft = load_transform(args, splice)
    Path(args.fold_output_dir).mkdir(exist_ok=True, parents=True)

    if args.fold_output_dev is not None:
        # dev mode (predict_folds.py:190-220): average fold posteriors
        x = np.load(str(Path(args.data_dir, args.data.format("dev"))))
        offsets = (np.load(str(Path(args.offset_dir, args.offsets.format("dev"))))
                   if is_recurrent(args.network) else None)
        iv = (np.load(str(Path(args.ivector_dir, args.ivectors.format("dev"))))
              if args.ivector_dir else None)
        x = prepare_features(x, args, splice, ft, iv)
        params_list = _load_fold_params(args, net, x.shape[1])
        y_out = 0
        for k, params in enumerate(params_list):
            print(f"Predicting fold {k} data")
            y_out = y_out + _predict(net, params, x, offsets, args)
        y_out /= len(params_list)
        y_out = (y_out - ref_logsum(y_out, axis=1)).astype(np.float32)
        np.save(str(Path(args.fold_output_dir, args.fold_output_dev)), y_out)
    else:
        # fold mode (predict_folds.py:221-246): each net over its own fold
        fold = 0
        while True:
            model_file = Path(args.fold_model_dir,
                              args.fold_network_pattern.format(fold))
            if not model_file.is_file():
                break
            print(f"Predicting fold {fold} data")
            x = np.load(str(Path(args.fold_data_dir,
                                 args.fold_data_pattern.format(fold))))
            offsets = (np.load(str(Path(args.fold_data_dir,
                                        args.fold_offset_pattern.format(fold))))
                       if is_recurrent(args.network) else None)
            iv = (np.load(str(Path(args.fold_data_dir,
                                   args.fold_ivector_pattern.format(fold))))
                  if args.ivector_dir else None)
            x = prepare_features(x, args, splice, ft, iv)
            template = net.init(jax.random.PRNGKey(0), x.shape[1])
            params = load_pytree(str(model_file), template)
            y = _predict(net, params, x, offsets, args)
            np.save(str(Path(args.fold_output_dir,
                             args.fold_output_pattern.format(fold))), y)
            fold += 1
        if fold == 0:
            raise FileNotFoundError("No fold networks found")


if __name__ == "__main__":
    main()
