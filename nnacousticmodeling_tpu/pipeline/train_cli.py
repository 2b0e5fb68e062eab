"""Training CLI — behavioral twin of the reference trainer entry point
(scripts/common/train.py): trains one network (master, one fold, or the
RPL head) through staged (optimizer, batch-size, lr, early-stop) phases
and saves the final model.

Run: ``python -m nnacousticmodeling_tpu.pipeline.train_cli [args]``.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from ..models import RPL4, is_recurrent
from ..ops.timedelay import apply_time_delay
from ..train import TrainConfig, build_stages, save_pytree, train_network
from .common import (
    add_data_args, add_network_args, build_network, dump_args,
    effective_splice, load_transform, num_classes_for, prepare_features,
    str2bool,
)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="TPU acoustic model trainer")
    parser.add_argument("--epoch", "-e", type=int, nargs="+", default=[20])
    parser.add_argument("--optimizer", "-o", nargs="+", default=["momentumsgd"])
    parser.add_argument("--batch-size", "-b", type=int, nargs="+", default=[128])
    parser.add_argument("--lr", type=float, nargs="+",
                        default=[1e-2, 1e-3, 1e-4, 1e-5])
    parser.add_argument("--early-stopping", type=str2bool, nargs="+",
                        default=[True])
    parser.add_argument("--bproplen", type=int, default=20)
    parser.add_argument("--shuffle-sequences", action="store_true",
                        help="sentence-level shuffling with stream batch "
                             "layout even for feed-forward nets "
                             "(the reference's flag, train.py:49,307)")
    parser.add_argument("--dtype", choices=["float32", "bfloat16"],
                        default="float32",
                        help="compute dtype for forward/backward; master "
                             "params and optimizer state stay float32")
    parser.add_argument("--mesh", default="",
                        help="device mesh spec, e.g. 'data=8' or "
                             "'data=4,model=2': shard minibatches over the "
                             "data axis (gradient all-reduce via XLA) and "
                             "weight matrices column-parallel over the "
                             "model axis; with --train-all-folds a 'fold' "
                             "axis shards the K simultaneous fold networks")
    parser.add_argument("--distributed", action="store_true",
                        help="call jax.distributed.initialize() before "
                             "device use (auto-detects TPU pod / SLURM "
                             "topology; see scripts/pod/launch_slurm.sh)")
    parser.add_argument("--coordinator", default="",
                        help="explicit coordinator address host:port for "
                             "--distributed (implies it)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("--out", default="result")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--no-validation", dest="use_validation",
                        action="store_false")
    parser.add_argument("--no-progress", action="store_true")
    parser.add_argument("--noplot", dest="plot", action="store_false",
                        help="disable loss/accuracy plot PNGs")
    parser.add_argument("--resume", "-r", default="",
                        help="resume from a training snapshot "
                             "(<out>/snapshot.npz written every epoch)")
    # fold / RPL training modes (train.py:59-70)
    parser.add_argument("--train-fold", type=int)
    parser.add_argument("--train-all-folds", action="store_true",
                        help="train ALL K fold networks simultaneously as "
                             "one vmapped program (optionally sharded over "
                             "a 'fold' mesh axis) instead of the "
                             "reference's sequential per-fold loop")
    parser.add_argument("--train-rpl", action="store_true")
    parser.add_argument("--fold-data-dir", default="fold_data")
    parser.add_argument("--fold-output-dir", default="fold_data_out")
    parser.add_argument("--fold-model-dir", default="fold_models")
    parser.add_argument("--fold-data-pattern", default="data_{0}.npy")
    parser.add_argument("--fold-offset-pattern", default="offsets_{0}.npy")
    parser.add_argument("--fold-target-pattern", default="targets_{0}.npy")
    parser.add_argument("--fold-ivector-pattern", default="ivectors_{}.npy")
    parser.add_argument("--fold-output-pattern", default="data_{0}.npy")
    parser.add_argument("--fold-network-pattern", default="fold_{0}.npz")
    add_network_args(parser)
    add_data_args(parser)
    return parser


def _load_rpl_data(args):
    """Fold-output logits + targets for RPL training (train.py:129-157)."""
    xs, ys = [], []
    fold = 0
    while True:
        x_file = Path(args.fold_output_dir, args.fold_output_pattern.format(fold))
        y_file = Path(args.fold_data_dir, args.fold_target_pattern.format(fold))
        if not x_file.is_file() or not y_file.is_file():
            break
        print(f"Loading fold {fold} data")
        xs.append(np.load(str(x_file)))
        ys.append(np.load(str(y_file)))
        fold += 1
    if fold == 0:
        raise FileNotFoundError("No fold data found")
    return np.concatenate(xs, axis=0), np.concatenate(ys, axis=0)


def _load_all_fold_data(args):
    """Every fold's data concatenated fold-ascending, plus the
    per-utterance fold assignment — the shared corpus for fold-parallel
    training (train/fold_parallel.py builds each fold's training-set
    index universe from it, mirroring train.py:162-206)."""
    xs, ys, ivs, utt_folds = [], [], [], []
    offsets = [0]
    num = 0
    fold = 0
    while True:
        x_file = Path(args.fold_data_dir, args.fold_data_pattern.format(fold))
        if not x_file.is_file():
            break
        print(f"Loading fold {fold} data")
        x_fold = np.load(str(x_file))
        xs.append(x_fold)
        off = np.load(str(Path(args.fold_data_dir,
                               args.fold_offset_pattern.format(fold))))
        offsets.extend((off[1:] + num).tolist())
        utt_folds.extend([fold] * (len(off) - 1))
        ys.append(np.load(str(Path(args.fold_data_dir,
                                   args.fold_target_pattern.format(fold)))))
        if args.ivector_dir is not None:
            ivs.append(np.load(str(Path(args.fold_data_dir,
                                        args.fold_ivector_pattern.format(fold)))))
        num += x_fold.shape[0]
        fold += 1
    if not xs:
        raise FileNotFoundError("No fold data found")
    return (np.concatenate(xs, axis=0), np.concatenate(ys, axis=0),
            np.asarray(offsets, dtype=np.int64),
            np.concatenate(ivs, axis=0) if ivs else None,
            np.asarray(utt_folds, dtype=np.int64), fold)


def _load_fold_train_data(args, recurrent: bool):
    """Concatenation of all folds except --train-fold (train.py:162-206)."""
    xs, ys, ivs = [], [], []
    offsets = [0]
    num = 0
    fold = 0
    while True:
        if fold == args.train_fold:
            fold += 1
            continue
        x_file = Path(args.fold_data_dir, args.fold_data_pattern.format(fold))
        if not x_file.is_file():
            break
        print(f"Loading fold {fold} data")
        x_fold = np.load(str(x_file))
        xs.append(x_fold)
        if recurrent:
            off = np.load(str(Path(args.fold_data_dir,
                                   args.fold_offset_pattern.format(fold))))
            offsets.extend((off[1:] + num).tolist())
        ys.append(np.load(str(Path(args.fold_data_dir,
                                   args.fold_target_pattern.format(fold)))))
        if args.ivector_dir is not None:
            ivs.append(np.load(str(Path(args.fold_data_dir,
                                        args.fold_ivector_pattern.format(fold)))))
        num += x_fold.shape[0]
        fold += 1
    if not xs:
        raise FileNotFoundError("No fold data found")
    x = np.concatenate(xs, axis=0)
    y = np.concatenate(ys, axis=0)
    iv = np.concatenate(ivs, axis=0) if ivs else None
    off = np.asarray(offsets, dtype=np.int64) if recurrent else None
    return x, y, off, iv


def _build_mesh(spec: str):
    """``--mesh`` spec -> (Mesh | None, model_axis | None)."""
    if not spec:
        return None, None
    from ..parallel import make_mesh, parse_mesh_spec
    axes = parse_mesh_spec(spec)
    mesh = make_mesh(axes)
    model_axis = "model" if axes.get("model", 1) > 1 else None
    return mesh, model_axis


def main(arg_list=None):
    parser = build_parser()
    args = parser.parse_args(list(map(str, arg_list)) if arg_list is not None
                             else None)
    if args.distributed or args.coordinator:
        # multi-host bring-up BEFORE any device use; with no explicit
        # coordinator jax auto-detects TPU-pod / SLURM topology
        from ..parallel import initialize_distributed
        initialize_distributed(args.coordinator or None,
                               args.num_processes, args.process_id)
    import jax
    primary = jax.process_index() == 0   # only one host writes artifacts
    if primary:
        dump_args(args, args.out)
    num_classes = num_classes_for(args)
    recurrent = is_recurrent(args.network) and not args.train_rpl

    # ---- data ---------------------------------------------------------
    offsets = offsets_dev = None
    ivectors = ivectors_dev = None
    if args.train_rpl:
        x, y = _load_rpl_data(args)
        x_dev = y_dev = None
        if args.use_validation:
            dev_file = Path(args.data_dir, args.data.format("dev"))
            if dev_file.is_file():
                x_dev = np.load(str(dev_file))
                y_dev = np.load(str(Path(args.target_dir,
                                         args.targets.format("dev"))))
    else:
        utt_folds = num_folds = None
        if args.train_all_folds:
            (x, y, offsets, ivectors, utt_folds,
             num_folds) = _load_all_fold_data(args)
        elif args.train_fold is not None:
            x, y, offsets, ivectors = _load_fold_train_data(args, recurrent)
        else:
            x = np.load(str(Path(args.data_dir, args.data.format("train"))))
            y = np.load(str(Path(args.target_dir, args.targets.format("train"))))
            if recurrent or args.shuffle_sequences:
                offsets = np.load(str(Path(args.offset_dir,
                                           args.offsets.format("train"))))
            if args.ivector_dir is not None:
                ivectors = np.load(str(Path(args.ivector_dir,
                                            args.ivectors.format("train"))))
        x_dev = y_dev = None
        if args.use_validation:
            x_dev = np.load(str(Path(args.data_dir, args.data.format("dev"))))
            y_dev = np.load(str(Path(args.target_dir,
                                     args.targets.format("dev"))))
            if recurrent:
                offsets_dev = np.load(str(Path(args.offset_dir,
                                               args.offsets.format("dev"))))
            if args.ivector_dir is not None:
                ivectors_dev = np.load(str(Path(args.ivector_dir,
                                                args.ivectors.format("dev"))))

        # splice -> transform -> i-vectors -> time delay (train.py:224-264)
        splice = effective_splice(args)
        ft = load_transform(args, splice)
        x = prepare_features(x, args, splice, ft, ivectors)
        if x_dev is not None:
            x_dev = prepare_features(x_dev, args, splice, ft, ivectors_dev)
        if recurrent and args.timedelay != 0:
            x, y, offsets = apply_time_delay(x, y, offsets, args.timedelay)
            if x_dev is not None:
                x_dev, y_dev, offsets_dev = apply_time_delay(
                    x_dev, y_dev, offsets_dev, args.timedelay)

    # ---- model + stages ----------------------------------------------
    stages = build_stages(args.epoch, args.optimizer, args.batch_size,
                          args.lr, args.early_stopping)
    mesh, model_axis = _build_mesh(args.mesh)
    # the engine consumes data/model axes; a fold-only mesh is for the
    # --train-all-folds path and must not reach the engine
    engine_mesh = (mesh if mesh is not None
                   and "data" in mesh.axis_names else None)
    config = TrainConfig(stages=stages, bprop_len=args.bproplen,
                         seed=args.seed,
                         use_validation=args.use_validation and x_dev is not None,
                         log=print,
                         snapshot_path=str(Path(args.out) / "snapshot.npz"),
                         resume_snapshot=bool(args.resume),
                         compute_dtype=args.dtype,
                         mesh=engine_mesh,
                         model_axis=model_axis if engine_mesh is not None
                         else None,
                         shuffle_sequences=args.shuffle_sequences)

    if args.train_all_folds:
        # all K fold networks as one vmapped (optionally fold-sharded)
        # program — replaces master_script.py:134-170's sequential loop
        from ..train.fold_parallel import train_folds_parallel
        net = build_network(args, num_classes)
        fold_mesh = (mesh if mesh is not None
                     and "fold" in mesh.axis_names else None)
        fold_params = train_folds_parallel(
            net, x, y, offsets, utt_folds, num_folds, config,
            x_dev=x_dev, y_dev=y_dev, mesh=fold_mesh)
        if primary:
            Path(args.fold_model_dir).mkdir(exist_ok=True, parents=True)
            for k, p in enumerate(fold_params):
                save_pytree(str(Path(args.fold_model_dir,
                                     args.fold_network_pattern.format(k))), p)
        return fold_params

    if args.train_rpl:
        rpl = RPL4(num_classes)
        import jax
        rpl_params = rpl.init(jax.random.PRNGKey(args.seed))

        class _RplNet:
            is_recurrent = False

            def init(self, key, in_dim):
                return rpl_params

            def apply(self, p, xb, rng=None, train=False):
                return rpl.apply(p, xb)

        net = _RplNet()
    else:
        net = build_network(args, num_classes)

    if args.resume and args.resume != "auto":
        config.snapshot_path = args.resume

    result = train_network(net, x, y, config, offsets=offsets,
                           x_dev=x_dev, y_dev=y_dev)

    # ---- save (train.py:393-395) --------------------------------------
    if not primary:
        return result
    Path(args.out).mkdir(exist_ok=True, parents=True)
    save_pytree(str(Path(args.out) / "model"), result.params)
    # np.savez appends .npz; provide the reference-style bare name too
    model_npz = Path(args.out) / "model.npz"
    if args.train_fold is not None:
        fold_file = Path(args.fold_model_dir,
                         args.fold_network_pattern.format(args.train_fold))
        fold_file.parent.mkdir(exist_ok=True, parents=True)
        import shutil
        shutil.copy(model_npz, fold_file)
    import json
    with open(Path(args.out) / "log.json", "w") as f:
        json.dump(result.history, f, indent=1)
    if args.plot:
        _write_plots(result.history, args.out)
    return result


def _write_plots(history, out_dir):
    """loss.png / accuracy.png training curves (the reference's
    PlotReport extension, train.py:348-355)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    if not history:
        return
    epochs = range(1, len(history) + 1)
    for metric, fname in [("loss", "loss.png"), ("accuracy", "accuracy.png")]:
        fig, ax = plt.subplots(figsize=(6, 4))
        ax.plot(epochs, [h[f"main/{metric}"] for h in history],
                label=f"main/{metric}")
        if f"validation/main/{metric}" in history[0]:
            ax.plot(epochs, [h.get(f"validation/main/{metric}") for h in history],
                    label=f"validation/main/{metric}")
        ax.set_xlabel("epoch")
        ax.set_ylabel(metric)
        ax.legend()
        fig.tight_layout()
        fig.savefig(str(Path(out_dir) / fname), dpi=80)
        plt.close(fig)
    return


if __name__ == "__main__":
    main()
