"""Training CLI for the segment classifier.

Counterpart of `/root/reference/gnn/trainSegmentClassifier.py:46-211`:
load NPZ graphs, partition train/valid/test rounded to batch multiples,
train with the jitted engine, report accuracy/precision/recall (+AUC),
save model params and loss histories.

Usage: python -m gnn_fpga_tpu.cli.train --input-dir ... [--output-dir ...]
"""

from __future__ import annotations

import argparse
import glob
import logging
import os

import jax
import numpy as np

from gnn_fpga_tpu.core import batching
from gnn_fpga_tpu.core.graph import load_npz
from gnn_fpga_tpu.models import mpnn
from gnn_fpga_tpu.train.trainer import Trainer, TrainConfig


def parse_args(argv=None):
    parser = argparse.ArgumentParser("train")
    add_arg = parser.add_argument
    add_arg("--input-dir", required=True)
    add_arg("--output-dir")
    add_arg("--n-samples", type=int, default=1024)
    add_arg("--valid-frac", type=float, default=0.1)
    add_arg("--test-frac", type=float, default=0.1)
    add_arg("--n-epochs", type=int, default=10)
    add_arg("--batch-size", type=int, default=32)
    add_arg("--hidden-dim", type=int, default=8)
    add_arg("--n-iters", type=int, default=3)
    add_arg("--learning-rate", type=float, default=1e-3)
    add_arg("--l1", type=float, default=0.0)
    add_arg("--pos-weight", type=float, default=1.0,
            help="BCE weight on positive edges (~n_fake/n_true escapes "
                 "base-rate collapse on high-pileup graphs)")
    add_arg("--prefetch", type=int, default=2,
            help="host batches prefetched to device ahead of the train "
                 "step (0 disables)")
    add_arg("--seed", type=int, default=0)
    add_arg("--n-buckets", type=int, default=1,
            help="size buckets for padding (one XLA compile per bucket; "
                 ">1 cuts padding waste on heavy-tailed size mixes)")
    add_arg("--resume", action="store_true",
            help="resume from checkpoint in output-dir")
    add_arg("--train-verbosity", type=int, default=0)
    add_arg("--show-config", action="store_true")
    return parser.parse_args(argv)


def load_graph_files(input_dir: str, n_samples: int):
    """NPZ graphs from a directory: ``graph*.npz`` / ``event*.npz``
    (`trainSegmentClassifier.py:128-131`)."""
    files = sorted(glob.glob(os.path.join(input_dir, "*.npz")))[:n_samples]
    if not files:
        raise FileNotFoundError(f"no NPZ graphs under {input_dir}")
    return [load_npz(f) for f in files]


def main(argv=None):
    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    if args.show_config:
        logging.info("Command line config: %s", args)

    logging.info("Loading input graphs")
    graphs = load_graph_files(args.input_dir, args.n_samples)
    n = len(graphs)

    # Partition sizes rounded to batch multiples
    # (`trainSegmentClassifier.py:133-140`).
    bs = args.batch_size
    n_test = int(n * args.test_frac) // bs * bs
    n_valid = int(n * args.valid_frac) // bs * bs
    n_train = (n - n_valid - n_test) // bs * bs
    if n_train <= 0:
        raise ValueError(f"no training data: {n} graphs, batch {bs}")
    rng = np.random.default_rng(args.seed)
    order = rng.permutation(n)
    test_graphs = [graphs[i] for i in order[:n_test]]
    valid_graphs = [graphs[i] for i in order[n_test:n_test + n_valid]]
    train_graphs = [graphs[i] for i in order[n_test + n_valid:
                                             n_test + n_valid + n_train]]
    logging.info("Train set size: %i", len(train_graphs))
    logging.info("Valid set size: %i", len(valid_graphs))
    logging.info("Test set size:  %i", len(test_graphs))

    # One shared bucket keeps a single compiled train step; --n-buckets > 1
    # trades compiles for less padding (heavy-tailed event-size mixes).
    if args.n_buckets > 1:
        bucket = batching.choose_buckets(graphs, args.n_buckets)
        logging.info("Buckets: %s (padding efficiency %.2f -> %.2f)",
                     bucket,
                     batching.padding_efficiency(
                         graphs, batching.choose_bucket(graphs), bs),
                     batching.padding_efficiency(graphs, bucket, bs))
    else:
        bucket = batching.choose_bucket(graphs)
    train_gen = batching.batch_generator(train_graphs, bs, bucket, seed=args.seed)
    if args.prefetch > 0:
        from gnn_fpga_tpu.core.prefetch import prefetch_to_device
        train_gen = prefetch_to_device(train_gen, size=args.prefetch)
    valid_gen = (batching.batch_generator(valid_graphs, bs, bucket,
                                          shuffle=False)
                 if n_valid else None)
    test_gen = (batching.batch_generator(test_graphs, bs, bucket,
                                         shuffle=False)
                if n_test else None)

    logging.info("Building the model")
    n_features = graphs[0].n_feature
    mcfg = mpnn.SegmentClassifierConfig(
        input_dim=n_features, hidden_dim=args.hidden_dim,
        n_iters=args.n_iters)
    params = mpnn.init_segment_classifier(jax.random.PRNGKey(args.seed), mcfg)
    tcfg = TrainConfig(learning_rate=args.learning_rate, l1=args.l1,
                       pos_weight=args.pos_weight)
    ckpt_dir = (os.path.join(args.output_dir, "checkpoints")
                if args.output_dir else None)
    metrics_path = (os.path.join(args.output_dir, "metrics.jsonl")
                    if args.output_dir else None)
    trainer = Trainer(
        lambda p, g, m: mpnn.segment_classifier_logits(p, g, mcfg, m),
        params, tcfg, checkpoint_dir=ckpt_dir, metrics_path=metrics_path)
    if args.resume and trainer.load_checkpoint():
        logging.info("Resumed from epoch %i", trainer.epoch)

    trainer.fit(train_gen, n_batches=len(train_graphs) // bs,
                n_epochs=args.n_epochs,
                valid_generator=valid_gen,
                n_valid_batches=(n_valid // bs),
                verbose=args.train_verbosity)

    if test_gen is not None:
        logging.info("Evaluating the test set")
        metrics = trainer.evaluate(test_gen, n_test // bs)
        for k, v in metrics.items():
            logging.info("%s: %.4f", k.capitalize(), v)

    if args.output_dir:
        os.makedirs(args.output_dir, exist_ok=True)
        logging.info("Writing outputs to %s", args.output_dir)
        from gnn_fpga_tpu.utils.serialization import save_params_npz
        save_params_npz(os.path.join(args.output_dir, "model.npz"),
                        trainer.params)
        np.savez(os.path.join(args.output_dir, "losses.npz"),
                 train_losses=np.asarray(trainer.train_losses),
                 valid_losses=np.asarray(trainer.valid_losses))
    logging.info("All done!")
    return trainer


if __name__ == "__main__":
    main()
