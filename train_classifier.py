#!/usr/bin/env python
"""Stage 3 CLI: features -> trained readout + evaluation report.

Drop-in equivalent of the reference's train_classifier.py (no required
flags, same input artifact, same printed accuracy + classification report),
backed by an on-device LBFGS multinomial logistic fit.
"""

import argparse
import sys
import time
from pathlib import Path

from lsm_tpu.cli.common import (
    build_config,
    mesh_from_args,
    metrics_from_args,
    resolve_commands,
    setup_logging,
)
from lsm_tpu.io import artifacts
from lsm_tpu.pipeline import train_and_evaluate


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Train and evaluate the readout classifier."
    )
    parser.add_argument("--input", type=str, default=artifacts.FEATURES_FILENAME)
    parser.add_argument("--vocab", type=str, default="v12", choices=["v12", "v35"])
    parser.add_argument("--commands", type=str, default=None,
                        help="Comma-separated keyword subset used as class "
                             "names in the report; overrides --vocab.")
    parser.add_argument("--metrics-out", type=str, default=None,
                        help="Append structured JSONL metric records to this "
                             "file.")
    parser.add_argument("--single-device", action="store_true",
                        help="Disable the automatic data-parallel mesh.")
    args = parser.parse_args()
    setup_logging()

    try:
        art = artifacts.load_features(Path(args.input))
    except FileNotFoundError:
        print("Error: Dataset file not found. "
              "Please run 'extract_lsm_features.py' first.")
        return

    print(f"Loaded {len(art.x_train)} training and {len(art.x_test)} test samples.")
    print("Training the Logistic Regression classifier...")
    cfg = build_config(args)
    names = resolve_commands(args)
    n_classes = int(max(art.y_train.max(), art.y_test.max())) + 1
    if n_classes > len(names):
        # The reference artifact schema carries no class names, so the CLI
        # vocabulary must match the one the features were built with: a
        # smaller vocab would silently train one-hot targets that zero
        # every out-of-range label (23 dead classes on a v35 artifact
        # under the v12 default) and only fail AFTER the LBFGS fit.
        print(
            f"Error: the feature artifact has {n_classes} classes but the "
            f"CLI vocabulary has {len(names)} names — re-run with the "
            "--vocab/--commands the features were built with.",
            file=sys.stderr,
        )
        sys.exit(1)
    metrics = metrics_from_args(args)
    t0 = time.perf_counter()
    result = train_and_evaluate(cfg, art, class_names=names[:n_classes],
                                mesh=mesh_from_args(args))
    print("Training complete.")
    print("Evaluating performance on the test set...")
    print("\n--- Final Results ---")
    print(f"Test Accuracy: {result.accuracy * 100:.2f}%\n")
    print("Classification Report:")
    print(result.report.render())
    if metrics:
        metrics.emit("stage3_wall_s", round(time.perf_counter() - t0, 3),
                     stage="train_classifier", lbfgs_iters=result.n_iters)
        metrics.emit("test_accuracy", result.accuracy,
                     stage="train_classifier", feature_set=cfg.feature_set)
        metrics.close()


if __name__ == "__main__":
    main()
