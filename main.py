#!/usr/bin/env python
"""Full-pipeline CLI — the reference's main.py surface.

Same flags (--n-filters, --filterbank, --feature-set, --multiplier), but the
stages run IN-PROCESS as library calls sharing one device context instead of
`os.system` subprocesses (main.py:19-27 in the reference): no triple JAX
startup, no redundant artifact round-trips — while the per-stage scripts
remain independently runnable and the artifacts are still written for
stage-level resume (SURVEY.md section 5.4).
"""

import argparse
from pathlib import Path

import time

from lsm_tpu.cli.common import (
    add_extension_flags,
    add_extract_flags,
    add_frontend_flags,
    build_config,
    mesh_from_args,
    metrics_from_args,
    setup_logging,
)
from lsm_tpu.io import artifacts, dataset
from lsm_tpu.pipeline import (
    create_spike_dataset,
    extract_lsm_features,
    featurize_audio_array,
    train_and_evaluate,
)


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Run the entire speech recognition pipeline."
    )
    add_frontend_flags(parser)
    add_extract_flags(parser)
    add_extension_flags(parser)
    parser.add_argument("--skip-artifacts", action="store_true",
                        help="Skip writing intermediate .npz artifacts.")
    parser.add_argument("--save-model", type=str, default=None,
                        help="Persist the trained model (reservoir + scaler "
                             "+ readout + frontend config) for classify.py.")
    args = parser.parse_args()
    setup_logging()
    cfg = build_config(args)
    mesh = mesh_from_args(args)
    metrics = metrics_from_args(args)

    print("--- Running Pipeline ---")

    print("\n--- Step 1: Creating Spike Train Dataset ---")
    t0 = time.perf_counter()
    spike_path = None if args.skip_artifacts else Path(
        artifacts.SPIKE_DATASET_FILENAME
    )
    if args.synthetic:
        n_per = min(args.samples_per_class, 200)
        if n_per < args.samples_per_class:
            print(f"note: --synthetic caps --samples-per-class at 200 "
                  f"(requested {args.samples_per_class}) — the synthetic "
                  "corpus is a smoke/bench fixture, not a dataset.")
        audio, labels = dataset.synthetic_audio_batch(
            n_per_class=n_per,
            n_classes=len(cfg.commands),
        )
        spikes = featurize_audio_array(cfg, audio, mesh=mesh)
        ds = artifacts.SpikeDataset(x_spikes=spikes, y_labels=labels)
        if spike_path is not None:
            artifacts.save_spike_dataset(spike_path, ds)
    else:
        ds = create_spike_dataset(cfg, Path(args.data_dir), spike_path,
                                  mesh=mesh)
    print(f"  Shape: {ds.x_spikes.shape}")
    if metrics:
        dt = time.perf_counter() - t0
        n = len(ds.x_spikes)
        metrics.emit("stage1_wall_s", round(dt, 3), stage="create_dataset",
                     utterances=n, utt_per_sec=round(n / max(dt, 1e-9), 1))
        metrics.emit("avg_spikes_per_sample",
                     round(float(ds.x_spikes.sum()) / max(n, 1), 2),
                     stage="create_dataset")

    print("\n--- Step 2: Extracting LSM Features ---")
    t0 = time.perf_counter()
    feat_path = None if args.skip_artifacts else Path(artifacts.FEATURES_FILENAME)
    ext = extract_lsm_features(cfg, ds, output_path=feat_path, mesh=mesh)
    if metrics:
        dt = time.perf_counter() - t0
        n = len(ds.x_spikes)
        metrics.emit("stage2_wall_s", round(dt, 3), stage="extract_features",
                     utterances=n, utt_per_sec=round(n / max(dt, 1e-9), 1))
        metrics.emit("w_critico", ext.w_critico, stage="extract_features")
        metrics.emit("mean_weight", ext.mean_weight, stage="extract_features",
                     multiplier=cfg.multiplier)
        if ext.diagnostics is not None:
            metrics.emit("regime", ext.diagnostics.regime,
                         stage="extract_features",
                         avg_participation=round(
                             ext.diagnostics.avg_participation, 2))

    print("\n--- Step 3: Training and Evaluating Classifier ---")
    t0 = time.perf_counter()
    result = train_and_evaluate(cfg, ext.artifact, mesh=mesh)
    if metrics:
        metrics.emit("stage3_wall_s", round(time.perf_counter() - t0, 3),
                     stage="train_classifier", lbfgs_iters=result.n_iters)
        metrics.emit("test_accuracy", result.accuracy,
                     stage="train_classifier", feature_set=cfg.feature_set)
    print("\n--- Final Results ---")
    print(f"Test Accuracy: {result.accuracy * 100:.2f}%\n")
    print("Classification Report:")
    print(result.report.render())

    if args.save_model:
        from lsm_tpu.io import model as model_io

        model_io.save_model(
            Path(args.save_model),
            reservoir=ext.params,
            readout=result.params,
            scaler=ext.scaler,
            frontend=cfg.frontend,
            feature_set=cfg.feature_set,
            class_names=cfg.commands,
        )
        print(f"Model saved to '{args.save_model}'")

    if metrics:
        metrics.close()
    print("\n--- Pipeline Finished ---")


if __name__ == "__main__":
    main()
