#!/usr/bin/env python
"""Stage 2 CLI: spike dataset -> standardized LSM features.

Drop-in equivalent of the reference's extract_lsm_features.py (same flags
--feature-set / --multiplier / --leak-variance-divisor, same input/output
artifacts), backed by the batched lax.scan reservoir instead of a per-sample
simulator loop. Extensions: --num-neurons, --batch-size, --input/--output.
"""

import argparse
import time
from pathlib import Path

from lsm_tpu.cli.common import (
    add_extension_flags,
    add_extract_flags,
    build_config,
    mesh_from_args,
    metrics_from_args,
    setup_logging,
)
from lsm_tpu.io import artifacts
from lsm_tpu.pipeline import extract_lsm_features, load_spike_dataset_any


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Extract features from a spike train dataset using an LSM."
    )
    add_extract_flags(parser)
    add_extension_flags(parser)
    parser.add_argument("--input", type=str,
                        default=artifacts.SPIKE_DATASET_FILENAME)
    parser.add_argument("--output", type=str, default=artifacts.FEATURES_FILENAME)
    args = parser.parse_args()
    setup_logging()
    cfg = build_config(args)

    try:
        ds = load_spike_dataset_any(Path(args.input))
    except FileNotFoundError as e:
        print(f"Error: {e}")
        return
    print(f"Loaded {len(ds.x_spikes)} samples from '{args.input}'")

    metrics = metrics_from_args(args)
    t0 = time.perf_counter()
    result = extract_lsm_features(cfg, ds, output_path=Path(args.output),
                                  mesh=mesh_from_args(args))
    print(f"Extraction complete. Features saved to '{args.output}'")
    if metrics:
        dt = time.perf_counter() - t0
        n = len(ds.x_spikes)
        metrics.emit("stage2_wall_s", round(dt, 3), stage="extract_features",
                     utterances=n, utt_per_sec=round(n / max(dt, 1e-9), 1))
        metrics.emit("w_critico", result.w_critico, stage="extract_features")
        metrics.emit("mean_weight", result.mean_weight,
                     stage="extract_features", multiplier=cfg.multiplier)
        if result.diagnostics is not None:
            metrics.emit("regime", result.diagnostics.regime,
                         stage="extract_features",
                         avg_participation=round(
                             result.diagnostics.avg_participation, 2))
        metrics.close()


if __name__ == "__main__":
    main()
