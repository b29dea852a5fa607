#!/usr/bin/env python
"""Standalone inference CLI: classify audio or spike corpora with a saved
model.

EXTENSION beyond the reference (which can only evaluate by re-training,
train_classifier.py:36-48): `main.py --save-model m.npz` persists the
trained reservoir + scaler + readout + frontend config; this script then
scores

  - a Speech Commands-style directory of WAVs   (--data-dir),
  - a classic spike dataset .npz                (--input file.npz),
  - a sharded spike-dataset directory, streamed (--input shards_dir/),

on one device or data-parallel over the mesh, writing predictions (and
accuracy when labels are available) to stdout and --output.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

from lsm_tpu.cli.common import mesh_from_args, setup_logging
from lsm_tpu.config import PipelineConfig, ReservoirConfig
from lsm_tpu.io import artifacts, model as model_io
from lsm_tpu.io.sharded import ShardedSpikeDataset
from lsm_tpu import pipeline


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Classify utterances with a saved LSM model."
    )
    parser.add_argument("--model", type=str, default=model_io.MODEL_FILENAME)
    parser.add_argument("--data-dir", type=str, default=None,
                        help="Speech Commands-style WAV directory to classify.")
    parser.add_argument("--input", type=str, default=None,
                        help="Spike dataset: classic .npz or sharded dir.")
    parser.add_argument("--output", type=str, default="predictions.npz")
    parser.add_argument("--batch-size", type=int, default=512)
    parser.add_argument("--samples-per-class", type=int, default=0,
                        help="Cap WAVs per class dir under --data-dir "
                             "(0 = no cap, the default: inference scores "
                             "EVERY file; the training-time 1000 cap is a "
                             "dataset-build convention, not an inference "
                             "one).")
    parser.add_argument("--single-device", action="store_true")
    parser.add_argument("--audio-wire", type=str, default="int16",
                        choices=["int16", "ulaw"],
                        help="Decoder->device format for --data-dir WAVs: "
                             "int16 (bit-transparent, default) or uint8 "
                             "G.711 mu-law (quarter the f32 bytes, lossy "
                             "but measured accuracy-neutral).")
    args = parser.parse_args()
    setup_logging()

    try:
        bundle = model_io.load_model(Path(args.model))
    except FileNotFoundError as e:
        print(f"Error: {e}", file=sys.stderr)
        sys.exit(1)
    if bundle.feature_mode != "batch":
        print(
            "Error: this bundle is calibrated for continuous-mode streaming "
            "features; batch classification would mismatch its readout. "
            "Serve it with stream_kws.py --mode continuous, or use the "
            "original batch bundle.",
            file=sys.stderr,
        )
        sys.exit(1)
    mesh = mesh_from_args(args)
    cfg = PipelineConfig(
        frontend=bundle.frontend,
        reservoir=ReservoirConfig(
            num_neurons=bundle.reservoir.n_neurons,
            num_output_neurons=bundle.reservoir.n_outputs,
        ),
        feature_set=bundle.feature_set,
        commands=bundle.class_names,
        batch_size=args.batch_size,
        audio_wire=args.audio_wire,
        # Inference scores EVERY file by default: the training-time 1000
        # cap is a dataset-build convention; silently truncating a
        # production directory would drop utterances with no signal.
        max_samples_per_class=(args.samples_per_class
                               or 1_000_000_000),
    )

    if args.data_dir is not None:
        # Raw WAVs: featurize first, then classify in memory.
        ds = pipeline.create_spike_dataset(cfg, Path(args.data_dir), mesh=mesh)
        source = _InMemorySource(ds)
    elif args.input is not None:
        p = Path(args.input)
        if p.is_dir():
            source = ShardedSpikeDataset(p)
        else:
            source = _InMemorySource(artifacts.load_spike_dataset(p))
    else:
        print("Error: provide --data-dir or --input.", file=sys.stderr)
        sys.exit(1)

    preds, labels = pipeline.classify_spikes_streaming(
        cfg, source, bundle.reservoir, bundle.readout, bundle.scaler, mesh=mesh
    )
    np.savez_compressed(
        Path(args.output),
        predictions=preds.astype(np.int32),
        labels=labels.astype(np.int32),
        class_names=np.asarray(bundle.class_names),
    )
    print(f"Classified {len(preds)} utterances -> '{args.output}'")
    counts = np.bincount(preds, minlength=len(bundle.class_names))
    for name, c in zip(bundle.class_names, counts):
        print(f"  {name:>10s}: {c}")
    if labels.size and labels.max() >= 0:
        acc = float((preds == labels).mean())
        print(f"Accuracy vs provided labels: {acc * 100:.2f}%")


class _InMemorySource:
    """Adapter: SpikeDataset -> the iter_batches protocol."""

    def __init__(self, ds: artifacts.SpikeDataset):
        self.ds = ds

    def iter_batches(self, batch_size: int):
        x, y = self.ds.x_spikes, self.ds.y_labels
        for start in range(0, x.shape[0], batch_size):
            yield artifacts.SpikeDataset(
                x[start : start + batch_size], y[start : start + batch_size]
            )


if __name__ == "__main__":
    main()
