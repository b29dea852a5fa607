"""Sharded artifact storage for large corpora (SURVEY.md section 5.4).

The reference's single compressed .npz works to ~10^4 utterances; the
100k-utterance configuration (BASELINE.json configs[4]) needs artifacts that
can be written incrementally, read shard-by-shard (streaming into device
batches without materializing the corpus in host RAM), and resumed.

Format: a directory with `manifest.json` plus `shard_{i:05d}.npz` files,
each a standard spike-dataset .npz (same keys as the reference contract, so
any shard is individually loadable by the classic loader).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Iterator, List, Tuple

import numpy as np

from lsm_tpu.io.artifacts import SpikeDataset

_MANIFEST = "manifest.json"


class ShardedSpikeDatasetWriter:
    """Append batches; each flush writes one shard."""

    def __init__(self, root: Path, shard_size: int = 8192):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self.shard_size = shard_size
        self._x: List[np.ndarray] = []
        self._y: List[np.ndarray] = []
        self._buffered = 0
        self._shards: List[dict] = []

    def append(self, x_spikes: np.ndarray, y_labels: np.ndarray) -> None:
        if x_spikes.shape[0] != y_labels.shape[0]:
            raise ValueError("batch length mismatch")
        self._x.append(np.asarray(x_spikes, np.uint8))
        self._y.append(np.asarray(y_labels, np.int32))
        self._buffered += x_spikes.shape[0]
        while self._buffered >= self.shard_size:
            self._flush_shard(self.shard_size)

    def _concat(self) -> Tuple[np.ndarray, np.ndarray]:
        x = np.concatenate(self._x, axis=0) if self._x else np.zeros((0,), np.uint8)
        y = np.concatenate(self._y, axis=0) if self._y else np.zeros((0,), np.int32)
        return x, y

    def _flush_shard(self, n: int) -> None:
        x, y = self._concat()
        shard_x, rest_x = x[:n], x[n:]
        shard_y, rest_y = y[:n], y[n:]
        idx = len(self._shards)
        name = f"shard_{idx:05d}.npz"
        np.savez_compressed(self.root / name, X_spikes=shard_x, y_labels=shard_y)
        self._shards.append({"file": name, "num_samples": int(shard_x.shape[0])})
        self._x = [rest_x] if rest_x.shape[0] else []
        self._y = [rest_y] if rest_y.shape[0] else []
        self._buffered = int(rest_x.shape[0]) if rest_x.ndim else 0

    def close(self) -> dict:
        if self._buffered:
            self._flush_shard(self._buffered)
        manifest = {
            "format": "lsm_tpu.sharded_spike_dataset.v1",
            "num_samples": int(sum(s["num_samples"] for s in self._shards)),
            "shards": self._shards,
        }
        (self.root / _MANIFEST).write_text(json.dumps(manifest, indent=2))
        return manifest


class ShardedSpikeDataset:
    """Reader: iterate shards or fixed-size batches without loading all."""

    def __init__(self, root: Path):
        self.root = Path(root)
        manifest_path = self.root / _MANIFEST
        if not manifest_path.exists():
            raise FileNotFoundError(f"no manifest at {manifest_path}")
        self.manifest = json.loads(manifest_path.read_text())
        if self.manifest.get("format") != "lsm_tpu.sharded_spike_dataset.v1":
            raise ValueError("unknown sharded dataset format")

    @property
    def num_samples(self) -> int:
        return self.manifest["num_samples"]

    def iter_shards(self) -> Iterator[SpikeDataset]:
        for s in self.manifest["shards"]:
            data = np.load(self.root / s["file"])
            yield SpikeDataset(x_spikes=data["X_spikes"], y_labels=data["y_labels"])

    def iter_batches(self, batch_size: int) -> Iterator[SpikeDataset]:
        """Re-chunk shards into exact batch_size batches (last may be short)."""
        buf_x: List[np.ndarray] = []
        buf_y: List[np.ndarray] = []
        n = 0
        for shard in self.iter_shards():
            buf_x.append(shard.x_spikes)
            buf_y.append(shard.y_labels)
            n += shard.x_spikes.shape[0]
            while n >= batch_size:
                x = np.concatenate(buf_x, axis=0)
                y = np.concatenate(buf_y, axis=0)
                yield SpikeDataset(x[:batch_size], y[:batch_size])
                buf_x, buf_y = [x[batch_size:]], [y[batch_size:]]
                n -= batch_size
        if n:
            yield SpikeDataset(
                np.concatenate(buf_x, axis=0), np.concatenate(buf_y, axis=0)
            )

    def load_all(self) -> SpikeDataset:
        xs, ys = [], []
        for shard in self.iter_shards():
            xs.append(shard.x_spikes)
            ys.append(shard.y_labels)
        return SpikeDataset(np.concatenate(xs), np.concatenate(ys))
