"""Stage artifacts — the byte-compatible .npz contracts between stages.

These schemas are the compatibility surface with the reference
(SURVEY.md section 2.2) and MUST be preserved:

- speech_spike_dataset_pure_redundancy.npz  (stage 1 -> stage 2)
    X_spikes: uint8 (N, n_filters * R, TIME_BINS * 4)
    y_labels: int32 (N,)
  (create_dataset.py:168-176; SPIKE_TRAIN_DATASET.md:61-66)

- lsm_features_larger.npz  (stage 2 -> stage 3)
    X_train_features, y_train, X_test_features, y_test,
    feature_set (str), leak_variance_divisor
  (extract_lsm_features.py:203-212; train_classifier.py:27-31)
"""

from __future__ import annotations

from pathlib import Path
from typing import NamedTuple, Optional

import numpy as np

SPIKE_DATASET_FILENAME = "speech_spike_dataset_pure_redundancy.npz"
FEATURES_FILENAME = "lsm_features_larger.npz"


class SpikeDataset(NamedTuple):
    x_spikes: np.ndarray  # uint8 (N, C, T)
    y_labels: np.ndarray  # int32 (N,)


class FeatureArtifact(NamedTuple):
    x_train: np.ndarray
    y_train: np.ndarray
    x_test: np.ndarray
    y_test: np.ndarray
    feature_set: str
    leak_variance_divisor: Optional[float]


def save_spike_dataset(path: Path, ds: SpikeDataset) -> None:
    x = np.ascontiguousarray(ds.x_spikes, dtype=np.uint8)
    y = np.ascontiguousarray(ds.y_labels, dtype=np.int32)
    if x.ndim != 3 or y.ndim != 1 or x.shape[0] != y.shape[0]:
        raise ValueError(f"bad spike dataset shapes: {x.shape}, {y.shape}")
    np.savez_compressed(path, X_spikes=x, y_labels=y)


def load_spike_dataset(path: Path) -> SpikeDataset:
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"Dataset not found at '{path}'")
    data = np.load(path)
    return SpikeDataset(x_spikes=data["X_spikes"], y_labels=data["y_labels"])


def save_features(path: Path, art: FeatureArtifact) -> None:
    np.savez_compressed(
        path,
        X_train_features=art.x_train,
        y_train=art.y_train,
        X_test_features=art.x_test,
        y_test=art.y_test,
        feature_set=art.feature_set,
        leak_variance_divisor=(
            np.nan if art.leak_variance_divisor is None else art.leak_variance_divisor
        ),
    )


def load_features(path: Path) -> FeatureArtifact:
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(
            f"Dataset file not found: '{path}'. Run the feature extraction stage first."
        )
    # Pickle-free (pickle load of an untrusted .npz is arbitrary code
    # execution; everything WE write is plain arrays). The one legacy
    # case needing pickle is a REFERENCE-produced artifact whose
    # leak_variance_divisor=None was saved as an object scalar
    # (extract_lsm_features.py:203-212); npz members load lazily, so the
    # ValueError fires at THAT member's access — fall back for it alone,
    # with a warning (loading a reference artifact means trusting it).
    data = np.load(path, allow_pickle=False)
    try:
        lvd = data["leak_variance_divisor"]
    except ValueError:
        import logging

        logging.getLogger(__name__).warning(
            "'%s' stores leak_variance_divisor as a pickled object "
            "(reference-format None); re-reading that member with "
            "allow_pickle=True — only load artifacts you trust.", path,
        )
        with np.load(path, allow_pickle=True) as trusted:
            lvd = trusted["leak_variance_divisor"]
    lvd_val = None
    try:
        f = float(lvd)
        lvd_val = None if np.isnan(f) else f
    except (TypeError, ValueError):
        lvd_val = None
    return FeatureArtifact(
        x_train=data["X_train_features"],
        y_train=data["y_train"],
        x_test=data["X_test_features"],
        y_test=data["y_test"],
        feature_set=str(data["feature_set"]),
        leak_variance_divisor=lvd_val,
    )
