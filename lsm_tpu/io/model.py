"""Trained-model artifact: everything needed for standalone inference.

The reference has no model persistence at all — train_classifier.py
re-trains from the features artifact on every invocation and nothing can
classify new audio without re-running the whole pipeline. A production
framework needs a deployable bundle: this artifact packs the reservoir
(weights, not just the seed — robust to RNG-implementation drift), the
train-split scaler moments, the readout, the frontend configuration and
the class names into one .npz, so `classify.py --model m.npz` can score
raw WAVs or spike datasets directly.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np

from lsm_tpu.config import FrontendConfig
from lsm_tpu.models.reservoir import ReservoirParams
from lsm_tpu.readout.logistic import LogisticParams
from lsm_tpu.readout.scaler import ScalerState

MODEL_FILENAME = "lsm_model.npz"
# Dense bundles keep the original tag (older loaders stay compatible);
# sparse bundles carry their own tag so a pre-sparse build of load_model
# fails with an explicit "unknown model format" instead of a raw
# KeyError('w_rec') deep in deserialization.
_FORMAT_DENSE = "lsm_tpu.model.v1"
_FORMAT_SPARSE = "lsm_tpu.model.v2-sparse"
_KNOWN_FORMATS = (_FORMAT_DENSE, _FORMAT_SPARSE)


class ModelBundle(NamedTuple):
    reservoir: ReservoirParams
    readout: LogisticParams
    scaler: ScalerState
    frontend: FrontendConfig
    feature_set: str
    class_names: tuple
    # Which feature DISTRIBUTION the readout+scaler were calibrated on:
    # "batch" (the pipeline's exact windowed features — also what the
    # exact streaming mode serves) or "continuous" (ContinuousKWS
    # carried-state features, fit via continuous.fit_continuous_readout).
    # Serving continuous mode with a batch-calibrated readout loses ~0.3
    # accuracy (docs/VALIDATION.md) — stream_kws.py enforces the match.
    feature_mode: str = "batch"
    # For feature_mode == "continuous": the knobs that shape the feature
    # distribution the readout was calibrated on (chunk_len,
    # norm_decay_db_per_bin). Serving MUST reuse them — a different
    # decay/chunk at serve time silently re-introduces the calibration
    # mismatch — so stream_kws.py reads them from here. None for batch
    # bundles (not {}: a shared mutable NamedTuple default would alias
    # across instances).
    continuous_params: "dict | None" = None


def save_model(
    path: Path,
    reservoir: ReservoirParams,
    readout: LogisticParams,
    scaler: ScalerState,
    frontend: FrontendConfig,
    feature_set: str,
    class_names: Sequence[str],
    feature_mode: str = "batch",
    continuous_params: dict | None = None,
) -> None:
    from lsm_tpu.models.sparse import SparseReservoirParams

    is_sparse = isinstance(reservoir, SparseReservoirParams)
    static = {
        "n_neurons": reservoir.n_neurons,
        "n_outputs": reservoir.n_outputs,
        "n_channels": reservoir.n_channels,
        "threshold": reservoir.threshold,
        "refractory": reservoir.refractory,
        "burst_isi_max": reservoir.burst_isi_max,
        "n_rate_windows": reservoir.n_rate_windows,
        "kind": "sparse" if is_sparse else "dense",
    }
    if is_sparse:
        static["n_band"] = reservoir.n_band
        weights = dict(
            w_blocks=np.asarray(reservoir.w_blocks),
            src_idx=np.asarray(reservoir.src_idx),
        )
    else:
        weights = dict(w_rec=np.asarray(reservoir.w_rec))
    if feature_mode not in ("batch", "continuous"):
        raise ValueError(f"unknown feature_mode: {feature_mode!r}")
    if feature_mode == "continuous" and not continuous_params:
        raise ValueError(
            "continuous bundles must record the calibration's "
            "distribution-shaping knobs (chunk_len, norm_decay_db_per_bin)"
        )
    meta = {
        "format": _FORMAT_SPARSE if is_sparse else _FORMAT_DENSE,
        "feature_mode": feature_mode,
        "continuous_params": dict(continuous_params or {}),
        "feature_set": feature_set,
        "class_names": list(class_names),
        "frontend": dataclasses.asdict(frontend),
        "reservoir_static": static,
    }
    np.savez_compressed(
        path,
        meta=json.dumps(meta),
        w_in=np.asarray(reservoir.w_in),
        leak=np.asarray(reservoir.leak),
        readout_w=np.asarray(readout.w),
        readout_b=np.asarray(readout.b),
        scaler_mean=np.asarray(scaler.mean),
        scaler_scale=np.asarray(scaler.scale),
        **weights,
    )


def load_model(path: Path) -> ModelBundle:
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"Model file not found: '{path}'")
    # allow_pickle stays OFF: every member of OUR bundle format is a
    # plain array or JSON string, and pickle load of an untrusted .npz
    # is arbitrary code execution.
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["meta"]))
    if meta.get("format") not in _KNOWN_FORMATS:
        raise ValueError(
            f"unknown model format {meta.get('format')!r} in '{path}' "
            f"(this build reads: {', '.join(_KNOWN_FORMATS)})"
        )
    rs = meta["reservoir_static"]
    fdict = meta["frontend"]
    # Tuples were serialized as lists; restore for the frozen dataclass.
    if isinstance(fdict.get("spike_thresholds"), list):
        fdict["spike_thresholds"] = tuple(fdict["spike_thresholds"])
    common = dict(
        w_in=jnp.asarray(data["w_in"]),
        leak=jnp.asarray(data["leak"]),
        n_neurons=int(rs["n_neurons"]),
        n_outputs=int(rs["n_outputs"]),
        n_channels=int(rs["n_channels"]),
        threshold=float(rs["threshold"]),
        refractory=int(rs["refractory"]),
        burst_isi_max=int(rs["burst_isi_max"]),
        n_rate_windows=int(rs["n_rate_windows"]),
    )
    if rs.get("kind", "dense") == "sparse":
        from lsm_tpu.models.sparse import SparseReservoirParams

        reservoir = SparseReservoirParams(
            w_blocks=jnp.asarray(data["w_blocks"]),
            src_idx=jnp.asarray(data["src_idx"]),
            n_band=int(rs["n_band"]),
            **common,
        )
    else:
        reservoir = ReservoirParams(w_rec=jnp.asarray(data["w_rec"]), **common)
    return ModelBundle(
        reservoir=reservoir,
        readout=LogisticParams(
            w=jnp.asarray(data["readout_w"]), b=jnp.asarray(data["readout_b"])
        ),
        scaler=ScalerState(
            mean=jnp.asarray(data["scaler_mean"]),
            scale=jnp.asarray(data["scaler_scale"]),
        ),
        frontend=FrontendConfig(**fdict),
        feature_set=meta["feature_set"],
        class_names=tuple(meta["class_names"]),
        feature_mode=meta.get("feature_mode", "batch"),
        continuous_params=meta.get("continuous_params") or None,
    )
