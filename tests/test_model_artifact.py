"""Model persistence round-trip + standalone inference (classify.py path).

The reference cannot classify without re-training; the model artifact
(lsm_tpu/io/model.py) makes the trained pipeline deployable. The saved
bundle must reproduce the training-time predictions exactly.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lsm_tpu.config import (
    FEATURE_SETS,
    FrontendConfig,
    PipelineConfig,
    ReservoirConfig,
)
from lsm_tpu.io import artifacts, dataset
from lsm_tpu.io import model as model_io
from lsm_tpu.models import reservoir as res
from lsm_tpu.readout import logistic, scaler
from lsm_tpu import pipeline


def test_model_roundtrip_and_inference(tmp_path):
    cfg = PipelineConfig(
        frontend=FrontendConfig(n_filters=32),
        reservoir=ReservoirConfig(
            num_neurons=192, num_output_neurons=96, small_world_k=38,
            input_fanout=6,
        ),
        commands=("a", "b", "c", "d"),
        batch_size=16,
    )
    audio, labels = dataset.synthetic_audio_batch(n_per_class=16, n_classes=4,
                                                  seed=5)
    spikes = pipeline.featurize_audio_array(cfg, audio, mesh=None)
    ds = artifacts.SpikeDataset(spikes, labels)
    ext = pipeline.extract_lsm_features(cfg, ds, run_diagnostics=False,
                                        mesh=None)
    result = pipeline.train_and_evaluate(cfg, ext.artifact, mesh=None)
    assert ext.scaler is not None

    path = tmp_path / "model.npz"
    model_io.save_model(
        path, reservoir=ext.params, readout=result.params, scaler=ext.scaler,
        frontend=cfg.frontend, feature_set=cfg.feature_set,
        class_names=cfg.commands,
    )
    bundle = model_io.load_model(path)
    assert bundle.class_names == cfg.commands
    assert bundle.frontend == cfg.frontend
    assert bundle.feature_set == cfg.feature_set
    np.testing.assert_array_equal(
        np.asarray(bundle.reservoir.w_rec), np.asarray(ext.params.w_rec)
    )

    # Inference with the loaded bundle reproduces the in-process predictions.
    keys = tuple(FEATURE_SETS[cfg.feature_set])
    feats = res.extract_features(ext.params, jnp.asarray(spikes), keys)
    preds_train_time = np.asarray(
        logistic.predict(result.params, scaler.transform(ext.scaler, feats))
    )
    preds_loaded, labs = pipeline.classify_spikes_streaming(
        cfg, _Source(ds), bundle.reservoir, bundle.readout, bundle.scaler,
        mesh=None,
    )
    np.testing.assert_array_equal(preds_loaded, preds_train_time)
    np.testing.assert_array_equal(labs, labels)


class _Source:
    def __init__(self, ds):
        self.ds = ds

    def iter_batches(self, batch_size):
        x, y = self.ds.x_spikes, self.ds.y_labels
        for s in range(0, x.shape[0], batch_size):
            yield artifacts.SpikeDataset(x[s:s+batch_size], y[s:s+batch_size])


def test_load_model_missing_file(tmp_path):
    with pytest.raises(FileNotFoundError):
        model_io.load_model(tmp_path / "nope.npz")


def test_sparse_bundle_carries_versioned_format(tmp_path):
    """Sparse bundles save under their own format tag, so a pre-sparse
    loader (which only knows lsm_tpu.model.v1) rejects them with a clear
    versioning error instead of a raw KeyError('w_rec')."""
    import json

    from lsm_tpu.models.sparse import init_reservoir_sparse

    rcfg = ReservoirConfig(
        num_neurons=256, num_output_neurons=128, small_world_k=52,
        mean_weight=0.01, sparse=True,
    )
    sparams = init_reservoir_sparse(rcfg, n_channels=32)
    d = 5 * 128
    path = tmp_path / "sparse_model.npz"
    model_io.save_model(
        path, reservoir=sparams,
        readout=logistic.LogisticParams(
            w=jnp.zeros((d, 4)), b=jnp.zeros((4,))
        ),
        scaler=scaler.ScalerState(mean=jnp.zeros((d,)), scale=jnp.ones((d,))),
        frontend=FrontendConfig(n_filters=32),
        feature_set="original", class_names=("a", "b", "c", "d"),
    )
    data = np.load(path, allow_pickle=True)
    assert json.loads(str(data["meta"]))["format"] == model_io._FORMAT_SPARSE
    bundle = model_io.load_model(path)          # this build reads it fine
    assert bundle.reservoir.n_neurons == 256

    # An unknown tag must name the formats this build understands.
    meta = json.loads(str(data["meta"]))
    meta["format"] = "lsm_tpu.model.v99"
    bad = {k: data[k] for k in data.files if k != "meta"}
    np.savez(tmp_path / "bad.npz", meta=json.dumps(meta), **bad)
    with pytest.raises(ValueError, match="unknown model format.*v99"):
        model_io.load_model(tmp_path / "bad.npz")
